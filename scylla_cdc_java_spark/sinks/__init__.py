from .parquet_merge import ParquetMergeSink

__all__ = ["ParquetMergeSink"]
