"""scylla_cdc_java_spark — a from-scratch, PySpark-native CDC /
incremental-ingest engine with the capabilities of scylla-cdc-java
(reference surveyed in SURVEY.md; no code shared or translated).

Public surface (mirrors ScyllaCDC.java:17-40 / replicator Main):

    from scylla_cdc_java_spark import Engine, GenSpec, generate_to_dir
    info = generate_to_dir(GenSpec(n_events=100_000), "/tmp/world")
    eng = Engine(spark, info["log_dir"], info["generations_path"], "/tmp/tgt")
    stats = eng.replay()
    eng.sink.read().show()
"""

from .generator import GenSpec, generate_to_dir, generate_world, write_world
from .oracle import OracleState, apply_event, final_state
from .model import DEFAULT_TABLE, EngineConfig, TableConfig
from .sinks.parquet_merge import ParquetMergeSink, list_view
from .streaming.engine import Engine, ReplayStats
from .streaming.stream_tail import StructuredTail

__all__ = [
    "Engine",
    "ReplayStats",
    "StructuredTail",
    "GenSpec",
    "generate_to_dir",
    "generate_world",
    "write_world",
    "ParquetMergeSink",
    "list_view",
    "TableConfig",
    "DEFAULT_TABLE",
    "EngineConfig",
    "OracleState",
    "apply_event",
    "final_state",
]
