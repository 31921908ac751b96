"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side mechanics are real and tested — schema, Arrow batch
shape, ``mapInPandas`` iterator contract, partition sizing — while the
actual media decode is STUBBED deterministically (this container ships
no image/audio libraries). ``decode_real`` shows where PIL/soundfile
would slot in, gated behind an import-try that raises
``NotImplementedError`` here.

Scale notes: media blobs dominate row size, so the decode pass uses
``mapInPandas`` (streaming iterator of Arrow batches — bounded memory
regardless of blob size) rather than a scalar UDF; on a real corpus
you'd cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g.
64) so a batch of 10 MB blobs fits comfortably in executor memory.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

META_SCHEMA = (
    "doc_id long, n_bytes int, format string, width int, height int, "
    "n_frames int, checksum long"
)


def to_binary_assets(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Model a media table: (doc_id, asset binary, media_type). Here the
    'asset' is the document's bytes — the plumbing is type-faithful."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("asset"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a real decoder: dimensions derived
    from a checksum, so tests are stable and SQL-oracle-checkable."""
    crc = zlib.crc32(blob)
    return {
        "n_bytes": len(blob),
        "width": 64 + crc % 577,
        "height": 64 + (crc >> 10) % 577,
        "n_frames": 1 + crc % 24,
        "checksum": crc,
    }


def decode_stub_metadata(assets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode pass: binary -> typed metadata row."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(b) for b in pdf["asset"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            out.insert(2, "format", pdf["media_type"].values)
            yield out[["doc_id", "n_bytes", "format", "width", "height",
                       "n_frames", "checksum"]]

    return assets.mapInPandas(_decode, schema=META_SCHEMA)


def decode_real(assets: DataFrame):  # pragma: no cover - env-gated
    """Where a real decoder integrates (PIL for images, etc.)."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media libraries not available in this environment; "
            "use decode_stub_metadata for the plumbing-level pipeline"
        ) from e
    raise NotImplementedError("wire PIL.Image.open over mapInPandas batches")
