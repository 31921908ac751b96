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
    'asset' is the document's bytes — the plumbing is type-faithful.
    fan_out: every downstream decode is a per-row mapInPandas pass that
    inherits the scan's partitioning — a single-row-group corpus file
    would otherwise decode on one core (datapipe/fanout.py)."""
    from .fanout import fan_out

    docs = fan_out(docs, id_col)
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


RESIZE_SCHEMA = (
    "doc_id long, asset binary, width int, height int, n_bytes int"
)

FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary, n_frames int"

FEATURE_DIM = 16
FEATURES_SCHEMA = "doc_id long, features array<float>"


def resize_stub(assets: DataFrame, target_w: int = 224, target_h: int = 224,
                id_col: str = "doc_id") -> DataFrame:
    """Image-resize pass: binary -> binary with new dimensions. The
    resample itself is stubbed (no PIL here) as a deterministic byte
    subsample to exactly ``target_w*target_h/64`` bytes, but the Spark
    plumbing is the real thing: ``mapInPandas`` over Arrow batches,
    binary in / binary out, bounded memory per batch (cap
    ``arrow.maxRecordsPerBatch`` low for real megapixel blobs)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = max(1, target_w * target_h // 64)
        for pdf in batches:
            out_blobs, dims = [], []
            for b in pdf["asset"]:
                b = bytes(b)
                step = max(1, len(b) // n_out)
                out_blobs.append(b[::step][:n_out])
                dims.append((target_w, target_h))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "asset": out_blobs,
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_bytes": [len(b) for b in out_blobs],
            })

    return assets.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def frame_sample_stub(assets: DataFrame, every_n: int = 8,
                      id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling pass: one binary blob -> several frame rows
    (row explosion INSIDE mapInPandas, the shape a real ffmpeg-backed
    sampler needs). Frames are deterministic byte slices standing in for
    decoded frames; the per-asset frame count comes from the stub
    decoder so it is stable for tests."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": [], "n_frames": []}
            for did, b in zip(pdf[id_col], pdf["asset"]):
                b = bytes(b)
                total = _fake_decode(b)["n_frames"]
                picked = list(range(0, total, every_n)) or [0]
                chunk = max(1, len(b) // max(total, 1))
                for fi in picked:
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(fi)
                    rows["frame"].append(b[fi * chunk:(fi + 1) * chunk])
                    rows["n_frames"].append(total)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(_frames, schema=FRAMES_SCHEMA)


def feature_extract_stub(assets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction pass: binary -> fixed-dim float vector (the
    embedding-model slot). Stub: a 16-dim byte-histogram projection,
    numpy-vectorized per Arrow batch — the exact batch shape a real
    ONNX/torch encoder consumes (stacked uint8 tensor in, float32
    matrix out)."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["asset"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM)[:FEATURE_DIM]
                tot = max(hist.sum(), 1)
                vec = (hist / tot).astype(np.float32)
                assert len(vec) == FEATURE_DIM  # schema promises array of this dim
                feats.append(vec)
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "features": feats,
            })

    return assets.mapInPandas(_feat, schema=FEATURES_SCHEMA)


PNG_ASSETS_SCHEMA = "doc_id long, asset binary"
PNG_DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_pixels int, pixel_crc long"
)


def to_png_assets(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Encode each doc as a REAL (spec-conformant) tiny RGB PNG — the
    ingest half of the decode-on-real-bytes round trip. mapInPandas:
    text bytes -> deterministic pixel buffer -> stdlib PNG encoder
    (datapipe/png.py), rotating through all five scanline filters.
    fan_out before the per-row encoder for the same reason as
    ``to_binary_assets``."""
    from .fanout import fan_out
    from .png import doc_pixels, encode_png

    docs = fan_out(docs, id_col)

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                w, h, buf = doc_pixels(int(did), text)
                blobs.append(encode_png(w, h, buf))
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "asset": blobs})

    return docs.mapInPandas(_enc, schema=PNG_ASSETS_SCHEMA)


def decode_real(assets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode over binary assets — no stub: parses the PNG
    container (signature, chunk CRCs), inflates IDAT with zlib, and
    reconstructs every scanline filter (datapipe/png.py). Same
    ``mapInPandas`` Arrow-batch plumbing as the stub passes, so the
    memory posture at scale is identical (cap
    ``arrow.maxRecordsPerBatch`` low for megapixel blobs). Wider format
    support (JPEG, palettes, alpha) is where PIL would slot into this
    exact function body on a real cluster."""
    import zlib as _zlib

    from .png import decode_png

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "n_pixels": [], "pixel_crc": []}
            for did, blob in zip(pdf[id_col], pdf["asset"]):
                w, h, pixels = decode_png(bytes(blob))
                rows["doc_id"].append(did)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(len(pixels))
                rows["pixel_crc"].append(_zlib.crc32(pixels))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(_dec, schema=PNG_DECODE_SCHEMA)
