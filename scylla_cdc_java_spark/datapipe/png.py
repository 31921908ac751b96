"""Minimal dependency-free PNG codec (stdlib ``zlib`` + ``struct``).

Closes the one env-gated stub in the multimodal pipeline: this
container ships no PIL/ffmpeg, but PNG itself is just zlib-compressed
scanlines with per-row filters (RFC 2083), so 8-bit RGB encode/decode
is implementable exactly with the stdlib. The encoder emits spec-
conformant files (signature, IHDR/IDAT/IEND with CRCs) and rotates
through ALL five filter types row by row, so the decoder's filter
reconstruction (None/Sub/Up/Average/Paeth) is genuinely exercised on
every image taller than 4 rows — decode is not a trivial inverse of a
degenerate encode.

Scope: 8-bit/channel RGB (color type 2), non-interlaced — the shape
the multimodal plumbing needs for real byte-exact decode tests. A full
decoder (palettes, alpha, interlace) is where PIL would slot in on a
real corpus.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes (len == width*height*3) as a conformant
    PNG. Row r uses filter type r % 5 — all five filters appear in any
    image with >= 5 rows."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    stride = width * 3
    prev = bytes(stride)
    raw = bytearray()
    for r in range(height):
        row = rgb[r * stride:(r + 1) * stride]
        ft = r % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - 3] if i >= 3 else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (row[i] - _paeth(
                    row[i - 3] if i >= 3 else 0,
                    prev[i],
                    prev[i - 3] if i >= 3 else 0,
                )) & 0xFF
                for i in range(stride)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit RGB non-interlaced PNG -> (width, height, raw
    rgb bytes). Validates signature, chunk CRCs, and IHDR shape; raises
    ValueError on anything out of scope."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", blob[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if (bit_depth, color_type, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need 8-bit RGB, "
                    "non-interlaced); a full decoder (PIL) slots in here"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                c = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter type {ft}")
        out += line
        prev = bytes(line)
    return width, height, bytes(out)


def doc_image_shape(doc_id: int) -> tuple[int, int]:
    """Deterministic tiny image dimensions for a synthetic doc asset."""
    return 4 + (doc_id % 13), 4 + ((doc_id // 13) % 11)


def doc_pixels(doc_id: int, text: str) -> tuple[int, int, bytes]:
    """Deterministic RGB buffer for a doc: its UTF-8 bytes tiled to
    width*height*3. The GOLDEN oracle computes (w, h, crc32(pixels))
    from this recipe alone — no PNG involved — so the distributed side
    must round-trip the real encoder/decoder to match."""
    w, h = doc_image_shape(doc_id)
    n = w * h * 3
    src = (text or "").encode("utf-8") or b"\x00"
    reps = n // len(src) + 1
    return w, h, (src * reps)[:n]
