"""PNG codec (functions/png.py) — unit + integration pins.

Decoder validated against HAND-BUILT streams (filters written per the
spec by an independent scalar implementation, not our encoder) across
all five filter types and all four supported color types, plus CRC and
unsupported-feature error paths. PNG is lossless, so arbitrary content
round-trips bit-exactly — the property that lets PNG rows share the
formula-pixel media_features oracle with PPM/BMP.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flink_essentials_spark.functions import png

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(t: bytes, b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + t + b + struct.pack(
        ">I", zlib.crc32(t + b) & 0xFFFFFFFF
    )


def _build(w, h, color_type, raw: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth_scalar(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def _filter_image(img: np.ndarray, ftype_of_row) -> bytes:
    """Independent scalar reference implementation of PNG filtering."""
    h, w, ch = img.shape
    stride = w * ch
    out = bytearray()
    prev = [0] * stride
    for y in range(h):
        ft = ftype_of_row(y)
        line = [int(v) for v in img[y].ravel()]
        out.append(ft)
        for x in range(stride):
            left = line[x - ch] if x >= ch else 0
            ul = prev[x - ch] if x >= ch else 0
            up = prev[x]
            if ft == 0:
                e = line[x]
            elif ft == 1:
                e = (line[x] - left) & 0xFF
            elif ft == 2:
                e = (line[x] - up) & 0xFF
            elif ft == 3:
                e = (line[x] - (left + up) // 2) & 0xFF
            else:
                e = (line[x] - _paeth_scalar(left, up, ul)) & 0xFF
            out.append(e)
        prev = line
    return bytes(out)


def test_round_trip_rgb_and_gray():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)
    assert np.array_equal(png.decode_png(png.encode_png(rgb)), rgb)
    g = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    assert np.array_equal(
        png.decode_png(png.encode_png(g)), np.repeat(g[:, :, None], 3, axis=2)
    )


def test_decode_all_filter_types_hand_built():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (10, 4, 3), dtype=np.uint8)
    data = _build(4, 10, 2, _filter_image(img, lambda y: y % 5))
    assert np.array_equal(png.decode_png(data), img)


def test_decode_rgba_and_gray_alpha():
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    data = _build(5, 6, 6, _filter_image(rgba, lambda y: y % 5))
    assert np.array_equal(png.decode_png(data), rgba[:, :, :3])
    ga = rng.integers(0, 256, (4, 7, 2), dtype=np.uint8)
    data = _build(7, 4, 4, _filter_image(ga, lambda y: 0))
    assert np.array_equal(png.decode_png(data), np.repeat(ga[:, :, :1], 3, axis=2))


def test_crc_mismatch_raises():
    bad = bytearray(png.encode_png(np.zeros((3, 3, 3), np.uint8)))
    bad[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(bad))


def test_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"BM not a png")
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    data = SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IDAT", zlib.compress(b"\x00" * 26)) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="8-bit"):
        png.decode_png(data)
    ihdr_pal = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = SIG + _chunk(b"IHDR", ihdr_pal) + _chunk(b"IDAT", zlib.compress(b"\x00" * 6)) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="color type"):
        png.decode_png(data)


def test_decode_media_covers_png_rows(spark):
    from pyspark.sql import functions as F

    from flink_essentials_spark.functions import multimodal
    from flink_essentials_spark.tables import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].filter(
        F.col("doc_id") < 60
    )
    media = multimodal.synthetic_real_media(spark, docs)
    rows = multimodal.decode_media(
        media.filter(F.col("mime_type") == png.PNG_MIME)
    ).collect()
    assert rows, "no PNG rows under doc_id < 60 (doc_id % 24 == 12)"
    for r in rows:
        did = r["media_id"]
        w, h = ((did % 8) + 1) * 4, ((did % 4) + 1) * 2
        px = (did + np.arange(w * h * 3)) % 256
        assert r["features"][0] == float(w)
        assert r["features"][3] == int(px.sum()) / px.size
