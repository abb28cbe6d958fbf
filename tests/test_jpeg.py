"""Baseline JPEG codec (functions/jpeg.py) — unit + integration pins.

The decoder is validated three independent ways:
1. A HAND-ASSEMBLED minimal stream (bytes written per T.81 by hand, not
   by our encoder) must decode to the analytically-derived pixels —
   this catches encoder/decoder bug cancellation.
2. Flat images at quality 100 round-trip bit-exactly (DC-only blocks,
   unit quant table) — the invariant the media_features oracle leans on.
3. General content round-trips within quantization tolerance for
   4:4:4, 4:2:0, grayscale and restart-interval streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_essentials_spark.functions import jpeg


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    x, y = np.arange(w), np.arange(h)
    r = np.minimum(np.add.outer(y * 2, x), 255)
    g = np.minimum(np.add.outer(y, x * 2), 255)
    b = np.minimum(np.add.outer(y * 3, x * 3) // 2, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


# --- 1. hand-assembled stream (encoder-independent) --------------------------


def test_decode_hand_assembled_dc_only_stream():
    """8x8 single-component stream with quant table all ones, Huffman
    tables with a single 1-bit code, one DC coefficient 576 and EOB.
    Analytically: IDCT of [576, 0...] is flat 576/8 = 72 -> +128 = 200.
    Entropy bits: DC code '0', 10 magnitude bits of 576 (1001000000),
    AC-EOB code '0', padded with 1s -> bytes 0x48 0x07."""
    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
    sof = b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08" + (8).to_bytes(2, "big") + (
        8
    ).to_bytes(2, "big") + b"\x01" + b"\x01\x11\x00"
    dc_bits = bytes([1] + [0] * 15)  # one 1-bit code
    dht_dc = b"\xff\xc4" + (20).to_bytes(2, "big") + b"\x00" + dc_bits + bytes([10])
    dht_ac = b"\xff\xc4" + (20).to_bytes(2, "big") + b"\x10" + dc_bits + bytes([0x00])
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01" + b"\x01\x00" + b"\x00\x3f\x00"
    stream = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + b"\x48\x07" + b"\xff\xd9"
    out = jpeg.decode_jpeg(stream)
    assert out.shape == (8, 8, 3)
    assert np.all(out == 200), np.unique(out)


# --- 2. flat exactness (the oracle invariant) --------------------------------


@pytest.mark.parametrize("v", [0, 7, 128, 201, 255])
@pytest.mark.parametrize("shape", [(8, 8), (2, 4), (17, 31), (24, 40)])
def test_flat_gray_q100_exact(v, shape):
    arr = np.full(shape, v, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=100))
    assert out.shape == (*shape, 3)
    assert np.all(out == v)


def test_flat_gray_q100_exact_with_restarts():
    arr = np.full((16, 40), 99, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=100, restart_interval=1))
    assert np.all(out == 99)


def test_flat_color_q100_exact_rgb():
    # flat COLOR 3-channel input with R=G=B is still exactly flat gray
    arr = np.full((10, 12, 3), 55, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=100))
    assert np.all(out == 55)


# --- 3. round-trip tolerance for general content -----------------------------


def test_gray_gradient_tight():
    g = np.linspace(0, 255, 33 * 47).reshape(33, 47).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert int(np.abs(out[:, :, 0].astype(int) - g.astype(int)).max()) <= 4


def test_color_444_smooth():
    arr = _smooth_rgb(40, 56)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=95))
    assert out.shape == arr.shape
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 12


def test_color_420_smooth():
    arr = _smooth_rgb(38, 54)  # odd MCU coverage (not multiple of 16)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=95, subsample=True))
    assert out.shape == arr.shape
    err = np.abs(out.astype(int) - arr.astype(int))
    assert float(err.mean()) <= 3.0
    assert int(err.max()) <= 40  # chroma edges lose more; smooth input stays low


def test_restart_interval_bitstream_equivalent():
    arr = _smooth_rgb(40, 56)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=90))
    rst = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=90, restart_interval=3))
    assert np.array_equal(base, rst)


def test_quality_monotonic():
    arr = _smooth_rgb(32, 32)
    errs = []
    for q in (30, 60, 90):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=q))
        errs.append(float(np.abs(out.astype(int) - arr.astype(int)).mean()))
    assert errs[0] >= errs[1] >= errs[2]


# --- error paths -------------------------------------------------------------


def test_rejects_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"P6\n1 1\n255\nxxx")


def test_rejects_progressive():
    data = bytearray(jpeg.encode_jpeg(np.full((8, 8), 5, np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        jpeg.decode_jpeg(bytes(data))


def test_truncated_stream_raises():
    # every cut INSIDE the stream must yield the codec's ValueError
    # family, never a raw IndexError; dropping only the trailing EOI
    # marker leaves a complete image, which decodes (lenient, like the
    # GIF trailer case — pinned explicitly so an encoder change that
    # shifts the length can't make the sweep land on it spuriously)
    data = jpeg.encode_jpeg(_smooth_rgb(24, 24), quality=90)
    for cut in range(2, len(data) - 2, 7):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(data[:cut])
    assert jpeg.decode_jpeg(data[: len(data) - 2]).shape == (24, 24, 3)


# --- integration through the Spark multimodal layer --------------------------


def test_decode_media_covers_jpeg_rows(spark):
    from flink_essentials_spark.functions import multimodal
    from flink_essentials_spark.tables import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].limit(60)
    media = multimodal.synthetic_real_media(spark, docs)
    rows = (
        multimodal.decode_media(media.filter(F_mime_jpeg()))
        .select("media_id", "features")
        .collect()
    )
    assert rows, "no JPEG rows in the first 60 docs (doc_id % 12 in (3, 9))"
    for r in rows:
        did = r["media_id"]
        w, h, v = ((did % 8) + 1) * 4, ((did % 4) + 1) * 2, float(did % 256)
        assert r["features"] == [
            float(w), float(h), 3.0, v, v, v, v, float(w * h * 3)
        ], did


def F_mime_jpeg():
    from pyspark.sql import functions as F

    return F.col("mime_type") == jpeg.JPEG_MIME


def test_resize_images_jpeg_path(spark):
    from pyspark.sql import functions as F

    from flink_essentials_spark.functions import multimodal
    from flink_essentials_spark.tables import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].limit(60)
    media = multimodal.synthetic_real_media(spark, docs).filter(F_mime_jpeg())
    out = multimodal.resize_images(media, 16, 12).collect()
    assert out
    for r in out:
        arr = jpeg.decode_jpeg(bytes(r["payload"]))
        assert arr.shape == (12, 16, 3)
        # flat source stays flat through resize + re-encode at q90:
        # DC-only blocks survive any quant table exactly
        assert np.all(arr == arr[0, 0, 0])
