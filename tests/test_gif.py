"""GIF codec (functions/gif.py) — LZW round trips, hand-built streams
for local-color-table and extension handling, error paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_essentials_spark.functions import gif


def test_round_trip_shapes_and_dictionary_growth():
    rng = np.random.default_rng(1)
    for shape in [(1, 1), (2, 3), (7, 13), (64, 70), (200, 300)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        got = gif.decode_gif(gif.encode_gif(a))
        assert np.array_equal(got, np.repeat(a[:, :, None], 3, axis=2)), shape


def test_round_trip_long_runs_hit_clear_reset():
    # constant runs compress into deep dictionary chains; a 200x300
    # two-tone image forces the 12-bit cap and a mid-stream CLEAR
    a = np.zeros((200, 300), dtype=np.uint8)
    a[::3] = 255
    a[:, ::7] = 17
    got = gif.decode_gif(gif.encode_gif(a))
    assert np.array_equal(got[:, :, 0], a)


def _minimal_gif(w, h, indices, palette, *, local=False, interlace=False,
                 extension=b""):
    """Hand-built single-image GIF with the palette either global or
    local — an independent construction path for decoder tests."""
    n_pal = len(palette)
    size_field = max(1, (n_pal - 1).bit_length()) - 1
    pal_bytes = b"".join(bytes(c) for c in palette)
    pal_bytes += b"\x00" * ((2 << size_field) * 3 - len(pal_bytes))
    out = bytearray(b"GIF89a")
    gct_flag = 0 if local else 0x80 | size_field
    out += struct.pack("<HHBBB", w, h, gct_flag, 0, 0)
    if not local:
        out += pal_bytes
    out += extension
    ipacked = (0x80 | size_field if local else 0) | (0x40 if interlace else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local:
        out += pal_bytes
    mcs = 2
    out.append(mcs)
    data = gif._lzw_encode(np.asarray(indices, dtype=np.uint8), mcs)
    for i in range(0, len(data), 255):
        out.append(len(data[i : i + 255]))
        out += data[i : i + 255]
    out += b"\x00\x3b"
    return bytes(out)


def test_local_color_table_and_extension_skipping():
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = [0, 1, 2, 3, 2, 1]
    # graphic-control extension (0x21 0xF9) must be skipped cleanly
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    data = _minimal_gif(3, 2, idx, palette, local=True, extension=ext)
    got = gif.decode_gif(data)
    exp = np.array([palette[i] for i in idx], dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(got, exp)


def test_rejects_interlaced_and_no_image():
    data = _minimal_gif(2, 2, [0, 1, 1, 0], [(0, 0, 0), (1, 1, 1)], interlace=True)
    with pytest.raises(ValueError, match="interlaced"):
        gif.decode_gif(data)
    with pytest.raises(ValueError, match="signature"):
        gif.decode_gif(b"BM not a gif")
    # header + trailer, no image descriptor
    hdr = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="no image"):
        gif.decode_gif(hdr)


def test_truncation_always_valueerror():
    data = gif.encode_gif((np.arange(1200) % 256).astype(np.uint8).reshape(30, 40))
    # every cut INSIDE the image data must raise ValueError; dropping
    # only the trailing 0x3B leaves a complete image, which decodes
    # (lenient, like real-world decoders)
    for cut in range(1, len(data) - 1, 11):
        with pytest.raises(ValueError):
            gif.decode_gif(data[:cut])
    assert gif.decode_gif(data[: len(data) - 1]).shape == (30, 40, 3)


def test_gif_features_query_runs(spark):
    from flink_essentials_spark.queries.llmdata import q_gif_features

    rows = q_gif_features(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:20]:
        did = r["doc_id"]
        w, h = ((did % 8) + 1) * 4, ((did % 4) + 1) * 2
        v = (did * 5 + 3 * np.arange(w * h)) % 256
        assert (r["w"], r["h"]) == (w, h)
        assert r["mean_val"] == int(v.sum()) / v.size


def test_encode_gif_rgb_palette_and_resize_round_trip():
    rng = np.random.default_rng(4)
    # 5-color image: exact-palette encode must round-trip losslessly
    palette = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (9, 11))
    img = palette[idx]
    assert np.array_equal(gif.decode_gif(gif.encode_gif_rgb(img)), img)
    # 300 guaranteed-distinct colors (i spread over two channels)
    i = np.arange(300)
    many = np.stack([i % 256, i // 256, np.zeros_like(i)], axis=1).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        gif.encode_gif_rgb(many.reshape(20, 15, 3))


def test_resize_images_handles_gif(spark):
    from flink_essentials_spark.functions import codecs, multimodal

    g = (np.arange(8 * 6) % 256).astype(np.uint8).reshape(6, 8)
    df = spark.createDataFrame(
        [(1, "image", bytearray(gif.encode_gif(g)), gif.GIF_MIME)],
        "media_id long, modality string, payload binary, mime_type string",
    )
    out = multimodal.resize_images(df, 4, 3).collect()
    assert len(out) == 1 and (out[0]["width"], out[0]["height"]) == (4, 3)
    dec = gif.decode_gif(bytes(out[0]["payload"]))
    exp = codecs.resize_nearest(np.repeat(g[:, :, None], 3, axis=2), 4, 3)
    assert np.array_equal(dec, exp)
