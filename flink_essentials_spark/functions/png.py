"""Pure-stdlib+numpy PNG codec (RFC 2083 / W3C PNG spec, public).

PNG is chunked (IHDR/IDAT/IEND, CRC-32 per chunk) around a
zlib-compressed, per-scanline-filtered pixel stream. ``zlib`` is the
Python standard library — no external codec package — so PNG joins
PPM/BMP/JPEG/WAV as a fully real format in this image:

- decoder: chunk walk with CRC verification, concatenated-IDAT
  inflate, scanline unfilter (all five filter types: None/Sub/Up/
  Average/Paeth), 8-bit grayscale / gray+alpha / RGB / RGBA -> uint8
  (h, w, 3) RGB (alpha dropped, gray replicated).
- encoder: filter type 0 scanlines, one IDAT, RGB or grayscale.
  Lossless either way — unlike JPEG, arbitrary content round-trips
  bit-exactly, which keeps formula-pixel fixtures oracle-predictable.

Interlaced (Adam7), 16-bit and paletted images are rejected with a
clear error. Runs inside Arrow-batched mapInPandas bodies per payload,
per executor — never on the driver. Reference parity: the reference
repo has no multimodal layer; this backs the training-data extension
surface (SURVEY.md §2.11).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MIME = "image/png"

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale -> PNG (filter 0)."""
    gray = arr.ndim == 2
    assert arr.dtype == np.uint8
    h, w = arr.shape[:2]
    color_type = 0 if gray else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, -1)
    scanlines = np.zeros((h, raw.shape[1] + 1), dtype=np.uint8)
    scanlines[:, 1:] = raw  # filter byte 0 per line
    idat = zlib.compress(scanlines.tobytes(), 6)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> uint8 (h, w, 3) RGB. 8-bit gray/gray+alpha/RGB/RGBA only;
    CRCs verified; all five scanline filters supported."""
    if data[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth={depth}")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type} (palette?)")

    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * channels
    raw = raw.reshape(h, stride + 1)
    ftypes, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = lines[y].copy()
        ft = ftypes[y]
        prev = out[y - 1] if y else zero
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up — vectorized whole-line
            out[y] = line + prev
        elif ft == 1:  # Sub = per-channel prefix sum mod 256 (vectorized)
            out[y] = np.cumsum(
                line.reshape(w, channels), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ft in (3, 4):
            # Average/Paeth: nonlinear left-dependency every `channels`
            # bytes — loop over PIXELS with channel-vector math (w
            # iterations, not w*channels scalar numpy ops)
            ln = line.reshape(w, channels).astype(np.int32)
            pv = prev.reshape(w, channels).astype(np.int32)
            res = np.empty((w, channels), dtype=np.int32)
            left = np.zeros(channels, dtype=np.int32)
            if ft == 3:
                for i in range(w):
                    left = (ln[i] + ((left + pv[i]) >> 1)) & 0xFF
                    res[i] = left
            else:
                upleft = np.zeros(channels, dtype=np.int32)
                for i in range(w):
                    b = pv[i]
                    p = left + b - upleft
                    pa, pb, pc = np.abs(p - left), np.abs(p - b), np.abs(p - upleft)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, upleft)
                    )
                    left = (ln[i] + pred) & 0xFF
                    res[i] = left
                    upleft = b
            out[y] = res.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2).copy()
    if channels == 2:  # gray + alpha: drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    if channels == 4:  # RGBA: drop alpha
        return px[:, :, :3].copy()
    return px.copy()
