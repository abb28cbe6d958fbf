"""Pure-stdlib+numpy GIF89a codec (CompuServe GIF89a spec + the LZW
variant it mandates — public documents).

GIF is a palette format: pixels are indices into a ≤256-entry color
table, compressed with variable-width LZW (9→12-bit codes, LSB-first
bit packing, CLEAR/EOI control codes, sub-block framing). Palette
indexing makes it LOSSLESS for any image with ≤256 distinct colors —
so, like PPM/BMP/PNG, formula-pixel fixtures round-trip bit-exactly
and a DuckDB oracle can predict decoded stats arithmetically.

- decoder: header + logical-screen descriptor, global AND local color
  tables, extension-block skipping (graphic control / comment /
  application), full LZW decode (dictionary rebuild, deferred-clear
  tolerant, 12-bit cap), palette lookup → uint8 (h, w, 3) RGB.
  Interlaced images are rejected with a clear error; truncated or
  corrupt streams raise ValueError (never raw IndexError).
- encoder: grayscale (h, w) uint8 with the 256-gray global palette,
  REAL LZW compression (dictionary build, width growth, CLEAR reset at
  dictionary cap — not the uncompressed-GIF trick).

Runs inside Arrow-batched mapInPandas bodies per payload, per executor
— never on the driver. Reference parity: the reference repo has no
multimodal layer; this backs the training-data extension surface
(SURVEY.md §2.11).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MIME = "image/gif"

_HDR = b"GIF89a"
_MAX_WIDTH = 12  # LZW code width cap per the spec


class _LsbBitWriter:
    """LSB-first bit packer (GIF's bit order), framed into ≤255-byte
    sub-blocks by the caller."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LsbBitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    w.write(clear, width)
    prev = b""
    for sym in indices.tolist():
        cur = prev + bytes([sym])
        if cur in table:
            prev = cur
            continue
        w.write(table[prev], width)
        table[cur] = nxt
        nxt += 1
        # decoder grows its width when ITS next slot hits 2^width; the
        # encoder mirrors that exactly
        if nxt - 1 == (1 << width) and width < _MAX_WIDTH:
            width += 1
        if nxt == (1 << _MAX_WIDTH):
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
        prev = bytes([sym])
    if prev:
        w.write(table[prev], width)
        # the decoder defines one more entry while processing this
        # final code; if that define lands ON the width boundary the
        # decoder reads the NEXT code one bit wider — mirror it, or
        # EOI desyncs (found by the hypothesis sweep on tiny palettes)
        if nxt == (1 << width) and width < _MAX_WIDTH:
            width += 1
    w.write(eoi, width)
    return w.flush()


def encode_gif(arr: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale -> GIF89a with a 256-gray global palette.

    Palette index == gray value, so decode returns the gray replicated
    to RGB bit-exactly (lossless for grayscale content by construction).
    """
    assert arr.dtype == np.uint8 and arr.ndim == 2
    h, w = arr.shape
    out = bytearray(_HDR)
    # logical screen descriptor: GCT present, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # gray global color table
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(8)  # LZW minimum code size
    data = _lzw_encode(arr.reshape(-1), 8)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def encode_gif_rgb(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB with ≤256 distinct colors -> GIF89a with an
    exact palette (lossless). Raises ValueError beyond 256 colors — GIF
    is a palette format; quantization is a modeling decision left to
    the caller. Nearest-neighbor resize output of any decoded GIF stays
    within the source palette, so resize→re-encode always round-trips."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs <= 256 distinct colors, image has {len(palette)}"
        )
    size_field = max(1, (len(palette) - 1).bit_length()) - 1
    n_entries = 2 << size_field
    mcs = max(2, size_field + 1)
    out = bytearray(_HDR)
    out += struct.pack("<HHBBB", w, h, 0x80 | (0x70 | size_field), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += b"\x00" * ((n_entries - len(palette)) * 3)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    data = _lzw_encode(indices.astype(np.uint8), mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF stream (LZW data ends early)")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LsbBitReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0
    table: list[bytes] = []
    width = min_code_size + 1
    prev = b""

    def reset() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = reset()
    while True:
        code = r.read(width)
        if code == clear:
            table = reset()
            width = min_code_size + 1
            prev = b""
            continue
        if code == eoi:
            break
        if not prev:
            if code >= len(table):
                raise ValueError("corrupt GIF stream (first code not literal)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF stream (code beyond dictionary)")
        if pos + len(entry) > n_pixels:
            raise ValueError("corrupt GIF stream (more pixels than image size)")
        out[pos : pos + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        pos += len(entry)
        if len(table) == (1 << width) and width < _MAX_WIDTH:
            width += 1
        prev = entry
    if pos != n_pixels:
        raise ValueError(
            f"corrupt GIF stream (decoded {pos} pixels, expected {n_pixels})"
        )
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF -> uint8 (h, w, 3) RGB (first image frame; palette applied).

    Supports global/local color tables, skips extension blocks; rejects
    interlaced images; truncated/corrupt streams raise ValueError.
    """
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF (bad signature)")
    try:
        sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF stream (no image descriptor)")
            block = data[pos]
            pos += 1
            if block == 0x3B:  # trailer before any image
                raise ValueError("GIF contains no image data")
            if block == 0x21:  # extension: label + sub-blocks
                pos += 1
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
                continue
            if block != 0x2C:
                raise ValueError(f"unexpected GIF block 0x{block:02x}")
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image has no color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(lzw), min_code_size, w * h)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("corrupt GIF stream (index beyond palette)")
            return pal[idx].reshape(h, w, 3).copy()
    except (IndexError, struct.error):
        raise ValueError("truncated GIF stream") from None
