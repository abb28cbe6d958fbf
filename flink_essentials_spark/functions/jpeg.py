"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

Implements the baseline sequential DCT process with Huffman entropy
coding — the dominant real-world still-image format — with no codec
library: marker parsing, DQT/DHT/SOF0/SOS/DRI, byte-stuffed bitstream,
per-component Huffman DC/AC decode, dequantize + dezigzag, 8x8 IDCT as
two matmuls against the precomputed DCT-II basis, chroma upsampling for
subsampled scans, and BT.601 YCbCr<->RGB. The encoder produces
grayscale, 4:4:4 and 4:2:0 baseline streams using the Annex K example
quantization/Huffman tables, which is what the decoder round-trip tests
pin.

Determinism note (why the media_features oracle can cover JPEG): for a
FLAT gray image every 8x8 block is constant, so the forward DCT is
exactly [8*(v-128), 0, 0, ...]; at quality 100 the quant table is all
ones, the DC value survives rounding exactly, chroma is exactly neutral
(Cb = Cr = 128), and the decoder reproduces every pixel bit-for-bit.
An independent SQL engine can therefore predict the decoded features of
flat JPEG payloads from the generator formula alone, while general
content is verified by round-trip tolerance tests (lossy by design).

Used inside Arrow-batched mapInPandas bodies (multimodal.decode_media /
resize_images) — per-payload, per-executor, never on the driver.
Reference parity: the reference repo has no multimodal layer; this
backs the training-data-pipeline surface (SURVEY.md §2.11).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MIME = "image/jpeg"

# --- zigzag / DCT basis ------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal DCT-II basis: C[u, x] = s(u) * cos((2x+1) u pi / 16),
# s(0)=sqrt(1/8), s(u>0)=sqrt(2/8). block_dct = C @ f @ C.T ;
# idct = C.T @ F @ C — two 8x8 matmuls per block, vectorized over all
# blocks with einsum below.
_C = np.zeros((8, 8))
for _u in range(8):
    _s = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _C[_u, _x] = _s * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K (K.1/K.2) example quantization tables, natural order.
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K (K.3) typical Huffman tables: (bits[1..16], huffval).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention): 1..100."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)


# --- Huffman table construction ---------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) by the canonical T.81 C.2 procedure."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical-code decoder: per-length (min_code, max_code, val_idx)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.max_code[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.max_code[length] >= code >= self.min_code[length]:
                return self.vals[self.val_ptr[length] + code - self.min_code[length]]
        raise ValueError("invalid Huffman code in JPEG stream")


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG stream (entropy data ends early)")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG stream (entropy data ends early)")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker reached — T.81 pads the tail with 1-bits
                    self.pos -= 1
                    b = 0xFF
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Skip to the next marker (used for RSTn)."""
        self.nbits = 0
        try:
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
        except IndexError:
            raise ValueError(
                "truncated JPEG stream (no marker before end of data)"
            ) from None


def _extend(v: int, n: int) -> int:
    """T.81 F.12: map n-bit magnitude to signed coefficient."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


# --- decoder -----------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 (h, w, 3) RGB (grayscale replicated).

    Supports: SOF0 baseline sequential, 1 or 3 components, arbitrary
    sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), multiple DQT/DHT
    segments, restart intervals, byte stuffing. Rejects progressive /
    arithmetic streams with a clear error.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG stream (marker cut short)")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG stream (segment length cut short)")
        seg_len = struct.unpack_from(">H", data, pos)[0]
        if pos + seg_len > len(data):
            raise ValueError("truncated JPEG stream (segment body cut short)")
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    tbl = np.frombuffer(body, ">u2", 64, p).astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(body, "u1", 64, p).astype(np.int64)
                    p += 64
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline huffman)
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"only 8-bit precision supported, got {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}); "
                "only baseline sequential is implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, dc_tabs[tt >> 4], ac_tabs[tt & 0xF]))
            pos += seg_len
            return _decode_scan(data, pos, frame, scan, qtables, restart_interval)
        pos += seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtables, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    planes = {}
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)

    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                m = reader.data[reader.pos + 1]
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected RST marker")
                reader.pos += 2
                pred = {c["id"]: 0 for c in comps}
            for comp, dc_tab, ac_tab in scan:
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = dc_tab.decode(reader)
                        diff = _extend(reader.receive(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = ac_tab.decode(reader)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        f = _C.T @ block.reshape(8, 8) @ _C
                        py0 = (my * comp["v"] + by) * 8
                        px0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][py0 : py0 + 8, px0 : px0 + 8] = f
            mcu_count += 1

    # upsample to full size, crop, level shift
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w] + 128.0)

    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category, magnitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, v if v > 0 else v + (1 << n) - 1


def _encode_block(bw, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    n, mag = _magnitude(diff)
    code, length = dc_codes[n]
    bw.write(code, length)
    if n:
        bw.write(mag, n)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        n, mag = _magnitude(v)
        code, length = ac_codes[(run << 4) | n]
        bw.write(code, length)
        bw.write(mag, n)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _component_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h, w) float plane (level-shifted) -> (n_by, n_bx, 64) zigzagged
    quantized int coefficients; DCT vectorized over all blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw))
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ux,ijxy,vy->ijuv", _C, blocks, _C)
    flat = coefs.reshape(ph // 8, pw // 8, 64)
    qz = np.round(flat / q.reshape(8, 8).ravel()).astype(np.int64)
    # natural order -> zigzag order
    zz = np.empty_like(qz)
    zz[:, :, np.arange(64)] = qz[:, :, ZIGZAG]
    return zz


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w, 3) RGB (or (h, w) grayscale) -> baseline JPEG.

    4:4:4 by default; ``subsample=True`` emits 4:2:0 (2x2 box-averaged
    chroma); ``restart_interval=N`` emits DRI + RSTn markers every N
    MCUs (exercises the decoder's restart path). Annex K example
    Huffman tables, IJG quality scaling.
    """
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if gray:
        y = arr.astype(np.float64) - 128.0
        planes = [(y, ql, 1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even dims by edge-replication, then 2x2 box mean
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            def _down(p):
                pad = np.empty((ph, pw))
                pad[:h, :w] = p
                pad[h:, :w] = p[h - 1 : h, :]
                pad[:, w:] = pad[:, w - 1 : w]
                return pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [(y, ql, 2, 2), (_down(cb), qc, 1, 1), (_down(cr), qc, 1, 1)]
        else:
            planes = [(y, ql, 1, 1), (cb, qc, 1, 1), (cr, qc, 1, 1)]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (luma table 0; chroma table 1 when color)
    tables = [(0, ql)] + ([(1, qc)] if not gray else [])
    for tid, tbl in tables:
        zz_tbl = tbl.reshape(8, 8).ravel()[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in zz_tbl
        )
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (_, _, sh, sv) in enumerate(planes):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        hts += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    comp_zz = [
        _component_blocks(p, q) for (p, q, _, _) in planes
    ]
    # MCU walk: each MCU is [(component_index, zz_block), ...]
    mcus = []
    if gray or not subsample:
        n_by, n_bx = comp_zz[0].shape[:2]
        for by in range(n_by):
            for bx in range(n_bx):
                mcus.append([(ci, comp_zz[ci][by, bx]) for ci in range(len(planes))])
    else:
        # 4:2:0 MCU: 4 luma blocks (2x2) then one of each chroma
        n_by, n_bx = comp_zz[1].shape[:2]  # chroma block grid == MCU grid
        ly, lx = comp_zz[0].shape[:2]
        for by in range(n_by):
            for bx in range(n_bx):
                mcu = []
                for sy in range(2):
                    for sx in range(2):
                        yy, xx = min(2 * by + sy, ly - 1), min(2 * bx + sx, lx - 1)
                        mcu.append((0, comp_zz[0][yy, xx]))
                mcu += [(1, comp_zz[1][by, bx]), (2, comp_zz[2][by, bx])]
                mcus.append(mcu)

    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for i, mcu in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(planes)
        for ci, zz in mcu:
            codes = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            preds[ci] = _encode_block(bw, zz, preds[ci], *codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
