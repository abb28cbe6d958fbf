"""Minimal MJPEG-in-AVI container codec (pure struct/numpy, public spec).

AVI is a RIFF container (Microsoft "AVI RIFF File Reference", public);
Motion-JPEG stores one baseline JPEG per frame in ``00dc`` chunks
inside the ``movi`` LIST. With the pure-numpy JPEG codec in
functions.jpeg this gives a REAL video path with no codec library:
parse the container, pull frame payloads, decode frames on demand —
so the video modality graduates from the ``fake=`` stub to actual
decode (multimodal.sample_frames).

Writer emits the minimal standard layout (avih + one video strl +
movi); parser is lenient: it walks RIFF chunks and collects
``00dc``/``00db`` entries, reading the frame period from ``avih``.

Like every codec here this runs inside Arrow-batched mapInPandas
bodies, per payload, per executor — never on the driver. Reference
parity: the reference repo has no multimodal layer; this backs the
training-data extension surface (SURVEY.md §2.11).
"""

from __future__ import annotations

import struct

AVI_MIME = "video/x-msvideo"


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG payloads (one per frame) -> minimal MJPEG AVI."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    n = len(frames)
    usec_per_frame = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)

    avih = struct.pack(
        "<14I",
        usec_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags (no index chunk is written)
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    # AVISTREAMHEADER: fccType, fccHandler, dwFlags, wPriority,
    # wLanguage, dwInitialFrames, dwScale, dwRate (rate/scale = fps),
    # dwStart, dwLength, dwSuggestedBufferSize, dwQuality,
    # dwSampleSize, rcFrame(l, t, r, b)
    strh = struct.pack(
        "<4s4sIHH8I4H",
        b"vids", b"MJPG",
        0, 0, 0,
        0, 1, fps,
        0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, width & 0xFFFF, height & 0xFFFF,
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_avi_mjpeg(data: bytes) -> tuple[list[bytes], int]:
    """MJPEG AVI -> (list of JPEG frame payloads, frame_period_ms).

    Lenient chunk walk: any ``00dc``/``00db`` chunk anywhere inside the
    RIFF body counts as a frame (in file order — MJPEG has no
    inter-frame dependencies); the frame period comes from
    avih.dwMicroSecPerFrame (0 if absent).
    """
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []
    period_us = 0

    def walk(pos: int, end: int) -> None:
        nonlocal period_us
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid == b"avih":
                period_us = struct.unpack_from("<I", data, body)[0]
            elif cid in (b"00dc", b"00db") and size:
                frames.append(data[body : body + size])
            pos = body + size + (size & 1)

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    return frames, period_us // 1000
