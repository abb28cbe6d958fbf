"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are ``binary`` columns with a ``modality`` tag and a
metadata struct (schemas.MEDIA_SCHEMA). Images and audio decode for
REAL here — PPM/BMP via the header-arithmetic codecs in
functions.codecs, baseline JPEG via the pure-numpy T.81 codec in
functions.jpeg, PCM WAV audio — with real feature extraction and real
nearest-neighbor resize. Only video containers still genuinely require
a codec library and stay stubbed: for those ``decode_media`` raises
NotImplementedError unless ``fake=True``, which substitutes a
deterministic hash-derived feature vector so downstream pipeline
stages are exercisable end-to-end.

Scale notes: payloads ride in parquet binary columns; feature
extraction is ``mapInPandas`` (Arrow-batched, per-partition codec
init via the iterator form); never collect payloads to the driver.
Batch size is controlled by spark.sql.execution.arrow.maxRecordsPerBatch
— lower it for large payloads to bound executor memory.

Feature vector layout (array<double>, real decode path):
``[dim_a, dim_b, channels, mean, rms, min, max, n_vals]`` where
(dim_a, dim_b) = (width, height) for images, (n_samples, sample_rate)
for audio. Every element is derived from exact-in-float64 integer
arithmetic (integer sums / sums of squares, one division, sqrt), so an
independent SQL engine reproduces them bit-for-bit — that is what the
media_features DuckDB oracle checks.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_essentials_spark.functions import avi, codecs, gif, jpeg, png
from flink_essentials_spark.schemas import MEDIA_SCHEMA

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, modality string, n_bytes long, payload_md5 string, "
    f"features array<double>"
)


def synthetic_media(spark: SparkSession, source_df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text corpus: payload =
    utf-8 bytes of the text (a stand-in blob), metadata from lengths."""
    return source_df.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.struct(
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            (F.length(text_col).cast("long") * 100).alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def synthetic_real_media(spark: SparkSession, source_df: DataFrame) -> DataFrame:
    """Media table with REAL encoded payloads, derived deterministically
    from doc_id alone (so an independent engine can predict the decoded
    content — the media_features oracle recomputes it in SQL):

    - doc_id % 3 == 0 → image over w = ((doc_id%8)+1)*4,
      h = ((doc_id%4)+1)*2. The lossless containers carry pixels
      v_i = (doc_id + i) % 256: PPM for doc_id % 24 == 0, PNG
      (stdlib-zlib codec, functions.png) for doc_id % 24 == 12, BMP
      for doc_id % 12 == 6 — identical decoded features, so the oracle
      formula is container-independent. doc_id % 12 in (3, 9) →
      baseline JPEG (pure-numpy codec) of a FLAT gray image
      v = doc_id % 256 at quality 100 — flat blocks quantize losslessly (only the DC
      coefficient survives, quant table all ones), so even the lossy
      format decodes bit-exactly and stays oracle-predictable; the
      doc_id % 12 == 9 variant adds restart markers (DRI/RSTn) so the
      decoder's restart path runs under the oracle too. Non-flat JPEG
      content is covered by round-trip tolerance tests (lossy by
      design — no SQL engine can re-derive it).
    - doc_id % 3 == 1 → audio, int16 samples
      s_i = ((doc_id*31 + i*7) % 65536) − 32768 over
      n = ((doc_id%50)+10)*50 samples at 16 kHz, encoded as PCM WAV.
    - doc_id % 3 == 2 → video. doc_id % 6 == 2: REAL MJPEG-in-AVI
      (functions.avi + functions.jpeg): n = (doc_id%5)+2 flat-gray
      frames, frame i value (doc_id*7 + i*13) % 256, image dims from
      the same doc_id formulas, 10 fps — flat frames decode bit-exactly
      (see the JPEG note above), so per-frame features stay
      oracle-predictable. doc_id % 6 == 5: opaque utf-8 text payload —
      keeps the no-library stub path exercised for container formats
      that genuinely need codec libs.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # flat columns only — the meta struct is assembled JVM-side
        # below (pandas→Arrow struct-from-dict conversion is the slow
        # path), and text rides in only for the video rows that use it
        for pdf in batches:
            ids, mods, payloads, mimes = [], [], [], []
            widths, heights, durs, rates = [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                if did % 3 == 0:
                    w = ((did % 8) + 1) * 4
                    h = ((did % 4) + 1) * 2
                    if did % 6 == 3:  # doc_id % 12 in (3, 9): flat-gray JPEG
                        g = np.full((h, w), did % 256, dtype=np.uint8)
                        payload = jpeg.encode_jpeg(
                            g,
                            quality=100,
                            restart_interval=2 if did % 12 == 9 else 0,
                        )
                        mime = jpeg.JPEG_MIME
                    else:  # doc_id % 12 in (0, 6): formula pixels, lossless
                        px = ((did + np.arange(w * h * 3)) % 256).astype(np.uint8)
                        arr = px.reshape(h, w, 3)
                        if did % 24 == 0:
                            payload, mime = codecs.encode_ppm(arr), codecs.PPM_MIME
                        elif did % 24 == 12:
                            payload, mime = png.encode_png(arr), png.PNG_MIME
                        else:
                            payload, mime = codecs.encode_bmp(arr), codecs.BMP_MIME
                    meta, modality = (w, h, 0, 0), "image"
                elif did % 3 == 1:
                    n = ((did % 50) + 10) * 50
                    s = (((did * 31 + 7 * np.arange(n)) % 65536) - 32768).astype(
                        np.int16
                    )
                    payload, mime = codecs.encode_wav(s, 16000), codecs.WAV_MIME
                    meta, modality = (0, 0, n * 1000 // 16000, 16000), "audio"
                elif did % 6 == 2:  # real MJPEG-in-AVI video
                    w = ((did % 8) + 1) * 4
                    h = ((did % 4) + 1) * 2
                    n_frames = (did % 5) + 2
                    frames = [
                        jpeg.encode_jpeg(
                            np.full((h, w), (did * 7 + i * 13) % 256, np.uint8),
                            quality=100,
                        )
                        for i in range(n_frames)
                    ]
                    payload = avi.encode_avi_mjpeg(frames, w, h, fps=10)
                    mime = avi.AVI_MIME
                    meta, modality = (w, h, n_frames * 100, 0), "video"
                else:
                    payload = str(txt).encode("utf-8")
                    mime = "application/octet-stream"
                    meta, modality = (0, 0, len(payload) * 100, 0), "video"
                ids.append(did)
                mods.append(modality)
                payloads.append(payload)
                mimes.append(mime)
                widths.append(meta[0])
                heights.append(meta[1])
                durs.append(meta[2])
                rates.append(meta[3])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": mods,
                    "payload": payloads,
                    "mime_type": mimes,
                    "width": widths,
                    "height": heights,
                    "duration_ms": durs,
                    "sample_rate": rates,
                }
            )

    flat = source_df.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 2, F.col("text")).alias("text"),
    ).mapInPandas(
        gen,
        "media_id long, modality string, payload binary, mime_type string, "
        "width int, height int, duration_ms bigint, sample_rate int",
    )
    return flat.select(
        "media_id",
        "modality",
        "payload",
        "mime_type",
        F.struct("width", "height", "duration_ms", "sample_rate").alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-feature vector."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def _summarize(vals: np.ndarray, dim_a: float, dim_b: float, channels: float) -> list[float]:
    """[dim_a, dim_b, channels, mean, rms, min, max, n] from integer
    samples — exact int64 sums, one division, sqrt: bit-reproducible
    in any IEEE-754 engine (the oracle recomputes these in DuckDB)."""
    v = vals.astype(np.int64)
    n = v.size
    return [
        dim_a,
        dim_b,
        channels,
        int(v.sum()) / n,
        math.sqrt(int((v * v).sum()) / n),
        float(v.min()),
        float(v.max()),
        float(n),
    ]


def _decode_features(payload: bytes, mime: str) -> list[float] | None:
    if mime == codecs.PPM_MIME:
        arr = codecs.decode_ppm(payload)
        h, w = arr.shape[:2]
        return _summarize(arr.ravel(), float(w), float(h), 3.0)
    if mime == codecs.BMP_MIME:
        arr = codecs.decode_bmp(payload)
        h, w = arr.shape[:2]
        return _summarize(arr.ravel(), float(w), float(h), 3.0)
    if mime == jpeg.JPEG_MIME:
        arr = jpeg.decode_jpeg(payload)
        h, w = arr.shape[:2]
        return _summarize(arr.ravel(), float(w), float(h), 3.0)
    if mime == png.PNG_MIME:
        arr = png.decode_png(payload)
        h, w = arr.shape[:2]
        return _summarize(arr.ravel(), float(w), float(h), 3.0)
    if mime == codecs.WAV_MIME:
        samples, rate = codecs.decode_wav(payload)
        return _summarize(samples, float(samples.size), float(rate), 1.0)
    return None


def decode_media(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode payloads → feature vectors via Arrow-batched mapInPandas.

    PPM/BMP/JPEG/WAV payloads decode for REAL (functions.codecs,
    functions.jpeg) into the
    ``[dim_a, dim_b, channels, mean, rms, min, max, n_vals]`` layout.
    Other mime types (video containers) need codec libraries this
    image lacks: ``fake=True`` runs the deterministic md5 stand-in for
    them (same schema, same batch shape); ``fake=False`` raises. A
    real video implementation plugs its codec call into
    ``_decode_features``.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init hook (codec contexts would be opened here)
        for pdf in batches:
            feats = []
            for payload, mime in zip(pdf["payload"], pdf["mime_type"]):
                f = _decode_features(bytes(payload), mime)
                if f is None:
                    if not fake:
                        hint = (
                            "MJPEG-AVI video decodes through sample_frames / "
                            "video_frame_features (per-frame), not per-payload "
                            "features; "
                            if mime == avi.AVI_MIME
                            else ""
                        )
                        raise NotImplementedError(
                            f"no per-payload decoder for {mime}; {hint}"
                            "pass fake=True for the deterministic stub"
                        )
                    f = _fake_features(bytes(payload))
                feats.append(f)
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "features": feats,
                }
            )

    # mapInPandas defeats automatic column pruning — ship only what the
    # UDF reads (the meta struct in particular stays JVM-side)
    return df.select("media_id", "modality", "payload", "mime_type").mapInPandas(
        op, schema=FEATURES_SCHEMA
    )


AHASH_SCHEMA = "media_id long, width int, height int, hash_hi long, hash_lo long"


def image_ahash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash per image — the multimodal near-dup
    fingerprint: decode (PPM/BMP/PNG/JPEG via the pure-numpy codecs),
    integer BT.601 luma (299R+587G+114B; 1000·v for grayscale — the
    same scale, so gray and RGB encodings of identical content hash
    identically), area-average to a ``grid×grid`` raster, bit b set
    iff block-mean > global mean. INTEGER-EXACT end to end: the mean
    comparison is cross-multiplied (``s_b·N > S·n_b``, all int64), and
    blocks left empty by tiny images (w or h < grid) threshold false
    on 0>0 — so an independent engine recomputing the pixel formulas
    reproduces every bit (oracle ``image_dedup``). Emitted as two
    32-bit halves (hash_hi = bits 32..63) to keep the value unsigned-
    exact in any engine. Equal-hash grouping is the scale-safe
    near-dup step: groupBy(hash), never pairwise; robust to container
    and colorspace differences by construction (tested: the same
    pixels through PPM, BMP and PNG share one hash).

    Scale: one Arrow-batched decode pass, output 5 ints per image —
    the groupBy shuffles fingerprints, not payloads."""
    from flink_essentials_spark.functions import png as _png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, his, los = [], [], [], [], []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime_type"]
            ):
                payload = bytes(payload)
                if mime == codecs.PPM_MIME:
                    arr = codecs.decode_ppm(payload)
                elif mime == codecs.BMP_MIME:
                    arr = codecs.decode_bmp(payload)
                elif mime == _png.PNG_MIME:
                    arr = _png.decode_png(payload)
                elif mime == jpeg.JPEG_MIME:
                    arr = jpeg.decode_jpeg(payload)
                else:
                    continue
                a = arr.astype(np.int64)
                if a.ndim == 3:
                    luma = 299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]
                else:
                    luma = 1000 * a
                h, w = luma.shape
                bx = (np.arange(w) * grid) // w
                by = (np.arange(h) * grid) // h
                idx = (by[:, None] * grid + bx[None, :]).ravel()
                # float64 bincount sums stay exact: block sums are
                # bounded by 255000·w·h ≪ 2^53
                sums = np.bincount(
                    idx, weights=luma.ravel(), minlength=grid * grid
                ).astype(np.int64)
                n = np.bincount(idx, minlength=grid * grid).astype(np.int64)
                bits = (sums * int(n.sum())) > (int(sums.sum()) * n)
                hi = lo = 0
                for b in np.nonzero(bits)[0]:
                    if b >= 32:
                        hi |= 1 << (int(b) - 32)
                    else:
                        lo |= 1 << int(b)
                ids.append(int(mid))
                ws.append(w)
                hs.append(h)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "hash_hi": pd.Series(his, dtype="int64"),
                    "hash_lo": pd.Series(los, dtype="int64"),
                }
            )

    return df.select("media_id", "payload", "mime_type").mapInPandas(
        op, schema=AHASH_SCHEMA
    )


ENVELOPE_SCHEMA = "media_id long, n_samples long, hash_hi long, hash_lo long"


def audio_envelope_hash(df: DataFrame, windows: int = 64) -> DataFrame:
    """Perceptual audio fingerprint — the 1-D sibling of
    :func:`image_ahash`: decode WAV (pure-stdlib codec), square the
    int16 samples (energy), area-average into ``windows`` buckets,
    bit w set iff window energy-mean > global energy-mean. The same
    cross-multiplied integer comparison (``e_w·N > E·n_w``, exact
    int64: per-window sums ≤ 2^30·n ≪ 2^63) makes the hash
    loudness-shape-derived yet ENGINE-EXACT, so an independent engine
    can recompute every bit from a sample formula (oracle
    ``audio_fingerprints``). Amplitude scaling leaves the bits
    unchanged (mean-relative); silence hashes to 0. Emitted as two
    32-bit halves like image_ahash; equal-hash grouping is the same
    scale-safe near-dup step."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, his, los = [], [], [], []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime_type"]
            ):
                if mime != codecs.WAV_MIME:
                    continue
                samples, _rate = codecs.decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                energy = s * s
                n = s.size
                idx = (np.arange(n) * windows) // n
                # float64 bincount stays exact: window sums are
                # < 2^30·n ≪ 2^53 for any realistic clip length
                sums = np.bincount(
                    idx, weights=energy, minlength=windows
                ).astype(np.int64)
                cnt = np.bincount(idx, minlength=windows).astype(np.int64)
                bits = (sums * n) > (int(energy.sum()) * cnt)
                hi = lo = 0
                for b in np.nonzero(bits)[0]:
                    if b >= 32:
                        hi |= 1 << (int(b) - 32)
                    else:
                        lo |= 1 << int(b)
                ids.append(int(mid))
                ns.append(n)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "hash_hi": pd.Series(his, dtype="int64"),
                    "hash_lo": pd.Series(los, dtype="int64"),
                }
            )

    return df.select("media_id", "payload", "mime_type").mapInPandas(
        op, schema=ENVELOPE_SCHEMA
    )


THASH_SCHEMA = "media_id long, n_frames int, hash_hi long, hash_lo long"


def video_temporal_hash(df: DataFrame, windows: int = 64) -> DataFrame:
    """Temporal brightness fingerprint over REAL MJPEG-AVI decode —
    the video member of the perceptual-hash family (image_ahash /
    audio_envelope_hash): per frame, the integer luma sum (1000·gray,
    the shared scale); frames area-mapped into ``windows`` buckets;
    bit w set iff the window's mean frame brightness exceeds the
    clip's mean — the same cross-multiplied integer compare, so the
    bits are scene-brightness-shape, engine-exact, and recomputable
    from a frame formula (oracle ``video_fingerprints``). Frames in
    one clip share dimensions, so per-frame sums compare directly."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfs, his, los = [], [], [], []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime_type"]
            ):
                if mime != avi.AVI_MIME:
                    continue
                frames, _fps = avi.parse_avi_mjpeg(bytes(payload))
                fsums = []
                for fr in frames:
                    a = jpeg.decode_jpeg(fr).astype(np.int64)
                    luma = (
                        299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]
                        if a.ndim == 3
                        else 1000 * a
                    )
                    fsums.append(int(luma.sum()))
                n = len(fsums)
                if n == 0:
                    continue
                fsums_a = np.array(fsums, dtype=np.int64)
                idx = (np.arange(n) * windows) // n
                s = np.bincount(idx, weights=fsums_a, minlength=windows).astype(
                    np.int64
                )
                cnt = np.bincount(idx, minlength=windows).astype(np.int64)
                bits = (s * n) > (int(fsums_a.sum()) * cnt)
                hi = lo = 0
                for b in np.nonzero(bits)[0]:
                    if b >= 32:
                        hi |= 1 << (int(b) - 32)
                    else:
                        lo |= 1 << int(b)
                ids.append(int(mid))
                nfs.append(n)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "hash_hi": pd.Series(his, dtype="int64"),
                    "hash_lo": pd.Series(los, dtype="int64"),
                }
            )

    return df.select("media_id", "payload", "mime_type").mapInPandas(
        op, schema=THASH_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, modality string, mime_type string, "
    "width int, height int, payload binary"
)

FRAMES_SCHEMA = "media_id long, frame_idx int, frame_md5 string"


def resize_images(
    df: DataFrame, width: int, height: int, *, fake: bool = False
) -> DataFrame:
    """Image resize over Arrow batches. PPM/BMP payloads go through the
    REAL path: decode → nearest-neighbor resize (floor mapping, integer
    arithmetic) → re-encode in the same container. Mime types needing a
    codec library (JPEG, …) use the ``fake=True`` deterministic
    payload stand-in (correct metadata, batch shape and schema) or
    raise; a real implementation adds its codec to the dispatch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload, mime in zip(pdf["payload"], pdf["mime_type"]):
                b = bytes(payload)
                if mime == codecs.PPM_MIME:
                    payloads.append(
                        codecs.encode_ppm(
                            codecs.resize_nearest(codecs.decode_ppm(b), width, height)
                        )
                    )
                elif mime == codecs.BMP_MIME:
                    payloads.append(
                        codecs.encode_bmp(
                            codecs.resize_nearest(codecs.decode_bmp(b), width, height)
                        )
                    )
                elif mime == jpeg.JPEG_MIME:
                    # decode → nearest resize → re-encode (lossy, like
                    # any real JPEG pipeline); fixed quality keeps the
                    # output deterministic
                    payloads.append(
                        jpeg.encode_jpeg(
                            codecs.resize_nearest(jpeg.decode_jpeg(b), width, height),
                            quality=90,
                        )
                    )
                elif mime == png.PNG_MIME:
                    payloads.append(
                        png.encode_png(
                            codecs.resize_nearest(png.decode_png(b), width, height)
                        )
                    )
                elif mime == gif.GIF_MIME:
                    # nearest resize keeps colors inside the source
                    # palette, so the exact-palette re-encode is lossless
                    payloads.append(
                        gif.encode_gif_rgb(
                            codecs.resize_nearest(gif.decode_gif(b), width, height)
                        )
                    )
                elif fake:
                    # stand-in: content-addressed payload, real metadata
                    payloads.append(
                        hashlib.md5(b + f"{width}x{height}".encode()).digest()
                    )
                else:
                    raise NotImplementedError(
                        f"no library-free codec for {mime}; pass fake=True"
                    )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "mime_type": pdf["mime_type"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )
            yield out

    return (
        df.filter(F.col("modality") == "image")
        .select("media_id", "modality", "payload", "mime_type")
        .mapInPandas(op, schema=RESIZED_SCHEMA)
    )


def _sampled_indices(n_frames: int, period_ms: int, every_ms: int) -> list[int]:
    """Frame indices at an every_ms cadence given the stream's frame
    period; degenerates to every frame when the cadence is finer than
    the period. Capped at 100 samples per payload (bounds the 1→N
    expansion inside one Arrow batch)."""
    step = max(1, every_ms // period_ms) if period_ms > 0 else 1
    return list(range(0, n_frames, step))[:100]


def sample_frames(
    df: DataFrame, every_ms: int = 1000, *, fake: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame — the
    1→N expansion inside the Arrow batch that a real ffmpeg call
    produces.

    MJPEG-in-AVI payloads are REAL: the RIFF container is parsed
    (functions.avi), the frame cadence comes from the stream header,
    and frame_md5 hashes the actual extracted JPEG frame payload.
    Container formats that genuinely need a codec library fall back to
    the deterministic ``fake=True`` stub (frame count from metadata
    duration) or raise."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                payload = bytes(r.payload)
                if r.mime_type == avi.AVI_MIME:
                    frames, period_ms = avi.parse_avi_mjpeg(payload)
                    for i in _sampled_indices(len(frames), period_ms, every_ms):
                        rows.append(
                            {
                                "media_id": r.media_id,
                                "frame_idx": i,
                                "frame_md5": hashlib.md5(frames[i]).hexdigest(),
                            }
                        )
                    continue
                if not fake:
                    raise NotImplementedError(
                        f"no library-free video codec for {r.mime_type}; "
                        "pass fake=True for the stub"
                    )
                n = max(1, int(r.meta["duration_ms"] // every_ms))
                for i in range(min(n, 100)):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            # real impl decodes frame i*every_ms here
                            "frame_md5": hashlib.md5(
                                payload + i.to_bytes(4, "big")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    return df.filter(F.col("modality") == "video").mapInPandas(
        op, schema=FRAMES_SCHEMA
    )


VIDEO_FRAME_FEATURES_SCHEMA = (
    "media_id long, frame_idx int, f_w int, f_h int, "
    "mean_val double, min_val double, max_val double"
)


def video_frame_features(df: DataFrame, every_ms: int = 100) -> DataFrame:
    """REAL video decode: sample frames from MJPEG-AVI payloads at an
    every_ms cadence and DECODE each sampled frame (functions.jpeg),
    emitting per-frame dimensions and pixel stats. Integer-exact
    arithmetic (int64 sum, one division) so flat-frame fixtures are
    reproducible by an independent SQL engine — the video_frames
    oracle. Non-AVI video payloads raise (no library-free codec)."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.mime_type != avi.AVI_MIME:
                    raise NotImplementedError(
                        f"no library-free video codec for {r.mime_type}"
                    )
                frames, period_ms = avi.parse_avi_mjpeg(bytes(r.payload))
                for i in _sampled_indices(len(frames), period_ms, every_ms):
                    arr = jpeg.decode_jpeg(frames[i])
                    h, w = arr.shape[:2]
                    v = arr.astype(np.int64)
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "f_w": w,
                            "f_h": h,
                            "mean_val": int(v.sum()) / v.size,
                            "min_val": float(v.min()),
                            "max_val": float(v.max()),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "f_w", "f_h",
                    "mean_val", "min_val", "max_val",
                ],
            )

    return (
        df.filter(F.col("modality") == "video")
        .select("media_id", "payload", "mime_type")
        .mapInPandas(op, schema=VIDEO_FRAME_FEATURES_SCHEMA)
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Payload stats with pure Column expressions (no Python): size and
    content hash per item — the JVM-side fast path for audits."""
    return df.select(
        "media_id",
        "modality",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
