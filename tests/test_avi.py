"""MJPEG-in-AVI container (functions/avi.py) + real video frame path.

The video modality's graduation from stub to real decode: container
round trips, header-derived frame cadence, and the Spark-side
sample_frames / video_frame_features operators over real payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_essentials_spark.functions import avi, jpeg, multimodal
from flink_essentials_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _mjpeg(values, w=12, h=8, fps=10):
    frames = [
        jpeg.encode_jpeg(np.full((h, w), v, np.uint8), quality=100) for v in values
    ]
    return frames, avi.encode_avi_mjpeg(frames, w, h, fps=fps)


def test_container_round_trip():
    frames, data = _mjpeg([3, 99, 200])
    out, period_ms = avi.parse_avi_mjpeg(data)
    assert period_ms == 100
    assert out == frames
    for f, v in zip(out, (3, 99, 200)):
        assert np.all(jpeg.decode_jpeg(f) == v)


def test_container_word_alignment():
    # odd-length frame payloads must still parse (RIFF pads to 16-bit)
    frames = [b"\xff\xd8" + b"x" * 7 + b"\xff\xd9"]
    out, period_ms = avi.parse_avi_mjpeg(avi.encode_avi_mjpeg(frames, 4, 4, fps=5))
    assert out == frames and period_ms == 200


def test_rejects_non_avi():
    with pytest.raises(ValueError, match="RIFF"):
        avi.parse_avi_mjpeg(b"\xff\xd8 not a riff")


def test_sampled_indices_cadence():
    # 100 ms period: every_ms 100 -> all, 250 -> every 2nd, 1000 -> every 10th
    assert multimodal._sampled_indices(6, 100, 100) == [0, 1, 2, 3, 4, 5]
    assert multimodal._sampled_indices(6, 100, 250) == [0, 2, 4]
    assert multimodal._sampled_indices(25, 100, 1000) == [0, 10, 20]
    assert multimodal._sampled_indices(5, 0, 1000) == [0, 1, 2, 3, 4]  # no header period
    assert len(multimodal._sampled_indices(1000, 100, 100)) == 100  # cap


def test_sample_frames_real_avi(spark):
    docs = load_tables(spark, SF_DIR)["documents"].filter(F.col("doc_id") < 40)
    media = multimodal.synthetic_real_media(spark, docs)
    avi_rows = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter(F.col("mime_type") == avi.AVI_MIME).collect()
    }
    assert avi_rows, "no AVI rows under doc_id < 40 (doc_id % 6 == 2)"
    out = multimodal.sample_frames(
        media.filter(F.col("mime_type") == avi.AVI_MIME), every_ms=100
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_md5"]))
    for did, payload in avi_rows.items():
        frames, _ = avi.parse_avi_mjpeg(payload)
        expected = [
            (i, hashlib.md5(f).hexdigest()) for i, f in enumerate(frames)
        ]
        assert sorted(got[did]) == expected, did
        assert len(frames) == (did % 5) + 2


def test_sample_frames_stub_still_raises_without_fake(spark):
    docs = load_tables(spark, SF_DIR)["documents"].filter(F.col("doc_id") < 40)
    media = multimodal.synthetic_real_media(spark, docs).filter(
        F.col("mime_type") == "application/octet-stream"
    )
    with pytest.raises(Exception, match="library-free"):
        multimodal.sample_frames(media, every_ms=100).collect()


def test_video_frame_features_match_formula(spark):
    docs = load_tables(spark, SF_DIR)["documents"].filter(F.col("doc_id") < 60)
    media = multimodal.synthetic_real_media(spark, docs)
    out = multimodal.video_frame_features(
        media.filter(F.col("mime_type") == avi.AVI_MIME), every_ms=100
    ).collect()
    assert out
    for r in out:
        did, i = r["media_id"], r["frame_idx"]
        v = float((did * 7 + i * 13) % 256)
        assert (r["f_w"], r["f_h"]) == (((did % 8) + 1) * 4, ((did % 4) + 1) * 2)
        assert r["mean_val"] == v and r["min_val"] == v and r["max_val"] == v


def test_video_frame_features_sampling_cadence(spark):
    docs = load_tables(spark, SF_DIR)["documents"].filter(F.col("doc_id") < 60)
    media = multimodal.synthetic_real_media(spark, docs).filter(
        F.col("mime_type") == avi.AVI_MIME
    )
    dense = multimodal.video_frame_features(media, every_ms=100).collect()
    sparse = multimodal.video_frame_features(media, every_ms=200).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in sparse} == {
        (r["media_id"], r["frame_idx"]) for r in dense if r["frame_idx"] % 2 == 0
    }
