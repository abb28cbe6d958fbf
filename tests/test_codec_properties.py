"""Property-based codec invariants (hypothesis).

The lossless codecs (PNG, PPM, BMP, WAV, AVI container) must
round-trip ARBITRARY content bit-exactly; JPEG must round-trip any
FLAT gray image bit-exactly at quality 100 (the media_features oracle
invariant) and must never error or change shape on arbitrary content.
Sizes are kept small — the point is adversarial shapes/values, not
volume.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from flink_essentials_spark.functions import avi, codecs, jpeg, png

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _rgb(shape):
    return arrays(np.uint8, (*shape, 3), elements=st.integers(0, 255))


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_rgb))
def test_png_lossless_any_rgb(arr):
    assert np.array_equal(png.decode_png(png.encode_png(arr)), arr)


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_rgb))
def test_ppm_bmp_lossless_any_rgb(arr):
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(arr)), arr)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(arr)), arr)


@settings(max_examples=25, deadline=None)
@given(
    arrays(np.int16, st.integers(1, 500), elements=st.integers(-32768, 32767)),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_lossless_any_pcm(samples, rate):
    out, r = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert r == rate and np.array_equal(out, samples)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 255), _dims)
def test_jpeg_flat_gray_exact_any_value_and_shape(v, shape):
    arr = np.full(shape, v, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=100))
    assert out.shape == (*shape, 3)
    assert np.all(out == v)


@settings(max_examples=10, deadline=None)
@given(_dims.flatmap(_rgb), st.integers(1, 100), st.booleans())
def test_jpeg_any_content_decodes_to_same_shape(arr, quality, subsample):
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=quality, subsample=subsample))
    assert out.shape == arr.shape and out.dtype == np.uint8


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=64), min_size=1, max_size=6),
    st.integers(1, 60),
)
def test_avi_container_lossless_any_payloads(frames, fps):
    out, period_ms = avi.parse_avi_mjpeg(avi.encode_avi_mjpeg(frames, 8, 8, fps=fps))
    assert out == frames
    assert period_ms == (1_000_000 // fps) // 1000


@settings(max_examples=25, deadline=None)
@given(
    _dims.flatmap(
        lambda s: arrays(np.uint8, s, elements=st.integers(0, 255))
    )
)
def test_gif_lossless_any_gray(arr):
    from flink_essentials_spark.functions import gif

    got = gif.decode_gif(gif.encode_gif(arr))
    assert np.array_equal(got, np.repeat(arr[:, :, None], 3, axis=2))


@settings(max_examples=25, deadline=None)
@given(
    st.tuples(st.integers(1, 16), st.integers(1, 16)).flatmap(
        lambda s: st.tuples(
            arrays(
                np.uint8, (*s, 3), elements=st.integers(0, 255)
            ),
            st.integers(1, 8),
        )
    )
)
def test_gif_rgb_lossless_within_palette(arr_and_k):
    """Any image whose colors come from a small palette must round-trip
    bit-exactly through the exact-palette RGB encoder."""
    from flink_essentials_spark.functions import gif

    arr, k = arr_and_k
    h, w = arr.shape[:2]
    palette = arr.reshape(-1, 3)[:k]
    idx = (arr[:, :, 0].astype(np.int64) + arr[:, :, 1]) % len(palette)
    img = palette[idx]
    assert np.array_equal(gif.decode_gif(gif.encode_gif_rgb(img)), img)


# --- BPE greedy-fold equivalence (the invariant the oracle's
# list_reduce fold relies on) -----------------------------------------


def _greedy_scan(syms, a, b):
    """Reference greedy left-to-right non-overlapping merge: scan with
    explicit skip — the textbook definition."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _engine_fold(syms, a, b):
    """The engine's fold (text.bpe_train/bpe_encode inner loop)."""
    acc = []
    for x in syms:
        if acc and acc[-1] == a and x == b:
            acc[-1] = a + b
        else:
            acc.append(x)
    return acc


def _string_fold(syms, a, b):
    """The DuckDB oracle's list_reduce fold on a space-joined
    accumulator, replicated literally."""
    acc = None
    for x in syms:
        if acc is None:
            acc = x
        elif x == b and (acc == a or acc.endswith(" " + a)):
            acc = acc + b
        else:
            acc = acc + " " + x
    return [] if acc is None else acc.split(" ")


@given(
    st.lists(st.sampled_from(["a", "b", "ab", "ba", "aa", "c"]), max_size=12),
    st.sampled_from(["a", "b", "ab", "aa", "c"]),
    st.sampled_from(["a", "b", "ab", "aa", "c"]),
)
@settings(max_examples=300, deadline=None)
def test_bpe_merge_folds_agree_with_greedy_scan(syms, a, b):
    """All three formulations of one BPE merge application must agree
    on adversarial symbol streams (overlapping runs, symbols that are
    substrings/concatenations of each other): the textbook greedy
    scan, the engine's list fold, and the oracle's space-joined string
    fold. The alphabet deliberately contains 'ab' == 'a'+'b' and 'aa'
    so a wrong suffix check or a cascading re-match would be caught."""
    want = _greedy_scan(syms, a, b)
    assert _engine_fold(syms, a, b) == want
    assert _string_fold(syms, a, b) == want
