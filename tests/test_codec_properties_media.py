"""Property-based roundtrip invariants for the round-5 media codecs
(GIF LZW, FLAC) — the same hypothesis treatment the posting-list codec
gets in test_codec.py: lossless means EXACT for every input in the
domain, not just the fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from polaris_spark.ops.flac import decode_flac, encode_flac
from polaris_spark.ops.multimodal import decode_gif, encode_gif


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 30), st.integers(1, 30), st.integers(1, 17),
       st.integers(0, 2**31 - 1))
def test_gif_roundtrip_any_palette_image(h, w, colors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, colors, (h, w))]
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 6000),
       st.sampled_from([256, 1024, 4096]))
def test_flac_roundtrip_any_mono_int16(seed, n, block):
    rng = np.random.default_rng(seed)
    # mix of tonal and impulsive content, full int16 range incl. edges
    s = (rng.integers(-32768, 32768, n)
         * rng.integers(0, 2, n)).astype(np.int16)
    s[:: max(1, n // 7)] = rng.choice(
        np.array([-32768, 32767, 0, 1, -1], np.int16), 1 + (n - 1)
        // max(1, n // 7))
    out, rate = decode_flac(encode_flac(s, 8000, block_size=block))
    assert rate == 8000
    np.testing.assert_array_equal(out, s)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 3000),
       st.sampled_from(["independent", "left_side", "right_side",
                        "mid_side"]))
def test_flac_roundtrip_any_stereo_mode(seed, n, mode):
    rng = np.random.default_rng(seed)
    st2 = rng.integers(-32768, 32768, (n, 2)).astype(np.int16)
    out, _ = decode_flac(encode_flac(st2, 44100, stereo_mode=mode))
    np.testing.assert_array_equal(out, st2)
