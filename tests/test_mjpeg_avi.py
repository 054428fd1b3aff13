"""MJPEG/AVI container codec: the video modality made real by reusing
the in-container JPEG codec — a container-walk problem (RIFF chunks,
like WAV), not a new compression problem.

Decode correctness is checked against a HAND-BUILT AVI assembled by an
independent writer in this file (spec chunk layout, including the
``rec `` grouping and odd-size padding the encoder never emits), so
the parser does not merely share the encoder's bugs.
"""

import struct

import numpy as np
import pytest

from polaris_spark.ops.jpeg import decode_jpeg, encode_jpeg
from polaris_spark.ops.multimodal import (decode_mjpeg_avi,
                                          encode_mjpeg_avi,
                                          image_featurizer,
                                          media_featurizer,
                                          media_frame_extractor,
                                          sample_frames)


def _frames(n, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_roundtrip_container_faithful():
    """JPEG is lossy; the CONTAINER must be byte-faithful — decoding
    the AVI equals decoding each frame's own JPEG independently."""
    fs = _frames(6, seed=1)
    out = decode_mjpeg_avi(encode_mjpeg_avi(fs, fps=5, quality=85))
    exp = np.stack([decode_jpeg(encode_jpeg(f, quality=85)) for f in fs])
    assert out.shape == (6, 24, 32, 3)
    np.testing.assert_array_equal(out, exp)


def test_grayscale_frames_promote_to_rgb():
    g = [np.arange(0, 256, 2, dtype=np.uint8).reshape(8, 16)] * 3
    assert decode_mjpeg_avi(encode_mjpeg_avi(g)).shape == (3, 8, 16, 3)


def test_hand_built_avi_with_rec_grouping_and_padding():
    """Independent writer: frames split between a bare 00dc chunk (odd
    size → pad byte) and a 'rec ' grouped LIST, plus a junk chunk the
    parser must skip — layouts the encoder never produces."""
    f0 = encode_jpeg(np.full((8, 8, 3), 200, np.uint8), quality=95)
    f1 = encode_jpeg(np.zeros((8, 8, 3), np.uint8), quality=95)
    if len(f0) % 2 == 0:
        f0 += b"\xff\xd9"[:0]  # keep as-is; pad handled below either way

    def ck(cid, body):
        return (cid + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    movi = (b"movi" + ck(b"JUNK", b"x" * 7)          # skipped, odd size
            + ck(b"00dc", f0)
            + ck(b"LIST", b"rec " + ck(b"00db", f1)))  # grouped frame
    riff = (b"AVI " + ck(b"LIST", b"hdrl" + ck(b"avih", b"\x00" * 56))
            + ck(b"LIST", movi))
    avi = b"RIFF" + struct.pack("<I", len(riff)) + riff

    out = decode_mjpeg_avi(avi)
    exp = np.stack([decode_jpeg(f0), decode_jpeg(f1)])
    np.testing.assert_array_equal(out, exp)


def test_extractor_real_frames_and_stub_fallback():
    fs = _frames(8, seed=2)
    avi = encode_mjpeg_avi(fs, quality=80)
    got = media_frame_extractor(avi, 4)
    assert all(p[:3] == b"\xff\xd8\xff" for p in got)
    # equal-spaced: frames 0, 2, 4, 6 of 8
    exp = [encode_jpeg(fs[i], quality=80) for i in (0, 2, 4, 6)]
    assert [bytes(p) for p in got] == exp
    blob = bytes(np.random.default_rng(3).integers(0, 256, 100,
                                                   dtype=np.uint8))
    assert [len(s) for s in media_frame_extractor(blob, 4)] == [25] * 4


def test_featurizer_routes_avi_to_first_frame_pixels():
    fs = _frames(3, seed=4)
    avi = encode_mjpeg_avi(fs, quality=85)
    first_jpeg = encode_jpeg(fs[0], quality=85)
    assert media_featurizer(avi) == image_featurizer(first_jpeg)


def test_error_contract():
    with pytest.raises(ValueError, match="no video frames"):
        decode_mjpeg_avi(b"RIFF\x04\x00\x00\x00AVI ")
    with pytest.raises(ValueError, match="not an AVI"):
        decode_mjpeg_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="at least one"):
        encode_mjpeg_avi([])


def test_sample_frames_spark_real_video(spark):
    """The Spark explode path yields REAL decodable JPEG frames for AVI
    videos while opaque blobs keep the byte-slice behavior."""
    from polaris_spark.ops.multimodal import ASSET_SCHEMA

    fs = _frames(6, seed=5)
    avi = encode_mjpeg_avi(fs, quality=85)
    blob = bytes(np.random.default_rng(6).integers(0, 256, 400,
                                                   dtype=np.uint8))
    meta = {"width": 32, "height": 24, "sample_rate": None,
            "duration_ms": 600, "format": "avi"}
    meta2 = dict(meta, format="mp4")
    assets = spark.createDataFrame(
        [(0, "video", bytearray(avi), meta),
         (1, "video", bytearray(blob), meta2)], ASSET_SCHEMA)
    rows = sample_frames(assets, n_frames=3).collect()
    assert len(rows) == 6
    by = {}
    for r in rows:
        by.setdefault(r.asset_id, []).append((r.frame_idx,
                                              bytes(r.frame_data)))
    avi_frames = [d for _, d in sorted(by[0])]
    assert all(d[:3] == b"\xff\xd8\xff" for d in avi_frames)
    np.testing.assert_array_equal(
        decode_jpeg(avi_frames[0]),
        decode_jpeg(encode_jpeg(fs[0], quality=85)))
    assert [len(d) for _, d in sorted(by[1])] == [133, 133, 133]
