"""GIF codec: the third real compressed image format in-container.

Strategy mirrors test_jpeg.py: exact roundtrips through our own
encoder (GIF's LZW is lossless over palette-indexed pixels), PLUS a
decoder check against a HAND-PACKED bitstream assembled from the
GIF89a spec by an independent 10-line packer — so decode correctness
does not rest on the encoder sharing its bugs.
"""

import numpy as np
import pytest

from polaris_spark.ops.multimodal import (_decode_rgb, decode_gif,
                                          encode_bmp, encode_gif,
                                          image_featurizer,
                                          media_featurizer)


def _img(h, w, colors, seed=0):
    """Random image drawing from a fixed palette of `colors` RGB rows."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, colors, (h, w))]


def test_roundtrip_small_palette():
    img = _img(13, 17, colors=5, seed=1)
    out = decode_gif(encode_gif(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


def test_roundtrip_grayscale_promotes_to_rgb():
    g = np.linspace(0, 255, 9 * 7).reshape(9, 7).astype(np.uint8)
    out = decode_gif(encode_gif(g))
    np.testing.assert_array_equal(out, np.stack([g] * 3, axis=-1))


def test_roundtrip_full_256_palette_and_table_reset():
    """128x128 of 256 random colors mints >4096 LZW sequences, forcing
    the encoder's CLEAR-on-full reset and the decoder's append guard —
    the code path a small image never reaches."""
    img = _img(128, 128, colors=256, seed=2)
    data = encode_gif(img)
    np.testing.assert_array_equal(decode_gif(data), img)
    # palette is full 8-bit → min code size 8; reset path really ran
    assert len(np.unique(img.reshape(-1, 3), axis=0)) == 256


def test_roundtrip_two_color_min_code_size_floor():
    """1-bit images still use the spec minimum LZW code size of 2."""
    img = np.zeros((6, 6, 3), np.uint8)
    img[::2] = 255
    data = encode_gif(img)
    np.testing.assert_array_equal(decode_gif(data), img)


def test_decode_hand_packed_stream_matches_spec():
    """2x2 pixels [0,1,1,0], black/white palette, assembled by hand:
    header + LSD + GCT + image descriptor + an LZW stream packed by an
    independent LSB-first packer emitting the spec code sequence
    CLEAR,0,1,1,0,EOI with the early width change after code 8 is
    minted (the subtle bit a paired encoder/decoder bug would hide)."""
    import struct

    bits, buf, nb = bytearray(), 0, 0

    def put(code, width):
        nonlocal buf, nb
        buf |= code << nb
        nb += width
        while nb >= 8:
            bits.append(buf & 0xFF)
            buf >>= 8
            nb -= 8

    # mcs=2 → clear=4, eoi=5, initial width 3. Decoder table additions:
    # after the 2nd pixel code size hits 7, after the 3rd it hits
    # 8 == 1<<3 → width becomes 4 BEFORE the 4th pixel code is read.
    put(4, 3)   # CLEAR
    put(0, 3)   # pixel 0
    put(1, 3)   # pixel 1  (adds code 6)
    put(1, 3)   # pixel 1  (adds code 7; table hits 8 → width 4)
    put(0, 4)   # pixel 0  (read at the grown width)
    put(5, 4)   # EOI
    if nb:
        bits.append(buf & 0xFF)

    gif = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)
           + bytes([0, 0, 0, 255, 255, 255] + [0] * 6)  # 4-entry GCT
           + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
           + bytes([2])                                  # LZW min code size
           + bytes([len(bits)]) + bytes(bits) + b"\x00\x3b")
    out = decode_gif(gif)
    exp = np.array([[[0, 0, 0], [255, 255, 255]],
                    [[255, 255, 255], [0, 0, 0]]], np.uint8)
    np.testing.assert_array_equal(out, exp)


def test_decode_interlaced():
    """Store rows in 4-pass interlace order, set the interlace flag in
    the descriptor, and check the decoder restores scan order."""
    img = _img(16, 5, colors=7, seed=3)
    passes = np.concatenate([np.arange(o, 16, s)
                             for o, s in ((0, 8), (4, 8), (2, 4), (1, 2))])
    data = bytearray(encode_gif(img[passes]))
    # descriptor packed byte sits right before the LZW min-code-size
    # byte: 6 (header) + 7 (LSD) + 3*table (GCT) + 1 (0x2c) + 8
    table_n = 2 << (data[10] & 0x07)
    ipacked = 6 + 7 + 3 * table_n + 1 + 8
    assert data[ipacked] == 0
    data[ipacked] = 0x40
    np.testing.assert_array_equal(decode_gif(bytes(data)), img)


def test_encode_rejects_true_color():
    img = _img(40, 40, colors=8, seed=4).astype(np.int32)
    img = (img + np.arange(40 * 40 * 3).reshape(40, 40, 3)) % 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(img.astype(np.uint8))


def test_decode_rejects_non_gif():
    for junk in (b"", b"GIF", b"NOTAGIF!", b"GIF89a"):
        with pytest.raises(ValueError):
            decode_gif(junk)


def test_featurizer_routes_gif_same_as_bmp():
    """media_featurizer sniffs GIF magic and runs the REAL pixel
    featurizer: identical pixels → identical features across
    containers (and ≠ the byte-level stub's output)."""
    img = _img(24, 24, colors=6, seed=5)
    f_gif = media_featurizer(encode_gif(img))
    f_bmp = media_featurizer(encode_bmp(img))
    assert f_gif == f_bmp == image_featurizer(encode_gif(img))


def test_decode_rgb_dispatch():
    img = _img(10, 11, colors=4, seed=6)
    np.testing.assert_array_equal(_decode_rgb(encode_gif(img)), img)


def test_quantize_identity_within_budget():
    from polaris_spark.ops.multimodal import quantize_colors
    img = _img(15, 15, colors=12, seed=7)
    np.testing.assert_array_equal(quantize_colors(img, 256), img)


def test_quantize_true_color_to_budget_and_deterministic():
    from polaris_spark.ops.multimodal import quantize_colors
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    q1, q2 = quantize_colors(img, 64), quantize_colors(img, 64)
    np.testing.assert_array_equal(q1, q2)
    assert len(np.unique(q1.reshape(-1, 3), axis=0)) <= 64
    # quantized image should be closer to the original than a constant
    err = np.abs(q1.astype(int) - img.astype(int)).mean()
    base = np.abs(img.astype(int) - img.reshape(-1, 3).mean(0)).mean()
    assert err < base


def test_quantize_grayscale_shape():
    from polaris_spark.ops.multimodal import quantize_colors
    g = np.arange(0, 255, 0.25).astype(np.uint8).reshape(30, 34)
    q = quantize_colors(g, 16)
    assert q.shape == g.shape and len(np.unique(q)) <= 16


def test_encode_gif_quantize_path_roundtrips_exactly():
    from polaris_spark.ops.multimodal import quantize_colors
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_gif(img, quantize=True)
    # lossy vs the original, but the DECODE is exact vs the quantized image
    np.testing.assert_array_equal(decode_gif(data), quantize_colors(img, 256))
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)  # lossiness is never silent


def test_encode_rejects_degenerate_dimensions():
    for bad in (np.zeros((0, 0, 3), np.uint8), np.zeros((1, 0, 3), np.uint8),
                np.zeros((1, 70000, 3), np.uint8)):
        with pytest.raises(ValueError, match="65535"):
            encode_gif(bad)
