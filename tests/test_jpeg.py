"""Baseline JPEG codec (pure numpy, `ops/jpeg.py`) — the second
compressed image format real in-container.

Strategy mirrors the PNG tests: self-roundtrip bounds for the lossy
path, an EXACT case the math guarantees (flat block at quality 100),
plus a hand-assembled bitstream that verifies the decoder against the
T.81 spec independently of our own encoder."""

import struct

import numpy as np
import pytest

from polaris_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _smooth_rgb(h=33, w=47):
    y, x = np.mgrid[0:h, 0:w]
    r = ((np.sin(x / 9) + 1) * 120).astype(np.uint8)
    g = ((np.cos(y / 8) + 1) * 120).astype(np.uint8)
    b = ((x + y) % 200).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_jpeg_flat_gray_quality100_exact():
    """Constant-value image at quality 100: all quant entries clip to 1,
    the only coefficient is the DC (integer 8*(v-128)), so the decode is
    bit-exact — a correctness anchor the lossy path can't blur."""
    img = np.full((16, 24), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (16, 24)
    assert (out == img).all()


def test_jpeg_gray_roundtrip_bounded_error():
    y, x = np.mgrid[0:33, 0:47]
    img = ((np.sin(x / 7) + np.cos(y / 5)) * 50 + 128).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_rgb_444_roundtrip_bounded_error():
    rgb = _smooth_rgb()
    out = decode_jpeg(encode_jpeg(rgb, quality=95))
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert out.shape == rgb.shape
    assert err.max() <= 8 and err.mean() < 2.0


def test_jpeg_rgb_420_subsampled_roundtrip():
    """4:2:0 exercises multi-block MCUs (2×2 luma + 1+1 chroma per MCU)
    and the decoder's upsampling; odd dimensions exercise edge padding."""
    rgb = _smooth_rgb(33, 47)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=True))
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert out.shape == rgb.shape
    assert err.mean() < 5.0  # chroma is 2x2-averaged: looser bound


def test_jpeg_rgb_422_subsampled_roundtrip():
    """4:2:2 exercises asymmetric sampling factors (2×1 luma blocks per
    MCU, horizontal-only chroma upsampling in the decoder)."""
    rgb = _smooth_rgb(33, 47)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample="422"))
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert out.shape == rgb.shape
    assert err.mean() < 4.0
    # 4:2:2 halves only horizontal chroma -> error between 4:4:4 and 4:2:0
    e444 = np.abs(decode_jpeg(encode_jpeg(rgb, quality=95)).astype(int)
                  - rgb.astype(int)).mean()
    e420 = np.abs(decode_jpeg(encode_jpeg(rgb, quality=95,
                                          subsample="420")).astype(int)
                  - rgb.astype(int)).mean()
    assert e444 <= err.mean() <= e420 + 0.5


def test_jpeg_restart_markers_identical_decode():
    """DRI/RSTn only re-frames the entropy stream (predictor resets +
    byte alignment); decoded pixels must equal the marker-free encode."""
    rgb = _smooth_rgb()
    plain = decode_jpeg(encode_jpeg(rgb, quality=90))
    with_rst = decode_jpeg(encode_jpeg(rgb, quality=90, restart_interval=3))
    assert (plain == with_rst).all()


def test_jpeg_decoder_spec_compliance_handbuilt():
    """Hand-assembled minimal baseline JPEG, independent of our encoder:
    8×8 grayscale, quant table all 16s, trivial canonical Huffman tables
    (DC: single 1-bit code '0' → category 3; AC: single code → EOB).
    Entropy bits: '0'+'100' (DC diff +4) then '0' (EOB), 1-padded →
    0x47. Per T.81: DC coef 4·16 = 64; orthonormal IDCT of a lone DC is
    the constant 64/8 = 8; +128 level shift → every pixel 136."""
    soi = b"\xff\xd8"
    dqt = (b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
           + bytes([16] * 64))
    sof = (b"\xff\xc0" + struct.pack(">H", 11)
           + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = (b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x00])
              + bytes([1] + [0] * 15) + bytes([3]))
    dht_ac = (b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x10])
              + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    jpg = soi + dqt + sof + dht_dc + dht_ac + sos + bytes([0x47]) + b"\xff\xd9"
    out = decode_jpeg(jpg)
    assert out.shape == (8, 8)
    assert (out == 136).all()


def test_jpeg_rejects_non_baseline():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # progressive marker (SOF2) must be rejected, not mis-decoded
    prog = (b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError):
        decode_jpeg(prog)


def test_jpeg_malformed_streams_raise_valueerror_only():
    """The codec-family error contract: every malformed-but-magic-matching
    payload raises ValueError (never struct.error/KeyError/IndexError),
    so media_featurizer's `except ValueError` stub fallback keeps the
    Spark pipeline total over arbitrary payloads."""
    from polaris_spark.ops.multimodal import media_featurizer, stub_featurizer

    img = np.full((8, 8), 120, np.uint8)
    good = encode_jpeg(img, quality=90)
    # strip the DHT segments out of a valid stream -> entropy tables missing
    out, pos = bytearray(good[:2]), 2
    while pos + 4 <= len(good):
        marker = good[pos + 1]
        if marker == 0xDA:
            out += good[pos:]
            break
        ln = struct.unpack_from(">H", good, pos + 2)[0]
        if marker != 0xC4:
            out += good[pos:pos + 2 + ln]
        pos += 2 + ln
    # zero sampling factor in SOF (hmax=0 -> division in MCU geometry)
    zs = bytearray(good)
    sof_at = zs.find(b"\xff\xc0")
    zs[sof_at + 2 + 2 + 6 + 1] = 0x00      # the component's (h<<4|v) byte
    # corrupt DHT: DC size symbol 200 -> received value exceeds int64
    soi = b"\xff\xd8"
    dqt = (b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
           + bytes([16] * 64))
    sof = (b"\xff\xc0" + struct.pack(">H", 11)
           + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = (b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x00])
              + bytes([1] + [0] * 15) + bytes([200]))
    dht_ac = (b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x10])
              + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    overflow = soi + dqt + sof + dht_dc + dht_ac + sos \
        + bytes([0xAA] * 40) + b"\xff\xd9"
    bad_payloads = [
        b"\xff\xd8\xff\xc0\x00\x20\x08",   # truncated SOF header
        b"\xff\xd8\xff\xdb\x00\x02",       # truncated DQT
        bytes(out),                        # missing DHT
        good[:len(good) // 2],             # truncated entropy stream
        bytes(zs),                         # zero sampling factor
        overflow,                          # DC category > 63 (int64 blow)
    ]
    for bad in bad_payloads:
        with pytest.raises(ValueError):
            decode_jpeg(bad)
        # featurizer must fall back to the byte-level stub, not crash
        assert media_featurizer(bad) == stub_featurizer(bad)


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker —
    a spec-legal stream with padding decodes identically."""
    y, x = np.mgrid[0:16, 0:16]
    img = (x * 8 + y).astype(np.uint8)
    good = encode_jpeg(img, quality=95)
    filled = good[:2] + b"\xff\xff" + good[2:]
    assert (decode_jpeg(filled) == decode_jpeg(good)).all()


def test_jpeg_media_featurizer_dispatch():
    """media_featurizer sniffs the JPEG magic and routes to the REAL
    pixel featurizer: flat image at quality 100 decodes exactly, so the
    features must match the same pixels as BMP byte-for-byte."""
    from polaris_spark.ops.multimodal import (encode_bmp, image_featurizer,
                                              media_featurizer,
                                              stub_featurizer)

    img = np.full((16, 16, 3), 99, np.uint8)
    jpg = encode_jpeg(img, quality=100)
    assert media_featurizer(jpg) == image_featurizer(jpg)
    assert media_featurizer(jpg) == media_featurizer(encode_bmp(img))
    assert media_featurizer(jpg) != stub_featurizer(jpg)


def test_jpeg_resizer_contract():
    from polaris_spark.ops.multimodal import bmp_resizer

    rgb = _smooth_rgb(32, 40)
    out = bmp_resizer(encode_jpeg(rgb, quality=95), 8, 8)
    assert len(out) == 64


def test_jpeg_assets_through_spark_pipeline(spark):
    """JPEG payloads ride the SAME mapInPandas kernels as BMP/WAV:
    decode_features and resize_images over a mixed BMP/JPEG asset table,
    each row's output equal to the driver-side reference call."""
    from polaris_spark.ops.multimodal import (ASSET_SCHEMA, bmp_resizer,
                                              decode_features, encode_bmp,
                                              media_featurizer,
                                              resize_images)

    rows = []
    for i in range(12):
        rng = np.random.default_rng(1000 + i)
        h, w = 16 + (i % 3) * 8, 16 + (i % 4) * 8
        grad = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
        px = np.clip(grad[..., None] + rng.integers(0, 32, (h, w, 3)),
                     0, 255).astype(np.uint8)
        if i % 2:
            data, fmt = encode_jpeg(px, quality=95), "jpeg"
        else:
            data, fmt = encode_bmp(px), "bmp"
        rows.append((i, "image", bytearray(data),
                     {"width": w, "height": h, "sample_rate": None,
                      "duration_ms": None, "format": fmt}))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)

    feats = {r["asset_id"]: r["features"]
             for r in decode_features(assets, featurizer=media_featurizer)
             .collect()}
    sizes = {r["asset_id"]: bytes(r["resized"])
             for r in resize_images(assets, 8, 8, resizer=bmp_resizer)
             .collect()}
    assert len(feats) == len(sizes) == 12
    for aid, kind, data, _meta in rows:
        assert feats[aid] == media_featurizer(bytes(data))
        assert sizes[aid] == bmp_resizer(bytes(data), 8, 8)
