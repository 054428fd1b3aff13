"""FLAC codec: the first real compressed AUDIO format in-container.

Same strategy as test_jpeg.py / test_gif.py: exact roundtrips through
our own encoder (FLAC is lossless), PLUS decoder checks against
HAND-PACKED bitstreams assembled from RFC 9639 by an independent
MSB-first packer with its own bitwise (non-table) CRC-8/CRC-16 — so
decode correctness does not rest on the encoder sharing its bugs.
The hand streams cover paths the encoder never emits: LPC subframes,
rice partitions > 1, and wasted-bits shifts.
"""

import numpy as np
import pytest

from polaris_spark.ops.flac import decode_flac, encode_flac
from polaris_spark.ops.multimodal import (audio_featurizer, encode_wav,
                                          media_featurizer)


# ---------------------------------------------------- independent kit
class _Pack:
    """Spec-side MSB-first packer, written independently of the codec's
    _BitWriter (no shared code paths)."""

    def __init__(self):
        self.bits = []

    def put(self, v, n):
        self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]

    def unary(self, q):
        self.bits += [0] * q + [1]

    def bytes(self):
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(int("".join(map(str, bits[i:i + 8])), 2)
                     for i in range(0, len(bits), 8))


def _crc8_ref(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_ref(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def _streaminfo(rate, ch, bps, total):
    p = _Pack()
    p.put(4096, 16), p.put(4096, 16), p.put(0, 24), p.put(0, 24)
    p.put(rate, 20), p.put(ch - 1, 3), p.put(bps - 1, 5), p.put(total, 36)
    body = p.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80, 0, 0, len(body)]) + body


def _frame(bsize, body_packer, ch_bits=0b0000, bps_bits=0b100):
    """Hand frame: sync+fixed strategy, explicit 16-bit bsize, rate from
    STREAMINFO, frame number 0; `body_packer(p)` writes the subframes."""
    head = bytes([0xFF, 0xF8, 0x70, (ch_bits << 4) | (bps_bits << 1), 0x00,
                  (bsize - 1) >> 8, (bsize - 1) & 0xFF])
    head += bytes([_crc8_ref(head)])
    p = _Pack()
    body_packer(p)
    frame = head + p.bytes()
    return frame + bytes([_crc16_ref(frame) >> 8, _crc16_ref(frame) & 0xFF])


# ----------------------------------------------------------- roundtrip
def test_roundtrip_mono_sine():
    t = np.arange(9001) / 8000
    s = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    data = encode_flac(s, 8000)
    out, rate = decode_flac(data)
    assert rate == 8000 and out.dtype == np.int16
    np.testing.assert_array_equal(out, s)
    assert len(data) < s.nbytes  # actually compresses a tonal signal


@pytest.mark.parametrize("mode,asgn", [("independent", 1), ("left_side", 8),
                                       ("right_side", 9), ("mid_side", 10)])
def test_roundtrip_stereo_all_decorrelations(mode, asgn):
    t = np.arange(7000) / 8000
    st = np.stack([(np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16),
                   (np.sin(2 * np.pi * 301 * t) * 9000).astype(np.int16)], 1)
    data = encode_flac(st, 8000, stereo_mode=mode)
    out, _ = decode_flac(data)
    np.testing.assert_array_equal(out, st)
    # the frame really used the claimed channel assignment: the nibble
    # lives in the 4th header byte of the first frame (after STREAMINFO:
    # 4 magic + 4 block header + 34 body)
    assert data[42 + 3] >> 4 == asgn


def test_roundtrip_noise_takes_escape_and_still_exact():
    rng = np.random.default_rng(1)
    wn = rng.integers(-32768, 32768, 5000).astype(np.int16)
    out, _ = decode_flac(encode_flac(wn, 16000))
    np.testing.assert_array_equal(out, wn)


def test_roundtrip_constant_and_odd_lengths():
    c = np.full(10000, -123, np.int16)
    d = encode_flac(c, 16000)
    np.testing.assert_array_equal(decode_flac(d)[0], c)
    assert len(d) < 120  # CONSTANT subframes: ~bytes, not kilobytes
    rng = np.random.default_rng(2)
    for n in (1, 2, 4095, 4096, 4097, 8193):
        x = rng.integers(-1000, 1000, n).astype(np.int16)
        np.testing.assert_array_equal(decode_flac(encode_flac(x, 44100))[0], x)


def test_roundtrip_int8():
    rng = np.random.default_rng(3)
    x = rng.integers(-128, 128, 3000).astype(np.int8)
    out, _ = decode_flac(encode_flac(x, 8000))
    np.testing.assert_array_equal(out.astype(np.int64), x.astype(np.int64))


# ------------------------------------------------- hand-packed streams
def test_hand_packed_constant_frame():
    """Minimal spec stream: mono, 4 samples, one CONSTANT subframe."""
    def body(p):
        p.put(0, 1), p.put(0, 6), p.put(0, 1)   # pad, CONSTANT, no waste
        p.put(7, 16)
    data = _streaminfo(8000, 1, 16, 4) + _frame(4, body)
    out, rate = decode_flac(data)
    assert rate == 8000
    np.testing.assert_array_equal(out, np.full(4, 7, np.int16))


def test_hand_packed_fixed_order1_rice():
    """FIXED order-1 subframe, rice param 0: warmup 10, residuals
    [1,-1,2] zigzag to [2,1,4] → samples [10,11,10,12]."""
    def body(p):
        p.put(0, 1), p.put(0b001001, 6), p.put(0, 1)  # FIXED order 1
        p.put(10, 16)                                  # warmup
        p.put(0, 2), p.put(0, 4), p.put(0, 4)          # rice4, porder 0, k=0
        for u in (2, 1, 4):
            p.unary(u)
    data = _streaminfo(8000, 1, 16, 4) + _frame(4, body)
    np.testing.assert_array_equal(decode_flac(data)[0],
                                  np.array([10, 11, 10, 12], np.int16))


def test_hand_packed_lpc_subframe():
    """LPC order 1, precision 4, shift 0, coef [1] ≡ prev-sample
    predictor: warmup 5, residuals [1,2] → [5,6,8]. The encoder never
    emits LPC, so only a hand stream exercises this path."""
    def body(p):
        p.put(0, 1), p.put(0b100000, 6), p.put(0, 1)  # LPC order 1
        p.put(5, 16)                                   # warmup
        p.put(3, 4)                                    # precision-1 = 3
        p.put(0, 5)                                    # shift 0
        p.put(1, 4)                                    # coef = 1
        p.put(0, 2), p.put(0, 4), p.put(1, 4)          # rice, porder 0, k=1
        for r in (1, 2):                               # zigzag: 2, 4
            u = 2 * r
            p.unary(u >> 1), p.put(u, 1)
    data = _streaminfo(8000, 1, 16, 3) + _frame(3, body)
    np.testing.assert_array_equal(decode_flac(data)[0],
                                  np.array([5, 6, 8], np.int16))


def test_hand_packed_two_rice_partitions():
    """Partition order 1 (two partitions, params 0 and 1) over a FIXED
    order-0 subframe of 4 samples [3,-2,0,5]."""
    def body(p):
        p.put(0, 1), p.put(0b001000, 6), p.put(0, 1)  # FIXED order 0
        p.put(0, 2), p.put(1, 4)                       # rice4, porder 1
        p.put(0, 4)                                    # part 1: k=0
        for u in (6, 3):                               # zigzag(3), zigzag(-2)
            p.unary(u)
        p.put(1, 4)                                    # part 2: k=1
        for u in (0, 10):                              # zigzag(0), zigzag(5)
            p.unary(u >> 1), p.put(u, 1)
    data = _streaminfo(8000, 1, 16, 4) + _frame(4, body)
    np.testing.assert_array_equal(decode_flac(data)[0],
                                  np.array([3, -2, 0, 5], np.int16))


def test_hand_packed_wasted_bits():
    """CONSTANT with 1 wasted bit: stored value 6 at 15 bits → 12."""
    def body(p):
        p.put(0, 1), p.put(0, 6), p.put(1, 1)  # wasted flag
        p.unary(0)                             # wasted-1 = 0 → 1 wasted bit
        p.put(6, 15)
    data = _streaminfo(8000, 1, 16, 2) + _frame(2, body)
    np.testing.assert_array_equal(decode_flac(data)[0],
                                  np.full(2, 12, np.int16))


# ------------------------------------------------------ error contract
def test_crc_corruption_detected():
    s = (np.arange(5000) % 997).astype(np.int16)
    data = bytearray(encode_flac(s, 16000))
    data[60] ^= 0xFF  # inside the first frame's subframe payload
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))


def test_decode_rejects_non_flac():
    for junk in (b"", b"fLa", b"RIFFxxxxWAVE", b"fLaC"):
        with pytest.raises(ValueError):
            decode_flac(junk)


def test_encode_rejects_unsigned():
    with pytest.raises(ValueError, match="signed"):
        encode_flac(np.zeros(10, np.uint8))


# ----------------------------------------------------- pipeline wiring
def test_featurizer_routes_flac_same_as_wav():
    """media_featurizer sniffs fLaC and runs the REAL spectral kernel:
    same samples → same features as the WAV container."""
    t = np.arange(4000) / 8000
    s = np.sin(2 * np.pi * 500 * t) * 0.5
    wav = encode_wav(s, 8000)
    # encode the SAME int16 samples WAV carries, losslessly, as FLAC
    from polaris_spark.ops.multimodal import decode_wav
    pcm, rate = decode_wav(wav)  # float64 = int16/32768, exactly
    flac = encode_flac((pcm * 32768.0).astype(np.int16), rate)
    assert media_featurizer(flac) == media_featurizer(wav) \
        == audio_featurizer(flac)


def test_encode_rejects_float():
    with pytest.raises(ValueError, match="int8/int16"):
        encode_flac(np.zeros(10, np.float64))


def test_empty_and_multiframe_edges():
    """Zero-sample streams decode to the right empty shape; >127 frames
    exercises the multi-byte UTF-8 frame-number path; extreme
    alternating samples stress the max FIXED-residual magnitudes."""
    rng = np.random.default_rng(7)
    out, rate = decode_flac(encode_flac(np.zeros(0, np.int16), 8000))
    assert out.shape == (0,) and rate == 8000
    out2, _ = decode_flac(encode_flac(np.zeros((0, 2), np.int16), 8000))
    assert out2.shape == (0, 2)
    big = rng.integers(-300, 300, 4096 * 130).astype(np.int16)
    np.testing.assert_array_equal(decode_flac(encode_flac(big, 8000))[0], big)
    alt = np.empty(4000, np.int16)
    alt[0::2], alt[1::2] = 32767, -32768
    np.testing.assert_array_equal(decode_flac(encode_flac(alt, 8000))[0], alt)


def test_multichannel_roundtrip_and_limit():
    rng = np.random.default_rng(11)
    for ch in (3, 8):
        x = rng.integers(-2000, 2000, (1500, ch)).astype(np.int16)
        np.testing.assert_array_equal(decode_flac(encode_flac(x, 8000))[0], x)
    with pytest.raises(ValueError, match="1-8 channels"):
        encode_flac(np.zeros((10, 9), np.int16), 8000)
