"""Pure-numpy FLAC codec (subset) — the first COMPRESSED audio format
real in-container (round 5), joining the image family (PNG/JPEG/GIF).

Implements the RFC 9639 / FLAC format from scratch with stdlib + numpy
only: STREAMINFO metadata, frame headers (UTF-8-style frame numbers,
CRC-8), subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC, Rice
residual coding (both 4- and 5-bit parameter methods, partitions,
raw-bits escape), stereo decorrelation (independent, left/side,
right/side, mid/side), wasted-bits shifts, and frame CRC-16.

Encoder subset: 8/16-bit PCM, mono/stereo, fixed 4096-sample blocks,
per-channel best-of CONSTANT / VERBATIM / FIXED(0-2) with a
single-partition Rice residual, and selectable stereo decorrelation —
enough to exercise every decoder path the format's hot loop uses.
FIXED-order reconstruction is k-fold ``np.cumsum`` (vectorized); only
Rice bit unpacking walks bits.

Like the JPEG/GIF codecs, correctness rests on (a) exact roundtrips
through our own encoder, (b) a HAND-PACKED bitstream assembled from
the spec by an independent test packer, so the decoder does not merely
share the encoder's bugs, and (c) spec-derived goldens (fixed-predictor
identities, Rice zigzag). Reference: RFC 9639; no reference-engine
analog (the reference is a code search engine — this belongs to the
multimodal training-data extension, SURVEY §2.12).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"fLaC"

# ---------------------------------------------------------------- CRCs
_CRC8_TAB = np.zeros(256, np.uint8)
_CRC16_TAB = np.zeros(256, np.uint16)
for _i in range(256):
    _c8 = _i
    _c16 = _i << 8
    for _ in range(8):
        _c8 = ((_c8 << 1) ^ 0x07) & 0xFF if _c8 & 0x80 else (_c8 << 1) & 0xFF
        _c16 = ((_c16 << 1) ^ 0x8005) & 0xFFFF if _c16 & 0x8000 \
            else (_c16 << 1) & 0xFFFF
    _CRC8_TAB[_i] = _c8
    _CRC16_TAB[_i] = _c16


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TAB[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TAB[(c >> 8) ^ b]) ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------------- bit I/O
class _BitReader:
    """MSB-first bit reader over bytes (FLAC's bit order)."""

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        end = self.pos + n
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        if b1 > len(self.data):
            raise ValueError("FLAC bitstream truncated")
        chunk = int.from_bytes(self.data[b0:b1], "big")
        self.pos = end
        return (chunk >> ((b1 << 3) - end)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count 0 bits up to the terminating 1 bit (RFC 9639 unary)."""
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (int(v) & ((1 << n) - 1))
        self.nb += n
        while self.nb >= 8:
            self.nb -= 8
            self.buf.append((self.acc >> self.nb) & 0xFF)
        self.acc &= (1 << self.nb) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self) -> None:
        if self.nb:
            self.write(0, 8 - self.nb)

    def bytes(self) -> bytes:
        assert self.nb == 0
        return bytes(self.buf)


# ----------------------------------------------------- frame utilities
def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    if n < 0x80:
        return bytes([n])
    for k in range(1, 7):  # k continuation bytes carry 6k + (6-k) bits
        if n < 1 << (6 * k + 6 - k):
            break
    else:
        raise ValueError("frame number exceeds 36 bits")
    out = [((0xFF << (7 - k)) & 0xFF) | (n >> (6 * k))]
    for i in range(k - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    k = 0
    while b0 & (0x80 >> k):
        k += 1
    n = b0 & (0x7F >> k)
    for _ in range(k - 1):
        n = (n << 6) | (br.read(8) & 0x3F)
    return n


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(warm: np.ndarray, resid: np.ndarray,
                   order: int) -> np.ndarray:
    """Inverse of ``order``-fold differencing: k cumulative sums seeded
    by the warmup samples (vectorized FIXED-predictor reconstruction)."""
    if order == 0:
        return resid.astype(np.int64)
    # peel the warmups down to each differencing level's seed
    seeds = [warm.astype(np.int64)]
    for _ in range(order):
        seeds.append(np.diff(seeds[-1]))
    out = resid.astype(np.int64)
    for lvl in range(order, 0, -1):
        seed = seeds[lvl - 1][-1]  # last warmup value at level lvl-1
        out = seed + np.cumsum(out)
    # out currently: samples AFTER the warmup region
    return np.concatenate([warm.astype(np.int64), out])


# -------------------------------------------------------------- decode
def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC → (samples, rate): int16 (bps ≤ 16) or int32 samples, shape
    (n,) mono / (n, ch) multichannel — the same contract as
    ``multimodal.decode_wav``. Verifies frame-header CRC-8 and frame
    CRC-16. Raises ValueError on non-FLAC or unsupported variants."""
    if data[:4] != _MAGIC:
        raise ValueError("not a FLAC payload")
    pos, info = 4, None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = int.from_bytes(data[pos: pos + 4], "big")
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = data[pos + 4: pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16), br.read(16), br.read(24), br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, ch, bps, total)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, ch, bps, total = info

    chans = [[] for _ in range(ch)]
    got = 0
    while got < total and pos < len(data):
        br = _BitReader(data, pos * 8)
        if br.read(14) != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_asgn = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            bsize = 192
        elif bs_code <= 5:
            bsize = 576 << (bs_code - 2)
        elif bs_code == 6:
            bsize = br.read(8) + 1
        elif bs_code == 7:
            bsize = br.read(16) + 1
        else:
            bsize = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        sbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code, bps)
        hdr_end = br.pos >> 3
        crc8 = br.read(8)
        if crc8 != _crc8(data[pos:hdr_end]):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_asgn < 8:
            nch, kinds = ch_asgn + 1, ["ind"] * (ch_asgn + 1)
        elif ch_asgn == 8:
            nch, kinds = 2, ["left", "side"]
        elif ch_asgn == 9:
            nch, kinds = 2, ["side", "right"]
        elif ch_asgn == 10:
            nch, kinds = 2, ["mid", "side"]
        else:
            raise ValueError(f"reserved channel assignment {ch_asgn}")
        if nch != ch:
            raise ValueError("frame channel count != STREAMINFO")

        sub = []
        for kind in kinds:
            cbps = sbps + (1 if kind == "side" else 0)
            if br.read(1):
                raise ValueError("bad subframe sync bit")
            stype = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = br.read_unary() + 1
            cbps -= wasted
            if stype == 0:  # CONSTANT
                s = np.full(bsize, br.read_signed(cbps), np.int64)
            elif stype == 1:  # VERBATIM
                s = np.array([br.read_signed(cbps) for _ in range(bsize)],
                             np.int64)
            elif 8 <= stype <= 12:  # FIXED, order 0-4
                order = stype - 8
                warm = np.array([br.read_signed(cbps)
                                 for _ in range(order)], np.int64)
                resid = _read_residual(br, bsize, order)
                s = _fixed_restore(warm, resid, order)
            elif stype >= 32:  # LPC, order 1-32
                order = stype - 31
                warm = [br.read_signed(cbps) for _ in range(order)]
                prec = br.read(4) + 1
                shift = br.read_signed(5)
                coefs = [br.read_signed(prec) for _ in range(order)]
                resid = _read_residual(br, bsize, order)
                s = list(warm)
                for r in resid.tolist():
                    pred = sum(c * s[-1 - j] for j, c in enumerate(coefs))
                    s.append((pred >> shift) + r)
                s = np.array(s, np.int64)
            else:
                raise ValueError(f"reserved subframe type {stype}")
            sub.append(s << wasted)

        if ch_asgn == 8:       # left/side: R = L - side
            sub = [sub[0], sub[0] - sub[1]]
        elif ch_asgn == 9:     # side/right: L = R + side
            sub = [sub[1] + sub[0], sub[1]]
        elif ch_asgn == 10:    # mid/side
            mid, side = sub
            mid = (mid << 1) | (side & 1)
            sub = [(mid + side) >> 1, (mid - side) >> 1]
        br.align()
        crc16 = br.read(16)
        if crc16 != _crc16(data[pos: (br.pos >> 3) - 2]):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.pos >> 3
        take = min(bsize, total - got)
        for c in range(ch):
            chans[c].append(sub[c][:take])
        got += take
    if got < total:
        raise ValueError("FLAC stream ended early")
    out = np.stack([np.concatenate(c) if c else np.zeros(0, np.int64)
                    for c in chans], axis=-1)
    dt = np.int16 if bps <= 16 else np.int32
    out = out.astype(dt)
    return (out[:, 0] if ch == 1 else out), rate


def _read_residual(br: _BitReader, bsize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bsize % nparts or (bsize >> porder) <= order:
        raise ValueError("invalid residual partition order")
    out = np.empty(bsize - order, np.int64)
    w = 0
    for p in range(nparts):
        cnt = (bsize >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(cnt):
                out[w + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[w + i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        w += cnt
    return out


# -------------------------------------------------------------- encode
def _best_rice_param(resid: np.ndarray) -> int:
    if not len(resid):
        return 0
    u = (np.abs(resid.astype(np.int64)) << 1).sum()
    mean = max(1, int(u // max(1, len(resid))))
    return min(14, max(0, int(mean).bit_length() - 1))


def _rice_cost(resid: np.ndarray, param: int) -> int:
    r = resid.astype(np.int64)
    u = (r << 1) ^ (r >> 63)
    return int((u >> param).sum()) + len(u) * (1 + param)


def _write_residual(bw: _BitWriter, resid: np.ndarray, cbps: int) -> None:
    """Single-partition residual: Rice when cheaper, else the raw-bits
    escape (the VERBATIM of the residual layer). Escape width is sized
    to the residual itself — an order-k FIXED residual can exceed the
    channel bit depth by k bits."""
    bw.write(0, 2)   # method 0: 4-bit params
    bw.write(0, 4)   # partition order 0
    param = _best_rice_param(resid)
    peak = int(np.abs(resid).max(initial=0))
    raw_bits = min(31, max(1, peak.bit_length() + 1))  # signed width
    if _rice_cost(resid, param) >= len(resid) * raw_bits + 5:
        bw.write(0xF, 4)
        bw.write(raw_bits, 5)
        for v in resid.tolist():
            bw.write(int(v), raw_bits)
        return
    bw.write(param, 4)
    r = resid.astype(np.int64)
    u = ((r << 1) ^ (r >> 63)).tolist()
    for v in u:
        bw.write_unary(v >> param)
        bw.write(v, param)


def encode_flac(samples: np.ndarray, rate: int = 16000,
                block_size: int = 4096,
                stereo_mode: str = "independent") -> bytes:
    """int16 (n,) mono / (n, 2) stereo PCM → FLAC bytes — inverse of
    :func:`decode_flac` (lossless; exact roundtrip). Per block and
    channel the encoder picks the cheapest of CONSTANT / FIXED(0-2) /
    VERBATIM with a single-partition Rice residual; ``stereo_mode``
    chooses the decorrelation (``independent`` / ``left_side`` /
    ``right_side`` / ``mid_side``) so every decoder path is
    constructible. 8-bit input is encoded as bps=8."""
    s = np.asarray(samples)
    if s.dtype not in (np.int8, np.int16):
        raise ValueError(
            f"FLAC encodes signed integer PCM (int8/int16), got {s.dtype}; "
            "scale float [-1,1] audio by 32768 and cast first")
    bps = 8 if s.dtype == np.int8 else 16
    s = s.astype(np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError(f"FLAC supports 1-8 channels, got {ch}")
    if ch > 2 and stereo_mode != "independent":
        raise ValueError("decorrelation is a stereo-only mode")

    bw_all = bytearray()
    info = _BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    streaminfo = info.bytes() + b"\x00" * 16  # md5 0 = unverified
    bw_all += _MAGIC + struct.pack(">I", 0x80000000 | len(streaminfo))
    bw_all += streaminfo

    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        blk = s[start: start + block_size]
        bsize = len(blk)
        if bsize == 0:
            break
        if ch == 2 and stereo_mode != "independent":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                ch_asgn, parts = 8, [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                ch_asgn, parts = 9, [(side, bps + 1), (right, bps)]
            elif stereo_mode == "mid_side":
                mid = (left + right) >> 1
                ch_asgn, parts = 10, [(mid, bps), (side, bps + 1)]
            else:
                raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
        else:
            ch_asgn = ch - 1
            parts = [(blk[:, c], bps) for c in range(ch)]

        head = bytearray()
        head += b"\xff\xf8"  # sync + reserved + fixed blocking
        head.append((7 << 4) | 0)      # explicit 16-bit bsize; rate=STREAMINFO
        head.append((ch_asgn << 4) | ({8: 1, 16: 4}[bps] << 1))
        head += _utf8_number(fi)
        head += struct.pack(">H", bsize - 1)
        head.append(_crc8(bytes(head)))

        bw = _BitWriter()
        for vals, cbps in parts:
            cands = []
            if (vals == vals[0]).all():
                cands.append(("const", 0, None))
            for order in (0, 1, 2):
                if bsize > order:
                    resid = _fixed_residual(vals, order)
                    lim = 1 << (cbps + 3)  # stay clear of rice overflow
                    if len(resid) == 0 or np.abs(resid).max(initial=0) < lim:
                        cost = _rice_cost(resid, _best_rice_param(resid))
                        cands.append((("fixed", order), cost, resid))
            cands.append(("verbatim", bsize * cbps, None))
            kind = min(cands, key=lambda c: c[1])
            bw.write(0, 1)
            if kind[0] == "const":
                bw.write(0, 6)
                bw.write(0, 1)
                bw.write(int(vals[0]), cbps)
            elif kind[0] == "verbatim":
                bw.write(1, 6)
                bw.write(0, 1)
                for v in vals.tolist():
                    bw.write(int(v), cbps)
            else:
                order = kind[0][1]
                bw.write(8 + order, 6)
                bw.write(0, 1)
                for v in vals[:order].tolist():
                    bw.write(int(v), cbps)
                _write_residual(bw, kind[2], cbps)
        bw.align()
        frame = bytes(head) + bw.bytes()
        bw_all += frame + struct.pack(">H", _crc16(frame))
    return bytes(bw_all)
