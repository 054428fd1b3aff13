"""Pure-numpy baseline JPEG codec (ITU-T T.81 baseline sequential DCT).

Second COMPRESSED image format real in-container (after PNG): no PIL, no
external libraries — the entropy layer, DCT and color model are implemented
here from the public spec.

- :func:`decode_jpeg`: baseline sequential (SOF0/SOF1), 8-bit samples,
  grayscale or 3-component YCbCr with arbitrary sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 all exercised in tests), restart markers (DRI /
  RSTn), multi-table DQT/DHT segments, APPn/COM skip. Huffman decode is
  canonical-code table walk; IDCT is the orthonormal 8×8 DCT-III as two
  matrix products per block (numpy einsum over all blocks at once).
- :func:`encode_jpeg`: grayscale or color — 4:4:4 by default,
  ``subsample="420"``/``True`` for 4:2:0, ``"422"`` for 4:2:2 — Annex K
  quantization tables scaled by the libjpeg-compatible quality curve,
  Annex K Huffman tables, byte-stuffed entropy stream, optional restart
  intervals.

Design note for the Spark pipeline: this codec runs inside the
``mapInPandas`` media kernels (see ``ops/multimodal.py``), so it only ever
sees one Arrow batch of payloads per call — per-image numpy vectorization
(all blocks of one image DCT'd in a single einsum) is the right grain;
cross-image batching happens at the Spark partition level.

Reference behavior parity: the reference repo has no media pipeline (its
surface is code search, `CodeSearchImpl.java`); this module belongs to the
mission's training-data-pipeline extension — multimodal columns as opaque
binary + typed metadata with REAL decode where achievable in-container.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

#: zigzag position -> block-order index (row*8+col), per T.81 Figure A.6.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1 luminance quantization table (block order).
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

#: Annex K.2 chrominance quantization table (block order).
QT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)

# Annex K.3 Huffman specs: (bits_per_length[1..16], symbol values).
HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
HUFF_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))


def _ac_tail(first_col: dict[int, int]) -> list[int]:
    """The regular high-symbol tail both Annex K AC tables share:
    (run, size) symbols row by row; ``first_col[row] `` gives the first
    size present for that run row."""
    out = []
    for run in range(1, 16):
        lo = first_col.get(run, 3)
        out.extend((run << 4) | s for s in range(lo, 11))
    return out


HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])

HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])

assert sum(HUFF_AC_LUM[0]) == len(HUFF_AC_LUM[1]) == 162
assert sum(HUFF_AC_CHROM[0]) == len(HUFF_AC_CHROM[1]) == 162


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis: row k is the k-th cosine basis
    vector, so ``C @ x @ C.T`` is the forward 2-D DCT of block x and
    ``C.T @ X @ C`` inverts it."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0] *= np.sqrt(0.5)
    return c


_DCT = _dct_matrix()


def _build_decode_table(bits, values) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 Annex C): {(code_length, code) -> symbol}."""
    table, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits, values) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: {symbol -> (code, code_length)}."""
    return {sym: (code, length)
            for (length, code), sym in _build_decode_table(bits, values).items()}


# ---------------------------------------------------------------- bit I/O

class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


class _BitWriter:
    """MSB-first bit writer with FF -> FF 00 byte stuffing."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out, self.acc, self.nbits = bytearray(), 0, 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 7 - ((self.nbits + 7) % 8))
            # pad with 1-bits to the byte boundary (spec F.1.2.3)


def _extend(v: int, size: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.12)."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Magnitude category: smallest size with |v| < 2**size."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------- decoder

def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG → uint8 (H, W) grayscale or (H, W, 3) RGB.

    Supports SOF0/SOF1 (Huffman sequential), 8-bit precision, 1 or 3
    components, any sampling factors, DRI/RSTn restarts, 0xFF fill bytes
    before markers (T.81 B.1.1.2). Raises ValueError — and ONLY
    ValueError, the codec-family contract ``media_featurizer``'s stub
    fallback catches — on progressive (SOF2), arithmetic coding, 12-bit,
    truncated, or otherwise malformed streams.
    """
    try:
        return _decode_jpeg(data)
    except (struct.error, KeyError, IndexError, OverflowError,
            ZeroDivisionError) as e:
        # malformed-but-magic-matching payload: normalize the parser's
        # internal error class to the decoder contract (OverflowError:
        # a corrupt DHT can yield a DC size symbol > 63 whose received
        # value exceeds int64; ZeroDivisionError: a zero sampling factor
        # in a corrupt SOF)
        raise ValueError(f"malformed JPEG stream ({e!r})") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1          # 0xFF fill bytes before a marker are legal
        if pos >= len(data):
            break
        marker = data[pos]
        pos += 1
        if marker in (0x00, 0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2: pos + seglen]
        pos += seglen
        if marker == 0xDB:                      # DQT (1+ tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8,
                                            count=64, offset=off + 1)
                qt[tq] = tbl
                off += 65
        elif marker in (0xC0, 0xC1):            # SOF0 / SOF1
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 3 + 3 * i + 3)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xC4:                    # DHT (1+ tables)
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                bits = list(seg[off + 1: off + 17])
                nval = sum(bits)
                values = list(seg[off + 17: off + 17 + nval])
                huff[(tc, th)] = _build_decode_table(bits, values)
                off += 17 + nval
        elif marker == 0xDD:                    # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:                    # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables[cid] = (tt >> 4, tt & 15)
            # collect entropy-coded bytes up to the next true marker
            end = pos
            while end + 1 < len(data):
                if data[end] == 0xFF and data[end + 1] not in (0x00,) \
                        and not (0xD0 <= data[end + 1] <= 0xD7):
                    break
                end += 1
            return _decode_scan(data[pos:end], frame, scan_tables, qt,
                                huff, restart)
        # APPn / COM / others: skipped via seglen above
    raise ValueError("no SOS marker found")


def _decode_scan(scan: bytes, frame, scan_tables, qt, huff,
                 restart: int) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # split on restart markers, unstuff each segment
    segments = []
    cur = bytearray()
    i = 0
    while i < len(scan):
        b = scan[i]
        if b == 0xFF and i + 1 < len(scan):
            nxt = scan[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    # entropy pass: collect each component's DEQUANTIZED coefficient
    # blocks in MCU traversal order; the IDCT then runs ONCE per
    # component as a single einsum over the whole block stack (the
    # per-block 8×8 matmul pair inside the bit loop was the decoder's
    # numpy-call-overhead hot spot)
    blocks = [[] for _ in comps]
    coef = np.zeros(64, np.int64)
    n_mcu = mcux * mcuy
    per_seg = restart if restart else n_mcu
    mcu_idx = 0
    for seg in segments:
        rdr = _BitReader(seg)
        pred = [0] * len(comps)
        for _ in range(min(per_seg, n_mcu - mcu_idx)):
            for ci, c in enumerate(comps):
                dct, act = scan_tables[c["id"]]
                dq = qt[c["tq"]]
                for _blk in range(c["v"] * c["h"]):
                    coef[:] = 0
                    s = rdr.read_huffman(huff[(0, dct)])
                    pred[ci] += _extend(rdr.read_bits(s), s)
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = rdr.read_huffman(huff[(1, act)])
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r != 15:
                                break
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        coef[ZIGZAG[k]] = _extend(rdr.read_bits(sz), sz)
                        k += 1
                    blocks[ci].append(coef * dq)
            mcu_idx += 1
    if mcu_idx != n_mcu:
        raise ValueError(f"decoded {mcu_idx}/{n_mcu} MCUs")

    full = []
    for ci, c in enumerate(comps):
        stack = np.stack(blocks[ci]).reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ji,njk,kl->nil", _DCT, stack, _DCT) + 128.0
        # un-interleave MCU traversal order (mcu-major, then v, h within)
        # back into the component plane
        bh, bw = mcuy * c["v"], mcux * c["h"]
        p = (pix.reshape(mcuy, mcux, c["v"], c["h"], 8, 8)
             .transpose(0, 2, 4, 1, 3, 5)
             .reshape(bh * 8, bw * 8))
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sy > 1 or sx > 1:
            p = np.repeat(np.repeat(p, sy, axis=0), sx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder

def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex K base tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QT_LUM, QT_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _zigzag_rows(blocks: np.ndarray, dq: np.ndarray) -> np.ndarray:
    """Forward-DCT + quantize + zigzag a component's ENTIRE (n, 8, 8)
    level-shifted block stack in one einsum — (n, 64) int64 rows in
    zigzag order, ready for the entropy loop."""
    coefs = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT).reshape(-1, 64)
    q = np.round(coefs / dq.astype(np.float64)).astype(np.int64)
    return q[:, ZIGZAG]


def _encode_rows(wtr: _BitWriter, zz: np.ndarray,
                 dc_tab, ac_tab, pred: int) -> int:
    """Entropy-encode precomputed zigzag coefficient rows sequentially;
    returns the updated DC predictor."""
    for row in zz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        s = _category(diff)
        code, ln = dc_tab[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]      # ZRL
                wtr.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_tab[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]          # EOB
            wtr.write(code, ln)
    return pred


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate ``plane`` up to (bh, bw) multiples of 8."""
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, values = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample=False, restart_interval: int = 0) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline JPEG bytes.

    Color uses 4:4:4 by default; ``subsample=True`` or ``"420"`` emits
    4:2:0 (chroma 2×2 box-averaged), ``"422"`` emits 4:2:2 (chroma
    halved horizontally). ``restart_interval`` > 0 writes DRI and RSTn
    markers every that many MCUs (exercises the decoder's restart path).
    """
    arr = np.asarray(img, dtype=np.float64)
    gray = arr.ndim == 2
    if not gray and arr.shape[2] != 3:
        raise ValueError("expected (H, W) or (H, W, 3) uint8")
    h, w = arr.shape[:2]
    qlum, qchrom = _quality_tables(quality)

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0,
                  "plane": arr - 128.0}]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        if mode not in ("444", "420", "422"):
            raise ValueError(f"unsupported subsample mode {subsample!r}")
        if mode != "444":
            fx, fy = (2, 2) if mode == "420" else (2, 1)
            ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
            cbp = _pad_to_blocks(cb, ph, pw)
            crp = _pad_to_blocks(cr, ph, pw)
            cb = cbp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            cr = crp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            sampling = [(fx, fy), (1, 1), (1, 1)]
        else:
            sampling = [(1, 1), (1, 1), (1, 1)]
        comps = [{"id": i + 1, "h": sh, "v": sv,
                  "tq": 0 if i == 0 else 1, "plane": p - 128.0}
                 for i, ((sh, sv), p) in
                 enumerate(zip(sampling, (y, cb, cr)))]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    dc_lum = _build_encode_table(*HUFF_DC_LUM)
    ac_lum = _build_encode_table(*HUFF_AC_LUM)
    dc_chrom = _build_encode_table(*HUFF_DC_CHROM)
    ac_chrom = _build_encode_table(*HUFF_AC_CHROM)

    # pre-tile each component into MCU-traversal block order and run the
    # DCT + quantize + zigzag for the WHOLE component in one einsum — the
    # per-MCU entropy loop below only reads precomputed (n, 64) rows
    for c in comps:
        bh, bw = mcuy * 8 * c["v"], mcux * 8 * c["h"]
        p = _pad_to_blocks(c["plane"], bh, bw)
        # raster blocks, then regroup into per-MCU (v, h) runs
        tiles = (p.reshape(mcuy, c["v"], 8, mcux, c["h"], 8)
                 .transpose(0, 3, 1, 4, 2, 5)
                 .reshape(-1, 8, 8))     # MCU-major, then v, h within MCU
        c["zz"] = _zigzag_rows(tiles, qlum if c["tq"] == 0 else qchrom)
        c["per_mcu"] = c["v"] * c["h"]

    n_mcu = mcux * mcuy
    out = bytearray()
    out += b"\xff\xd8"                                  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for tq, tbl in ([(0, qlum)] if gray else [(0, qlum), (1, qchrom)]):
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(int(x) for x in tbl[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, HUFF_DC_LUM)
    out += _dht_segment(1, 0, HUFF_AC_LUM)
    if not gray:
        out += _dht_segment(0, 1, HUFF_DC_CHROM)
        out += _dht_segment(1, 1, HUFF_AC_CHROM)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for i, c in enumerate(comps):
        tbl = 0 if i == 0 else 0x11
        sos += bytes([c["id"], tbl])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    wtr = _BitWriter()
    pred = [0] * len(comps)
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            out += wtr.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            wtr = _BitWriter()
            pred = [0] * len(comps)
        for i, c in enumerate(comps):
            k = c["per_mcu"]
            dct, act = (dc_lum, ac_lum) if i == 0 else (dc_chrom, ac_chrom)
            pred[i] = _encode_rows(wtr, c["zz"][m * k:(m + 1) * k],
                                   dct, act, pred[i])
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)
