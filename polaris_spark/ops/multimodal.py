"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing — schemas, Arrow batch iteration via ``mapInPandas``,
partitioning by modality, explode-per-frame — is REAL and tested, and so is
the decode path for the uncompressed container formats, implemented
numpy-native right here (no external media libraries needed):

- **BMP** (24-bit BGR + 8-bit grayscale): :func:`decode_bmp` /
  :func:`encode_bmp` — header parse, row padding, bottom-up flip.
- **PPM** (netpbm P6, 8-bit): :func:`decode_ppm` / :func:`encode_ppm` —
  ASCII token header with comments, raw interleaved RGB.
- **PNG** (8-bit gray/RGB/palette/RGBA, non-interlaced):
  :func:`decode_png` / :func:`encode_png` — the first COMPRESSED format
  real in-container (round 5): stdlib zlib inflate + full filter
  reconstruction (None/Sub/Up/Average/Paeth).
- **JPEG** (baseline sequential DCT, gray + YCbCr 4:4:4/4:2:2/4:2:0,
  restart markers): ``ops/jpeg.py`` — the second COMPRESSED format real
  in-container (round 5): Huffman entropy layer, Annex K tables,
  orthonormal numpy IDCT; decoder spec-verified against a hand-assembled
  bitstream independent of the encoder.
- **GIF** (89a/87a, global+local color tables, interlace):
  :func:`decode_gif` / :func:`encode_gif` — the third COMPRESSED format
  real in-container (round 5): full variable-width LZW with CLEAR/EOI
  and 4096-entry table reset; decoder spec-verified against a
  hand-packed bitstream independent of the encoder.
- **WAV** (PCM 16/8-bit, RIFF): :func:`decode_wav` / :func:`encode_wav` —
  chunk walk, interleaved-channel reshape.
- **FLAC** (RFC 9639 subset): ``ops/flac.py`` — the first COMPRESSED
  audio format real in-container (round 5): CONSTANT/VERBATIM/FIXED/LPC
  subframes, Rice residuals with partitions + escape, all four stereo
  decorrelations, CRC-8/CRC-16 verification; decoder spec-verified
  against a hand-packed bitstream independent of the encoder.
- **MJPEG/AVI** (RIFF container, MJPG stream): :func:`encode_mjpeg_avi`
  / :func:`decode_mjpeg_avi` — the VIDEO modality made real (round 5):
  container walk (movi/rec lists, word alignment, junk skipping) over
  per-frame baseline JPEGs; :func:`sample_frames` extracts REAL
  standalone frames from it, and video features = first-frame pixels.

Real kernels built on them: :func:`image_featurizer` (grayscale histogram),
:func:`audio_featurizer` (8-band spectral energy via rfft),
:func:`bmp_resizer` (nearest-neighbor resample). The remaining opaque
codecs (mp3, ISO-BMFF mp4) stay import-gated on PIL/soundfile, which
this container lacks — :func:`media_featurizer` sniffs magic bytes and falls
back to the deterministic byte-level stub for those, so the pipeline is
total over arbitrary payloads. Swapping a codec only changes the per-batch
kernel body; schema, batch shape and partitioning stay.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

ASSET_SCHEMA = (
    "asset_id bigint, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, format:string>"
)

FEATURE_DIM = 8
FEATURES_SCHEMA = f"asset_id bigint, kind string, n_bytes bigint, features array<double>"
FRAMES_SCHEMA = "asset_id bigint, frame_idx int, frame_data binary"

KINDS = ["image", "audio", "video"]


def synth_assets(spark, n: int = 100, seed: int = 42):
    """Deterministic fake binary assets (md5-chain payloads) + metadata."""
    rows = []
    for i in range(n):
        kind = KINDS[i % 3]
        h = hashlib.md5(f"{seed}|{i}".encode()).digest()
        data = (h * (64 + i % 192))[: 1024 + (i * 37) % 4096]
        meta = {
            "width": 64 + i % 512 if kind == "image" else None,
            "height": 64 + (i * 3) % 512 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + i * 10 if kind != "image" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        }
        rows.append((i, kind, bytearray(data), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# --------------------------------------------------------------- codecs
# Real, numpy-native decode/encode for the uncompressed formats. At 100 TB
# these run inside Arrow-batched mapInPandas kernels (below) — per-batch
# Python dispatch, per-asset numpy work, zero per-row Spark overhead.


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP (BITMAPINFOHEADER; 24-bit BGR or 8-bit
    grayscale-palette) → uint8 array of shape (H, W, 3) RGB. Handles
    4-byte row padding and bottom-up row order. Raises ValueError on
    non-BMP / compressed / unsupported depth."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    hsz, w, h = struct.unpack_from("<Iii", data, 14)
    if hsz < 40:
        raise ValueError(f"unsupported BMP header size {hsz}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0:
        raise ValueError(f"compressed BMP (method {comp}) unsupported")
    flip = h > 0
    h = abs(h)
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        px = np.frombuffer(data, np.uint8, stride * h, off)
        px = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = px[:, :, ::-1]  # BGR → RGB
    elif bpp == 8:
        ncol = struct.unpack_from("<I", data, 46)[0] or 256
        pal = np.frombuffer(data, np.uint8, ncol * 4, 14 + hsz)
        pal = pal.reshape(ncol, 4)[:, :3][:, ::-1]  # BGRA → RGB
        stride = (w + 3) & ~3
        idx = np.frombuffer(data, np.uint8, stride * h, off)
        rgb = pal[idx.reshape(h, stride)[:, :w]]
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return (rgb[::-1] if flip else rgb).copy()


def encode_bmp(rgb: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bit uncompressed BMP bytes (bottom-up,
    4-byte row padding) — the exact inverse of :func:`decode_bmp`."""
    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    body = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + body


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, 8-bit maxval) → uint8 (H, W, 3) RGB —
    the other no-dependency image container (netpbm). Header is ASCII
    tokens (``P6 <w> <h> <maxval>``) with ``#`` comments; pixel data is
    raw interleaved RGB. Raises ValueError on non-P6 / 16-bit payloads."""
    if len(data) < 2 or data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    toks, pos = [], 2
    while len(toks) < 3 and pos < len(data):
        c = data[pos:pos + 1]
        if c == b"#":  # comment to end-of-line
            pos = data.find(b"\n", pos)
            if pos < 0:
                raise ValueError("truncated PPM header")
            pos += 1
        elif c.isspace():
            pos += 1
        else:
            j = pos
            while j < len(data) and not data[j:j + 1].isspace():
                j += 1
            toks.append(data[pos:j])
            pos = j
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxv = (int(t) for t in toks)
    if maxv != 255:
        raise ValueError(f"unsupported PPM maxval {maxv}")
    pos += 1  # single whitespace byte after maxval, then raw pixels
    px = np.frombuffer(data, np.uint8, w * h * 3, pos)
    return px.reshape(h, w, 3).copy()


def encode_ppm(rgb: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → binary P6 PPM bytes — the exact inverse of
    :func:`decode_ppm`."""
    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> np.ndarray:
    """Pure-numpy PNG decode — the first COMPRESSED format real
    in-container (round 5): stdlib ``zlib`` inflate + per-row filter
    reversal per the PNG spec. Supports 8-bit depth, non-interlaced,
    color types 0 (grayscale → (H, W)), 2 (RGB → (H, W, 3)),
    3 (palette → (H, W, 3)) and 6 (RGBA → (H, W, 4)). Filter
    reconstruction: None/Up are pure vector ops, Sub is a per-channel
    prefix sum (cumsum mod 256), Average/Paeth run the spec's sequential
    recurrences. Raises ValueError on non-PNG / unsupported variants
    (16-bit, interlace, gray+alpha)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8: pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", ihdr)
    ch = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype)
    if depth != 8 or ilace != 0 or comp != 0 or filt != 0 or ch is None:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={ctype}, "
            f"interlace={ilace})")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes, filtered = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f, cur = int(ftypes[y]), filtered[y]
        if f == 0:
            rec = cur.copy()
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-ch] → prefix sum
            rec = (np.cumsum(cur.reshape(w, ch), axis=0, dtype=np.int64)
                   % 256).astype(np.int32).reshape(stride)
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, np.int32)
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (cur[i] + (left + prev[i]) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b, c = prev[i], (prev[i - ch] if i >= ch else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                rec[i] = (cur[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    arr = out.astype(np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return pal[arr.reshape(h, w)]
    arr = arr.reshape(h, w, ch)
    return arr[:, :, 0] if ctype == 0 else arr


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W) grayscale, (H, W, 3) RGB or (H, W, 4) RGBA → PNG
    bytes (filter 0 rows, one zlib stream) — inverse of
    :func:`decode_png` for these shapes."""
    import zlib

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.shape[2] == 3:
        ctype, ch = 2, 3
    elif arr.shape[2] == 4:
        ctype, ch = 6, 4
    else:
        raise ValueError(f"unsupported channel count {arr.shape[2]}")
    h, w = arr.shape[:2]
    scan = np.zeros((h, w * ch + 1), np.uint8)
    scan[:, 1:] = arr.reshape(h, w * ch)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + chunk(b"IEND", b""))


def _gif_lzw_decode(data: bytes, mcs: int) -> bytes:
    """GIF-flavor LZW decompress (variable code width ``mcs+1``..12,
    LSB-first bit packing, CLEAR/EOI control codes, early width change
    when the table reaches ``2^width``) → raw palette indices."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table, width = list(base), mcs + 1
    out, prev = bytearray(), None
    bitbuf = nbits = pos = 0
    n = len(data)
    while True:
        while nbits < width and pos < n:
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break  # stream ended without EOI: tolerate, like most readers
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table, width, prev = list(base), mcs + 1, None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad GIF LZW stream (first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("bad GIF LZW code")
        if len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """Pure-numpy GIF decode — the third COMPRESSED image format real
    in-container (round 5): full LZW decompression (variable code width,
    CLEAR/EOI, 4096-entry table) per the GIF89a spec. Returns the FIRST
    image block as (H, W, 3) RGB via its (local-over-global) color
    table; supports interlaced row order; extensions (GCE/comment/
    application) are skipped — transparency renders as its palette
    color. Raises ValueError on non-GIF payloads."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 14:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos, gct = 13, None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos: pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _l, _t, w, h, ipack = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if ipack & 0x80:  # local color table wins
            n = 2 << (ipack & 0x07)
            pal = np.frombuffer(data[pos: pos + 3 * n],
                                np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"bad GIF LZW min code size {mcs}")
        sub = bytearray()
        while data[pos]:
            ln = data[pos]
            sub += data[pos + 1: pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_gif_lzw_decode(bytes(sub), mcs)[: w * h],
                            np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        grid = idx.reshape(h, w)
        if ipack & 0x40:  # interlaced: 4-pass row order
            rows = np.concatenate([np.arange(o, h, s)
                                   for o, s in ((0, 8), (4, 8),
                                                (2, 4), (1, 2))])
            deinter = np.empty_like(grid)
            deinter[rows] = grid
            grid = deinter
        if int(grid.max(initial=0)) >= len(pal):
            raise ValueError("GIF index outside color table")
        return pal[grid]
    raise ValueError("GIF contains no image block")


def quantize_colors(rgb: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Median-cut palette quantization (Heckbert 1982), pure numpy:
    reduce an RGB image to ≤ ``n_colors`` distinct colors. Works on the
    UNIQUE colors weighted by pixel counts: repeatedly split the
    most-populous splittable box along its widest channel at the
    pixel-weighted median, then paint each box with its weighted mean
    color. Images already within the budget pass through UNCHANGED
    (exact identity — no palette snap). Deterministic."""
    arr = np.asarray(rgb, dtype=np.uint8)
    gray = arr.ndim == 2
    if gray:
        arr = np.stack([arr] * 3, axis=-1)
    h, w, _ = arr.shape
    uniq, inv, cnt = np.unique(arr.reshape(-1, 3), axis=0,
                               return_inverse=True, return_counts=True)
    if len(uniq) > n_colors:
        u = uniq.astype(np.int32)
        boxes = [np.arange(len(u))]  # index sets over unique colors
        while len(boxes) < n_colors:
            # most-populous box that still has >1 unique color
            pick, best = -1, 0
            for bi, idx in enumerate(boxes):
                if len(idx) > 1 and int(cnt[idx].sum()) > best:
                    pick, best = bi, int(cnt[idx].sum())
            if pick < 0:
                break
            idx = boxes[pick]
            ch = int(np.argmax(u[idx].max(0) - u[idx].min(0)))
            order = idx[np.argsort(u[idx, ch], kind="stable")]
            csum = np.cumsum(cnt[order])
            # weighted median split point, clamped so both halves are
            # non-empty even when one color holds most of the mass
            cut = int(np.searchsorted(csum, csum[-1] / 2)) + 1
            cut = min(max(cut, 1), len(order) - 1)
            boxes[pick] = order[:cut]
            boxes.append(order[cut:])
        pal = np.empty((len(boxes), 3), np.uint8)
        box_of = np.empty(len(u), np.int64)
        for bi, idx in enumerate(boxes):
            wsum = cnt[idx].astype(np.float64)
            pal[bi] = np.floor(
                (u[idx] * wsum[:, None]).sum(0) / wsum.sum() + 0.5)
            box_of[idx] = bi
        arr = pal[box_of[inv]].reshape(h, w, 3)
    return arr[:, :, 0] if gray else arr


def encode_gif(rgb: np.ndarray, quantize: bool = False) -> bytes:
    """uint8 (H, W, 3) RGB or (H, W) grayscale → single-frame GIF89a
    bytes (global color table + LZW, CLEAR emitted on table overflow) —
    inverse of :func:`decode_gif`. GIF is palette-indexed, so the image
    must use ≤256 distinct colors; pass ``quantize=True`` to apply
    median-cut (:func:`quantize_colors`) first — the explicit lossy
    production path — else >256 colors raises ValueError (lossy
    behavior is never silent)."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if quantize:
        arr = quantize_colors(arr, 256)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w, _ = arr.shape
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError(f"GIF dimensions must be 1..65535, got {w}x{h}")
    flat = arr.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF needs <=256 colors, image has {len(pal)}")
    mcs = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    table_n = 1 << mcs  # color table size must be a power of two
    pal_bytes = np.zeros((table_n, 3), np.uint8)
    pal_bytes[: len(pal)] = pal
    clear, eoi = table_n, table_n + 1

    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    codes: dict[tuple[int, int], int] = {}
    width, next_code = mcs + 1, eoi + 1
    idx = inv.astype(np.int32).ravel()
    emit(clear, width)
    cur = int(idx[0])
    for sym in map(int, idx[1:]):
        key = (cur, sym)
        hit = codes.get(key)
        if hit is not None:
            cur = hit
            continue
        emit(cur, width)
        if next_code == 4096:  # table full: reset both sides
            emit(clear, width)
            codes.clear()
            width, next_code = mcs + 1, eoi + 1
        else:
            codes[key] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = sym
    emit(cur, width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)

    head = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (mcs - 1), 0, 0)
            + pal_bytes.tobytes()
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([mcs]))
    body = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i: i + 255]
        body += bytes([len(chunk)]) + chunk
    return bytes(head) + bytes(body) + b"\x00\x3b"


_AVI_MAGIC = (b"RIFF", b"AVI ")


def _is_avi(data: bytes) -> bool:
    return data[:4] == _AVI_MAGIC[0] and data[8:12] == _AVI_MAGIC[1]


def _avi_frame_payloads(data: bytes) -> list[bytes]:
    """RIFF/AVI container walk (same chunk discipline as the WAV
    parser): collect the video-frame chunks (``??dc``/``??db``) inside
    ``movi`` lists, recursing through ``rec `` groupings; header lists
    are skipped — each returned payload is one standalone encoded
    frame."""
    if not _is_avi(data):
        raise ValueError("not an AVI payload")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos: pos + 4]
            sz = struct.unpack_from("<I", data, pos + 4)[0]
            body = pos + 8
            if cid == b"LIST" and data[body: body + 4] in (b"movi", b"rec "):
                walk(body + 4, min(body + sz, len(data)))
            elif cid[2:4] in (b"dc", b"db") and sz:
                frames.append(data[body: body + sz])
            pos = body + sz + (sz & 1)  # chunks are word-aligned

    walk(12, len(data))
    return frames


def encode_mjpeg_avi(frames, fps: int = 10, quality: int = 90) -> bytes:
    """Frames (list of uint8 (H, W[, 3]) arrays, or one (N, H, W, 3)
    array) → a minimal RIFF/AVI container with an MJPG video stream —
    every frame its own baseline JPEG (``ops/jpeg.py``), so the result
    is a REAL video payload decodable frame-independently. Writes
    avih/strh/strf headers and a keyframe idx1 (every MJPEG frame is a
    keyframe)."""
    from polaris_spark.ops.jpeg import encode_jpeg

    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (cid + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    def lst(typ: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", typ + body)

    n = len(frames)
    avih = struct.pack("<14I", 1_000_000 // max(1, fps), 0, 0, 0x10, n,
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, max(1, fps),
                          0, n, 0, 0, 0, 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body, idx, off = b"", b"", 4
    for p in payloads:
        movi_body += chunk(b"00dc", p)
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    riff = b"AVI " + hdrl + lst(b"movi", movi_body) + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_mjpeg_avi(data: bytes) -> np.ndarray:
    """MJPEG/AVI → (n_frames, H, W, 3) uint8 RGB via the in-container
    JPEG decoder — the video analog of :func:`_decode_rgb`. Raises
    ValueError on non-AVI payloads or an AVI with no video frames."""
    from polaris_spark.ops.jpeg import decode_jpeg

    payloads = _avi_frame_payloads(data)
    if not payloads:
        raise ValueError("AVI contains no video frames")
    out = []
    for p in payloads:
        a = decode_jpeg(p)
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=-1)
        out.append(a[:, :, :3])
    return np.stack(out)


def _decode_rgb(data: bytes) -> np.ndarray:
    """Route a binary image payload to its real decoder
    (PNG/JPEG/GIF/PPM/BMP) and normalize to (H, W, 3) RGB."""
    if data[:8] == _PNG_SIG:
        a = decode_png(data)
    elif data[:3] == b"\xff\xd8\xff":
        from polaris_spark.ops.jpeg import decode_jpeg

        a = decode_jpeg(data)
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        a = decode_gif(data)
    elif data[:2] == b"P6":
        return decode_ppm(data)
    else:
        return decode_bmp(data)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    return a[:, :, :3]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM payload (16-bit signed or 8-bit unsigned) →
    (samples, sample_rate); samples are float64 in [-1, 1], shape
    (n_samples,) mono or (n_samples, n_channels). Walks the chunk list
    (fmt/data may be preceded by LIST etc.). Raises ValueError on
    non-WAV / non-PCM payloads."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, sz = data[pos:pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8: pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    codec, nch, rate, _bps, _align, bits = fmt
    if codec != 1:
        raise ValueError(f"non-PCM WAV (format {codec}) unsupported")
    if bits == 16:
        s = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        s = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if nch > 1:
        s = s[: len(s) - len(s) % nch].reshape(-1, nch)
    return s, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float64 [-1, 1] (mono or (n, ch)) → 16-bit PCM WAV bytes — the
    exact inverse of :func:`decode_wav` (up to int16 quantization)."""
    arr = np.asarray(samples, dtype=np.float64)
    nch = 1 if arr.ndim == 1 else arr.shape[1]
    pcm = np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2")
    body = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def synth_media_assets(spark, n: int = 60, seed: int = 42):
    """Deterministic REAL media payloads: BMP gradients+noise (image),
    PCM sine-mix WAVs (audio), and opaque md5-chain blobs (video — stands
    in for a compressed container, exercising the stub fallback). Same
    schema as :func:`synth_assets`; every image/audio payload round-trips
    through :func:`decode_bmp` / :func:`decode_wav`."""
    rows = []
    for i in range(n):
        kind = KINDS[i % 3]
        rng = np.random.default_rng(seed * 100_003 + i)
        if kind == "image":
            w, h = 16 + (i % 5) * 8, 16 + ((i * 3) % 5) * 8
            grad = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
            px = np.clip(grad[..., None] + rng.integers(0, 64, (h, w, 3)),
                         0, 255).astype(np.uint8)
            data, meta = encode_bmp(px), {
                "width": w, "height": h, "sample_rate": None,
                "duration_ms": None, "format": "bmp"}
        elif kind == "audio":
            rate, dur_ms = 8000, 250 + (i % 4) * 125
            t = np.arange(int(rate * dur_ms / 1000)) / rate
            f0 = 200.0 + (i % 7) * 110.0
            s = 0.6 * np.sin(2 * np.pi * f0 * t) \
                + 0.25 * np.sin(2 * np.pi * 2.5 * f0 * t) \
                + 0.05 * rng.standard_normal(len(t))
            data, meta = encode_wav(np.clip(s, -1, 1), rate), {
                "width": None, "height": None, "sample_rate": rate,
                "duration_ms": dur_ms, "format": "wav"}
        else:
            blob = hashlib.md5(f"{seed}|{i}".encode()).digest()
            data, meta = (blob * 200)[: 2048 + i * 13], {
                "width": None, "height": None, "sample_rate": None,
                "duration_ms": 1000 + i * 10, "format": "mp4"}
        rows.append((i, kind, bytearray(data), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def stub_featurizer(data: bytes) -> list[float]:
    """STUB per-asset featurizer: deterministic byte-histogram moments.
    Same signature as a real one (bytes → FEATURE_DIM floats)."""
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    hist = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))[0]
    total = hist.sum() or 1
    return (hist / total).round(6).tolist()


def image_featurizer(data: bytes) -> list[float]:
    """REAL image featurizer over decoded pixels (BMP/PPM/PNG/JPEG/GIF,
    numpy-native): grayscale luminance histogram, FEATURE_DIM bins,
    L1-normalized — same contract as :func:`stub_featurizer`
    (bytes → FEATURE_DIM floats)."""
    rgb = _decode_rgb(data)
    gray = rgb @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(gray, bins=FEATURE_DIM, range=(0, 256))[0]
    total = hist.sum() or 1
    return (hist / total).round(6).tolist()


def _decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Route a binary audio payload to its real decoder (WAV/FLAC) and
    return float64 samples in [-1, 1] — the audio analog of
    :func:`_decode_rgb` (FLAC's integer PCM is normalized to match
    :func:`decode_wav`'s contract)."""
    if data[:4] == b"fLaC":
        from polaris_spark.ops.flac import decode_flac

        s, rate = decode_flac(data)
        full = 32768.0 if s.dtype == np.int16 else 2147483648.0
        return s.astype(np.float64) / full, rate
    return decode_wav(data)


def audio_featurizer(data: bytes) -> list[float]:
    """REAL audio featurizer over decoded samples (WAV/FLAC):
    FEATURE_DIM log-spaced spectral-band energies (rfft power, L1-norm) —
    same contract as :func:`stub_featurizer`."""
    s, _rate = _decode_audio(data)
    if s.ndim > 1:
        s = s.mean(axis=1)
    if not len(s):
        return [0.0] * FEATURE_DIM
    p = np.abs(np.fft.rfft(s)) ** 2
    edges = np.unique(np.geomspace(1, len(p), FEATURE_DIM + 1).astype(int))
    bands = np.add.reduceat(p, np.r_[0, edges[:-1]])[:FEATURE_DIM]
    bands = np.pad(bands, (0, FEATURE_DIM - len(bands)))
    total = bands.sum() or 1.0
    return (bands / total).round(6).tolist()


def media_featurizer(data: bytes) -> list[float]:
    """Total featurizer: magic-byte sniff → real BMP/WAV kernel, anything
    else (compressed codecs this container can't decode) → the
    deterministic byte-level stub. The swap point production would use to
    route png/jpeg through PIL stays :func:`decode_features`'s
    ``featurizer`` argument."""
    try:
        if (data[:2] in (b"BM", b"P6") or data[:8] == _PNG_SIG
                or data[:3] == b"\xff\xd8\xff"
                or data[:6] in (b"GIF87a", b"GIF89a")):
            return image_featurizer(data)
        if (data[:4] == b"RIFF" and data[8:12] == b"WAVE") \
                or data[:4] == b"fLaC":
            return audio_featurizer(data)
        if _is_avi(data):
            frames = _avi_frame_payloads(data)
            if frames:  # video features = first-frame pixel histogram
                return image_featurizer(frames[0])
    except ValueError:
        pass  # malformed header: fall through to the byte-level stub
    return stub_featurizer(data)


def bmp_resizer(data: bytes, width: int, height: int) -> bytes:
    """REAL resize (BMP/PPM/PNG/JPEG/GIF): decode, grayscale,
    nearest-neighbor
    resample with numpy index maps → w×h luminance bytes — same contract
    as :func:`stub_resizer` (bytes, w, h → width*height bytes)."""
    rgb = _decode_rgb(data)
    gray = (rgb @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    h, w = gray.shape
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return gray[np.ix_(yi, xi)].tobytes()


def media_resizer(data: bytes, width: int, height: int) -> bytes:
    """Total resizer: real decode-and-resample for the in-container
    image codecs (BMP/PPM/PNG/JPEG/GIF), deterministic byte-level stub
    for anything else — the resize analog of :func:`media_featurizer`."""
    try:
        return bmp_resizer(data, width, height)
    except Exception:
        return stub_resizer(data, width, height)


def pil_featurizer(data: bytes) -> list[float]:
    """Real image featurizer — import-gated; raises in this container.
    Contract: identical signature/shape as :func:`stub_featurizer`, so the
    swap is drop-in (verified by the kernel contract test)."""
    img = decode_image(data)  # raises NotImplementedError without PIL
    arr = np.asarray(img.convert("L"), dtype=np.float64)
    hist = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))[0]
    total = hist.sum() or 1
    return (hist / total).round(6).tolist()


def decode_features(assets, featurizer=stub_featurizer):
    """mapInPandas feature extraction over binary payloads.

    The Arrow plumbing (schema, batch iteration, column shapes) is FINAL;
    ``featurizer`` (bytes → FEATURE_DIM floats) is the only swap point
    between the deterministic stub and a real decoder (PIL/soundfile).
    Output schema is featurizer-independent — contract-tested."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(len).astype("int64"),
                    "features": [featurizer(bytes(b)) for b in pdf["data"]],
                }
            )

    return assets.select("asset_id", "kind", "data").mapInPandas(kernel, FEATURES_SCHEMA)


def media_frame_extractor(data: bytes, n_frames: int) -> list[bytes]:
    """Total frame extractor: REAL equal-spaced frames for MJPEG/AVI
    payloads (each returned bytes is one standalone decodable JPEG),
    the deterministic byte-slice stub for opaque containers this box
    can't decode (mp4) — the frame analog of :func:`media_featurizer`."""
    if _is_avi(data):
        try:
            payloads = _avi_frame_payloads(data)
        except ValueError:
            payloads = []
        if payloads:
            return [payloads[(f * len(payloads)) // n_frames]
                    for f in range(n_frames)]
    step = max(1, len(data) // n_frames)
    return [data[f * step:(f + 1) * step] for f in range(n_frames)]


def sample_frames(assets, n_frames: int = 4,
                  extractor=media_frame_extractor):
    """Per-video frame sampling: explode each video asset into n_frames
    rows. ``extractor`` (bytes, n → n payloads) is the swap point:
    the default pulls REAL frames out of MJPEG/AVI containers and falls
    back to equal-spaced byte slices for opaque formats; the explode /
    row-multiplication plumbing is format-independent."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_data = [], [], []
            for aid, b in zip(pdf["asset_id"], pdf["data"]):
                for f, payload in enumerate(extractor(bytes(b), n_frames)):
                    out_id.append(aid)
                    out_idx.append(f)
                    out_data.append(payload)
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_idx": out_idx, "frame_data": out_data}
            )

    videos = assets.where("kind = 'video'")
    return videos.select("asset_id", "data").mapInPandas(kernel, FRAMES_SCHEMA)


def decode_image(data: bytes):
    """Real image decode — import-gated; raises in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL (not in this container); "
            "decode_features provides the deterministic stub path"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(data))


def stub_resizer(data: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic fixed-size digest bytes standing in for
    resized pixels (same output length a real w×h grayscale buffer has)."""
    reps = (width * height) // 16 or 1
    return (hashlib.md5(data).digest() * reps)[: width * height]


def pil_resizer(data: bytes, width: int, height: int) -> bytes:
    """Real resize — import-gated on PIL; identical signature/shape as
    :func:`stub_resizer` (contract-tested drop-in)."""
    img = decode_image(data)  # raises NotImplementedError without PIL
    return img.convert("L").resize((width, height)).tobytes()


def resize_images(assets, width: int = 32, height: int = 32,
                  resizer=stub_resizer):
    """Image resize over binary columns. The Arrow plumbing (schema,
    batching, modality filter) is final; ``resizer`` (bytes, w, h → bytes)
    is the only swap point between the stub and PIL."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "resized": [resizer(bytes(b), width, height)
                                for b in pdf["data"]],
                    "width": width,
                    "height": height,
                }
            )

    images = assets.where("kind = 'image'").repartition("kind")
    return images.select("asset_id", "data").mapInPandas(
        kernel, "asset_id bigint, resized binary, width int, height int"
    )
