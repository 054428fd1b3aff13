"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing — schemas, Arrow batch iteration via ``mapInPandas``,
partitioning by modality, explode-per-frame — is REAL and tested. The actual
media decoding is STUBBED: the container has no image/audio libraries, so
``decode_features`` uses a deterministic byte-level fake, and
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
PIL/soundfile are importable (import-gated). Swapping in a real decoder only
changes the per-batch kernel body; schema, batch shape and partitioning stay.
"""

from __future__ import annotations

import hashlib
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


def stub_featurizer(data: bytes) -> list[float]:
    """STUB per-asset featurizer: deterministic byte-histogram moments.
    Same signature as a real one (bytes → FEATURE_DIM floats)."""
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    hist = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))[0]
    total = hist.sum() or 1
    return (hist / total).round(6).tolist()


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


def sample_frames(assets, n_frames: int = 4):
    """Per-video frame sampling: explode each video asset into n_frames
    equal-spaced byte slices (stub for real frame extraction; the explode /
    row-multiplication plumbing is the real part)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_data = [], [], []
            for aid, b in zip(pdf["asset_id"], pdf["data"]):
                raw = bytes(b)
                step = max(1, len(raw) // n_frames)
                for f in range(n_frames):
                    out_id.append(aid)
                    out_idx.append(f)
                    out_data.append(raw[f * step:(f + 1) * step])
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
