"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride the pipeline as ``binary`` columns with metadata
columns (mime, width/height/duration).  The Ray-side plumbing — schema,
actor-pool stage shape, small-batch sizing, output layout — is real and
tested; the actual codec work is STUBBED (decode libs are not in this
container): ``decode_stub=True`` produces deterministic fake features,
``decode_stub=False`` raises ``NotImplementedError`` where a real
``PIL.Image.open`` / ``soundfile.read`` call belongs.

Scale notes: payload stages must use SMALL batch sizes (``batch_size=B`` with
B × payload_size × concurrency bounded by worker heap) and an actor pool
(model/codec init per worker).  ``ray.data`` spills oversized binary blocks
to the object store automatically; keep ``target_max_block_size`` in mind for
>10 MB payloads.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synthesize_media(n: int, *, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (stands in for an image corpus)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(payload_bytes) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * n, pa.string()),
            "width": pa.array(rng.integers(64, 2048, n, dtype=np.int32)),
            "height": pa.array(rng.integers(64, 2048, n, dtype=np.int32)),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode → feature-extract per batch.

    ``__init__`` is where a real implementation loads the codec / model once
    per actor.  ``__call__`` is vectorized over the batch.
    """

    def __init__(self, *, decode_stub: bool = True, feature_dim: int = FEATURE_DIM):
        self.decode_stub = decode_stub
        self.feature_dim = feature_dim
        # real impl: self.model = load_model(...); compiled transforms, etc.

    def _decode(self, payload: bytes, mime: str) -> np.ndarray:
        if not self.decode_stub:
            raise NotImplementedError(
                "real decode requires an image/audio codec (PIL/soundfile), "
                "not available in this environment"
            )
        # deterministic fake 'pixels': md5-seeded values
        digest = hashlib.md5(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        return np.random.default_rng(seed).random(self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        feats = np.stack(
            [self._decode(p, m) for p, m in zip(payloads, mimes)]
        ).astype(np.float32)
        flat = pa.array(feats.reshape(-1))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "feature": pa.FixedSizeListArray.from_arrays(flat, self.feature_dim),
            }
        )


def extract_media_features(
    ds: Dataset,
    *,
    batch_size: int = 64,
    concurrency: int = 2,
    decode_stub: bool = True,
) -> Dataset:
    """The canonical multimodal stage: actor pool, small batches (payloads are
    heavy), zero-copy Arrow in/out."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_stub": decode_stub},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def resize_stub(batch: pa.Table, *, max_side: int = 512) -> pa.Table:
    """Resize planning (pure-metadata part is real; pixel work is stubbed):
    computes target dims preserving aspect ratio."""
    w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
    h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    return batch.append_column(
        "target_width", pa.array((w * scale).astype(np.int32))
    ).append_column("target_height", pa.array((h * scale).astype(np.int32)))
