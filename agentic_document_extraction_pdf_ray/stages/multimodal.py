"""Multimodal columns: opaque binary payloads + actor-pool decode plumbing.

The reference renders PDF pages to PNG bytes and ships them as base64 data
URIs (``/root/reference/src/preprocessing/pdf_processor.py:134-211``). At
100 TB, image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The image/audio libraries are NOT in this
container, so the decode kernel is STUBBED: ``DecodeStub`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, in which case
it produces a seeded, reproducible fake feature vector — the Ray-side
plumbing (schema, batch size, actor signature, output layout) is real and
tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 64


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (binary payload + typed metadata)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(256 + (i % 7) * 64) for i in range(n)],
        "mime": ["image/png" if i % 3 == 0 else
                 "audio/wav" if i % 3 == 1 else "video/mp4" for i in range(n)],
        "width": [640 if i % 3 == 0 else -1 for i in range(n)],
        "height": [480 if i % 3 == 0 else -1 for i in range(n)],
        "duration_ms": [-1 if i % 3 == 0 else 1000 + i for i in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeStub:
    """Actor-pool decode/feature stage with a stubbed media kernel.

    Real deployments replace ``_decode_features`` with PIL/torchaudio/ffmpeg
    calls in ``__init__``-loaded libraries; everything around it (batch
    schema in/out, small batch sizes for large payloads, once-per-actor
    setup) stays identical.
    """

    def __init__(self, deterministic_fake: bool = True, dim: int = FEATURE_DIM):
        self.fake = deterministic_fake
        self.dim = dim

    def _decode_features(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires PIL/torchaudio/ffmpeg — not in this "
                "container; run with deterministic_fake=True")
        # Seeded by payload content → reproducible across workers.
        digest = hashlib.md5(payload).digest()
        seed = int.from_bytes(digest[:4], "little")
        rng = np.random.RandomState(seed)
        return rng.rand(self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = [self._decode_features(p, k).tolist()
                 for p, k in zip(payloads, kinds)]
        out = batch.drop_columns(["payload"])     # decoded: drop heavy bytes
        return out.append_column(
            "features", pa.array(feats, pa.list_(pa.float32())))


def decode_media(ds, concurrency=(1, 4), batch_size: int = 64):
    """Attach features via the actor pool; SMALL batches — payloads are fat
    (batch_size × payload × concurrency must fit the worker heap)."""
    return ds.map_batches(DecodeStub, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=1)


ORIENT_PORTRAIT = "portrait"
ORIENT_LANDSCAPE = "landscape"
ORIENT_SQUARE = "square"


def detect_orientation(width: int, height: int) -> str:
    """Page orientation from dimensions (reference
    ``/root/reference/src/preprocessing/base_processor.py:98-104``)."""
    if width > height:
        return ORIENT_LANDSCAPE
    if height > width:
        return ORIENT_PORTRAIT
    return ORIENT_SQUARE


def orient_batch(batch: pa.Table) -> pa.Table:
    """Vectorized orientation column over media metadata (unknown dims,
    encoded as -1, classify as ``square`` like equal dims — callers gate
    on width >= 0 when that matters)."""
    w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
    orient = np.where(w > h, ORIENT_LANDSCAPE,
                      np.where(h > w, ORIENT_PORTRAIT, ORIENT_SQUARE))
    return batch.append_column("orientation",
                               pa.array(orient.tolist(), pa.string()))
