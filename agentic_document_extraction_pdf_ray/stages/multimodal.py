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


class ResizeStub:
    """Actor-pool resize stage (image kernels absent → gated stub).

    Real plumbing: target geometry held per actor, aspect-preserving
    output dimensions computed vectorized from metadata, payload bytes
    passed through (a real kernel would re-encode them); rows without
    dimensions (width < 0) pass through untouched.
    """

    def __init__(self, max_side: int = 1024, deterministic_fake: bool = True):
        self.max_side = max_side
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image resize requires PIL — not in this container; run "
                "with deterministic_fake=True")
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        side = np.maximum(w, h)
        scale = np.where((side > self.max_side) & (w > 0),
                         self.max_side / np.maximum(side, 1.0), 1.0)
        new_w = np.where(w > 0, np.floor(w * scale + 0.5), w).astype(np.int32)
        new_h = np.where(h > 0, np.floor(h * scale + 0.5), h).astype(np.int32)
        out = batch.append_column("resized_width", pa.array(new_w, pa.int32()))
        out = out.append_column("resized_height", pa.array(new_h, pa.int32()))
        return out.append_column(
            "resize_scale", pa.array(scale, pa.float64()))


class FrameSampleStub:
    """Actor-pool video frame-sampling stage (ffmpeg absent → gated stub).

    Real plumbing: fps policy per actor, deterministic frame timestamps
    from duration metadata, one OUTPUT ROW PER FRAME (flat_map shape —
    the layout a downstream per-frame model stage consumes); non-video
    rows produce no frames.
    """

    def __init__(self, fps: float = 1.0, max_frames: int = 16,
                 deterministic_fake: bool = True):
        self.fps = fps
        self.max_frames = max_frames
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "frame sampling requires ffmpeg — not in this container; "
                "run with deterministic_fake=True")
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        payloads = batch["payload"].to_pylist()
        o_id, o_frame, o_ts, o_bytes = [], [], [], []
        for mid, kind, dur, payload in zip(ids, kinds, durs, payloads):
            if kind != "video" or dur is None or dur <= 0:
                continue
            n = min(self.max_frames, max(1, int(dur / 1000.0 * self.fps)))
            for f in range(n):
                ts = int((f + 0.5) * dur / n)        # mid-interval sampling
                digest = hashlib.md5(payload + ts.to_bytes(4, "little")).digest()
                o_id.append(mid)
                o_frame.append(f)
                o_ts.append(ts)
                o_bytes.append(digest)               # fake 16-byte "frame"
        return pa.table({
            "media_id": pa.array(o_id, pa.int64()),
            "frame_idx": pa.array(o_frame, pa.int32()),
            "ts_ms": pa.array(o_ts, pa.int32()),
            "frame": pa.array(o_bytes, pa.binary()),
        })


def sample_frames(ds, fps: float = 1.0, max_frames: int = 16,
                  concurrency=(1, 4), batch_size: int = 16):
    """Video rows → per-frame rows via the actor pool (tiny batches —
    video payloads are the fattest rows in the table)."""
    return ds.map_batches(FrameSampleStub, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size,
                          fn_constructor_kwargs={"fps": fps,
                                                 "max_frames": max_frames},
                          num_cpus=1)
