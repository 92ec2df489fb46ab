"""Actor-pool model stage: a deterministic stub "layout scorer".

Stands in for the reference's VLM agent stages
(``/root/reference/src/agents/analyzer.py:111-138``, extractor
``src/agents/extractor.py:74-153`` — HTTP model clients held per agent):
the model is "loaded" ONCE per actor in ``__init__`` (a seeded random
projection matrix over hashed character n-gram features) and ``__call__``
scores whole Arrow batches vectorized. In CI the stub keeps every result
deterministic, so pipeline-vs-oracle equality still holds; swapping in a
real model changes only ``__init__``.

Usage:
    ds.map_batches(LayoutScorer, batch_format="pyarrow",
                   concurrency=(2, 8), batch_size=2048, num_cpus=1)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_DIM = 256          # hashed feature dim
_SEED = 42


class LayoutScorer:
    """Stateful stage: weights built once per actor, batches scored in
    ``__call__``. Output column ``layout_score`` ∈ [0, 1]."""

    def __init__(self, seed: int = _SEED, dim: int = _DIM):
        rng = np.random.RandomState(seed)
        self.dim = dim
        self.w = rng.randn(dim)
        self.b = float(rng.randn())

    def _features(self, texts: list[str]) -> np.ndarray:
        import zlib
        out = np.zeros((len(texts), self.dim), np.float64)
        for i, t in enumerate(texts):
            s = (t or "")[:2000]
            enc = s.encode("utf-8", "ignore")
            for j in range(len(enc) - 2):
                out[i, zlib.crc32(enc[j:j + 3]) % self.dim] += 1.0
        n = np.linalg.norm(out, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return out / n

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = "extracted_text" if "extracted_text" in batch.column_names else "text"
        texts = batch[col].to_pylist()
        x = self._features(texts)
        score = 1.0 / (1.0 + np.exp(-(x @ self.w + self.b)))
        return batch.append_column("layout_score",
                                   pa.array(score, pa.float64()))


def score_layout(ds, concurrency=(2, 4), batch_size: int = 2048):
    """Attach layout_score via the actor pool."""
    return ds.map_batches(LayoutScorer, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=1)


class SelfCorrectingExtractor:
    """Bounded in-row retry actor: the reference's retry/self-correction
    loop (``/root/reference/src/extraction/multi_record.py:1038-1196``,
    graph retry ``src/pipeline/state.py:788-823`` max_retries=2 →
    human_review) kept INSIDE the UDF — never a dataset-level cycle
    (SURVEY.md §7.5). A low-confidence turn is re-extracted with a fallback
    view (whitespace-normalized full text, no boilerplate strip); if still
    low, the row is marked for review in a ``status`` column instead of
    raising.
    """

    MAX_RETRIES = 2

    def __init__(self, low_threshold: float = 0.5):
        self.low = low_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.confidence import (
            ACTION_AUTO_ACCEPT, ACTION_HUMAN_REVIEW, confidence_action,
        )
        from ..functions.extract import extract_turn
        texts = batch["text"].to_pylist()
        roles = batch["role"].to_pylist() if "role" in batch.column_names \
            else ["user"] * batch.num_rows
        out_text, out_conf, out_status, out_retries = [], [], [], []
        for t, role in zip(texts, roles):
            r = extract_turn(t, role or "user", "")
            retries = 0
            while r["confidence"] < self.low and retries < self.MAX_RETRIES:
                retries += 1
                # fallback view: treat as opaque payload (no block strip)
                r2 = extract_turn(t, "tool", "")
                if r2["confidence"] <= r["confidence"]:
                    break              # deterministic fallback won't improve
                r = r2
            out_text.append(r["extracted_text"])
            out_conf.append(r["confidence"])
            out_retries.append(retries)
            action = confidence_action(r["confidence"])
            out_status.append(
                "ok" if action == ACTION_AUTO_ACCEPT else
                "review" if action == ACTION_HUMAN_REVIEW else "retry_done")
        return pa.table({
            "text": batch["text"],
            "extracted_text": pa.array(out_text, pa.string()),
            "confidence": pa.array(out_conf, pa.float64()),
            "retries": pa.array(out_retries, pa.int32()),
            "status": pa.array(out_status, pa.string()),
        })


# ---------------------------------------------------------------------------
# Backend protocol + factory (the reference's VLM client factory surface,
# /root/reference/src/client/factory.py — named backends constructed from
# config, each holding its connection/weights per worker). A backend is any
# callable CLASS usable as a map_batches actor: heavy setup in __init__,
# batch scoring in __call__. Registering a real model backend is the ONLY
# step needed to swap inference in; every pipeline references backends by
# name through make_backend.

_BACKENDS: dict[str, type] = {}


def register_backend(name: str, cls: type) -> None:
    if name in _BACKENDS:
        raise ValueError(f"backend {name!r} already registered")
    if not callable(getattr(cls, "__call__", None)):
        raise TypeError(f"backend {cls!r} must be a callable class")
    _BACKENDS[name] = cls


def make_backend(name: str, **kwargs):
    """Instantiate a named backend (driver-side probe / tests)."""
    return backend_class(name)(**kwargs)


def backend_class(name: str) -> type:
    """The class itself — pass to map_batches for the actor pool."""
    if name not in _BACKENDS:
        raise KeyError(f"unknown backend {name!r}; have {sorted(_BACKENDS)}")
    return _BACKENDS[name]


def list_backends() -> list[str]:
    return sorted(_BACKENDS)


register_backend("layout_stub", LayoutScorer)
