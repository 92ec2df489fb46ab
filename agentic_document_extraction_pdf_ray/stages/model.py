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
