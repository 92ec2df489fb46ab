"""Mergeable cardinality sketch: HyperLogLog (Flajolet et al. 2007).

A distinct-count over a 100 TB stream must not shuffle the keys: an exact
``count(distinct user_id)`` per group is an all-to-all exchange of every
key occurrence. The HLL register array is a fixed ``2**P``-byte mergeable
summary: every ``map_batches`` task folds its batch into one register row
per group (map-side partial), and the final groupby merges register rows
with an element-wise ``max`` — the only data that ever moves is
``n_groups × n_blocks`` rows of 4 KiB each.

All kernels are vectorized numpy over uint64 hashes; no per-row Python.
Estimator: standard bias-corrected harmonic mean with the linear-counting
small-range correction. With P=12 (4096 registers) the asymptotic relative
standard error is 1.04/sqrt(4096) ≈ 1.6%.
"""

from __future__ import annotations

import numpy as np

HLL_P = 12                      # 4096 registers, ~1.6% standard error
HLL_M = 1 << HLL_P
_U64_ONE = np.uint64(1)
_REG_CAP = 64 - HLL_P + 1       # max storable rank (remainder is 64-P bits)


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0). Six shift passes —
    branch-free, no float round-trip (a float64 mantissa is 53 bits, so
    ``log2`` misplaces the top bit near powers of two)."""
    x = x.copy()
    out = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        step = np.uint64(s)
        m = x >= (_U64_ONE << step)
        out[m] += s
        x[m] >>= step
    return out + (x > 0)


def hll_fold(hashes: np.ndarray, reg: np.ndarray | None = None) -> np.ndarray:
    """Fold uint64 hashes into a register array (new one if not given).

    Register index = top P bits; rank = leading-zero count of the
    remaining 64-P bits + 1 (capped when the remainder is all zeros).
    """
    if reg is None:
        reg = np.zeros(HLL_M, np.uint8)
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rem = h << np.uint64(HLL_P)          # remainder shifted to the top
    rank = np.minimum(64 - _bitlen_u64(rem) + 1, _REG_CAP).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(regs: np.ndarray) -> np.ndarray:
    """Merge a (k, M) stack of register arrays: element-wise max.

    HLL's defining property — merge(fold(A), fold(B)) == fold(A ∪ B) —
    is what makes the map-side partial exact (not an approximation of
    the sketch itself)."""
    return regs.max(axis=0)


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected estimate with linear-counting small-range fix."""
    m = float(reg.size)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv_sum = np.ldexp(1.0, -reg.astype(np.int64)).sum()
    est = alpha * m * m / inv_sum
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------- t-digest
# Mergeable quantile sketch (Dunning & Ertl, "Computing extremely accurate
# quantiles using t-digests", 2019). The exact-quantile path
# (pipelines/events.events_value_quantiles) needs a BOUNDED value domain
# for its histogram; the t-digest is the unbounded-domain companion: a
# ~delta-centroid summary per (group, block) whose merge is
# concat + rebuild — order-independent, because build sorts by mean first.

TDIGEST_DELTA = 200


def tdigest_build(values: np.ndarray,
                  weights: np.ndarray | None = None,
                  delta: int = TDIGEST_DELTA) -> tuple[np.ndarray, np.ndarray]:
    """Build centroids (means, weights) from values via vectorized k1
    scale-function binning — one argsort + one ``np.add.reduceat``, no
    per-point Python loop (unlike the textbook greedy pass)."""
    v = np.asarray(values, np.float64)
    w = (np.ones(v.size, np.float64) if weights is None
         else np.asarray(weights, np.float64))
    if v.size == 0:
        return np.empty(0), np.empty(0)
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    total = w.sum()
    q = (np.cumsum(w) - w / 2.0) / total          # mid-point quantile
    k = np.floor((delta / np.pi) * np.arcsin(2.0 * q - 1.0))
    starts = np.concatenate(([0], np.flatnonzero(np.diff(k)) + 1))
    w_seg = np.add.reduceat(w, starts)
    means = np.add.reduceat(v * w, starts) / w_seg
    return means, w_seg


def tdigest_merge(parts: list[tuple[np.ndarray, np.ndarray]],
                  delta: int = TDIGEST_DELTA) -> tuple[np.ndarray, np.ndarray]:
    """Merge digests: concat centroids, rebuild. Permutation-invariant
    in ``parts`` (build sorts by mean), so distributed arrival order
    cannot change the result."""
    means = np.concatenate([m for m, _ in parts]) if parts else np.empty(0)
    wts = np.concatenate([w for _, w in parts]) if parts else np.empty(0)
    return tdigest_build(means, wts, delta)


def tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                     qs: np.ndarray | list[float]) -> np.ndarray:
    """Estimate quantiles: linear interpolation over centroid mid-point
    cumulative weights (clamped to the extreme centroid means)."""
    if means.size == 0:
        return np.full(len(qs), np.nan)
    cum = np.cumsum(weights) - weights / 2.0
    total = weights.sum()
    return np.interp(np.asarray(qs, np.float64) * total, cum, means)


# ------------------------------------------------------------ Misra-Gries
# Heavy-hitters summary with k counters: any key with true frequency
# > n/(k+1) is guaranteed present, and each kept count undercounts the
# truth by at most n/(k+1) (Misra & Gries 1982). Summaries MERGE by
# counter addition + the standard subtract-(k+1)-th-largest reduction
# (Agarwal et al. 2012), preserving the same error bound over the total
# stream length.

def mg_fold(keys: np.ndarray, counts: np.ndarray, k: int) -> dict:
    """Fold exact (key, count) partials into a k-counter MG summary.

    Vectorized: sort by count descending, keep the top k, subtract the
    (k+1)-th largest count from the survivors (the batched equivalent of
    decrement-all; same guarantee, one pass)."""
    if len(keys) <= k:
        return dict(zip(keys.tolist(), counts.tolist()))
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[k]]
    kept = order[:k]
    newc = counts[kept] - thresh
    pos = newc > 0
    return dict(zip(keys[kept][pos].tolist(), newc[pos].tolist()))


def mg_merge(summaries: list[dict], k: int) -> dict:
    """Merge MG summaries: add counters, then reduce back to k."""
    total: dict = {}
    for s in summaries:
        for key, c in s.items():
            total[key] = total.get(key, 0) + c
    if len(total) <= k:
        return total
    keys = np.array(list(total.keys()))
    counts = np.array(list(total.values()), np.int64)
    return mg_fold(keys, counts, k)
