"""Partitioned confidence calibration: fit offline, broadcast, apply stateless.

Mirrors the reference's ``ConfidenceCalibrator`` / ``PartitionedCalibrator``
(``/root/reference/src/validation/calibration.py:139-330``, :552-660):
per-partition curves with a MIN_PARTITION_SAMPLES gate and a global
fallback. Fit happens in a tiny ``groupby(partition).map_groups`` (the
calibration table is small); the fitted params are broadcast via ``ray.put``
and applied by a stateless vectorized ``map_batches`` stage — the
"fit offline, broadcast fitted params" pattern from SURVEY.md §2.3.

Calibrators: linear (least-squares y≈a·x+b clamped) and isotonic (PAV).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

MIN_PARTITION_SAMPLES = 50


@dataclass(frozen=True)
class LinearParams:
    a: float
    b: float

    def apply(self, x: np.ndarray) -> np.ndarray:
        return np.clip(self.a * x + self.b, 0.0, 1.0)


@dataclass(frozen=True)
class IsotonicParams:
    x: tuple[float, ...] = field(default_factory=tuple)
    y: tuple[float, ...] = field(default_factory=tuple)

    def apply(self, q: np.ndarray) -> np.ndarray:
        if not self.x:
            return q
        return np.clip(np.interp(q, self.x, self.y), 0.0, 1.0)


def fit_linear(conf: np.ndarray, correct: np.ndarray) -> LinearParams:
    if len(conf) < 2 or np.allclose(conf, conf[0]):
        return LinearParams(1.0, 0.0)
    a, b = np.polyfit(conf.astype(np.float64), correct.astype(np.float64), 1)
    return LinearParams(float(a), float(b))


def fit_isotonic(conf: np.ndarray, correct: np.ndarray) -> IsotonicParams:
    """Pool-adjacent-violators over confidence-sorted outcomes."""
    order = np.argsort(conf, kind="stable")
    x = conf[order].astype(np.float64)
    y = correct[order].astype(np.float64)
    w = np.ones_like(y)
    # PAV merge loop
    ys: list[float] = []
    ws: list[float] = []
    xs: list[float] = []
    for xi, yi, wi in zip(x, y, w):
        ys.append(yi)
        ws.append(wi)
        xs.append(xi)
        while len(ys) > 1 and ys[-2] > ys[-1]:
            wy = ws[-2] + ws[-1]
            ys[-2] = (ys[-2] * ws[-2] + ys[-1] * ws[-1]) / wy
            ws[-2] = wy
            xs[-2] = xs[-1]
            ys.pop(); ws.pop(); xs.pop()
    return IsotonicParams(tuple(xs), tuple(ys))


def expected_calibration_error(conf: np.ndarray, correct: np.ndarray,
                               n_bins: int = 10) -> float:
    bins = np.clip((conf * n_bins).astype(int), 0, n_bins - 1)
    ece = 0.0
    n = len(conf)
    for b in range(n_bins):
        m = bins == b
        if m.any():
            ece += m.sum() / n * abs(conf[m].mean() - correct[m].mean())
    return float(ece)


def fit_partitioned(samples: ray.data.Dataset, partition_col: str = "profile",
                    method: str = "linear") -> dict[str, LinearParams | IsotonicParams]:
    """Fit per-partition calibrators + '__global__' fallback.

    ``samples`` needs columns (partition_col, confidence, correct). Small
    table by construction (calibration points), so per-group fit is cheap.
    Partitions under MIN_PARTITION_SAMPLES fall back to the global curve.
    """
    fitter = fit_linear if method == "linear" else fit_isotonic
    df = samples.to_pandas()
    out: dict[str, LinearParams | IsotonicParams] = {
        "__global__": fitter(df["confidence"].to_numpy(),
                             df["correct"].to_numpy())
    }
    for key, g in df.groupby(partition_col):
        if len(g) >= MIN_PARTITION_SAMPLES:
            out[str(key)] = fitter(g["confidence"].to_numpy(),
                                   g["correct"].to_numpy())
    return out


def apply_calibration(ds: ray.data.Dataset, params: dict,
                      partition_col: str = "profile",
                      conf_col: str = "confidence") -> ray.data.Dataset:
    """Stateless apply stage; params broadcast once."""
    ref = ray.put(params)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(ref)
        conf = batch[conf_col].to_numpy(np.float64)
        keys = batch[partition_col].astype(str)
        out = np.empty_like(conf)
        for key in keys.unique():
            m = (keys == key).to_numpy()
            cal = p.get(key, p["__global__"])
            out[m] = cal.apply(conf[m])
        return batch.assign(calibrated_confidence=np.round(out, 6))

    return ds.map_batches(fn, batch_format="pandas")
