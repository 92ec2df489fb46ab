"""Distributed IRLS quality-classifier: bit-equality vs a single-process
run of the same algorithm (which proves the fixed-point moment fold is
partition-invariant — the engine run splits the corpus into many blocks,
the local run is one block), plus accuracy and calibration sanity."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _local_fit_and_score(sf: str, dims: int = 64, iters: int = 5,
                         ridge: float = 1e-3):
    """Same algorithm, one process, one 'block'."""
    from agentic_document_extraction_pdf_ray.pipelines.classifier import (
        GRAD_SCALE, _hashed_features, _margins, _pair_grid, _with_bias,
    )
    batch = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
    dims1 = dims + 1
    rows, feats, vals, y, n = _hashed_features(batch, dims)
    rows, feats, vals = _with_bias(rows, feats, vals, n, dims)
    w = np.zeros(dims1, np.float64)
    for _ in range(iters):
        z = _margins(rows, feats, vals, n, w)
        p = 1.0 / (1.0 + np.exp(-z))
        r, s = p - y, p * (1.0 - p)
        g = np.zeros(dims1, np.int64)
        np.add.at(g, feats,
                  np.round(r[rows] * vals * GRAD_SCALE).astype(np.int64))
        h = np.zeros(dims1 * dims1, np.int64)
        ia, ib = _pair_grid(rows)
        np.add.at(h, feats[ia] * dims1 + feats[ib],
                  np.round(s[rows[ia]] * vals[ia] * vals[ib]
                           * GRAD_SCALE).astype(np.int64))
        gf = g.astype(np.float64) / (GRAD_SCALE * n)
        hf = h.astype(np.float64).reshape(dims1, dims1) \
            / (GRAD_SCALE * n) + ridge * np.eye(dims1)
        w = w - np.linalg.solve(hf, gf)
    z = _margins(rows, feats, vals, n, w)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return w, ids, np.round(1.0 / (1.0 + np.exp(-z)), 6), y


class TestQualityClassifier:
    def test_fit_matches_local_exactly(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.classifier import (
            logreg_fit,
        )
        w = logreg_fit(SF)
        lw, *_ = _local_fit_and_score(SF)
        # the distributed fold is exact integers → identical moments →
        # identical solves → bit-identical weights, many blocks or one
        np.testing.assert_array_equal(w, lw)

    def test_scores_match_local_and_accuracy(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.classifier import (
            doc_quality_classifier,
        )
        got = (doc_quality_classifier(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        _, ids, p, y = _local_fit_and_score(SF)
        order = np.argsort(ids)
        np.testing.assert_array_equal(got["doc_id"].to_numpy(), ids[order])
        np.testing.assert_array_equal(got["p"].to_numpy(), p[order])
        np.testing.assert_array_equal(got["label"].to_numpy(),
                                      (y > 0.5)[order])
        assert got["correct"].mean() >= 0.97     # separable label, IRLS
        # sane probabilities: confident on both classes
        assert got.loc[got["pred"], "p"].min() >= 0.5
        assert got.loc[~got["pred"], "p"].max() < 0.5

    def test_pair_grid_enumerates_within_row_pairs(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.classifier import (
            _pair_grid,
        )
        rows = np.array([0, 0, 0, 2, 2, 5], np.int64)   # k = 3, 2, 1
        ia, ib = _pair_grid(rows)
        got = sorted(zip(ia.tolist(), ib.tolist()))
        want = sorted([(a, b) for s, k in [(0, 3), (3, 2), (5, 1)]
                       for a in range(s, s + k) for b in range(s, s + k)])
        assert got == want
