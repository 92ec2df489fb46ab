"""embedding_near_dup routing + LSH scale-path guarantees:
no false positives (every emitted pair is a true ≥-threshold pair),
high recall vs the exact brute-force pairs, and no duplicate emissions."""

from __future__ import annotations

import pytest

from agentic_document_extraction_pdf_ray.pipelines.similarity import (
    embedding_near_dup, embedding_near_dup_lsh, read_embeddings,
)

SF = "/root/testdata/sf0.01"
THRESH = 0.45


class TestEmbeddingNearDupLsh:
    @pytest.fixture(scope="class")
    def exact_pairs(self, ray_session):
        ds = embedding_near_dup(SF, threshold=THRESH)   # brute path at 500 rows
        return {(r["doc_a"], r["doc_b"]): r["cosine"] for r in ds.take_all()}

    @pytest.fixture(scope="class")
    def lsh_pairs(self, ray_session):
        ds = embedding_near_dup_lsh(SF, threshold=THRESH)
        return {(r["doc_a"], r["doc_b"]): r["cosine"] for r in ds.take_all()}

    def test_small_input_routes_to_bruteforce(self, ray_session, exact_pairs):
        assert read_embeddings(SF).count() <= 100_000
        assert exact_pairs, "fixture should contain near-dup pairs"

    def test_no_false_positives(self, exact_pairs, lsh_pairs):
        extra = set(lsh_pairs) - set(exact_pairs)
        assert not extra, f"LSH emitted non-pairs: {sorted(extra)[:5]}"

    def test_recall(self, exact_pairs, lsh_pairs):
        recall = len(set(exact_pairs) & set(lsh_pairs)) / len(exact_pairs)
        assert recall >= 0.85, f"LSH recall {recall:.3f} < 0.85"

    def test_cosines_match_exact(self, exact_pairs, lsh_pairs):
        for k, v in lsh_pairs.items():
            assert abs(v - exact_pairs[k]) < 1e-9

    def test_no_duplicate_emissions(self, ray_session):
        rows = embedding_near_dup_lsh(SF, threshold=THRESH).take_all()
        pairs = [(r["doc_a"], r["doc_b"]) for r in rows]
        assert len(pairs) == len(set(pairs)), \
            "lowest-colliding-table dedup must emit each pair once"
        assert all(a < b for a, b in pairs)


@pytest.mark.usefixtures("ray_session")
class TestIvfRecall:
    def test_ivf_topk_recall_vs_exact(self):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            ann_topk, ann_topk_ivf,
        )
        exact = ann_topk(SF, k=5, n_queries=10)
        approx = ann_topk_ivf(SF, k=5, n_queries=10)
        e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
        a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
        recall = len(e & a) / len(e)
        # radius-1 multi-probe: 0.70 measured on this fixture (was 0.26
        # single-probe); bound leaves headroom for plane-seed sensitivity
        assert recall >= 0.6, f"IVF top-k recall {recall:.2f} too low"
        # every approx neighbor set is per-query complete (5 each)
        assert approx.groupby("query_id").size().eq(5).all()
