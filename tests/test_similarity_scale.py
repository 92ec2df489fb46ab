"""embedding_near_dup routing + LSH scale-path guarantees:
no false positives (every emitted pair is a true ≥-threshold pair),
high recall vs the exact brute-force pairs, and no duplicate emissions."""

from __future__ import annotations

import numpy as np
import pandas as pd
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
            "bucketed candidate-pair dedup must emit each pair once"
        assert all(a < b for a, b in pairs)

    def test_degenerate_bucket_complete_and_deduped(self, ray_session,
                                                    tmp_path):
        """300 identical vectors collide in EVERY table's same code
        bucket (the degenerate case ADVICE round 2 flagged): the chunked
        id-only candidate scan plus bucketed dedup must emit exactly
        C(300,2) pairs once each, with exact cosine 1.0."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        n = 300
        rng = np.random.RandomState(3)
        vec = rng.randn(16)
        em = np.tile(vec, (n, 1))
        tbl = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(r) for r in em],
                                  pa.list_(pa.float64())),
            "label": pa.array(["x"] * n, pa.string()),
        })
        d = tmp_path / "degenerate"
        d.mkdir()
        pq.write_table(tbl, str(d / "embeddings.parquet"))
        df = embedding_near_dup_lsh(str(d), threshold=0.9).to_pandas()
        pairs = list(zip(df["doc_a"], df["doc_b"]))
        assert len(pairs) == len(set(pairs)) == n * (n - 1) // 2
        assert np.allclose(df["cosine"], 1.0)


@pytest.mark.usefixtures("ray_session")
class TestKmeansIvf:
    def test_kmeans_deterministic_and_normalized(self):
        import numpy as np

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            kmeans_fit,
        )
        c1 = kmeans_fit(SF, k=8, iters=3)
        c2 = kmeans_fit(SF, k=8, iters=3)
        assert np.array_equal(c1, c2), "fit must be partition-deterministic"
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    def test_kmeans_improves_inertia(self):
        import numpy as np

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            kmeans_fit, read_embeddings,
        )
        rows = read_embeddings(SF).take_all()
        em = np.array([r["embedding"] for r in rows], np.float64)
        em /= np.maximum(np.linalg.norm(em, axis=1, keepdims=True), 1e-12)

        def mean_sim(cent):
            return float(np.max(em @ cent.T, axis=1).mean())

        c0 = kmeans_fit(SF, k=8, iters=0)       # raw init
        c5 = kmeans_fit(SF, k=8, iters=5)
        assert mean_sim(c5) > mean_sim(c0), \
            "training must tighten the assignment similarity"

    def test_kmeans_noncontiguous_ids_and_tiny_corpus(self, tmp_path):
        """Init must not assume 0-based contiguous vec_ids (self-review
        r3): ids starting at 1000 fit fine; a corpus smaller than k
        raises instead of training a degenerate quantizer."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            kmeans_fit,
        )
        rng = np.random.RandomState(5)
        em = rng.randn(40, 8)
        tbl = pa.table({
            "vec_id": pa.array(range(1000, 1040), pa.int64()),
            "embedding": pa.array([list(r) for r in em],
                                  pa.list_(pa.float64())),
            "label": pa.array(["x"] * 40, pa.string()),
        })
        d = tmp_path / "shifted"
        d.mkdir()
        pq.write_table(tbl, str(d / "embeddings.parquet"))
        cent = kmeans_fit(str(d), k=4, iters=2)
        assert cent.shape == (4, 8)
        assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
        with pytest.raises(ValueError, match="fewer than k"):
            kmeans_fit(str(d), k=100, iters=1)

    def test_trained_recall_at_least_matches_lsh_ivf(self):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            ann_topk, ann_topk_ivf, ann_topk_ivf_kmeans,
        )
        exact = ann_topk(SF, k=5, n_queries=10)
        e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
        lsh = ann_topk_ivf(SF, k=5, n_queries=10)
        km = ann_topk_ivf_kmeans(SF, k=5, n_queries=10, n_probe=2)
        r_lsh = len(e & {(r.query_id, r.neighbor_id)
                         for r in lsh.itertuples()}) / len(e)
        r_km = len(e & {(r.query_id, r.neighbor_id)
                        for r in km.itertuples()}) / len(e)
        assert r_km >= 0.6, f"trained IVF recall {r_km:.2f} too low"
        assert r_km >= r_lsh - 0.1, (r_km, r_lsh)
        assert km.groupby("query_id").size().eq(5).all()


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


@pytest.mark.usefixtures("ray_session")
class TestKnnGraph:
    @staticmethod
    def _brute(ids, emb, k, labels=None):
        """(vec_id, rank) -> neighbor_id with the engine's fixed-point
        round-6 cosine and (cos DESC, id ASC) ordering."""
        q = np.floor(emb * 1e6 + 0.5).astype(np.int64)
        n2 = (q * q).sum(axis=1)
        out = {}
        for i in range(len(ids)):
            if n2[i] == 0:
                continue
            cands = []
            for j in range(len(ids)):
                if j == i or n2[j] == 0:
                    continue
                if labels is not None and labels[j] != labels[i]:
                    continue
                c = round(float(q[i] @ q[j])
                          / (np.sqrt(n2[i]) * np.sqrt(n2[j])), 6)
                cands.append((-c, ids[j]))
            cands.sort()
            for r, (_, nid) in enumerate(cands[:k], 1):
                out[(ids[i], r)] = nid
        return out

    def test_broadcast_path_matches_brute(self):
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_knn_graph,
        )
        sf = "/root/testdata/sf0.001"
        t = pq.read_table(f"{sf}/embeddings.parquet")
        ids = t["vec_id"].to_numpy()
        emb = np.array(t["embedding"].to_pylist(), np.float64)
        want = self._brute(ids, emb, 5)
        got = embedding_knn_graph(sf, k=5).to_pandas()
        got_map = {(r.vec_id, r.rank): r.neighbor_id
                   for r in got.itertuples()}
        assert got_map == want

    def test_label_confined_path_matches_brute(self):
        import pyarrow.parquet as pq
        import ray

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            _knn_graph_within_labels,
        )
        sf = "/root/testdata/sf0.001"
        t = pq.read_table(f"{sf}/embeddings.parquet")
        ids = t["vec_id"].to_numpy()
        emb = np.array(t["embedding"].to_pylist(), np.float64)
        labels = t["label"].to_numpy()
        want = self._brute(ids, emb, 5, labels=labels)
        ds = ray.data.read_parquet(f"{sf}/embeddings.parquet")
        got = _knn_graph_within_labels(ds, 5, 16).to_pandas()
        got_map = {(r.vec_id, r.rank): r.neighbor_id
                   for r in got.itertuples()}
        assert got_map == want

    def test_tie_break_and_exclusions(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_knn_graph,
        )
        # 10/20/30 are identical (pairwise cos 1.0 -> ties broken by id);
        # 40 is orthogonal-ish; 50 is the zero vector (excluded).
        vecs = {10: [1.0, 0.0], 20: [1.0, 0.0], 30: [2.0, 0.0],
                40: [0.0, 1.0], 50: [0.0, 0.0]}
        d = tmp_path / "knn"
        d.mkdir()
        pq.write_table(pa.table({
            "vec_id": pa.array(sorted(vecs), pa.int64()),
            "embedding": pa.array([vecs[i] for i in sorted(vecs)],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 5, pa.int32()),
        }), str(d / "embeddings.parquet"))
        out = embedding_knn_graph(str(d), k=2).to_pandas()
        m = {(r.vec_id, r.rank): (r.neighbor_id, r.cos_sim)
             for r in out.itertuples()}
        assert m[(10, 1)] == (20, 1.0) and m[(10, 2)] == (30, 1.0)
        assert m[(20, 1)] == (10, 1.0) and m[(20, 2)] == (30, 1.0)
        assert m[(30, 1)] == (10, 1.0) and m[(30, 2)] == (20, 1.0)
        assert m[(40, 1)][1] == 0.0      # orthogonal to all live vectors
        assert 50 not in {v for v, _ in m}          # zero vec: no rows
        assert all(n != 50 for (n, _) in m.values())  # ...and no edges


class TestEmbeddingPCA:
    def _local_fit(self, sf):
        """The same algorithm, single-process: quantize-once → exact
        integer second moments → eigh → sign fix."""
        import pyarrow.parquet as pq
        emb = np.stack(pq.read_table(f"{sf}/embeddings.parquet",
                                     columns=["embedding"])
                       .to_pandas()["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(emb * 1e6 + 0.5).astype(np.int64)
        n, d = q.shape
        mu = q.sum(axis=0, dtype=object).astype(np.float64) / (1e6 * n)
        gram = (q.T @ q).astype(np.float64) / 1e12
        cov = (gram - n * np.outer(mu, mu)) / (n - 1)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:2]
        comps, evar = v[:, order].T.copy(), w[order]
        for i in range(len(comps)):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        return comps, evar, mu, emb

    def test_fit_matches_local_exactly(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import pca_fit
        comps, evar, mu, n = pca_fit(SF, k=2)
        lc, le, lmu, lemb = self._local_fit(SF)
        assert n == len(lemb)
        np.testing.assert_array_equal(mu, lmu)      # exact int fold
        np.testing.assert_array_equal(comps, lc)    # same cov → same eigh
        np.testing.assert_array_equal(evar, le)

    def test_components_orthonormal_and_ordered(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import pca_fit
        comps, evar, _, _ = pca_fit(SF, k=2)
        g = comps @ comps.T
        np.testing.assert_allclose(g, np.eye(2), atol=1e-10)
        assert evar[0] >= evar[1] > 0

    def test_projection_matches_local(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_pca_project,
        )
        got = (embedding_pca_project(SF, k=2).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        lc, _, lmu, lemb = self._local_fit(SF)
        import pyarrow.parquet as pq
        ids = (pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])
               .to_pandas()["vec_id"].to_numpy())
        order = np.argsort(ids)
        want = np.round((lemb - lmu) @ lc.T, 6)[order]
        np.testing.assert_array_equal(got["vec_id"].to_numpy(), ids[order])
        np.testing.assert_array_equal(got["pc1"].to_numpy(), want[:, 0])
        np.testing.assert_array_equal(got["pc2"].to_numpy(), want[:, 1])
        # PCA property: pc1 sample variance >= pc2 sample variance
        assert got["pc1"].var() >= got["pc2"].var()


class TestEmbeddingMMR:
    def _local_mmr(self, sf, k=10, lam=0.7):
        import pyarrow.parquet as pq
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).to_pandas()
        ids = t["vec_id"].to_numpy(np.int64)
        emb = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(emb * 1e6 + 0.5).astype(np.int64)
        cent = q.sum(axis=0, dtype=object).astype(np.float64)
        cent /= np.linalg.norm(cent)
        nrm = np.linalg.norm(emb, axis=1)
        nrm[nrm == 0] = 1.0
        unit = emb / nrm[:, None]
        rel = unit @ cent
        sel, sel_rows = [], []
        for _ in range(k):
            pen = (unit @ unit[sel_rows].T).max(axis=1) if sel_rows \
                else np.zeros(len(unit))
            score = lam * rel - (1 - lam) * pen
            live = ~np.isin(ids, np.array(sel, np.int64)) if sel \
                else np.ones(len(ids), bool)
            li, ls = ids[live], score[live]
            j = np.lexsort((li, -ls))[0]
            sel.append(int(li[j]))
            sel_rows.append(int(np.flatnonzero(ids == li[j])[0]))
        return sel

    def test_matches_local_greedy(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_mmr_topk,
        )
        got = embedding_mmr_topk(SF, k=10)
        assert got["vec_id"].tolist() == self._local_mmr(SF, k=10)
        assert got["rank"].tolist() == list(range(1, 11))

    def test_diversity_beats_pure_relevance(self, ray_session, tmp_path):
        """Three near-identical high-relevance vectors + one orthogonal:
        pure top-k-by-relevance would take the three twins; MMR must
        interleave the orthogonal one."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        vecs = [[1.0, 0.01], [1.0, 0.011], [1.0, 0.012], [0.02, 1.0]]
        t = pa.table({"vec_id": pa.array(range(4), pa.int64()),
                      "embedding": pa.array(vecs, pa.list_(pa.float32())),
                      "label": pa.array([0] * 4, pa.int32())})
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_mmr_topk,
        )
        got = embedding_mmr_topk(str(tmp_path), k=2, lam=0.5)
        assert got["vec_id"].tolist()[1] == 3    # diversity pick


class TestEmbeddingHardNegatives:
    def test_excludes_same_label_and_self(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_hard_negatives,
        )
        # two tight same-label twins + two cross-label vectors: the
        # nearest vector overall is the same-label twin and MUST be
        # skipped in favor of cross-label candidates
        vecs = [[1.0, 0.0], [1.0, 0.001], [0.9, 0.1], [0.0, 1.0]]
        labels = [0, 0, 1, 1]
        t = pa.table({"vec_id": pa.array(range(4), pa.int64()),
                      "embedding": pa.array(vecs, pa.list_(pa.float32())),
                      "label": pa.array(labels, pa.int32())})
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        got = embedding_hard_negatives(str(tmp_path), k=2).to_pandas()
        by_anchor = {v: g.sort_values("rank")["neighbor_id"].tolist()
                     for v, g in got.groupby("vec_id")}
        assert by_anchor[0] == [2, 3]          # twin 1 skipped
        assert by_anchor[1] == [2, 3]
        assert by_anchor[2] == [1, 0]          # own-label 3 skipped
        assert all(len(v) == 2 for v in by_anchor.values())

    def test_chunked_equals_single_broadcast(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_hard_negatives,
        )
        one = (embedding_hard_negatives(SF, k=5, chunk_rows=10**9)
               .to_pandas().sort_values(["vec_id", "rank"])
               .reset_index(drop=True))
        many = (embedding_hard_negatives(SF, k=5, chunk_rows=37)
                .to_pandas().sort_values(["vec_id", "rank"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(one, many)

    def test_short_pool_emits_fewer_rows(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_hard_negatives,
        )
        # only ONE cross-label vector exists -> exactly one negative per
        # anchor even with k=5
        t = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                      "embedding": pa.array([[1.0, 0.0], [0.0, 1.0],
                                             [0.5, 0.5]],
                                            pa.list_(pa.float32())),
                      "label": pa.array([0, 0, 1], pa.int32())})
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        got = embedding_hard_negatives(str(tmp_path), k=5).to_pandas()
        assert got[got["vec_id"] == 0]["neighbor_id"].tolist() == [2]
        assert got[got["vec_id"] == 2]["rank"].tolist() == [1, 2]


class TestPqCodes:
    def test_codes_and_mse_semantics(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_pq_codes,
        )
        got = embedding_pq_codes(SF, m=4, k=16).to_pandas()
        assert got["vec_id"].is_unique
        # every byte of the packed code is a valid sub-code < 16
        codes = got["pq_code"].to_numpy(np.int64)
        for s in range(4):
            assert ((codes >> (8 * s)) & 0xFF < 16).all()
        assert (got["recon_mse"] >= 0).all()

    def test_deterministic_and_matches_local(self, ray_session):
        """Exact-integer folds make the fit bit-identical across runs;
        encode matches a local single-process replication."""
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_pq_codes, pq_fit,
        )
        b1 = pq_fit(SF, m=4, k=8, iters=3)
        b2 = pq_fit(SF, m=4, k=8, iters=3)
        for a, b in zip(b1, b2):
            np.testing.assert_array_equal(a, b)
        got = (embedding_pq_codes(SF, m=4, k=8, iters=3).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).to_pandas()
        t = t.sort_values("vec_id").reset_index(drop=True)
        emb = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        bounds = np.cumsum([0] + [b.shape[1] for b in b1])
        code = np.zeros(len(t), np.int64)
        for s in range(4):
            x = emb[:, bounds[s]:bounds[s + 1]]
            d2 = ((x[:, None, :] - b1[s][None, :, :]) ** 2).sum(axis=2)
            code += np.argmin(d2, axis=1).astype(np.int64) << (8 * s)
        np.testing.assert_array_equal(got["pq_code"].to_numpy(), code)

    def test_identical_vectors_share_codes(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_pq_codes,
        )
        rng = np.random.RandomState(3)
        base = rng.randn(8, 16).astype(np.float32)
        vecs = np.vstack([base, base])           # every vector twice
        t = pa.table({
            "vec_id": pa.array(range(16), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 16, pa.int32())})
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        got = (embedding_pq_codes(str(tmp_path), m=2, k=4, iters=4)
               .to_pandas().sort_values("vec_id"))
        c = got["pq_code"].to_numpy()
        np.testing.assert_array_equal(c[:8], c[8:])


class TestPqAdcTopk:
    def test_recall_vs_exact(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            ann_topk, embedding_pq_adc_topk,
        )
        exact = ann_topk(SF, k=5, n_queries=10)
        adc = embedding_pq_adc_topk(SF, k=5, n_queries=10, m=16,
                                    n_codes=16, rerank=100)
        e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
        a = {(r.query_id, r.neighbor_id) for r in adc.itertuples()}
        recall = len(e & a) / len(e)
        assert recall >= 0.9, f"PQ-ADC+rerank recall {recall:.2f} too low"
        # the pure-ADC shortlist alone is the coarse stage: much lower
        raw = embedding_pq_adc_topk(SF, k=5, n_queries=10, m=16,
                                    n_codes=16, rerank=0)
        ra = {(r.query_id, r.neighbor_id) for r in raw.itertuples()}
        assert len(e & ra) / len(e) <= recall
        assert adc.groupby("query_id").size().eq(5).all()
        assert (adc["neighbor_id"] != adc["query_id"]).all()

    def test_deterministic(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_pq_adc_topk,
        )
        a = embedding_pq_adc_topk(SF, k=3, n_queries=5, iters=2)
        b = embedding_pq_adc_topk(SF, k=3, n_queries=5, iters=2)
        pd.testing.assert_frame_equal(a, b)


class TestEmbeddingMarginMining:
    def test_margin_prefers_mutual_match_over_hub(self, ray_session,
                                                  tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_margin_mining,
        )
        # label-0 cluster around x-axis, label-1 cluster around y-axis,
        # plus one isolated cross-label MUTUAL pair on the diagonal:
        # raw cosine ranks hub pairs (cluster members vs the diagonal
        # pair) comparably, but the margin criterion must rank the
        # mutual diagonal pair FIRST because each endpoint's own
        # neighborhood is far away.
        vecs = [[1.0, 0.0], [0.99, 0.14], [0.98, -0.2],       # label 0 hub
                [0.0, 1.0], [0.14, 0.99], [-0.2, 0.98],       # label 1 hub
                [0.707, 0.707],                                # label 0 iso
                [0.717, 0.697]]                                # label 1 iso
        labels = [0, 0, 0, 1, 1, 1, 0, 1]
        t = pa.table({"vec_id": pa.array(range(8), pa.int64()),
                      "embedding": pa.array(vecs, pa.list_(pa.float32())),
                      "label": pa.array(labels, pa.int32())})
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        got = embedding_margin_mining(str(tmp_path), k=2, top_pairs=5)
        assert got.iloc[0]["vec_id"] == 6 and got.iloc[0]["neighbor_id"] == 7
        assert got.iloc[0]["margin"] > 1.0
        # every returned pair is cross-label and ordered u < v
        lab = dict(zip(range(8), labels))
        for _, r in got.iterrows():
            assert r["vec_id"] < r["neighbor_id"]
            assert lab[int(r["vec_id"])] != lab[int(r["neighbor_id"])]
        assert got["rank"].tolist() == list(range(1, len(got) + 1))

    def test_chunked_equals_single_broadcast(self, ray_session):
        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_margin_mining,
        )
        one = embedding_margin_mining(SF, chunk_rows=10**9)
        many = embedding_margin_mining(SF, chunk_rows=37)
        pd.testing.assert_frame_equal(one, many)


class TestPqAdcSelfExclusion:
    def test_tiny_corpus_never_returns_self(self, ray_session, tmp_path):
        # review finding: with total candidates <= rerank, the inf
        # self-mask rows used to survive into the shortlist and the
        # exact-cosine re-rank scored self at 1.0 -> own top-1
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agentic_document_extraction_pdf_ray.pipelines.similarity import (
            embedding_pq_adc_topk,
        )
        rng = np.random.RandomState(7)
        vecs = rng.randn(8, 16).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(8), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 8, pa.int32())})
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        for rerank in (0, 50):
            out = embedding_pq_adc_topk(str(tmp_path), k=3, n_queries=2,
                                        m=2, n_codes=4, iters=3,
                                        rerank=rerank)
            assert (out["neighbor_id"] != out["query_id"]).all(), rerank
            assert out.groupby("query_id").size().eq(3).all(), rerank
