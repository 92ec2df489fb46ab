"""The dup-graph analytics family is pair-source agnostic (round-3
verdict #1): every graph operator takes ``pairs=`` so the MinHash-LSH
candidate stream — the 100 TB scale path — can replace the exact n-gram
Jaccard plan, which stays the small-scale verification path.

The fixture is built so the two pair plans provably agree (perturbed
within-family copies at similarity far above both thresholds, disjoint
vocabulary across families), asserted as a precondition — then every
graph metric must be bit-identical whichever plan feeds it."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)[
        sorted(df.columns)]


@pytest.fixture(scope="module")
def graph_fixture(tmp_path_factory, ray_session):
    """3 perturbed near-dup families (5/4/3 docs) + 3 singletons, with
    a source column for the cross-source matrix. Each family member
    appends a distinct token tail to the family base text — 3-gram
    Jaccard ≈ 0.85-0.95 within a family, ~0 across (disjoint vocab)."""
    import pyarrow.parquet as pq

    # 60 DISTINCT tokens per family base (repeats add no distinct
    # shingles) + a 1-token tail per member → 3-gram Jaccard ≈ 0.94
    # within a family, where 16-band×8-row LSH collision prob ≈ 1.0.
    fam_bases = [" ".join(f"fam{f}word{i}" for i in range(60))
                 for f in range(3)]
    sizes = [5, 4, 3]
    texts = []
    for base, k in zip(fam_bases, sizes):
        for j in range(k):
            texts.append(base + f" tail{j}")
    texts += ["one completely standalone document about nothing " * 8,
              "another isolated text with its own private words " * 8,
              "third lonely record carrying unique content only " * 8]
    n = len(texts)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["web" if i % 2 == 0 else "books"
                            for i in range(n)], pa.string()),
    })
    d = tmp_path_factory.mktemp("dupgraph")
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


class TestPairSourceParam:
    def test_lsh_fed_equals_exact_fed(self, ray_session, graph_fixture):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            dedup_survivors, dedup_survivors_best, doc_dup_components,
            dup_clustering_coeff, dup_degree_hist, dup_pagerank,
            dup_source_matrix, dup_triangles, minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        d = graph_fixture
        exact = ngram_jaccard_pairs(d, threshold=0.5).materialize()
        lsh = minhash_lsh_pairs(d, threshold=0.5).materialize()

        # precondition: on this fixture the two plans find the SAME
        # edge set (within-family sims are far above both thresholds,
        # cross-family sims are ~0) — C(5,2)+C(4,2)+C(3,2) = 19 edges
        e = {(r["doc_a"], r["doc_b"]) for r in exact.take_all()}
        l = {(r["doc_a"], r["doc_b"]) for r in lsh.take_all()}
        assert e == l and len(e) == 19

        for fn in (dup_degree_hist, dup_source_matrix, dup_triangles,
                   dup_clustering_coeff, dup_pagerank, doc_dup_components,
                   dedup_survivors, dedup_survivors_best):
            a = _norm(fn(d, pairs=exact))
            b = _norm(fn(d, pairs=lsh))
            assert list(a.columns) == list(b.columns), fn.__name__
            try:
                pd.testing.assert_frame_equal(a, b, check_exact=True)
            except AssertionError as err:
                raise AssertionError(f"{fn.__name__}: {err}") from err

    def test_default_pair_source_unchanged(self, ray_session, graph_fixture):
        """pairs=None still routes through the exact n-gram plan."""
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            dup_degree_hist, ngram_jaccard_pairs,
        )
        d = graph_fixture
        got = _norm(dup_degree_hist(d))
        want = _norm(dup_degree_hist(
            d, pairs=ngram_jaccard_pairs(d)))
        pd.testing.assert_frame_equal(got, want, check_exact=True)
