"""doc_split_by_component — group-aware (leakage-free) split.

Three properties define the operator (docstring contract,
pipelines/dedup.py:doc_split_by_component):

1. ZERO LEAKAGE BY CONSTRUCTION — both ends of every dup pair get the
   same split (the thing split_leakage_matrix can only audit).
2. SINGLETON STABILITY — a doc with no duplicates gets exactly the
   split (and split_key string) doc_split_assign gives it, so adopting
   the group-aware split only ever moves docs that HAVE duplicates.
3. PAIR-SOURCE AGNOSTIC — LSH-fed result is bit-identical to the
   exact-n-gram-fed result (the ``pairs=`` family contract).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest


def _norm(df):
    df = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)[
        sorted(df.columns)]


@pytest.fixture(scope="module")
def split_fixture(tmp_path_factory, ray_session):
    """2 near-dup families (6/4 docs) + 4 singletons; family ids are
    chosen NON-contiguous so canonical-min-id ≠ any positional
    accident."""
    import pyarrow.parquet as pq

    fam_bases = [" ".join(f"fam{f}tok{i}" for i in range(60))
                 for f in range(2)]
    rows = []
    fam_ids = [[3, 11, 20, 27, 35, 41], [5, 14, 22, 30]]
    for base, ids in zip(fam_bases, fam_ids):
        for j, i in enumerate(ids):
            rows.append((i, base + f" tail{j}"))
    for k, i in enumerate([50, 61, 72, 83]):
        rows.append((i, f"standalone text number {k} " +
                     " ".join(f"solo{k}w{i2}" for i2 in range(40))))
    rows.sort()
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["web"] * len(rows), pa.string()),
    })
    d = tmp_path_factory.mktemp("splitcomp")
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


class TestSplitByComponent:
    def test_zero_leakage_and_family_key(self, ray_session, split_fixture):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            doc_split_by_component, ngram_jaccard_pairs,
        )
        d = split_fixture
        pairs = ngram_jaccard_pairs(d).materialize()
        got = _norm(doc_split_by_component(d, pairs=pairs))
        by_id = got.set_index("doc_id")

        edges = [(r["doc_a"], r["doc_b"]) for r in pairs.take_all()]
        assert len(edges) >= 6 + 4  # both families densely connected
        for a, b in edges:
            assert by_id.loc[a, "split"] == by_id.loc[b, "split"]
            assert by_id.loc[a, "split_key"] == by_id.loc[b, "split_key"]

        # every family member carries the family-min canonical id
        assert set(by_id.loc[[3, 11, 20, 27, 35, 41],
                             "canonical_id"]) == {3}
        assert set(by_id.loc[[5, 14, 22, 30], "canonical_id"]) == {5}

    def test_singletons_match_plain_split(self, ray_session,
                                          split_fixture):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            doc_split_by_component,
        )
        from agentic_document_extraction_pdf_ray.pipelines.documents import (
            doc_split_assign,
        )
        d = split_fixture
        grp = _norm(doc_split_by_component(d)).set_index("doc_id")
        plain = _norm(doc_split_assign(d)).set_index("doc_id")
        for i in [50, 61, 72, 83]:
            assert grp.loc[i, "canonical_id"] == i
            assert grp.loc[i, "split_key"] == plain.loc[i, "split_key"]
            assert grp.loc[i, "split"] == plain.loc[i, "split"]

    def test_lsh_fed_equals_exact_fed(self, ray_session, split_fixture):
        from agentic_document_extraction_pdf_ray.pipelines.dedup import (
            doc_split_by_component, minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )
        d = split_fixture
        a = _norm(doc_split_by_component(
            d, pairs=ngram_jaccard_pairs(d, threshold=0.5)))
        b = _norm(doc_split_by_component(
            d, pairs=minhash_lsh_pairs(d, threshold=0.5)))
        pd.testing.assert_frame_equal(a, b, check_exact=True)
