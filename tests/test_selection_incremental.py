"""Operator-level tests for the late-round-5 curation additions:
alpha-temperature language sampling weights, token-budget greedy
selection, and incremental snapshot dedup. Each is checked against an
independent driver-side pure-python/numpy reference at sf0.001 (the
DuckDB-oracle twin is covered by test_queries_vs_duckdb's
auto-discovery)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from agentic_document_extraction_pdf_ray.pipelines import dedup, documents

SF_DIR = "/root/testdata/sf0.001"


def _clean(t: str) -> str:
    return " ".join((t or "").split())


def _ntok(t: str) -> int:
    return len(_clean(t).split(" "))


@pytest.mark.usefixtures("ray_session")
def test_lang_temperature_weights_matches_python_reference():
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    docs["n_tokens"] = docs["text"].map(_ntok)
    agg = (docs.groupby("lang", as_index=False)
           .agg(n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
           .sort_values("lang").reset_index(drop=True))
    share = agg["n_tokens"].to_numpy(np.float64) / agg["n_tokens"].sum()
    powed = share ** 0.3
    prob = powed / powed.sum()

    got = (documents.lang_temperature_weights(SF_DIR).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    assert got["lang"].tolist() == agg["lang"].tolist()
    assert got["n_docs"].tolist() == agg["n_docs"].astype(int).tolist()
    assert got["n_tokens"].tolist() == agg["n_tokens"].astype(int).tolist()
    np.testing.assert_allclose(got["temp_prob"], np.round(prob, 6),
                               atol=1e-9)
    np.testing.assert_allclose(got["upsample"], np.round(prob / share, 6),
                               atol=1e-9)
    # semantic properties: a distribution, flattened toward uniform —
    # every below-average-share language is upsampled, every dominant
    # one downsampled
    assert abs(got["temp_prob"].sum() - 1.0) < 1e-5
    mean_share = 1.0 / len(got)
    assert (got.loc[got["token_share"] < mean_share, "upsample"] > 1).all()
    assert (got.loc[got["token_share"] > mean_share, "upsample"] < 1).all()


@pytest.mark.usefixtures("ray_session")
def test_doc_budget_select_matches_python_reference():
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    rows = []
    for _, r in docs.iterrows():
        ct = _clean(r["text"])
        n_chars = len(ct)
        denom = max(n_chars, 1)
        alpha = sum(c.isascii() and c.isalpha() for c in ct) / denom
        digit = sum(c.isdigit() for c in ct) / denom
        ntok = _ntok(r["text"])
        q = int(np.floor((0.4 * alpha + 0.3 * min(1.0, ntok / 100.0)
                          + 0.3 * (1.0 - digit)) * 10000 + 0.5))
        rows.append((r["doc_id"], q, ntok))
    ref = pd.DataFrame(rows, columns=["doc_id", "quality_x100", "n_tokens"])
    ref = ref.sort_values(["quality_x100", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    ref["cum_tokens"] = ref["n_tokens"].cumsum()
    budget = int(ref["n_tokens"].sum()) // 4
    want = ref[ref["cum_tokens"] <= budget]

    got = (documents.doc_budget_select(SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.sort_values("doc_id").reset_index(drop=True)
        [got.columns.tolist()])
    # greedy property: every kept doc's quality >= every dropped doc's
    # quality, up to the single boundary tie class
    kept = set(got["doc_id"])
    dropped = ref[~ref["doc_id"].isin(kept)]
    if len(got) and len(dropped):
        assert got["quality_x100"].min() >= dropped["quality_x100"].max() - 0


@pytest.mark.usefixtures("ray_session")
def test_dedup_incremental_matches_python_reference():
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    key = docs["text"].map(
        lambda t: hashlib.md5(_clean(t).lower().encode())
        .hexdigest()[:16])
    snap = set(key[docs["doc_id"] % 2 == 0])
    inc = docs["doc_id"] % 2 == 1
    want = pd.DataFrame({
        "doc_id": docs.loc[inc, "doc_id"].to_numpy(np.int64),
        "is_dup": key[inc].isin(snap).to_numpy(bool).astype(np.int64),
    }).sort_values("doc_id").reset_index(drop=True)

    got = (dedup.dedup_incremental(SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # every incoming doc answered exactly once
    assert got["doc_id"].is_unique
    assert (got["doc_id"] % 2 == 1).all()
