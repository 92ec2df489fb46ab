"""Operator-level tests for the round-5 data-selection additions: DSIR
importance-resampling weights and per-source trigram diversity. Each is
checked against an independent driver-side pure-python/numpy reference
at sf0.001 (the DuckDB-oracle twin is covered separately by
test_queries_vs_duckdb's auto-discovery)."""

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from agentic_document_extraction_pdf_ray.pipelines import documents

SF_DIR = "/root/testdata/sf0.001"
K = 1024


def _grams(text: str) -> list[str]:
    toks = [t for t in " ".join((text or "").lower().split()).split(" ")
            if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:16], 16) % K


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_match_python_reference():
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas()
    raw = np.zeros(K)
    tgt = np.zeros(K)
    doc_buckets = {}
    for _, r in docs.iterrows():
        bs = [_bucket(g) for g in _grams(r["text"])]
        doc_buckets[r["doc_id"]] = bs
        for b in bs:
            raw[b] += 1
            if r["lang"] == "en":
                tgt[b] += 1
    lr = (np.log((tgt + 1.0) / (tgt.sum() + K))
          - np.log((raw + 1.0) / (raw.sum() + K)))

    got = (documents.doc_dsir_weights(SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(docs)
    want_w = {d: round(float(sum(lr[b] for b in bs)), 6)
              for d, bs in doc_buckets.items()}
    for _, r in got.iterrows():
        assert r["n_grams"] == len(doc_buckets[r["doc_id"]])
        assert abs(r["dsir_logw"] - want_w[r["doc_id"]]) < 1e-6

    # semantic property: the target slice must be upweighted on average
    merged = got.merge(docs[["doc_id", "lang"]], on="doc_id")
    en = merged.loc[merged["lang"] == "en", "dsir_logw"].mean()
    other = merged.loc[merged["lang"] != "en", "dsir_logw"].mean()
    assert en > other


@pytest.mark.usefixtures("ray_session")
def test_source_trigram_diversity_matches_python_reference():
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    per_src: dict[str, Counter] = {}
    for _, r in docs.iterrows():
        toks = [t for t in " ".join((r["text"] or "").lower().split())
                .split(" ") if t]
        tris = [f"{a} {b} {c}"
                for a, b, c in zip(toks, toks[1:], toks[2:])]
        per_src.setdefault(r["source"], Counter()).update(tris)

    got = (documents.source_trigram_diversity(SF_DIR)
           .sort_values("source").reset_index(drop=True))
    want = pd.DataFrame([
        {"source": s, "n_trigrams": int(sum(c.values())),
         "n_distinct": int(len(c)),
         "ttr": round(len(c) / sum(c.values()), 6)}
        for s, c in per_src.items() if sum(c.values())
    ]).sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    assert ((got["ttr"] > 0) & (got["ttr"] <= 1)).all()
    assert (got["n_distinct"] <= got["n_trigrams"]).all()
