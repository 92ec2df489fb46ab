"""Operator-level tests for the round-5 additions: PII scrub, the
deterministic epoch shuffle, and int8-class embedding quantization.
Each is checked against an independent driver-side reference
implementation (python ``re`` / numpy) at sf0.001."""

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from agentic_document_extraction_pdf_ray.pipelines import documents, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_pii_scrub_matches_python_re():
    got = documents.doc_pii_scrub(SF_DIR).to_pandas()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ids = docs["doc_id"].to_numpy(np.int64)
    seeded = (docs["text"].fillna("")
              + pd.Series(documents.pii_seed_suffix(ids)))
    pats = [(n, re.compile(p), tok) for n, p, tok in documents.PII_PATTERNS]
    ref = {"doc_id": ids}
    red = seeded.copy()
    for name, cre, tok in pats:
        ref[name] = seeded.map(lambda s: len(cre.findall(s)))
        red = red.map(lambda s: cre.sub(tok, s))
    ref["redacted_len"] = red.map(len)
    ref_df = pd.DataFrame(ref)
    merged = got.sort_values("doc_id").reset_index(drop=True)
    ref_df = ref_df.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        merged.astype(np.int64), ref_df.astype(np.int64))
    # the seed plants PII in 4/7 of docs — the scrub must see it
    assert merged[["n_emails", "n_ssns", "n_phones", "n_ipv4"]
                  ].to_numpy().sum() >= len(merged) * 4 // 7
    # and the redaction must remove every match (spot-check via re)
    for name, cre, tok in pats:
        assert not red.map(lambda s: bool(cre.search(s))).any()


@pytest.mark.usefixtures("ray_session")
def test_epoch_shuffle_is_shardwise_permutation():
    got = documents.doc_epoch_shuffle(SF_DIR, epoch=0,
                                      n_shards=8).to_pandas()
    ids = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    assert sorted(got["doc_id"]) == sorted(ids)
    for shard, grp in got.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
        # pos order == (shuffle_key, doc_id) lexicographic order
        srt = grp.sort_values(["shuffle_key", "doc_id"])
        assert srt["pos"].tolist() == sorted(srt["pos"])
    # keys are the documented md5 and shard is their 2-hex-char prefix
    k = hashlib.md5(f"{got['doc_id'].iloc[0]}|ep0".encode()).hexdigest()
    assert got["shuffle_key"].iloc[0] == k
    assert (got["shard"]
            == got["shuffle_key"].str[:2].map(lambda h: int(h, 16) // 32)
            ).all()


@pytest.mark.usefixtures("ray_session")
def test_epoch_shuffle_epochs_differ():
    e0 = documents.doc_epoch_shuffle(SF_DIR, epoch=0).to_pandas()
    e1 = documents.doc_epoch_shuffle(SF_DIR, epoch=1).to_pandas()
    m = e0.merge(e1, on="doc_id", suffixes=("_0", "_1"))
    assert (m["shuffle_key_0"] != m["shuffle_key_1"]).all()
    # a different epoch reorders: same doc rarely keeps (shard, pos)
    same = ((m["shard_0"] == m["shard_1"])
            & (m["pos_0"] == m["pos_1"])).mean()
    assert same < 0.1


@pytest.mark.usefixtures("ray_session")
def test_embedding_quantize_matches_numpy():
    got = (similarity.embedding_quantize(SF_DIR).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = np.array(tbl["embedding"].to_pylist(), np.float64)
    q = np.floor(emb * 1e6 + 0.5).astype(np.int64)
    lo = q.min(axis=0)
    span = np.maximum(q.max(axis=0) - lo, 1)
    code = (q - lo) * 255 // span
    assert code.min() >= 0 and code.max() <= 255
    ref = pd.DataFrame({
        "vec_id": tbl["vec_id"].to_numpy(),
        "code_sum": code.sum(axis=1),
        "code_min": code.min(axis=1),
        "code_max": code.max(axis=1),
        "n_dims": np.full(len(q), q.shape[1], np.int64),
    }).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  ref.astype(np.int64))
