"""Similarity search over the ``embeddings(vec_id, embedding, label)`` table.

The FAISS-field-history analogue of the reference
(``/root/reference/src/memory/vector_store.py:66-480``, consumed by the
reconciler :484-514) re-expressed Ray-Data-first:

- brute-force cosine top-k: query matrix broadcast once via ``ray.put``,
  per-batch numpy matmul partial top-k, tiny driver-side merge;
- all-pairs near-dup: full (small) matrix broadcast, per-batch row-block ×
  matrix product;
- IVF-bucketed variant: coarse k-means-ish bucketing by argmax-component,
  groupby(bucket) local search — the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    emb = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    return ids, emb


def ann_topk(sf_dir: str, k: int = 5, n_queries: int = 10) -> pd.DataFrame:
    """Exact brute-force cosine top-k for the first ``n_queries`` vectors.

    The query matrix is broadcast ONCE (ray.put), each batch computes a
    partial top-k (vectorized matmul), the driver merges the tiny partials.
    Output: (query_id, neighbor_id, rank) — ints only, oracle-comparable.
    """
    ds = read_embeddings(sf_dir)
    qrows = ds.filter(lambda r: r["vec_id"] < n_queries).take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], np.int64)
    q = np.array([r["embedding"] for r in qrows], np.float64)
    q_norm = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_norm))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, qn = ray.get(q_ref)
        ids, emb = _batch_matrix(batch)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (emb / norms) @ qn.T                     # (batch, nq)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))
        for j in range(len(qi)):
            col = sims[:, j]
            idx = np.argpartition(-col, kk - 1)[:kk]
            for i in idx:
                if ids[i] != qi[j]:
                    out_q.append(qi[j])
                    out_n.append(ids[i])
                    out_s.append(col[i])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"],
        ascending=[True, False, True]).groupby("query_id").head(k)
    partials["rank"] = partials.groupby("query_id").cumcount() + 1
    return partials[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def embedding_near_dup(sf_dir: str, threshold: float = 0.45) -> ray.data.Dataset:
    """All-pairs cosine near-dup (doc_a < doc_b, sim ≥ threshold).

    The full matrix is broadcast once (fine to ~1M×64 fp32 = 256 MB; beyond
    that switch to the IVF-bucketed variant below). Per-batch row-block ×
    matrix matmul keeps the work distributed and vectorized.
    """
    ds = read_embeddings(sf_dir)
    all_rows = ds.take_all()
    all_rows.sort(key=lambda r: r["vec_id"])
    ids_all = np.array([r["vec_id"] for r in all_rows], np.int64)
    m = np.array([r["embedding"] for r in all_rows], np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    m_ref = ray.put((ids_all, m / norms))

    def block_pairs(batch: pa.Table) -> pa.Table:
        ia, mat = ray.get(m_ref)
        ids, emb = _batch_matrix(batch)
        bn = np.linalg.norm(emb, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        sims = (emb / bn) @ mat.T
        a_col, b_col, s_col = [], [], []
        for i in range(len(ids)):
            hits = np.where(sims[i] >= threshold)[0]
            for h in hits:
                if ids[i] < ia[h]:
                    a_col.append(int(ids[i]))
                    b_col.append(int(ia[h]))
                    s_col.append(float(sims[i, h]))
        return pa.table({"doc_a": pa.array(a_col, pa.int64()),
                         "doc_b": pa.array(b_col, pa.int64()),
                         "cosine": pa.array(s_col, pa.float64())})

    return ds.map_batches(block_pairs, batch_format="pyarrow")


def ann_topk_ivf(sf_dir: str, k: int = 5, n_queries: int = 10,
                 n_buckets: int = 8) -> pd.DataFrame:
    """LSH/IVF-bucketed variant: random-hyperplane bucket per vector, local
    search within the query's bucket set. Approximate — the 100 TB scale
    path (each bucket is a groupby partition; no full-matrix broadcast)."""
    rng = np.random.RandomState(42)
    ds = read_embeddings(sf_dir)
    first = ds.take(1)[0]
    dim = len(first["embedding"])
    planes = rng.randn(int(np.log2(n_buckets)), dim)
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids, emb = _batch_matrix(batch)
        bits = (emb @ pl.T) > 0
        bucket = np.zeros(len(ids), np.int64)
        for b in range(pl.shape[0]):
            bucket |= bits[:, b].astype(np.int64) << b
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64()),
                         "embedding": batch["embedding"]})

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def local_topk(group: pa.Table) -> pa.Table:
        ids, emb = _batch_matrix(group)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = emb / norms
        qmask = ids < n_queries
        out_q, out_n, out_s = [], [], []
        for qi in np.where(qmask)[0]:
            sims = mat @ mat[qi]
            order = np.argsort(-sims)
            cnt = 0
            for oi in order:
                if ids[oi] == ids[qi]:
                    continue
                out_q.append(int(ids[qi]))
                out_n.append(int(ids[oi]))
                out_s.append(float(sims[oi]))
                cnt += 1
                if cnt >= k:
                    break
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    res = bucketed.groupby("bucket").map_groups(
        local_topk, batch_format="pyarrow").to_pandas()
    res = res.sort_values(["query_id", "sim", "neighbor_id"],
                          ascending=[True, False, True])
    res = res.groupby("query_id").head(k)
    res["rank"] = res.groupby("query_id").cumcount() + 1
    return res[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
