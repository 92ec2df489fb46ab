"""Deduplication pipelines: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Corpus-scale generalizations of the reference's exact duplicate detection
(``/root/reference/src/export/consolidated_export.py:53-83`` — normalized
identifier → group indices) and its Levenshtein near-dup matching
(``src/utils/string_utils.py:280-352``), re-expressed as shuffle-aware Ray
Data plans:

- exact:        hash-partition on the normalized key, keep-first per group
- n-gram:       shingle-explode → groupby(shingle) pair gen → pair counts →
                exact Jaccard (has an exact DuckDB oracle)
- MinHash-LSH:  per-doc signatures (vectorized numpy) → band buckets →
                groupby(band) candidates → signature-estimate filter
- SimHash:      64-bit fingerprints per doc (deterministic, mergeable)
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

from .documents import _norm_ws, read_documents

_WS_RE = re.compile(r"\s+")

_MERSENNE = (1 << 61) - 1


def _token_lists(batch: pa.Table) -> list[list[str]]:
    clean = _norm_ws(batch["text"]).to_pylist()
    return [t.split(" ") if t else [] for t in clean]


def _hash64(s: str) -> int:
    """Stable 64-bit hash from md5 (portable across processes/workers)."""
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


# ---------------------------------------------------------------- exact dedup

def dedup_exact_prefix(sf_dir: str, k: int = 8) -> ray.data.Dataset:
    """Exact dedup on the first-k-token normalized prefix.

    Emits one row per duplicate GROUP: (norm_key, n_docs, keeper=min doc_id).
    Hash-partition + per-group aggregate; no row data moves beyond the
    (key, doc_id) projection.
    """
    def keyed(batch: pa.Table) -> pa.Table:
        keys = [" ".join(toks[:k]) for toks in _token_lists(batch)]
        return pa.table({"norm_key": pa.array(keys, pa.string()),
                         "doc_id": batch["doc_id"]})

    ds = read_documents(sf_dir).map_batches(keyed, batch_format="pyarrow")
    agg = ds.groupby("norm_key").aggregate(
        Count(alias_name="n_docs"), Min("doc_id", alias_name="keeper"))
    return agg.filter(lambda r: r["n_docs"] > 1)


# ------------------------------------------------------------- n-gram Jaccard

def _distinct_shingles(batch: pa.Table, n: int) -> pa.Table:
    doc_ids: list[int] = []
    shingles: list[str] = []
    ids = batch["doc_id"].to_pylist()
    for i, toks in enumerate(_token_lists(batch)):
        seen = set()
        for j in range(len(toks) - n + 1):
            sh = " ".join(toks[j:j + n])
            if sh not in seen:
                seen.add(sh)
                doc_ids.append(ids[i])
                shingles.append(sh)
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                     "shingle": pa.array(shingles, pa.string())})


def ngram_jaccard_pairs(sf_dir: str, n: int = 3,
                        threshold: float = 0.12) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard near-dup pairs (doc_a < doc_b).

    Plan: shingle-explode → (a) per-doc distinct-shingle sizes (small table,
    broadcast via ray.put) and (b) groupby(shingle) generating intra-bucket
    pairs → groupby(pair) counting intersections → Jaccard filter.
    The shuffle key is the shingle, so hot shingles = hot buckets; the
    generator's vocabulary keeps buckets small, and a cap guards blowup.
    """
    import pandas as pd

    n_buckets = 64
    shingles = read_documents(sf_dir).map_batches(
        lambda b: _distinct_shingles(b, n), batch_format="pyarrow")

    sizes_ds = shingles.groupby("doc_id").aggregate(Count(alias_name="n_sh"))
    sizes = {r["doc_id"]: r["n_sh"] for r in sizes_ds.take_all()}
    sizes_ref = ray.put(sizes)

    # Shingles are hashed into a bounded bucket count; each bucket task does
    # a fully vectorized pandas self-join on the shingle column — avoiding
    # Ray's per-group reduce overhead at shingle cardinality (~#turns).
    # Each shingle lives in exactly one bucket, so per-bucket pair counts
    # sum to the global intersections.
    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [zlib.crc32(s.encode()) % n_buckets
                   for s in batch["shingle"].to_pylist()]
        return batch.append_column("_bucket", pa.array(buckets, pa.int64()))

    def bucket_pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        # guard against pathological hot shingles (bound the join fan-out)
        freq = g["shingle"].value_counts()
        g = g[g["shingle"].isin(freq[freq <= 200].index)]
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
               .agg(inter=("shingle", "size")))
        return out.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})

    partial_pairs = (shingles.map_batches(add_bucket, batch_format="pyarrow")
                     .groupby("_bucket")
                     .map_groups(bucket_pair_counts, batch_format="pandas"))

    # Final per-pair sum, again bucketed (pair cardinality is high).
    def add_pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        key = (b["doc_a"].to_numpy().astype("int64") << 20) ^ \
            b["doc_b"].to_numpy().astype("int64")
        return b.assign(_pb=key % n_buckets)

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["doc_a", "doc_b"], as_index=False)
                .agg(inter=("inter", "sum")))

    inter = (partial_pairs.map_batches(add_pair_bucket, batch_format="pandas")
             .groupby("_pb").map_groups(sum_bucket, batch_format="pandas"))

    def jaccard(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        it = batch["inter"].to_pylist()
        jac = [i / (sz[x] + sz[y] - i) for x, y, i in zip(a, b, it)]
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        out = out.filter(pc.greater_equal(out["jaccard"], threshold))
        return pa.table({"doc_a": out["doc_a"], "doc_b": out["doc_b"],
                         "inter": pc.cast(out["inter"], pa.int64()),
                         "jaccard": out["jaccard"]})

    return inter.map_batches(jaccard, batch_format="pyarrow")


# ---------------------------------------------------------------- MinHash-LSH

_MINHASH_PERMS = 128
_LSH_BANDS = 16           # 16 bands × 8 rows
_ROWS_PER_BAND = _MINHASH_PERMS // _LSH_BANDS


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=_MINHASH_PERMS, dtype=np.int64).astype(object)
    b = rng.randint(0, _MERSENNE, size=_MINHASH_PERMS, dtype=np.int64).astype(object)
    return a, b


class MinHasher:
    """Actor-pool stage: permutation params built once per actor
    (the stateful-stage pattern, SURVEY.md §2.3)."""

    def __init__(self, n: int = 3):
        self.n = n
        self.a, self.b = _perm_params()
        self.a_u = self.a.astype(np.uint64)
        self.b_u = self.b.astype(np.uint64)

    def signature(self, toks: list[str]) -> np.ndarray:
        shingles = {" ".join(toks[j:j + self.n])
                    for j in range(len(toks) - self.n + 1)}
        if not shingles:
            return np.zeros(_MINHASH_PERMS, np.uint64)
        h = np.array([_hash64(s) for s in shingles], np.uint64)
        # (a*h + b) mod p over uint64 with python-int fallback avoided:
        # do the modmul in float-free object space only once per doc batch
        # is too slow; use uint64 wraparound hashing instead (valid universal
        # family for LSH bucketing purposes).
        sig = np.empty(_MINHASH_PERMS, np.uint64)
        for i in range(_MINHASH_PERMS):
            sig[i] = np.min(self.a_u[i] * h + self.b_u[i])
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        out_doc: list[int] = []
        out_band: list[int] = []
        out_bucket: list[str] = []
        sigs: list[bytes] = []
        for did, toks in zip(doc_ids, _token_lists(batch)):
            sig = self.signature(toks)
            sigs.append(sig.tobytes())
            for band in range(_LSH_BANDS):
                chunk = sig[band * _ROWS_PER_BAND:(band + 1) * _ROWS_PER_BAND]
                out_doc.append(did)
                out_band.append(band)
                out_bucket.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
        sig_rep = [s for s in sigs for _ in range(_LSH_BANDS)]
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "bucket": pa.array(out_bucket, pa.string()),
            "sig": pa.array(sig_rep, pa.binary()),
        })


def minhash_lsh_pairs(sf_dir: str, n: int = 3,
                      threshold: float = 0.12) -> ray.data.Dataset:
    """Approximate near-dup candidate pairs via MinHash + LSH banding.

    shingle→minhash (actor pool) → (band, bucket) explode →
    groupby(band, bucket) → intra-bucket pairs → estimated-Jaccard filter
    (fraction of equal signature slots). Candidate generation never
    compares documents across buckets — the scale path for 100 TB.
    """
    sigs = read_documents(sf_dir).map_batches(
        MinHasher, batch_format="pyarrow", concurrency=4,
        fn_constructor_kwargs={"n": n})

    # LSH buckets are numerous (bands × distinct band-hashes); hash them
    # into a bounded super-bucket count so each reduce task iterates many
    # LSH buckets locally (per-group Ray overhead bypassed).
    def add_super_bucket(b: pa.Table) -> pa.Table:
        sb = [zlib.crc32(f"{band}|{bk}".encode()) % 64
              for band, bk in zip(b["band"].to_pylist(),
                                  b["bucket"].to_pylist())]
        return b.append_column("_sb", pa.array(sb, pa.int64()))

    def super_bucket_pairs(group: pa.Table) -> pa.Table:
        import collections
        by_bucket: dict[tuple, list[tuple]] = collections.defaultdict(list)
        bands = group["band"].to_pylist()
        buckets = group["bucket"].to_pylist()
        ids = group["doc_id"].to_pylist()
        sigs_col = group["sig"].to_pylist()
        for band, bk, did, sg in zip(bands, buckets, ids, sigs_col):
            by_bucket[(band, bk)].append((did, sg))
        a_col, b_col, est = [], [], []
        for rows in by_bucket.values():
            if len(rows) < 2 or len(rows) > 200:     # hot-bucket guard
                continue
            rows = sorted(rows)
            for i in range(len(rows)):
                si = np.frombuffer(rows[i][1], np.uint64)
                for j in range(i + 1, len(rows)):
                    if rows[i][0] == rows[j][0]:
                        continue
                    sj = np.frombuffer(rows[j][1], np.uint64)
                    e = float(np.mean(si == sj))
                    if e >= threshold:
                        a_col.append(rows[i][0])
                        b_col.append(rows[j][0])
                        est.append(e)
        return pa.table({"doc_a": pa.array(a_col, pa.int64()),
                         "doc_b": pa.array(b_col, pa.int64()),
                         "est_jaccard": pa.array(est, pa.float64())})

    pairs = (sigs.map_batches(add_super_bucket, batch_format="pyarrow")
             .groupby("_sb")
             .map_groups(super_bucket_pairs, batch_format="pyarrow"))
    # A pair can surface from several bands → dedup to its max estimate.
    from ray.data.aggregate import Max
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


# -------------------------------------------------------------------- SimHash

def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash per document over unigram token hashes."""
    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for toks in _token_lists(batch):
            acc = np.zeros(64, np.int64)
            for t in toks:
                h = _hash64(t)
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            sim = 0
            for i in range(64):
                if acc[i] > 0:
                    sim |= (1 << i)
            out.append(f"{sim:016x}")
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(out, pa.string())})
    return read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")
