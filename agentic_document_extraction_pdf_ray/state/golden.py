"""Versioned golden-sample store — the ground-truth corpus manager
(reference ``src/evaluation/golden_dataset.py:24-260``: GoldenSample /
GoldenDataset with add/remove/filter, content hashing, versioned JSON
save/load), re-expressed Ray-Data-native:

- a dataset VERSION is an immutable Parquet snapshot under
  ``<root>/<name>/v<NNN>/`` with a tiny ``manifest.json`` (version,
  description, counts, order-insensitive content hash);
- mutation APIs (``add_samples`` / ``remove_samples``) are COPY-ON-WRITE:
  they write the next version and leave every prior version readable —
  the Dataset-immutability analogue of the reference's in-place list
  mutations + re-save;
- reads return a streaming ``ray.data.Dataset`` (column-pruned at the
  parquet read), so a golden corpus can be evaluation-joined at any size
  (``pipelines/evaluate.field_match_counts`` consumes it directly);
- the content hash is a commutative fold of per-row hashes (computed
  inside ``map_batches``), so identical sample SETS hash identically
  regardless of partitioning or row order, and ``commit`` deduplicates:
  re-committing unchanged content returns the existing version.

Sample schema (the GoldenSample fields, conversation-shaped):
    sample_id:string  document_type:string  schema_name:string
    expected_fields:map<string,string>  source_file:string
    tags:list<string>
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SAMPLE_SCHEMA = pa.schema([
    ("sample_id", pa.string()),
    ("document_type", pa.string()),
    ("schema_name", pa.string()),
    ("expected_fields", pa.map_(pa.string(), pa.string())),
    ("source_file", pa.string()),
    ("tags", pa.list_(pa.string())),
])


def samples_table(rows: list[dict[str, Any]]) -> pa.Table:
    """Build a samples table from GoldenSample-shaped dicts (the
    ``create_sample`` factory analogue)."""
    return pa.Table.from_pylist([
        {
            "sample_id": r["sample_id"],
            "document_type": r.get("document_type", ""),
            "schema_name": r.get("schema_name", ""),
            "expected_fields": sorted(
                (r.get("expected_fields") or {}).items()),
            "source_file": r.get("source_file", ""),
            "tags": list(r.get("tags") or []),
        }
        for r in rows
    ], schema=SAMPLE_SCHEMA)


def _row_hashes(batch: pa.Table) -> np.ndarray:
    """Per-row uint64 content hash over the CANONICAL row form (fields
    and tags sorted), independent of row position."""
    from ..functions.hashing import hash_str_array

    fields_sorted = [
        "" if kv is None else
        "\x1e".join(f"{k}\x1f{v}" for k, v in sorted(kv))
        for kv in batch["expected_fields"].to_pylist()
    ]
    tags_sorted = ["\x1e".join(sorted(t or []))
                   for t in batch["tags"].to_pylist()]
    canon = [
        "\x1d".join((sid or "", dt or "", sn or "", f, sf or "", tg))
        for sid, dt, sn, f, sf, tg in zip(
            batch["sample_id"].to_pylist(),
            batch["document_type"].to_pylist(),
            batch["schema_name"].to_pylist(),
            fields_sorted,
            batch["source_file"].to_pylist(),
            tags_sorted)
    ]
    return hash_str_array(canon).astype(np.uint64)


class GoldenStore:
    """Versioned, content-hashed golden-corpus store over Parquet."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- layout helpers ----------------------------------------------------
    def _dir(self, name: str, version: int) -> str:
        return os.path.join(self.root, name, f"v{version:03d}")

    def versions(self, name: str) -> list[dict[str, Any]]:
        """Manifests of every committed version, ascending."""
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return []
        out = []
        # numeric order, not lexicographic: v1000 must sort after v999
        dirs = [d for d in os.listdir(base)
                if d.startswith("v") and d[1:].isdigit()]
        for d in sorted(dirs, key=lambda s: int(s[1:])):
            mf = os.path.join(base, d, "manifest.json")
            if os.path.exists(mf):
                with open(mf, encoding="utf-8") as f:
                    out.append(json.load(f))
        return out

    def latest_version(self, name: str) -> int | None:
        vs = self.versions(name)
        return vs[-1]["version"] if vs else None

    # -- write path --------------------------------------------------------
    def commit(self, name: str, samples, description: str = "") -> int:
        """Write the next immutable version; returns its number.

        ``samples`` is a ``ray.data.Dataset`` or a ``pa.Table`` in
        :data:`SAMPLE_SCHEMA`. Uniqueness of ``sample_id`` is enforced
        (the reference's add-time duplicate check); identical content to
        the latest version is deduplicated (no new version written).

        Crash safety (ADVICE r4): samples + manifest are written into a
        hidden temp directory and atomically renamed to ``v<NNN>`` only
        after the manifest is durable — a failure mid-commit leaves no
        half-version that a later commit could append into. Any
        manifestless ``v<NNN>`` left by a pre-fix crash is removed
        before its number is reused. NOTE: the input plan executes 2–3
        times (digest, optional global uniqueness pass, write) — a
        Dataset passed here must be DETERMINISTIC, or the manifest
        hash/count may not describe the written files.
        """
        import shutil

        import ray.data

        if isinstance(samples, pa.Table):
            ds = ray.data.from_arrow(samples)
        else:
            ds = samples

        # distributed content hash + id-uniqueness in one narrow pass
        def digest(batch: pa.Table) -> pa.Table:
            h = _row_hashes(batch)
            ids = batch["sample_id"]
            return pa.table({
                "h_sum": pa.array([int(h.sum(dtype=np.uint64))],
                                  pa.uint64()),
                "h_xor": pa.array([int(np.bitwise_xor.reduce(h))
                                   if len(h) else 0], pa.uint64()),
                "n": pa.array([len(h)], pa.int64()),
                "n_unique_local": pa.array(
                    [pc.count_distinct(ids).as_py()], pa.int64()),
            })

        parts = ds.map_batches(digest, batch_format="pyarrow").to_pandas()
        n = int(parts["n"].sum())
        h_sum = int(parts["h_sum"].to_numpy(np.uint64).sum(dtype=np.uint64))
        h_xor = int(np.bitwise_xor.reduce(
            parts["h_xor"].to_numpy(np.uint64))) if len(parts) else 0
        content_hash = f"{h_sum:016x}{h_xor:016x}"

        # cheap local check first; the exact global pass (another full
        # plan execution) only runs when >1 block means local counts
        # can't prove global uniqueness
        if int(parts["n_unique_local"].sum()) != n:
            raise ValueError("duplicate sample_id within a block")
        if len(parts) > 1:
            n_distinct = ds.select_columns(["sample_id"]).unique("sample_id")
            if len(n_distinct) != n:
                raise ValueError("duplicate sample_id in commit")

        latest = self.latest_version(name)
        if latest is not None:
            with open(os.path.join(self._dir(name, latest),
                                   "manifest.json"), encoding="utf-8") as f:
                if json.load(f)["content_hash"] == content_hash:
                    return latest            # unchanged content: no-op

        version = (latest or 0) + 1
        d = self._dir(name, version)
        if os.path.isdir(d):
            # manifestless leftover from a pre-fix crash (versions()
            # skipped it, so its number is being reused): remove it
            # rather than appending a second commit's files into it
            if os.path.exists(os.path.join(d, "manifest.json")):
                raise FileExistsError(
                    f"version dir {d} already committed")
            shutil.rmtree(d)
        tmp = os.path.join(os.path.dirname(d),
                           f".tmp-v{version:03d}-{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        ds.write_parquet(os.path.join(tmp, "samples"))
        with open(os.path.join(tmp, "manifest.json"), "w",
                  encoding="utf-8") as f:
            json.dump({"name": name, "version": version,
                       "description": description,
                       "sample_count": n,
                       "content_hash": content_hash}, f, indent=2)
        os.rename(tmp, d)          # atomic publish, manifest included
        return version

    def add_samples(self, name: str, new_samples,
                    description: str = "") -> int:
        """Copy-on-write add: union latest ∪ new → next version.
        Duplicate ``sample_id`` (within new, or vs existing) raises."""
        import ray.data

        if isinstance(new_samples, pa.Table):
            new_samples = ray.data.from_arrow(new_samples)
        latest = self.latest_version(name)
        ds = (self.load(name).union(new_samples)
              if latest is not None else new_samples)
        return self.commit(name, ds, description=description)

    def remove_samples(self, name: str, sample_ids: list[str],
                       description: str = "") -> int:
        """Copy-on-write remove by id → next version."""
        drop = set(sample_ids)

        def keep(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(
                batch["sample_id"],
                value_set=pa.array(sorted(drop), pa.string())))
            return batch.filter(mask)

        ds = self.load(name).map_batches(keep, batch_format="pyarrow")
        return self.commit(name, ds, description=description)

    # -- read path ---------------------------------------------------------
    def load(self, name: str, version: int | None = None,
             columns: list[str] | None = None):
        """Streaming Dataset over one version (latest by default)."""
        import ray.data

        if version is None:
            version = self.latest_version(name)
        if version is None:
            raise FileNotFoundError(f"no versions of '{name}' in {self.root}")
        return ray.data.read_parquet(
            os.path.join(self._dir(name, version), "samples"),
            columns=columns)

    def filter(self, name: str, version: int | None = None,
               document_type: str | None = None,
               schema_name: str | None = None,
               tag: str | None = None):
        """filter_by_type / filter_by_schema / filter_by_tag analogue as
        ONE vectorized predicate pass over the streaming read."""
        ds = self.load(name, version)

        def pred(batch: pa.Table) -> pa.Table:
            mask = np.ones(len(batch), bool)
            if document_type is not None:
                mask &= pc.equal(batch["document_type"],
                                 document_type).to_numpy(zero_copy_only=False)
            if schema_name is not None:
                mask &= pc.equal(batch["schema_name"],
                                 schema_name).to_numpy(zero_copy_only=False)
            if tag is not None:
                tags = batch["tags"]
                flat_hit = pc.equal(pc.list_flatten(tags), tag)
                lens = pc.list_value_length(tags).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                rows = np.repeat(np.arange(len(batch)), lens)
                hit = np.zeros(len(batch), bool)
                hits = flat_hit.to_numpy(zero_copy_only=False)
                np.logical_or.at(hit, rows[hits], True)
                mask &= hit
            return batch.filter(pa.array(mask))

        return ds.map_batches(pred, batch_format="pyarrow")

    def stats(self, name: str, version: int | None = None) -> dict[str, Any]:
        """document_types / schema_names / all_tags / sample_count
        analogue, computed distributed (map-side distinct, tiny fold)."""
        ds = self.load(name, version,
                       columns=["document_type", "schema_name", "tags"])

        def partial(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_types": pa.array(
                    [pc.unique(batch["document_type"]).to_pylist()]),
                "schemas": pa.array(
                    [pc.unique(batch["schema_name"]).to_pylist()]),
                "tags": pa.array(
                    [pc.unique(pc.list_flatten(batch["tags"])).to_pylist()]),
                "n": pa.array([len(batch)], pa.int64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        return {
            "sample_count": int(parts["n"].sum()),
            "document_types": sorted(
                {x for xs in parts["doc_types"] for x in xs}),
            "schema_names": sorted(
                {x for xs in parts["schemas"] for x in xs}),
            "all_tags": sorted({x for xs in parts["tags"] for x in xs}),
        }
