"""Build an ADVERSARIAL documents corpus for engine-vs-oracle auditing.

The driver-graded corpora (sf0.001/sf0.01) are all-lowercase with zero
NULL / empty texts, so an engine/oracle pair that disagrees on
``lower()`` / ``coalesce(text,'')`` conventions still gate-passes (the
round-4 ADVICE doc_bm25_topk finding was exactly this class). This
script materializes a corpus that BREAKS those accidental invariants —
mixed case, NULL text, empty / whitespace-only text, unicode accents,
tabs / newlines / runs of spaces, punctuation-adjacent tokens — while
keeping the schema and id/lang/source shape of the real table, then
symlinks every other table from a real sf dir so `scripts/
check_queries.py <adv_dir> <doc queries...>` runs the full side-by-side
hash comparison on it.

Usage:
    python scripts/adversarial_corpus.py [/tmp/adversarial_sf]
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"

WORDS = ["Stream", "BATCH", "shuffle", "Partition", "exactly", "Once",
         "Arrow", "vectorized", "café", "naïve", "Zürich", "token",
         "hash", "JOIN", "filter", "Window"]


def texts(n: int) -> list[str | None]:
    out: list[str | None] = []
    for i in range(n):
        if i % 11 == 3:
            out.append(None)                       # NULL text
        elif i % 13 == 5:
            out.append("")                         # empty
        elif i % 13 == 8:
            out.append("   \t  ")                  # whitespace-only
        else:
            k = 3 + (i * 7) % 9
            ws = [WORDS[(i * 31 + j * 17) % len(WORDS)] for j in range(k)]
            sep = ["  ", " ", "\t", "\n", " ", " ,  "][i % 6]
            body = sep.join(ws)
            if i % 5 == 0:
                body = "  " + body + "   "         # pad ends
            if i % 7 == 2:
                body = body.upper()
            out.append(body)
    return out


def main() -> int:
    adv = sys.argv[1] if len(sys.argv) > 1 else "/tmp/adversarial_sf"
    os.makedirs(adv, exist_ok=True)
    n = 500
    t = texts(n)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(t, pa.string()),
        "lang": pa.array([["en", "de", "es", "fr"][i % 4]
                          for i in range(n)], pa.string()),
        "source": pa.array([f"s{i % 5}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(x or "") for x in t], pa.int64()),
    })
    pq.write_table(tbl, f"{adv}/documents.parquet")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        dst = f"{adv}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{name}.parquet", dst)
    print(f"adversarial corpus at {adv}: {n} docs "
          f"({sum(x is None for x in t)} NULL, "
          f"{sum(x == '' for x in t if x is not None)} empty)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
