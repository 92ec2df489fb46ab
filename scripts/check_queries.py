"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry through Ray and its ``oracle_sql()`` twin
through DuckDB on the same sf dir, comparing row count, column names, and
an order-insensitive value hash. Usage:

    python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: ray error {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            # deterministic rows-only queries carry a committed golden
            # parquet oracle at sf0.001 (numpy kernels, not SQL-expressible)
            golden = f"tests/golden/{name}_sf0.001.parquet"
            import os
            if sf_dir.rstrip("/").endswith("sf0.001") and os.path.exists(golden):
                import pyarrow.parquet as pq
                want = pq.read_table(golden).to_pandas()
                ok = (sorted(got.columns) == sorted(want.columns)
                      and len(got) == len(want)
                      and value_hash(got) == value_hash(want))
                status = "OK   " if ok else "FAIL "
                if not ok:
                    failures += 1
                print(f"{status} {name}: golden-parquet oracle "
                      f"rows={len(got)} ({dt:.1f}s)")
                continue
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [rows-only]")
            continue
        want = con.execute(sqls[name]).fetchdf()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "OK   " if ok_hash else "FAIL "
        if not ok_hash:
            failures += 1
        print(f"{status} {name}: ray={len(got)} oracle={len(want)} cols_ok={ok_cols} "
              f"hash_ok={ok_hash} ({dt:.1f}s)")
        if not ok_hash and ok_cols and ok_rows:
            g = got[sorted(got.columns)].astype(str)
            w = want[sorted(want.columns)].astype(str)
            gs = set(map(tuple, g.values.tolist()))
            ws = set(map(tuple, w.values.tolist()))
            print("   only-ray:", list(gs - ws)[:3])
            print("   only-oracle:", list(ws - gs)[:3])
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
