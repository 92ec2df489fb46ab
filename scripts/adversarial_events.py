"""Adversarial events audit: events-family engine-vs-oracle on NULLs.

Derives a variant of the sf0.001 events table that breaks the graded
corpus's accidental invariants — NULL ``value``, NULL ``event_type``,
NULL / malformed ``props``, negative and huge values — then runs every
SQL-matched events-family query engine-vs-oracle with the driver's hash
compare (the documents/transcripts adversarial-audit pattern).

The DuckDB view mirrors the ENGINE's reader-side ingest normalization
(``pipelines.events._EVENT_FILLS``: missing event_type ≡ '', missing
value ≡ 0.0, missing props ≡ '{}') — the SQL expression of what
``read_events`` does to every batch. Driver-graded corpora carry no
NULLs, so the plain views the driver uses are equivalent there.

Usage: python scripts/adversarial_events.py [--build-only] [adv_dir]
Exit code = number of failures.
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001/events.parquet"

EVENTS_QUERIES = [
    "brand_cooccurrence", "events_ab_lift", "events_anomaly_days",
    "events_asof", "events_attribution_last_touch", "events_benford",
    "events_bot_users", "events_churn_labels", "events_cube",
    "events_cusum_changepoint", "events_daily", "events_daily_dense",
    "events_daily_full_outer", "events_daily_ma7", "events_daily_pivot",
    "events_daily_unpivot", "events_distinct_users", "events_dow_chisq",
    "events_first_last", "events_funnel", "events_funnel_latency",
    "events_heavy_hitters", "events_interarrival", "events_json_agg",
    "events_nearest_click", "events_retention",
    "events_rolling_distinct_users", "events_sessions",
    "events_sliding_2d", "events_top3_types", "events_transitions",
    "events_type_overlap", "events_user_fano", "events_user_gini",
    "events_user_islands", "events_user_mode", "events_user_paths",
    "events_user_rfm", "events_user_running_total",
    "events_user_type_entropy", "events_value_quantiles",
    "streaming_sessions", "user_days_click_except_purchase",
    "users_click_and_purchase",
]


def build(adv: str) -> None:
    os.makedirs(adv, exist_ok=True)
    base_dir = os.path.dirname(BASE)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "documents", "embeddings"):
        dst = f"{adv}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{base_dir}/{name}.parquet", dst)
    t = pq.read_table(BASE)
    val = t["value"].to_pylist()
    et = t["event_type"].to_pylist()
    props = t["props"].to_pylist()
    for i in range(t.num_rows):
        if i % 11 == 4:
            val[i] = None
        elif i % 13 == 6:
            val[i] = -abs(val[i] if val[i] is not None else 1.0)
        elif i % 17 == 9:
            val[i] = 1e9 + (i % 97)
        if i % 19 == 7:
            et[i] = None
        if i % 23 == 11:
            props[i] = None
        elif i % 23 == 15:
            props[i] = "{not json"
    out = pa.table({
        "event_id": t["event_id"],
        "ts": t["ts"],
        "user_id": t["user_id"],
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(val, pa.float64()),
        "props": pa.array(props, pa.string())})
    dst = f"{adv}/events.parquet"
    if os.path.islink(dst) or os.path.exists(dst):
        os.remove(dst)
    pq.write_table(out, dst)
    print(f"adversarial events at {dst}: {out.num_rows} rows "
          f"({sum(v is None for v in val)} NULL value, "
          f"{sum(x is None for x in et)} NULL type, "
          f"{sum(p is None for p in props)} NULL props)")


def value_hash(df) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    adv = args[0] if args else "/tmp/adversarial_sf"
    build(adv)
    if "--build-only" in sys.argv:
        return 0

    import duckdb
    import pandas as pd

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    # the reader-normalization view (mirrors events._EVENT_FILLS)
    con.execute(f"""
        CREATE VIEW events AS
        SELECT event_id, ts, user_id,
               coalesce(event_type, '') AS event_type,
               coalesce(value, 0.0) AS value,
               coalesce(props, '{{}}') AS props
        FROM read_parquet('{adv}/events.parquet')""")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name in EVENTS_QUERIES:
        t0 = time.time()
        try:
            res = qs[name](adv)
            got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            if name not in sqls:
                print(f"rows  {name}: {len(got)} rows "
                      f"({time.time()-t0:.1f}s) [rows-only]")
                continue
            want = con.execute(sqls[name]).fetchdf()
            ok = (len(got) == len(want)
                  and sorted(got.columns) == sorted(want.columns)
                  and value_hash(got) == value_hash(want))
            if not ok:
                failures += 1
            print(f"{'OK   ' if ok else 'FAIL '} {name}: ray={len(got)} "
                  f"oracle={len(want)} "
                  f"cols_ok={sorted(got.columns) == sorted(want.columns)} "
                  f"hash_ok={value_hash(got) == value_hash(want)} "
                  f"({time.time()-t0:.1f}s)")
        except Exception as ex:  # noqa: BLE001
            failures += 1
            print(f"FAIL  {name}: error {type(ex).__name__}: "
                  f"{str(ex)[:160]}")
    print(f"FAILURES: {failures}")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
