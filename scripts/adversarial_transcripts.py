"""Adversarial transcripts audit: conv-family engine-vs-oracle on NULLs.

The generated transcript fixture already exercises mixed case, unicode
noise and empty/whitespace-only turns (sources/transcripts.py scenario
list), but contains no NULL ``text`` / ``tool`` and only the four
generator roles. This harness derives an adversarial copy (every 11th
text → NULL, every 17th tool → NULL, every 23rd role → 'system'),
repoints the fixed oracle symlink at it, and runs every SQL-matched
transcript-family query engine-vs-oracle with the driver's hash compare.

Usage: python scripts/adversarial_transcripts.py
Exit code = number of failures.
"""
from __future__ import annotations

import glob
import hashlib
import os
import sys
import time

BASE_FIXTURE_TURNS = 10_000
ADV_DIR = "/tmp/adversarial_transcripts"

# every transcript-family query with an oracle_sql() entry
CONV_QUERIES = [
    "conv_window_truncate", "conv_stream_flags", "turns_despeckle",
    "conv_stock_lines", "conv_link_domains", "conv_tool_latency",
    "conv_curation_report", "conv_role_trigrams", "conv_refusal_rate",
    "conv_lang_mismatch", "conv_verbosity_ratio", "conv_pii_leak_rate",
    "conv_time_splits", "conv_tool_transitions", "conv_dpo_pairs",
    "conv_turn_repeats", "conv_echo_rate", "conv_loss_mask_spans",
    "conv_first_msg_dedup", "conv_render_sft", "conv_sft_filter",
    "conv_context_growth", "conv_response_latency",
    "conv_role_alternation", "conv_tool_stats", "conv_modalities",
    "transcripts_quality_check", "conv_classify_fallback",
    "critic_combined",
]


def build_adversarial(src_dir: str, dst_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(dst_dir, exist_ok=True)
    for old in glob.glob(f"{dst_dir}/*.parquet"):
        os.remove(old)
    i0 = 0
    for f in sorted(glob.glob(f"{src_dir}/*.parquet")):
        t = pq.read_table(f)
        n = t.num_rows
        text = t["text"].to_pylist()
        tool = t["tool"].to_pylist()
        role = t["role"].to_pylist()
        for j in range(n):
            i = i0 + j
            if i % 11 == 4:
                text[j] = None
            if i % 17 == 6:
                tool[j] = None
            if i % 23 == 9:
                role[j] = "system"
        out = pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": t["ts"]})
        pq.write_table(out, f"{dst_dir}/{os.path.basename(f)}")
        i0 += n


def value_hash(df) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
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
    from agentic_document_extraction_pdf_ray.sources.transcripts import (
        transcripts_path,
    )

    src = transcripts_path(BASE_FIXTURE_TURNS, seed=42)
    build_adversarial(src, ADV_DIR)

    # repoint the fixed oracle symlink at the adversarial table and pin
    # the engine-side resolver to the same dir
    link = e._TRANSCRIPTS_ORACLE_LINK
    tmp = link + ".lnk"
    try:
        os.remove(tmp)
    except FileNotFoundError:
        pass
    os.symlink(ADV_DIR, tmp, target_is_directory=True)
    os.replace(tmp, link)
    e._transcripts_for = lambda sf_dir: ADV_DIR          # monkeypatch

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name in CONV_QUERIES:
        t0 = time.time()
        try:
            res = qs[name](sf)
            got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            if name not in sqls:
                print(f"rows  {name}: {len(got)} rows "
                      f"({time.time()-t0:.1f}s) [rows-only]")
                continue
            want = con.execute(sqls[name]).fetchdf()
            ok = (len(got) == len(want)
                  and sorted(got.columns) == sorted(want.columns)
                  and value_hash(got) == value_hash(want))
            tag = "OK   " if ok else "FAIL "
            if not ok:
                failures += 1
            print(f"{tag} {name}: ray={len(got)} oracle={len(want)} "
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
