"""CLI driver for the flagship extraction job (`ray job submit`-able).

Usage:
    python scripts/run_extract.py --input DIR --output DIR \
        [--partitions 64] [--salted] [--resume] [--redact-phi] [--cpus N]

Owns its Ray session (guarded init); the library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="transcript parquet dir")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--salted", action="store_true",
                    help="use the mega-conversation-safe salted plan")
    ap.add_argument("--resume", action="store_true",
                    help="manifest-gated resumable run (atomic per-partition commits)")
    ap.add_argument("--redact-phi", action="store_true")
    ap.add_argument("--stats", action="store_true",
                    help="print ds.stats() per-stage breakdown to stderr "
                         "after the run (measure, don't guess)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import agentic_document_extraction_pdf_ray  # noqa: F401 (PYTHONPATH for workers)
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if args.cpus:
            kwargs["num_cpus"] = args.cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    if args.resume:
        from agentic_document_extraction_pdf_ray.pipelines.resume import run_resumable_extract
        res = run_resumable_extract(args.input, args.output,
                                    num_partitions=args.partitions)
        print(json.dumps({"computed": len(res["computed"]),
                          "skipped": len(res["skipped"]),
                          "wall_sec": round(time.time() - t0, 2)}))
    else:
        if args.salted:
            from agentic_document_extraction_pdf_ray.pipelines.scale import extract_pipeline_salted
            ds = extract_pipeline_salted(args.input)
        else:
            from agentic_document_extraction_pdf_ray.pipelines.extract import (
                add_partition_id, extract_pipeline,
            )
            ds = add_partition_id(extract_pipeline(args.input), args.partitions)
        if args.redact_phi:
            from agentic_document_extraction_pdf_ray.stages.phi import redact_batch
            ds = ds.map_batches(redact_batch, batch_format="pyarrow")
        if args.salted or args.redact_phi:
            ds.write_parquet(args.output)
        else:
            ds.write_parquet(args.output, partition_cols=["partition_id"])
        print(json.dumps({"wall_sec": round(time.time() - t0, 2)}))
        if args.stats:
            print(ds.stats(), file=sys.stderr)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
