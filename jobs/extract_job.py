"""`ray job submit` entrypoint for the flagship extraction pipeline.

On a real fixed-size cluster (the north rule's N / 4N protocol):

    ray job submit --address http://<head>:8265 --working-dir . -- \
        python jobs/extract_job.py --input <transcripts_dir> \
        --output <out_dir> [--partitions 64] [--auto-skew]

In THIS sandbox the jobs CLI is environmentally gated — `ray job submit`
fails with "The Ray jobs CLI & SDK require the ray[default] installation"
(dashboard extras absent, installs prohibited; attempt recorded in
BASELINE.md). The same entrypoint therefore also runs directly:

    python jobs/extract_job.py --input ... --output ...

which is exactly what a submitted job executes on the driver pod —
`bench.py --scaling`'s fresh-process two-level protocol stands in for the
two cluster sizes.

The job is resumable: completed partitions are recorded in the output
manifest and skipped on re-submission (state/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory of transcript parquet files")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--auto-skew", action="store_true",
                    help="route mega-conversations through the salted plan")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import agentic_document_extraction_pdf_ray  # noqa: F401 (worker PYTHONPATH)
    import ray
    if not ray.is_initialized():                # a submitted job inherits
        ray.init(address="auto" if os.environ.get("RAY_ADDRESS") else "local")

    from agentic_document_extraction_pdf_ray.pipelines.extract import (
        extract_pipeline_auto)
    from agentic_document_extraction_pdf_ray.pipelines.resume import (
        run_resumable_extract)

    t0 = time.time()
    if args.auto_skew:
        # the auto-skew plan writes in one shot (no per-partition
        # manifest): clear any partial previous output so a re-submitted
        # job can't silently double rows
        import shutil
        shutil.rmtree(args.output, ignore_errors=True)
        extract_pipeline_auto(args.input).write_parquet(args.output)
        n = {"computed": "auto (non-resumable: output dir replaced)"}
    else:
        n = run_resumable_extract(args.input, args.output,
                                  num_partitions=args.partitions)
    n = {"computed": len(n.get("computed", [])),
         "skipped": len(n.get("skipped", []))} if isinstance(
             n.get("computed"), list) else n
    print(json.dumps({"job": "extract", "input": args.input,
                      "output": args.output, "partitions_done": n,
                      "wall_sec": round(time.time() - t0, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
