"""Cluster job entry point for the composed training-data prep pipeline.

On a real cluster this is submitted as:

    ray job submit --working-dir . -- \
        python jobs/run_prep.py \
            --docs s3://bucket/corpus/ \
            --out  s3://bucket/prep/run-001 \
            --fuzzy --min-quality 0.8 --langs en,es,de,fr

In this sandbox it runs against local parquet with
`ray.init(address="local")` — the pipeline code is identical.

Output is PARTITIONED parquet (one directory per lang) with an atomic
`_SUCCESS` marker: a rerun that finds the marker skips the work
(idempotent job-level resume — the prep pipeline is a single streaming
pass, so the resume unit is the run, unlike the crawl engine's
per-epoch checkpoints).  The driver-facing variants of this pipeline
(`training_data_prep`, `training_data_prep_fuzzy` in __ray_entry__)
are DuckDB-hash-checked end-to-end; this CLI adds only the sink.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray worker processes don't inherit the driver's sys.path mutation; export
# it so a launch from any cwd (ray job submit working-dir, /tmp scripts)
# still lets workers deserialize spider_ray closures.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True,
                    help="directory containing documents.parquet")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--fuzzy", action="store_true",
                    help="add the MinHash near-dup stage after exact dedup")
    ap.add_argument("--min-quality", type=float, default=0.80)
    ap.add_argument("--langs", default="en,es,de,fr")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                    help="local mode only; ignored on a cluster")
    args = ap.parse_args()

    marker = os.path.join(args.out, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            print(f.read().strip())
        return 0

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {} if addr not in ("local", "") else {"num_cpus": args.num_cpus}
        ray.init(address=addr or "local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from spider_ray.pipelines.prep import (training_data_prep,
                                           training_data_prep_fuzzy)

    langs = tuple(s for s in args.langs.split(",") if s)
    fn = training_data_prep_fuzzy if args.fuzzy else training_data_prep
    out_ds = fn(args.docs, min_quality=args.min_quality, langs=langs)
    out_ds.write_parquet(args.out, partition_cols=["lang"],
                         mode="overwrite")

    import pyarrow.parquet as pq

    rows = 0
    for root, _, files in os.walk(args.out):
        rows += sum(pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                    for f in files if f.endswith(".parquet"))
    summary = json.dumps({"done": True, "rows": rows, "out": args.out,
                          "fuzzy": bool(args.fuzzy)})
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(summary + "\n")
    os.replace(tmp, marker)
    print(summary)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
