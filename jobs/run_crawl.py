"""Cluster job entry point for the crawl engine.

On a real fixed-size multi-node Ray cluster this is submitted as:

    ray job submit --working-dir . -- \
        python jobs/run_crawl.py \
            --pages  s3://bucket/pages/           \
            --seeds  s3://bucket/seeds.parquet    \
            --ckpt   s3://bucket/ckpt/run-001     \
            --politeness politeness.json          \
            --num-parts 4096 --seen-shards 256 --fetch-concurrency 1024

and again with --resume after any interruption (exact resume from the
checkpoint manifest).  In this sandbox it runs against local paths with
`ray.init(address="local")` — the engine code is identical; see
BENCH/BASELINE.md for the two-parallelism-level scaling evidence that
stands in for the N vs 4N cluster-size criterion.

Sizing guidance at 10^10-URL frontier (SURVEY.md §4.2/§7.4): num_parts
~= cluster cores; seen shards sized so cuckoo tables fit actor heaps
(~94 MB/shard at 256 shards, state/cuckoo.py capacity notes);
fetch_concurrency ~= total cores with 0.5-CPU reservations.
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
    ap.add_argument("--pages", required=True, help="pages parquet path")
    ap.add_argument("--seeds", help="seeds parquet path (fresh runs)")
    ap.add_argument("--ckpt", required=True, help="checkpoint directory")
    ap.add_argument("--politeness", required=True, help="politeness json path")
    ap.add_argument("--num-parts", type=int, default=32)
    ap.add_argument("--seen-shards", type=int, default=8)
    ap.add_argument("--fetch-concurrency", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--force-distributed", action="store_true",
                    help="disable driver-side small-data fast paths")
    ap.add_argument("--emit-edges", action="store_true",
                    help="also write per-epoch href-edge shards "
                         "(ckpt/epoch_*/edges/) for graph analytics")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                    help="local mode only; ignored on a cluster")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # on a cluster, RAY_ADDRESS is set by `ray job submit` and
        # address="auto" attaches; local sandbox runs standalone
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {} if addr not in ("local", "") else {"num_cpus": args.num_cpus}
        ray.init(address=addr or "local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from spider_ray.engine import CrawlEngine

    with open(args.politeness) as f:
        pol = json.load(f)
    eng = CrawlEngine(args.pages, pol, args.ckpt,
                      num_parts=args.num_parts,
                      seen_shards=args.seen_shards,
                      fetch_concurrency=args.fetch_concurrency,
                      force_distributed=args.force_distributed,
                      politeness_path=args.politeness,
                      emit_edges=args.emit_edges)
    if not args.seeds and not args.resume:
        ap.error("--seeds required for fresh runs")
    # --resume with --seeds: seeds pass through so resuming against a
    # missing/wiped checkpoint degrades to a fresh run instead of failing
    seeds = pq.read_table(args.seeds) if args.seeds else None
    manifest = eng.run(seeds=seeds, resume=args.resume)
    print(json.dumps({
        "done": manifest["done"],
        "epochs": len(manifest["epochs"]),
        "urls": sum(e["selected"] for e in manifest["epochs"]),
        "seen": eng.seen_count(),  # metadata-only: never materializes urls
        "ckpt": args.ckpt,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
