"""Cluster job entry point for the persisted-index builds over a
documents/embeddings corpus.

On a real cluster this is submitted as:

    ray job submit --working-dir . -- \
        python jobs/run_index.py \
            --sf s3://bucket/corpus/ \
            --out s3://bucket/indexes/run-001 \
            --text --minhash --ivf --search spark,window

In this sandbox it runs against local parquet with
`ray.init(address="local")` — the pipeline code is identical.

Stages (each idempotent via the builders' own source-keyed _SUCCESS
markers, so a rerun skips finished indexes — the resumable-output
contract every long index build needs):
  text     inverted postings file hive-partitioned by token-hash
           bucket (webtext.build_text_index)
  minhash  LSH band rows hive-partitioned by band-hash bucket
           (webtext.build_minhash_index)
  ivf      k-means cell index hive-partitioned by cell
           (ann.build_ivf_index)
Optional probes print their measured partition read fractions —
the observable proof the indexes prune:
  --search t1,t2   boolean AND retrieval against the text index
  --probe-dedup    incremental near-dup probe against the minhash index

The builders/probes are the oracle-checked driver queries
(index_boolean_search, dedup_incremental_indexed, ann_ivf_topk); this
CLI adds only argument plumbing and the summary lines.
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
    ap.add_argument("--sf", required=True,
                    help="corpus dir holding documents.parquet / "
                         "embeddings.parquet")
    ap.add_argument("--out", required=True,
                    help="root directory for the index trees")
    ap.add_argument("--text", action="store_true")
    ap.add_argument("--minhash", action="store_true")
    ap.add_argument("--ivf", action="store_true")
    ap.add_argument("--search", default=None,
                    help="comma-separated terms: probe the text index")
    ap.add_argument("--probe-dedup", action="store_true",
                    help="incremental near-dup probe vs the minhash index")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                    help="local mode only; ignored on a cluster")
    args = ap.parse_args()
    if not (args.text or args.minhash or args.ivf):
        ap.error("pick at least one of --text / --minhash / --ivf")

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {} if addr not in ("local", "") else {"num_cpus": args.num_cpus}
        ray.init(address=addr or "local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    summary: dict = {}
    if args.text:
        from spider_ray.pipelines.webtext import build_text_index

        d = build_text_index(args.sf,
                             index_root=os.path.join(args.out, "text"))
        summary["text_index"] = d
        print(json.dumps({"stage": "text", "dir": d}))
    if args.minhash:
        from spider_ray.pipelines.webtext import build_minhash_index

        d = build_minhash_index(args.sf,
                                index_root=os.path.join(args.out,
                                                        "minhash"))
        summary["minhash_index"] = d
        print(json.dumps({"stage": "minhash", "dir": d}))
    if args.ivf:
        from spider_ray.pipelines.ann import build_ivf_index

        d, _cent = build_ivf_index(args.sf,
                                   index_root=os.path.join(args.out,
                                                           "ivf"))
        summary["ivf_index"] = d
        print(json.dumps({"stage": "ivf", "dir": d}))

    if args.search:
        from spider_ray.pipelines.webtext import index_boolean_search

        terms = tuple(t for t in args.search.split(",") if t)
        hits = index_boolean_search(
            args.sf, terms,
            index_root=os.path.join(args.out, "text")).to_pandas()
        summary["search_hits"] = len(hits)
        print(json.dumps({"stage": "search", "terms": list(terms),
                          "hits": len(hits)}))
    if args.probe_dedup:
        from spider_ray.pipelines.webtext import dedup_incremental_indexed

        pairs = dedup_incremental_indexed(
            args.sf,
            index_root=os.path.join(args.out, "minhash")).to_pandas()
        summary["dedup_pairs"] = len(pairs)
        print(json.dumps({"stage": "probe_dedup", "pairs": len(pairs)}))

    print(json.dumps({"done": True, **summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
