"""Cluster job entry point for link-graph analytics over a pages corpus.

On a real cluster this is submitted as:

    ray job submit --working-dir . -- \
        python jobs/run_graph.py \
            --pages s3://bucket/crawl/pages/ \
            --out   s3://bucket/graph/run-001 \
            --iters 5 --components

In this sandbox it runs against local parquet with
`ray.init(address="local")` — the pipeline code is identical.

Stages: derive the DISTINCT directed href graph from the pages table
(the same shared kernels the crawl fetch stage runs), write it as
partitioned parquet (`edges/`), run fixed-point PageRank over it
(`ranks/`), and optionally host-level connected components
(`components/`).  Each stage directory gets an atomic `_SUCCESS`
marker; a rerun skips completed stages (stage-level resume — each
stage is one streaming pass over its input).

The PageRank core is the oracle-checked graph.pagerank_edges (driver
queries pagerank_user_item / crawl_pagerank); this CLI adds only the
sinks and stage markers.
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


def _done(stage_dir: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, "_SUCCESS"))


def _mark(stage_dir: str, **info) -> str:
    summary = json.dumps({"done": True, **info})
    tmp = os.path.join(stage_dir, "_SUCCESS.tmp")
    with open(tmp, "w") as f:
        f.write(summary + "\n")
    os.replace(tmp, os.path.join(stage_dir, "_SUCCESS"))
    return summary


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages",
                    help="pages parquet (url, html, ...) — edges are "
                         "derived by re-parsing html")
    ap.add_argument("--edges-from",
                    help="pre-extracted edge parquet (e.g. a crawl run's "
                         "ckpt/epoch_*/edges/ shards from run_crawl.py "
                         "--emit-edges) — skips the html parse; shards "
                         "are made globally DISTINCT here")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--components", action="store_true",
                    help="also label host-level connected components")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                    help="local mode only; ignored on a cluster")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {} if addr not in ("local", "") else {"num_cpus": args.num_cpus}
        ray.init(address=addr or "local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from spider_ray.pipelines.crawl_queries import crawl_link_edges
    from spider_ray.pipelines.graph import pagerank_edges

    edges_dir = os.path.join(args.out, "edges")
    ranks_dir = os.path.join(args.out, "ranks")
    comp_dir = os.path.join(args.out, "components")

    if not _done(edges_dir):
        if bool(args.pages) == bool(args.edges_from):
            ap.error("exactly one of --pages / --edges-from is required")
        if args.edges_from:
            import glob

            matches = sorted(glob.glob(args.edges_from)) \
                if any(c in args.edges_from for c in "*?[") \
                else [args.edges_from]
            srcs = []
            for m in matches:  # expand dirs: read_parquet([...]) wants files
                srcs += sorted(glob.glob(os.path.join(m, "**", "*.parquet"),
                                         recursive=True)) \
                    if os.path.isdir(m) else [m]
            if not srcs:
                ap.error(f"--edges-from matched nothing: {args.edges_from}")
            edges = (rd.read_parquet(srcs)
                     .groupby(["src", "dst"]).count()
                     .drop_columns(["count()"]))
        else:
            edges = crawl_link_edges(args.pages)
        edges.write_parquet(edges_dir, mode="overwrite")
        print(_mark(edges_dir, stage="edges"))
    edges = rd.read_parquet(edges_dir)

    if not _done(ranks_dir):
        ranks = pagerank_edges(edges, iters=args.iters)
        ranks.write_parquet(ranks_dir, mode="overwrite")
        print(_mark(ranks_dir, stage="ranks", iters=args.iters))

    if args.components and not _done(comp_dir):
        # host-level components: collapse urls to hosts first (the
        # url-level graph of a crawl is one giant weak component by
        # construction; host granularity is the useful clustering)
        import pyarrow as pa

        from spider_ray.common.urlnorm import host_of_batch

        def to_hosts(t: pa.Table) -> pa.Table:
            out = pa.table({"src": host_of_batch(t["src"]),
                            "dst": host_of_batch(t["dst"])})
            return pa.TableGroupBy(out, ["src", "dst"]).aggregate([]) \
                .select(["src", "dst"])

        host_edges = (edges.map_batches(to_hosts, batch_format="pyarrow")
                      .groupby(["src", "dst"]).count()
                      .drop_columns(["count()"]))
        # reuse the components propagation via graph internals: the
        # same union-find/min-label shape as graph.graph_components,
        # applied to an explicit edge Dataset
        from spider_ray.pipelines.graph import components_of_edges

        comp = components_of_edges(host_edges)
        comp.write_parquet(comp_dir, mode="overwrite")
        print(_mark(comp_dir, stage="components"))

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
