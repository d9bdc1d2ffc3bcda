"""Seen-set admission stress: evidence for the 10^10-frontier path.

The flagship claim (BASELINE.json north_rule) is a sharded
bloom+cuckoo+EXACT URL-seen set whose resident memory stays bounded at a
10^10-URL frontier via log-structured sorted-Parquet spill
(state/seen.py).  Unit tests pin correctness at forced-tiny capacities;
this job measures the OTHER half of the claim at volume: sustained
admission throughput and the resident-memory bound while the exact layer
is pushed orders of magnitude past `mem_capacity`.

It streams deterministic synthetic canonical URLs (a configurable
fraction re-drawn from already-admitted keys, like recrawl-heavy link
batches) through the engine's own two-phase protocol — `check` then
`add` of the new subset, routed by hash % shards exactly as
`engine._admit_frontier_part` does — and reports:

  * urls/s for check and for check+add (the seen-set's share of the
    crawl loop's admission budget),
  * per-shard resident exact entries vs the configured bound,
  * spilled run files/rows (proof the log structure engaged),
  * exactness: admitted-total == oracle distinct count (always on —
    the point of the exact layer is NO false positives at any spill
    state; a python-set oracle at stress sizes is ~100 MB, affordable).

Run (sandbox):
    python jobs/run_seenstress.py --urls 10_000_000 --shards 8 \
        --mem-capacity 262144 --dup-frac 0.3

On a real cluster, submit with `ray job submit` and size shards per
jobs/run_crawl.py's guidance; throughput scales with shard count until
the routing driver saturates (engine admission is partition-parallel,
see engine._admit_frontier_part — this stress drives the shard actors
directly, so its driver loop is the UPPER bound on per-driver routing
cost, not the engine's).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray worker processes don't inherit the driver's sys.path mutation; export
# it so a launch from any cwd (ray job submit working-dir, /tmp scripts)
# still lets workers deserialize spider_ray closures.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=lambda s: int(s.replace("_", "")),
                    default=2_000_000, help="total url observations to stream")
    ap.add_argument("--batch", type=int, default=65_536)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--mem-capacity", type=int, default=1 << 18,
                    help="per-shard resident exact-layer bound")
    ap.add_argument("--capacity", type=int, default=1 << 22,
                    help="per-shard bloom/cuckoo capacity")
    ap.add_argument("--dup-frac", type=float, default=0.3,
                    help="fraction of each batch re-drawn from already-seen keys")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused check_add admission (the driver "
                         "epoch path's protocol) instead of split "
                         "check/add rounds")
    ap.add_argument("--spill-root", default="/tmp/spider_ray_seenstress")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    from spider_ray.state.seen import SeenChecker, make_seen_shards

    shards = make_seen_shards(args.shards, capacity_per_shard=args.capacity,
                              spill_root=args.spill_root,
                              mem_capacity=args.mem_capacity)
    checker = SeenChecker(shards)

    rng = np.random.default_rng(7)
    n_batches = (args.urls + args.batch - 1) // args.batch
    next_key = 0          # fresh keys are sequential -> oracle count is exact
    t_check = t_add = 0.0
    admitted = 0
    streamed = 0
    hi_key = 0
    t0 = time.time()
    for b in range(n_batches):
        n = min(args.batch, args.urls - streamed)
        n_dup = int(n * args.dup_frac) if next_key else 0
        fresh = np.arange(next_key, next_key + (n - n_dup), dtype=np.int64)
        next_key += n - n_dup
        dup = (rng.integers(0, max(next_key, 1), size=n_dup, dtype=np.int64)
               if n_dup else np.zeros(0, dtype=np.int64))
        keys = np.concatenate([fresh, dup])
        # the engine keys the seen set on hash64(canonical_url); a
        # splitmix64 of the key is the same distribution without paying
        # string building at stress volume — urls ride along for the
        # collision-support layer on a sampled subset
        x = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        hashes = (x ^ (x >> np.uint64(31))).astype(np.int64)
        if args.fused:
            # the driver epoch path's protocol since round 4: verdict +
            # insert in ONE RPC round per shard (seen.check_add)
            t = time.time()
            new = checker.check_add(hashes)
            t_check += time.time() - t
            admitted += int(new.sum())
        else:
            t = time.time()
            new = checker.check(hashes)
            t_check += time.time() - t
            t = time.time()
            admitted += checker.add(hashes[new])
            t_add += time.time() - t
        streamed += n
        hi_key = next_key
    wall = time.time() - t0

    residents = ray.get([s.resident_exact.remote() for s in shards])
    sizes = ray.get([s.size.remote() for s in shards])
    # count only completed spill runs (run-*.parquet) — a leftover
    # *.parquet.tmp from an interrupted spill is not a resident run
    run_files = sum(1 for _, _, fs in os.walk(args.spill_root) for f in fs
                    if f.startswith("run-") and f.endswith(".parquet"))
    rss_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # exactness oracle: fresh keys are sequential and splitmix64 is a
    # 64-bit BIJECTION, so distinct keys can NEVER collide — the
    # admitted == distinct gate is strictly sound, no probability hedge
    report = {
        "urls_streamed": streamed,
        "admitted": admitted,
        "oracle_distinct": hi_key,
        "exact": bool(admitted == hi_key),
        "protocol": "fused" if args.fused else "two-phase",
        "urls_per_sec_total": round(streamed / wall, 1),
        "urls_per_sec_check": round(streamed / t_check, 1) if t_check else None,
        "urls_per_sec_add": round(streamed / t_add, 1) if t_add else None,
        "resident_exact_per_shard_max": int(max(residents)),
        "mem_capacity_bound": args.mem_capacity,
        "resident_within_bound": bool(
            max(residents) <= args.mem_capacity + 1 + args.mem_capacity // 4),
        "spilled_rows": int(sum(sizes) - sum(residents)),
        "spill_files": run_files,
        "driver_rss_mib": round(rss_kib / 1024, 1),
        "shards": args.shards,
        "wall_sec": round(wall, 2),
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0 if report["exact"] and report["resident_within_bound"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
