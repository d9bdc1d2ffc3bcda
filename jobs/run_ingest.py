"""Cluster job entry point for INCREMENTAL corpus ingestion: process
parquet shards as they land in an incoming directory, exactly once.

On a real cluster this is submitted per scheduling tick (the
reference's cron trigger semantics, reference pkg/spider/
workflow.go:186 run_scheduled) as:

    ray job submit --working-dir . -- \
        python jobs/run_ingest.py \
            --incoming /mnt/shared/landing/ \
            --out      /mnt/shared/ingested/

In this sandbox it runs against local parquet with
`ray.init(address="local")`.  Paths are filesystem paths (a shared
mount on a cluster); an object-store deployment must swap the
listdir/marker/claim calls for its store's conditional-put primitives.

Each pass lists the incoming shards, SKIPS every shard whose output
marker exists (exactly-once per shard, however many times the job
reruns or crashes mid-pass), and for each new shard runs the C4-style
quality filter (the oracle-checked _c4_reasons kernel) in one streaming
map_batches, writing
    out/<shard-stem>/kept/      the surviving documents (parquet)
    out/<shard-stem>/_SUCCESS   atomic marker with the shard's counts
Output is per-shard — the resumable partitioned layout: a failed pass
re-does only the unmarked shards.  Cross-shard near-dup composes with
the persisted minhash index (jobs/run_index.py --probe-dedup) — kept
deliberately out of the per-shard pass so each shard's work is
shard-sized.
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
    ap.add_argument("--incoming", required=True,
                    help="directory of landing parquet shards")
    ap.add_argument("--out", required=True, help="output root")
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

    import pyarrow as pa
    import ray.data as rd

    from spider_ray.pipelines.webtext import _c4_reasons

    shards = sorted(f for f in os.listdir(args.incoming)
                    if f.endswith(".parquet"))
    os.makedirs(args.out, exist_ok=True)
    processed, skipped = [], []
    import time

    claim_ttl = float(os.environ.get("INGEST_CLAIM_TTL_S", "3600"))
    for shard in shards:
        stem = shard[:-len(".parquet")]
        shard_out = os.path.join(args.out, stem)
        marker = os.path.join(shard_out, "_SUCCESS")
        if os.path.exists(marker):
            skipped.append(stem)
            continue
        # overlapping scheduled passes: claim the shard with O_EXCL
        # before touching its output dir, so two ticks never overwrite
        # kept/ concurrently.  A stale claim (crashed owner, older than
        # claim_ttl) is removed and the O_EXCL create RETRIED — the
        # remove+retry means exactly one contender wins the steal; a
        # claim vanishing mid-check (owner just finished) loops back to
        # the marker/create checks instead of crashing the pass.  The
        # marker, written LAST, stays the only completion signal.
        os.makedirs(shard_out, exist_ok=True)
        claim = os.path.join(shard_out, "_CLAIM")
        got_claim = False
        while not got_claim:
            if os.path.exists(marker):
                break  # another pass completed it while we contended
            try:
                fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"{os.getpid()} {time.time()}\n".encode())
                os.close(fd)
                got_claim = True
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(claim)
                except FileNotFoundError:
                    continue  # claim released: retry the create
                if age < claim_ttl:
                    break  # live owner: leave the shard to it
                try:
                    os.remove(claim)  # stale: one remover wins the retry
                except FileNotFoundError:
                    pass
        if not got_claim:
            skipped.append(stem + " (claimed)"
                           if not os.path.exists(marker) else stem)
            continue
        if os.path.exists(marker):  # completed between check and claim
            os.remove(claim)
            skipped.append(stem)
            continue
        ds = rd.read_parquet(os.path.join(args.incoming, shard))

        def keep(t: pa.Table) -> pa.Table:
            _n, reason = _c4_reasons(t["text"], t.num_rows)
            return t.filter(pa.array(reason == "ok"))

        kept_dir = os.path.join(shard_out, "kept")
        kept = ds.map_batches(keep, batch_format="pyarrow").materialize()
        n_kept = kept.count()
        kept.write_parquet(kept_dir, mode="overwrite")
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"shard": shard, "n_in": ds.count(),
                                "n_kept": n_kept}) + "\n")
        os.replace(tmp, marker)  # marker LAST: crash -> shard redone
        try:
            os.remove(claim)
        except FileNotFoundError:
            pass
        processed.append(stem)
        print(json.dumps({"stage": "shard", "shard": stem,
                          "n_kept": n_kept}))

    print(json.dumps({"done": True, "processed": processed,
                      "skipped": skipped}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
