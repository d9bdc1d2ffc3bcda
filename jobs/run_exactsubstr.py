"""Cluster job entry point for ExactSubstr dedup (Lee et al. 2021):
report duplicated token spans across a corpus and write the deduped
(kept-token) corpus.

On a real cluster this is submitted as:

    ray job submit --working-dir . -- \
        python jobs/run_exactsubstr.py \
            --docs s3://bucket/corpus/ \
            --out  s3://bucket/exactsubstr/run-001 \
            --k 8 [--spans-only] [--force-distributed]

In this sandbox it runs against local parquet with
`ray.init(address="local")` — the pipeline code is identical.

Output layout (both stages resumable via atomic `_SUCCESS` markers —
a rerun that finds a stage's marker skips that stage):

    out/spans/   (doc_id, span_start, span_end, n_tokens)   + _SUCCESS
    out/dedup/   (doc_id, n_tokens_kept, text_dedup)        + _SUCCESS

The driver-facing variants (`dedup_substring_spans`,
`dedup_substring_apply` in __ray_entry__) are DuckDB-hash-checked; this
CLI adds only the partitioned sinks and stage-level resume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rows_under(path: str) -> int:
    import pyarrow.parquet as pq

    rows = 0
    for root, _, files in os.walk(path):
        rows += sum(pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                    for f in files if f.endswith(".parquet"))
    return rows


def _finish(stage_dir: str, payload: dict) -> None:
    tmp = os.path.join(stage_dir, "_SUCCESS.tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps(payload) + "\n")
    os.replace(tmp, os.path.join(stage_dir, "_SUCCESS"))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True,
                    help="directory containing documents.parquet")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--k", type=int, default=8,
                    help="duplicate window width in tokens")
    ap.add_argument("--spans-only", action="store_true",
                    help="write the span report but not the deduped corpus")
    ap.add_argument("--force-distributed", action="store_true")
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

    from spider_ray.pipelines.webtext import (dedup_substring_apply,
                                              dedup_substring_spans)

    summaries = []

    spans_dir = os.path.join(args.out, "spans")
    if os.path.exists(os.path.join(spans_dir, "_SUCCESS")):
        with open(os.path.join(spans_dir, "_SUCCESS")) as f:
            summaries.append(json.loads(f.read()))
    else:
        spans = dedup_substring_spans(
            args.docs, k=args.k, force_distributed=args.force_distributed)
        spans.write_parquet(spans_dir, mode="overwrite")
        s = {"stage": "spans", "rows": _rows_under(spans_dir), "k": args.k}
        _finish(spans_dir, s)
        summaries.append(s)

    if not args.spans_only:
        dedup_dir = os.path.join(args.out, "dedup")
        if os.path.exists(os.path.join(dedup_dir, "_SUCCESS")):
            with open(os.path.join(dedup_dir, "_SUCCESS")) as f:
                summaries.append(json.loads(f.read()))
        else:
            deduped = dedup_substring_apply(
                args.docs, k=args.k,
                force_distributed=args.force_distributed)
            deduped.write_parquet(dedup_dir, mode="overwrite")
            s = {"stage": "dedup", "rows": _rows_under(dedup_dir),
                 "k": args.k}
            _finish(dedup_dir, s)
            summaries.append(s)

    print(json.dumps({"done": True, "stages": summaries, "out": args.out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
