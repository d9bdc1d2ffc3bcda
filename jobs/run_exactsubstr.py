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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray worker processes don't inherit the driver's sys.path mutation; export
# it so a launch from any cwd (ray job submit working-dir, /tmp scripts)
# still lets workers deserialize spider_ray closures.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


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

    from spider_ray.pipelines import read_table
    from spider_ray.pipelines.webtext import (dedup_substring_spans,
                                              substring_apply_ds)

    docs_abs = os.path.abspath(args.docs)

    def _resume(stage_dir: str) -> dict | None:
        """Stage marker, validated against THIS run's parameters — a
        marker written with a different k or corpus must fail loudly,
        never silently mix stages computed under different settings."""
        p = os.path.join(stage_dir, "_SUCCESS")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            s = json.loads(f.read())
        if s.get("k") != args.k or s.get("docs") != docs_abs:
            raise SystemExit(
                f"{stage_dir}: _SUCCESS was written with k={s.get('k')} "
                f"docs={s.get('docs')}, but this run asked for "
                f"k={args.k} docs={docs_abs} — use a fresh --out")
        return s

    summaries = []

    spans_dir = os.path.join(args.out, "spans")
    s = _resume(spans_dir)
    if s is None:
        spans = dedup_substring_spans(
            args.docs, k=args.k, force_distributed=args.force_distributed)
        spans.write_parquet(spans_dir, mode="overwrite")
        s = {"stage": "spans", "rows": _rows_under(spans_dir),
             "k": args.k, "docs": docs_abs}
        _finish(spans_dir, s)
    summaries.append(s)

    if not args.spans_only:
        dedup_dir = os.path.join(args.out, "dedup")
        s = _resume(dedup_dir)
        if s is None:
            import ray.data as rd

            # reuse the spans stage's parquet — the corpus-wide window
            # aggregate (the job's dominant cost) is paid ONCE per run,
            # and a dedup-only resume reads the report instead of
            # recomputing it
            span_files = [os.path.join(root, f)
                          for root, _, fs in os.walk(spans_dir)
                          for f in fs if f.endswith(".parquet")]
            if span_files:
                spans_in = rd.read_parquet(span_files)
            else:  # a dup-free corpus writes no span parts
                import pyarrow as pa

                spans_in = rd.from_arrow(pa.schema(
                    [("doc_id", pa.int64()), ("span_start", pa.int64()),
                     ("span_end", pa.int64()), ("n_tokens", pa.int64())]
                ).empty_table())
            deduped = substring_apply_ds(
                lambda: read_table(args.docs, "documents",
                                   ["doc_id", "text"]),
                k=args.k, force_distributed=args.force_distributed,
                spans=spans_in)
            deduped.write_parquet(dedup_dir, mode="overwrite")
            s = {"stage": "dedup", "rows": _rows_under(dedup_dir),
                 "k": args.k, "docs": docs_abs}
            _finish(dedup_dir, s)
        summaries.append(s)

    print(json.dumps({"done": True, "stages": summaries, "out": args.out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
