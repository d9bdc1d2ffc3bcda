"""Per-host politeness-budget scheduling over the frontier.

Selection contract (must equal oracle.crawler): per host, the global
top-B candidates by (-priority, canonical_url), B = max_per_host_per_epoch.

Execution shape (SURVEY.md §7.3) — the full frontier is NEVER shuffled
and the selection never lands on the driver:

  1. combiner   map_batches(local top-B per host per block).  Output is
                ≤ hosts×B per block regardless of skew: a mega-host with
                10^9 frontier rows contributes ≤ B rows per block.
  2. salted reduce (only when the combined partials are still large):
                groupby("host_salt") with host_salt = host + '#' +
                url_hash % S — the north rule's "salted splits for
                mega-hosts": a hot host's partials spread over S groups,
                each reduced to top-B, before the final merge.
  3. final      per-host top-B as a DISTRIBUTED groupby over coarse
                host-hash buckets (`groupby("host_bucket").map_groups`):
                all partials of one host land in one bucket; each bucket
                task runs the per-host pandas kernel over its ≤
                hosts_in_bucket × (blocks-or-S) × B rows.  Buckets (not
                raw hosts) keep the group count bounded — Ray map_groups
                over millions of tiny per-host groups would be dominated
                by per-group overhead.

The selected SET is a pure function of data (strict total key
(host, -priority, canonical_url), unique urls), so it is identical at
any parallelism (SURVEY.md §7.4 "Deterministic ordering").  Callers that
need the deterministic crawl ORDER sort the (budget-bounded) selection
afterwards — see engine._run_epoch's distributed order write.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _topb_pandas(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Per-host top-B by (-priority, url). mergesort => stable/deterministic."""
    df = df.sort_values(["host", "neg_priority", "canonical_url"], kind="mergesort")
    return df.groupby("host", sort=False).head(budget)


def select_epoch_ds(frontier_ds, budget: int, salt_groups: int = 16,
                    force_salted: bool = False, final_buckets: int = 64):
    """Distributed selection; returns a ray.data.Dataset of selected rows
    (canonical_url, host, priority, url_hash, part) — unordered set."""

    def local_topb(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(neg_priority=-batch["priority"])
        return _topb_pandas(batch, budget)

    partials = frontier_ds.map_batches(local_topb, batch_format="pandas",
                                       zero_copy_batch=True)

    if force_salted:
        # (at scale: trigger when combiner output stays large — e.g. by
        # tracking the previous epoch's partial count; a count() here
        # would cost an extra execution per epoch)
        def add_salt(df: pd.DataFrame) -> pd.DataFrame:
            salt = (df["url_hash"].to_numpy() % salt_groups).astype(np.int32)
            return df.assign(
                host_salt=df["host"] + "#" + pd.Series(salt, index=df.index).astype(str)
            )

        def group_topb(df: pd.DataFrame) -> pd.DataFrame:
            return _topb_pandas(df, budget)

        partials = (
            partials.map_batches(add_salt, batch_format="pandas")
            .groupby("host_salt")
            .map_groups(group_topb, batch_format="pandas")
            .drop_columns(["host_salt"])
        )

    # final reduce: all partials of a host meet in exactly one coarse
    # bucket (pandas str hash = stable per-process? NO — use a seeded
    # numpy hash over the url_hash-independent host bytes via pandas
    # util.hash_array, which is deterministic across processes).
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        hb = (pd.util.hash_array(df["host"].to_numpy(dtype=object))
              % final_buckets).astype(np.int64)
        return df.assign(host_bucket=hb)

    def bucket_topb(df: pd.DataFrame) -> pd.DataFrame:
        out = _topb_pandas(df, budget)
        return out.drop(columns=["host_bucket", "neg_priority"])

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("host_bucket")
        .map_groups(bucket_topb, batch_format="pandas")
    )


def select_map_part(part_files: list[str], budget: int,
                    buckets: int) -> list:
    """Task-fused selection, map side for ONE frontier partition: local
    top-B per host, split by the SAME deterministic host bucket rule as
    select_epoch_ds.add_bucket.  Returns `buckets` tables (the caller
    uses num_returns=buckets so each reduce task fetches only its
    bucket's slice — the bare table when buckets == 1, matching Ray's
    num_returns=1 non-unpacking).

    Set-equivalence to the Dataset path: top-B of the union of per-part
    top-Bs equals the global per-host top-B (any globally-selected row
    is necessarily in its own part's top-B), so the fused and Dataset
    selections produce the identical set at any partitioning — the
    engine's conformance tests pin this end-to-end."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pa.set_cpu_count(1)
    t = pq.read_table(part_files,
                      columns=["canonical_url", "host", "priority",
                               "url_hash", "part"],
                      use_threads=False)
    df = t.to_pandas().assign(neg_priority=-t["priority"].to_pandas())
    sel = _topb_pandas(df, budget).drop(columns=["neg_priority"])
    hb = (pd.util.hash_array(sel["host"].to_numpy(dtype=object))
          % buckets).astype(np.int64)
    order = np.argsort(hb, kind="stable")
    sel = sel.iloc[order]
    cuts = np.searchsorted(hb[order], np.arange(buckets + 1))
    out = [pa.Table.from_pandas(sel.iloc[cuts[h]:cuts[h + 1]],
                                preserve_index=False)
           for h in range(buckets)]
    return out[0] if buckets == 1 else out


def select_reduce_bucket(slice_refs: list, budget: int,
                         sel_dir: str, bucket: int) -> int:
    """Task-fused selection, reduce side for ONE host bucket: gather the
    bucket's per-part slices, finish the per-host top-B, stage the
    result per part (sel_dir/part=P/bucket-*.parquet — the same hive
    layout the Dataset path's write_parquet(partition_cols) produces,
    so every downstream consumer is unchanged).  Atomic renames +
    deterministic content => replay-safe."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    pa.set_cpu_count(1)
    parts = [t for t in ray.get(list(slice_refs))
             if t is not None and t.num_rows]
    if not parts:
        return 0
    df = pa.concat_tables(parts).to_pandas()
    df = df.assign(neg_priority=-df["priority"])
    sel = _topb_pandas(df, budget).drop(columns=["neg_priority"])
    pcol = sel["part"].to_numpy()
    for p in np.unique(pcol):
        sub = sel[pcol == p].drop(columns=["part"])
        d = os.path.join(sel_dir, f"part={int(p)}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"bucket-{bucket:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(sub, preserve_index=False), tmp)
        os.replace(tmp, path)
    return len(sel)


def select_epoch(frontier_ds, budget: int, salt_groups: int = 16,
                 force_salted: bool = False) -> pd.DataFrame:
    """Driver-side convenience wrapper (tests / tools): run the
    distributed selection, pull the budget-bounded result to pandas and
    order it by the deterministic crawl order.  The engine's distributed
    path does NOT use this — it keeps the selection as a Dataset."""
    sel = select_epoch_ds(frontier_ds, budget, salt_groups=salt_groups,
                          force_salted=force_salted).to_pandas()
    if len(sel) == 0:
        return sel
    sel = sel.assign(neg_priority=-sel["priority"])
    sel = _topb_pandas(sel, budget).drop(columns=["neg_priority"])
    return sel.reset_index(drop=True)
