"""Per-host politeness-budget scheduling over the frontier.

Selection contract (must equal oracle.crawler): per host, the global
top-B candidates by (-priority, canonical_url), B = max_per_host_per_epoch.

Execution shape (SURVEY.md §7.3) — the full frontier is NEVER shuffled:

  1. combiner   map_batches(local top-B per host per block).  Output is
                ≤ hosts×B per block regardless of skew: a mega-host with
                10^9 frontier rows contributes ≤ B rows per block.
  2. salted reduce (only when the combined partials are still large):
                groupby("host_salt") with host_salt = host + '#' +
                url_hash % S — the north rule's "salted splits for
                mega-hosts": a hot host's partials spread over S groups,
                each reduced to top-B, before the final merge.
  3. final      per-host top-B over ≤ S×B rows/host (driver-side pandas;
                bounded by budget × hosts, not by frontier size.  At 10^7
                hosts the same _topb_pandas runs as one more
                groupby("host").map_groups round instead — same kernel).

The returned selection is ordered by the deterministic crawl order
(host, -priority, canonical_url) — a pure function of data, identical at
any parallelism (SURVEY.md §7.4 "Deterministic ordering").
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _topb_pandas(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Per-host top-B by (-priority, url). mergesort => stable/deterministic."""
    df = df.sort_values(["host", "neg_priority", "canonical_url"], kind="mergesort")
    return df.groupby("host", sort=False).head(budget)


def select_epoch(frontier_ds, budget: int, salt_groups: int = 16,
                 force_salted: bool = False) -> pd.DataFrame:
    """Run the selection; returns selected rows as pandas ordered by
    (host, -priority, canonical_url): canonical_url, host, priority,
    url_hash, part."""

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

    pdf = partials.to_pandas()
    if len(pdf) == 0:
        return pdf
    selected = _topb_pandas(pdf, budget).drop(columns=["neg_priority"])
    return selected.reset_index(drop=True)
