"""Training-data pipelines package.

Shared read helper: one definition of the column-pruned parquet read so
the path convention/read options live in exactly one place.
"""

from __future__ import annotations


def read_table(sf_dir: str, table: str, columns=None):
    """Column-pruned ray.data read of one testdata table."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def table_num_rows(sf_dir: str, table: str) -> int:
    """Row count of one testdata table from parquet FOOTER metadata —
    no Dataset execution, no data read (sizing hints, pruned-fraction
    reports)."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def sf_of(sf_dir: str, default: float = 0.001) -> float:
    """Parse the scale factor from an sfN path token; callers supply
    their own default for token-less paths (one regex, one place)."""
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir or "")
    return float(m.group(1)) if m else default


def join_partitions(*row_counts: int, rows_per_part: int = 150_000,
                    floor: int = 2) -> int:
    """Hash-join partition count from the (metadata-cheap) input sizes:
    enough partitions that each holds ~rows_per_part rows of the larger
    side, capped at the cluster CPU count.  Partition count is per-DATA,
    not per-machine: at sf0.1 a 600k-row join wants 4 partitions (a
    fixed 64 measured 2× the wall of 8 — every extra hash-shuffle
    aggregator adds constant cost), while a 10^10-row join saturates
    the CPU cap and scales with the cluster."""
    import ray

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    est = max(row_counts) if row_counts else 0
    need = max(floor, -(-est // rows_per_part))
    return max(floor, min(cpus, need))


def coalesce_for_join(ds, num_blocks: int):
    """Merge an Aggregate's output blocks before a hash join.  Ray's
    join shuffle broadcasts each side's schema to all aggregator
    partitions via the FIRST input bundle only (hash_shuffle.py marks
    `_has_schemas_broadcasted` at submission) — but `_shuffle_block`
    returns early on a zero-row block, so when the upstream Aggregate's
    first emitted block is one of its schema-less empties ("RefBundle
    with a different schema ... new schema: .") the broadcast is
    silently consumed, and any join partition that then receives no
    real rows for that side holds a ZERO-COLUMN table, which Acero
    rejects with 'No match or multiple matches for key field
    reference' (reproduced at 32 CPUs with a vocab-sized side; a
    map_batches pass cannot fix it — empty blocks survive map tasks).
    `repartition(num_blocks=...)` concatenates blocks, absorbing the
    schema-less empties into typed non-empty blocks, so the join's
    first bundle always carries a schema.  Size num_blocks to the
    join's own partition count (data-sized via join_partitions) so the
    merge is a split/concat pass, not an extra all-to-all."""
    return ds.repartition(num_blocks=num_blocks)


def distinct_tokens(ds, column_out: str = "token"):
    """Corpus vocabulary over a Dataset with a `text` column: per-batch
    distinct tokens (the shared split_tokens kernel) re-deduped by ONE
    grouped count — vocab-sized shuffle — returned as a SORTED pandas
    frame with one column.  One definition so the probe vocabularies of
    cms_token_counts and bpe_tokenize_stats can never drift from the
    tokenizer."""
    import numpy as np
    import pyarrow as pa

    from ..common.tokens import split_tokens

    def partials(t: pa.Table) -> pa.Table:
        flat, _ = split_tokens(t["text"])
        u = (np.unique(np.asarray(flat, dtype=object)) if len(flat)
             else np.array([], dtype=object))
        return pa.table({column_out: pa.array(u, pa.string())})

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby(column_out).count().drop_columns(["count()"])
            .sort(column_out).to_pandas())
