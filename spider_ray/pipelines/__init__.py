"""Training-data pipelines package.

Shared read helper: one definition of the column-pruned parquet read so
the path convention/read options live in exactly one place.
"""

from __future__ import annotations


def read_table(sf_dir: str, table: str, columns=None):
    """Column-pruned ray.data read of one testdata table."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
