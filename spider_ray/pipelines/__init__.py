"""Training-data pipelines package.

Shared read helper: one definition of the column-pruned parquet read so
the path convention/read options live in exactly one place.
"""

from __future__ import annotations


def read_table(sf_dir: str, table: str, columns=None):
    """Column-pruned ray.data read of one testdata table."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def sf_of(sf_dir: str, default: float = 0.001) -> float:
    """Parse the scale factor from an sfN path token; callers supply
    their own default for token-less paths (one regex, one place)."""
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir or "")
    return float(m.group(1)) if m else default
