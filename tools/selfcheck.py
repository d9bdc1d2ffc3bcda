"""Driver-style self-check: run each __ray_entry__.queries() entry and
compare against oracle_sql() via DuckDB (row count + schema + order-
insensitive value comparison), the way CORRECTNESS_r{N}.json is built.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # sort by exact-typed (non-float) columns first: sub-tolerance float
    # noise in a leading sort key would misalign rows between frames
    keys = sorted(df.columns, key=lambda c: (df[c].dtype.kind == "f", c))
    df = df.sort_values(keys, kind="mergesort").reset_index(drop=True)
    return df


def compare(df_ray: pd.DataFrame, df_sql: pd.DataFrame) -> list[str]:
    problems = []
    if len(df_ray) != len(df_sql):
        problems.append(f"rows {len(df_ray)} != {len(df_sql)}")
    if sorted(df_ray.columns) != sorted(df_sql.columns):
        problems.append(f"columns {sorted(df_ray.columns)} != {sorted(df_sql.columns)}")
        return problems
    a, b = _norm(df_ray), _norm(df_sql)
    if len(a) == len(b):
        for col in a.columns:
            x, y = a[col], b[col]
            if x.dtype.kind == "f" or y.dtype.kind == "f":
                import numpy as np
                ok = np.allclose(x.astype(float), y.astype(float),
                                 rtol=1e-9, atol=1e-9, equal_nan=True)
            else:
                ok = x.astype(str).equals(y.astype(str))
            if not ok:
                diff = (x != y)
                problems.append(f"col {col}: {int(getattr(diff, 'sum', lambda: 1)())} diffs "
                                f"e.g. ray={x[diff].head(3).tolist() if diff.any() else '?'} "
                                f"sql={y[diff].head(3).tolist() if diff.any() else '?'}")
    return problems


def main():
    sys.path.insert(0, "/root/repo")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import os

    import ray

    # DRIVER PARITY: the correctness driver runs at num_cpus=32, and
    # partitioning-dependent bugs (r4's tfidf join failure) are
    # invisible at lower parallelism — so the gate defaults to 32.
    # Override with SELFCHECK_CPUS to sweep (e.g. 3/4/8/32) before
    # committing join-bearing queries.  KNOWN FLOOR: num_cpus=2
    # deadlocks every Dataset.join — Ray's join reserves its
    # HashShuffleAggregator actors at min(1, cpus/2/partitions) CPU
    # each (2 x 0.5 at 2 CPUs) plus executor overhead, leaving < 1
    # CPU available, so no 1-CPU map task can ever schedule (verified:
    # available CPU pins at 0.75-0.8 forever).  3 CPUs works.
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("SELFCHECK_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        failures += 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df_ray = _to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows={len(df_ray)} ({dt:.1f}s) [rows-only]")
            continue
        df_sql = con.execute(oracles[name]).fetchdf()
        try:
            problems = compare(df_ray, df_sql)
        except Exception as ex:  # dtype surprises must not abort the run
            problems = [f"compare raised {type(ex).__name__}: {ex}"]
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: rows={len(df_ray)} ({dt:.1f}s) [sql-matched]")
    print("failures:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
