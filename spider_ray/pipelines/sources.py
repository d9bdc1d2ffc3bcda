"""Alternative source/sink formats: CSV and JSON-lines.

The reference ingests only NATS subjects and emits only side-effect
sinks (SURVEY.md §2 negative list: "no file formats, no readers/
writers"); the graft adds Parquet everywhere, and this module adds the
other two formats a data-exchange pipeline meets in practice — each
exercised END TO END: a distributed Ray Data sink (`write_csv` /
`write_json`) producing a sharded directory, then the matching Ray Data
source reading it back, then an aggregate whose DuckDB oracle runs on
the ORIGINAL parquet — so equality certifies the whole
format-roundtrip, not just the reader.

Scale notes: both converters are Dataset writes (one file per block,
never a driver-side collect), so the conversion step itself is the
resumable partitioned-output pattern; the /tmp cache is keyed on the
source parquet's (mtime, size) like ann.build_ivf_index.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from . import read_table as _rp

_CACHE_ROOT = "/tmp/spider_ray_sources"


def _roundtrip_dir(sf_dir: str, table: str, fmt: str) -> str:
    """Write `table` to a sharded CSV/JSON directory under /tmp (once per
    source-file version) and return the directory path."""
    import ray.data as rd

    src = f"{sf_dir}/{table}.parquet"
    st = os.stat(src)
    key = f"{os.path.basename(os.path.normpath(sf_dir))}-{table}-{fmt}-" \
          f"{st.st_mtime_ns}-{st.st_size}"
    out = os.path.join(_CACHE_ROOT, key)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    ds = rd.read_parquet(src)
    if fmt == "csv":
        ds.write_csv(out)
    else:
        ds.write_json(out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def csv_source_doc_stats(sf_dir: str):
    """documents → distributed CSV sink → ray.data.read_csv → per-lang
    stats computed from the TEXT column (length recomputed, not the
    stored n_chars), so a quoting/escaping bug anywhere in the CSV
    path breaks the oracle hash."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    path = _roundtrip_dir(sf_dir, "documents", "csv")
    ds = rd.read_csv(path, file_extensions=["csv"])

    def lengths(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "text_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        })

    return (ds.map_batches(lengths, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("text_chars", alias_name="total_text_chars"))
            .sort("lang"))


def jsonl_source_token_stats(sf_dir: str):
    """documents → distributed JSON-lines sink → ray.data.read_json →
    per-source token totals (vectorized RE2 count over the roundtripped
    text — JSON string escaping must survive exactly)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    path = _roundtrip_dir(sf_dir, "documents", "json")
    ds = rd.read_json(path, file_extensions=["json"])

    def counts(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pattern="[A-Za-z0-9_]+")
        return pa.table({
            "source": t["source"],
            "n_tokens": pc.cast(n, pa.int64()),
        })

    return (ds.map_batches(counts, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="total_tokens"))
            .sort("source"))
