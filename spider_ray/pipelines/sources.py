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


# ---------------------------------------------------------------------------
# WARC (the web-archive format Common-Crawl ships) — minimal response
# records, written sharded and read back as a distributed source
# ---------------------------------------------------------------------------

def write_warc_shards(pages_path: str, out_dir: str,
                      shards: int = 8) -> str:
    """Convert a pages parquet into `shards` plain (uncompressed) WARC
    files of minimal response records:

        WARC/1.0\\r\\n
        WARC-Type: response\\r\\n
        WARC-Target-URI: <url>\\r\\n
        Content-Length: <len(html)>\\r\\n
        \\r\\n
        <html bytes>\\r\\n\\r\\n

    Distributed: one Ray task per shard reads its row-range slice of the
    parquet (row-group pruned by pyarrow) and streams records to its
    file; idempotent via a _DONE marker keyed on the source version."""
    import ray
    import pyarrow.parquet as pq

    st = os.stat(pages_path)
    out = os.path.join(out_dir,
                       f"warc-{st.st_mtime_ns}-{st.st_size}-{shards}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    n = pq.ParquetFile(pages_path).metadata.num_rows
    bounds = [n * i // shards for i in range(shards + 1)]

    @ray.remote(num_cpus=0.5)
    def write_shard(i: int) -> int:
        # read ONLY the row groups overlapping this shard's row range —
        # a full read_table per shard would decode the whole corpus
        # `shards` times over
        pf = pq.ParquetFile(pages_path)
        md = pf.metadata
        offs = [0]
        for g in range(md.num_row_groups):
            offs.append(offs[-1] + md.row_group(g).num_rows)
        lo, hi = bounds[i], bounds[i + 1]
        groups = [g for g in range(md.num_row_groups)
                  if offs[g + 1] > lo and offs[g] < hi]
        if not groups:
            t = pq.read_schema(pages_path).empty_table() \
                .select(["url", "html"])
        else:
            t = pf.read_row_groups(groups, columns=["url", "html"])
            t = t.slice(lo - offs[groups[0]], hi - lo)
        path = os.path.join(out, f"shard-{i:04d}.warc")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            for url, html in zip(t["url"].to_pylist(),
                                 t["html"].to_pylist()):
                body = html if isinstance(html, bytes) \
                    else str(html).encode()
                f.write(b"WARC/1.0\r\n"
                        b"WARC-Type: response\r\n"
                        b"WARC-Target-URI: " + url.encode() + b"\r\n" +
                        f"Content-Length: {len(body)}\r\n\r\n".encode()
                        + body + b"\r\n\r\n")
        os.replace(tmp, path)
        return t.num_rows

    ray.get([write_shard.remote(i) for i in range(shards)])
    with open(marker, "w") as f:
        f.write("ok")
    return out


def read_warc(warc_dir: str):
    """Distributed WARC source: one binary read per shard file
    (ray.data.read_binary_files), records parsed per file by
    Content-Length walking (O(records) header scans, body extraction by
    slice — bodies are never re-scanned).  Returns Dataset[(url,
    html)]."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_binary_files(warc_dir, file_extensions=["warc"])

    def parse(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for buf in t["bytes"].to_pylist():
            pos = 0
            while pos < len(buf):
                hdr_end = buf.index(b"\r\n\r\n", pos)
                header = buf[pos:hdr_end].decode()
                fields = {}
                for line in header.split("\r\n")[1:]:
                    k, _, v = line.partition(": ")
                    fields[k] = v
                clen = int(fields["Content-Length"])
                body_start = hdr_end + 4
                urls.append(fields["WARC-Target-URI"])
                htmls.append(buf[body_start:body_start + clen])
                pos = body_start + clen + 4  # trailing \r\n\r\n
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return ds.map_batches(parse, batch_format="pyarrow")


def warc_source_host_stats(sf_dir: str):
    """End-to-end WARC roundtrip over the crawl fixture: pages parquet →
    sharded WARC sink → distributed WARC source → text extraction with
    the SHARED kernel → per-host (docs, total extracted chars).
    rows-only for the driver (the corpus is self-generated); pytest
    pins the parsed (url, html) EXACTLY equal to the source parquet
    and the stats to a DuckDB aggregate over it."""
    from ..common.extract import extract_text_batch
    from ..common.urlnorm import host_of_batch
    from .crawl_queries import run_crawl_cached

    eng = run_crawl_cached(sf_dir)  # shares the cached fixture
    warc_dir = write_warc_shards(eng.pages_path,
                                 os.path.join(_CACHE_ROOT, "warc"))

    def stats(t: pa.Table) -> pa.Table:
        texts = extract_text_batch(t["html"])
        nchars = pa.array([len(x) for x in texts], pa.int64())
        out = pa.table({"host": host_of_batch(t["url"]),
                        "n_chars": nchars})
        return pa.TableGroupBy(out, ["host"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")]
        ).rename_columns(["host", "total_chars", "docs"])

    from ray.data.aggregate import Sum

    return (read_warc(warc_dir)
            .map_batches(stats, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Sum("total_chars", alias_name="total_chars"),
                       Sum("docs", alias_name="docs"))
            .sort("host"))


def _partitioned_parquet_dir(sf_dir: str, table: str, col: str) -> str:
    """Write `table` hive-partitioned by `col` under /tmp (once per
    source version) and return the directory path — the standard
    partitioned-output layout a resumable 100 TB job writes (one
    directory per key, skippable on retry)."""
    import ray.data as rd

    src = f"{sf_dir}/{table}.parquet"
    st = os.stat(src)
    key = f"{os.path.basename(os.path.normpath(sf_dir))}-{table}-hive-" \
          f"{col}-{st.st_mtime_ns}-{st.st_size}"
    out = os.path.join(_CACHE_ROOT, key)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    rd.read_parquet(src).write_parquet(out, partition_cols=[col],
                                       mode="overwrite")
    with open(marker, "w") as f:
        f.write("ok")
    return out


def parquet_partition_pruned_stats(sf_dir: str, langs=("de", "en")):
    """Hive-partitioned parquet sink + PARTITION-PRUNED source: write
    documents partitioned by lang, then compute per-source stats for a
    lang subset by reading ONLY those langs' partition directories —
    the files of every other language are never opened (measured read
    fraction printed).  The DuckDB oracle runs a WHERE lang IN (...)
    over the ORIGINAL parquet, so equality certifies the partitioned
    write, the pruned read, AND that pruning lost no rows."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    root = _partitioned_parquet_dir(sf_dir, "documents", "lang")
    all_parts = sorted(d for d in os.listdir(root)
                       if d.startswith("lang="))
    hit = [d for d in all_parts
           if d.split("=", 1)[1] in set(langs)]
    print(f"[parquet_partition_pruned_stats] reading {len(hit)}/"
          f"{len(all_parts)} partitions "
          f"(read fraction {len(hit) / max(len(all_parts), 1):.3f})")
    files = [os.path.join(root, d, f)
             for d in hit
             for f in sorted(os.listdir(os.path.join(root, d)))
             if f.endswith(".parquet")]
    empty = pa.table({"lang": pa.array([], pa.string()),
                      "source": pa.array([], pa.string()),
                      "n_docs": pa.array([], pa.int64()),
                      "total_chars": pa.array([], pa.int64())})
    if not files:
        return rd.from_arrow(empty)
    # the partition column lives in the PATH, not the file — carry it
    # back via the per-directory read (lang is constant per directory)
    parts = []
    for d in hit:
        lang = d.split("=", 1)[1]
        fs = [os.path.join(root, d, f)
              for f in sorted(os.listdir(os.path.join(root, d)))
              if f.endswith(".parquet")]
        sub = rd.read_parquet(fs, columns=["source", "text"])

        def tag(t: pa.Table, _lang=lang) -> pa.Table:
            return pa.table({
                "lang": pa.array([_lang] * t.num_rows, pa.string()),
                "source": t["source"],
                "chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            })

        parts.append(sub.map_batches(tag, batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return (ds.groupby(["lang", "source"])
            .aggregate(Count(alias_name="n_docs"),
                       Sum("chars", alias_name="total_chars"))
            .sort(["lang", "source"]))
