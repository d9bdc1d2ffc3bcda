"""Composed training-data preparation pipeline — the end-to-end flow a
user of this engine runs over a raw document corpus before training:

  pruned read → vectorized quality scoring + token counting → quality
  and language filters → exact content dedup (keep min doc_id, count
  dups) → deterministic ordered output.

One STREAMING Ray Data pipeline: scoring/filtering happen inside a
single map_batches (the text column never survives past its batch —
only its 63-bit content hash enters the dedup shuffle), and the dedup
reduce is the coarse-bucket groupby pattern (text_hash % 64 buckets,
per-bucket pandas keep-first) shared with the dedup/LSH modules.  The
whole composition is mirrored by ONE DuckDB oracle SQL in
__ray_entry__, which is what makes a multi-stage pipeline trustworthy:
the COMPOSITION is hash-checked, not just each stage.

Reference anchor: this is the graft's analogue of chaining the
reference's worker hops (score → filter → dedup) into one flow
(`pkg/spider/workflow.go:83-328` dispatch chain), expressed as Dataset
stages instead of per-message NATS hops.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..common.hashing import hash64

from . import read_table as _rp  # shared column-pruned read

_TOKEN_PAT = r"[A-Za-z0-9_]+"  # shared with oracle SQL regexp semantics


def training_data_prep(sf_dir: str, min_quality: float = 0.80,
                       langs: tuple[str, ...] = ("en", "es", "de", "fr"),
                       dedup_buckets: int = 64):
    """Returns (doc_id, lang, n_tokens, quality, dup_count) for the
    documents that survive quality + language filtering, one row per
    distinct content (keeper = min doc_id), sorted by doc_id.

    The quality threshold compares the ROUNDED score (4 dp,
    half-away-from-zero) so the Ray filter and the SQL oracle make
    identical keep/drop decisions at the boundary."""

    ds = _rp(sf_dir, "documents", ["doc_id", "lang", "text"])
    lang_set = pa.array(list(langs), pa.string())

    def score_filter(t: pa.Table) -> pa.Table:
        text = t["text"]
        n = pc.cast(pc.utf8_length(text), pa.float64())
        n_safe = pc.max_element_wise(n, pa.scalar(1.0))
        n_alpha = pc.cast(pc.utf8_length(pc.replace_substring_regex(
            text, pattern="[^A-Za-z]", replacement="")), pa.float64())
        n_digit = pc.cast(pc.utf8_length(pc.replace_substring_regex(
            text, pattern="[^0-9]", replacement="")), pa.float64())
        quality = pc.round(
            pc.subtract(pc.divide(n_alpha, n_safe),
                        pc.divide(n_digit, n_safe)),
            ndigits=4, round_mode="half_towards_infinity")
        n_tokens = pc.cast(
            pc.count_substring_regex(text, pattern=_TOKEN_PAT), pa.int64())
        keep = pc.and_(pc.greater_equal(quality, pa.scalar(min_quality)),
                       pc.is_in(t["lang"], value_set=lang_set))
        sub = pa.table({
            "doc_id": t["doc_id"], "lang": t["lang"],
            "n_tokens": n_tokens, "quality": quality,
            "text": text,
        }).filter(keep)
        # content hash only past this point — the text column never
        # enters the shuffle
        hashes = np.fromiter((hash64(s) for s in sub["text"].to_pylist()),
                             dtype=np.int64, count=sub.num_rows)
        return pa.table({
            "doc_id": sub["doc_id"], "lang": sub["lang"],
            "n_tokens": sub["n_tokens"], "quality": sub["quality"],
            "text_hash": pa.array(hashes),
            "bucket": pa.array((hashes % dedup_buckets).astype(np.int32)),
        })

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_hash", "doc_id"], kind="mergesort")
        dup_count = df.groupby("text_hash", sort=False)["doc_id"] \
                      .transform("size")
        keep = ~df.duplicated(subset=["text_hash"], keep="first")
        out = df[keep].assign(dup_count=dup_count[keep].astype(np.int64))
        return out.drop(columns=["text_hash", "bucket"])

    return (ds.map_batches(score_filter, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dedup_bucket, batch_format="pandas")
            .sort("doc_id"))


def crawl_then_prep(sf_dir: str, min_quality: float = 0.40,
                    dedup_buckets: int = 64):
    """The FLAGSHIP composition: the crawl engine's extracted-text
    checkpoint shards stream STRAIGHT into the training-data prep
    stages — crawl → score → quality filter → exact content dedup
    (keeper = min url) → deterministic ordered output — the path a user
    of this engine runs end-to-end from raw web pages to a training
    corpus.

    The prep side never materializes the crawl output: it is a
    ray.data.read_parquet over the per-epoch texts shards the fetch
    actors wrote (engine.py `flush_texts` — the crawl's resumable
    partitioned sink IS the prep's source), and only the 63-bit content
    hash enters the dedup shuffle.  Correctness gate: the composition
    is hash-matched in pytest against ONE DuckDB statement over the
    engine's text table — whose own gate is byte-equality with the
    single-threaded oracle crawler."""
    import glob

    import ray.data as rd

    from .crawl_queries import run_crawl_cached

    eng = run_crawl_cached(sf_dir)
    files = sorted(glob.glob(
        os.path.join(eng.ckpt_dir, "epoch_*", "texts", "*.parquet")))
    ds = rd.read_parquet(files)

    def score_filter(t: pa.Table) -> pa.Table:
        text = t["text"]
        n = pc.cast(pc.utf8_length(text), pa.float64())
        n_safe = pc.max_element_wise(n, pa.scalar(1.0))
        n_alpha = pc.cast(pc.utf8_length(pc.replace_substring_regex(
            text, pattern="[^A-Za-z]", replacement="")), pa.float64())
        n_digit = pc.cast(pc.utf8_length(pc.replace_substring_regex(
            text, pattern="[^0-9]", replacement="")), pa.float64())
        quality = pc.round(
            pc.subtract(pc.divide(n_alpha, n_safe),
                        pc.divide(n_digit, n_safe)),
            ndigits=4, round_mode="half_towards_infinity")
        n_tokens = pc.cast(
            pc.count_substring_regex(text, pattern=_TOKEN_PAT), pa.int64())
        sub = pa.table({
            "url": t["url"], "n_tokens": n_tokens, "quality": quality,
            "text": text,
        }).filter(pc.greater_equal(quality, pa.scalar(min_quality)))
        hashes = np.fromiter((hash64(s) for s in sub["text"].to_pylist()),
                             dtype=np.int64, count=sub.num_rows)
        return pa.table({
            "url": sub["url"], "n_tokens": sub["n_tokens"],
            "quality": sub["quality"],
            "text_hash": pa.array(hashes),
            "bucket": pa.array((hashes % dedup_buckets).astype(np.int32)),
        })

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_hash", "url"], kind="mergesort")
        dup_count = df.groupby("text_hash", sort=False)["url"] \
                      .transform("size")
        keep = ~df.duplicated(subset=["text_hash"], keep="first")
        out = df[keep].assign(dup_count=dup_count[keep].astype(np.int64))
        return out.drop(columns=["text_hash", "bucket"])

    return (ds.map_batches(score_filter, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dedup_bucket, batch_format="pandas")
            .sort("url"))


def training_data_prep_fuzzy(sf_dir: str, min_quality: float = 0.80,
                             langs: tuple[str, ...] = ("en", "es", "de", "fr"),
                             threshold: float = 0.8,
                             verify_distributed: bool | None = None):
    """The full prep chain with a NEAR-dup stage appended (round-2
    verdict item 8): score → filter → exact dedup → MinHash+LSH
    word-3-gram near-dup over the SURVIVORS → drop every survivor that
    is the higher-id side of a ≥threshold pair.  The whole composition
    (including the LSH stage) is mirrored by one DuckDB statement whose
    near-dup stage is exact all-pairs Jaccard over the same survivor
    set — equality certifies 100% LSH recall through the composition.

    Stage reuse: survivor texts come back via the size-adaptive semi
    join (relational._semi_anti), candidates/verification are the
    dedup-module machinery (Dataset-native, verify_distributed-capable).
    """
    import ray.data as rd

    from .dedup import (MinHasher, _candidate_pairs_ds, _sketch_bands,
                        _verify_dispatch)
    from .relational import _semi_anti
    from ..common.tokens import word_shingle_hashes

    base = training_data_prep(sf_dir, min_quality=min_quality,
                              langs=langs).materialize()
    keep_ids = base.select_columns(["doc_id"])

    # survivor texts: adaptive semi join against the pruned corpus read.
    # materialize() is a deliberate barrier: the semi join, the verify
    # joins and the final anti join each run num_partitions aggregator
    # actors — leaving them in ONE lazy graph stacks 3x that actor count
    # and deadlocks an oversubscribed node (blocks stay in the object
    # store and spill, so the barrier is scale-safe)
    docs = _semi_anti(_rp(sf_dir, "documents", ["doc_id", "text"]),
                      keep_ids, "doc_id", "doc_id", anti=False,
                      distributed=verify_distributed,
                      key_threshold=2_000_000).materialize()

    hasher = MinHasher(num_perms=64)

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sh, par = word_shingle_hashes(t["text"])
        return _sketch_bands(ids, sh, par, t.num_rows, hasher, 16)

    cand = _candidate_pairs_ds(
        docs.map_batches(sketch, batch_format="pyarrow", batch_size=4096))
    pairs = _verify_dispatch(sf_dir, docs, cand, word_shingle_hashes,
                             "jaccard", threshold,
                             verify_distributed, 200_000)
    if isinstance(pairs, pa.Table):
        pairs_ds = rd.from_arrow(pairs.select(["doc_b"]))
    else:
        pairs_ds = pairs.select_columns(["doc_b"])
    # drop the higher-id side of every qualifying pair (doc_a < doc_b by
    # construction) — the same rule the SQL oracle applies
    return _semi_anti(base, pairs_ds, "doc_id", "doc_b", anti=True,
                      distributed=verify_distributed,
                      key_threshold=2_000_000).sort("doc_id")
