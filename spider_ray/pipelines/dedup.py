"""Deduplication suite over the `documents` / `embeddings` tables:
exact, MinHash+LSH, SimHash, char-n-gram Jaccard, embedding-cosine.

Shared shape (the scalable pattern from the build brief):
  shingle/sketch per doc (vectorized map_batches — common/tokens kernels,
  no per-token Python)
    -> explode to (band_id, band_hash, id) rows
    -> groupby(band) -> candidate pairs within buckets
    -> distributed pair dedup (pair-bucket groupby)
    -> exact verification on the candidate set only.

Verification is adaptive like the crawl engine's epoch spine: below
`driver_pair_threshold` candidates the exact check runs driver-side on a
filtered parquet gather (bounded, documented); above it — or with
verify_distributed=True, which tests force — candidates stay a Dataset
and verification is a hash-partitioned pairs⋈documents join
(Dataset.join on doc_a, then doc_b) with the exact Jaccard computed
inside map_batches.  On a 30-50%-near-dup web corpus the candidate set
is O(corpus), so the join path is the one that scales; no stage ever
gathers candidate TEXTS onto the driver there.

All hash functions are seeded and deterministic (splitmix64 machinery in
common/tokens), so sketch and verify agree on any worker and re-runs are
byte-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..common.hashing import hash64
from ..common.tokens import (
    _string_offsets,
    char_ngram_hashes,
    simhash_batch,
    split_by_doc,
    word_shingle_hashes,
)
from ..state.bloom import _splitmix64

from . import read_table as _rp  # shared column-pruned read (one definition)

_MASK63 = np.uint64((1 << 63) - 1)
_PAIR_BUCKETS = 64


def _round_half_away(x: np.ndarray, nd: int = 4) -> np.ndarray:
    """Half-away-from-zero rounding — matches DuckDB round() (repo
    convention, see relational._round_cols)."""
    p = 10.0 ** nd
    return np.floor(np.abs(x) * p + 0.5) / p * np.sign(x)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition by content hash, keep first (min
    doc_id) per group.  Grouping key is the 63-bit content hash — at
    10^10 docs the text column never moves through the shuffle.  Content
    identity stays blake2b over the FULL text (common/hashing.hash64):
    the truncated-prefix token hash is for sketches only."""
    from ray.data.aggregate import Count, Min

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        hashes = np.fromiter((hash64(s) for s in t["text"].to_pylist()),
                             dtype=np.int64, count=t.num_rows)
        return pa.table({"doc_id": t["doc_id"], "text_hash": pa.array(hashes)})

    out = (ds.map_batches(h, batch_format="pyarrow")
             .groupby("text_hash")
             .aggregate(Min("doc_id", alias_name="doc_id"),
                        Count(alias_name="dup_count")))
    return out.drop_columns(["text_hash"])


# ---------------------------------------------------------------------------
# MinHash machinery (vectorized per batch)
# ---------------------------------------------------------------------------

class MinHasher:
    """num_perms multiply-add permutations in uint64 wraparound
    arithmetic (h_i(x) = a_i*x + b_i mod 2^64, odd a_i) — the standard
    multiply-shift universal-hash family.  Parameters derive from
    splitmix64(seed) — deterministic."""

    def __init__(self, num_perms: int = 64, seed: int = 1234):
        idx = np.arange(2 * num_perms, dtype=np.uint64) + np.uint64(seed)
        mixed = _splitmix64(idx)
        self.a = mixed[:num_perms] | np.uint64(1)
        self.b = mixed[num_perms:]
        self.num_perms = num_perms

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perms, np.iinfo(np.int64).max, dtype=np.int64)
        x = shingles.astype(np.uint64)[:, None]
        with np.errstate(over="ignore"):
            vals = x * self.a[None, :] + self.b[None, :]  # mod 2^64 wraps
        return (vals.min(axis=0) >> np.uint64(1)).astype(np.int64)

    # chunk size for the (shingles × perms) broadcast: 32k × 64 × 8B =
    # 16 MB transient instead of one ~100 MB matrix per batch — large
    # fresh allocations fault slowly on overcommitted hosts and the
    # values are consumed immediately by the per-doc min anyway
    _SIG_CHUNK = 1 << 15

    def signatures(self, shingles: np.ndarray, parent: np.ndarray,
                   n_docs: int) -> np.ndarray:
        """(n_docs × num_perms) signature matrix for a whole batch:
        chunked (shingles × perms) broadcasts + per-doc minimums —
        parent must be nondecreasing (tokens.word_shingle_hashes /
        char_ngram_hashes emit doc-sorted rows).  Empty docs get the
        sentinel signature (int64 max)."""
        acc = np.full((n_docs, self.num_perms), np.uint64(2**64 - 1),
                      dtype=np.uint64)
        n = len(shingles)
        sh = shingles.astype(np.uint64)
        for i0 in range(0, n, self._SIG_CHUNK):
            i1 = min(i0 + self._SIG_CHUNK, n)
            with np.errstate(over="ignore"):
                vals = (sh[i0:i1, None] * self.a[None, :]
                        + self.b[None, :])
            par_c = parent[i0:i1]
            new = np.ones(i1 - i0, dtype=bool)
            new[1:] = par_c[1:] != par_c[:-1]
            starts = np.nonzero(new)[0]
            mins = np.minimum.reduceat(vals, starts, axis=0)
            docs = par_c[starts]
            # a doc can span chunk boundaries -> min-merge into acc
            np.minimum.at(acc, docs, mins)
        # untouched (empty-doc) rows: (2^64-1) >> 1 == int64 max — the
        # sentinel falls out of the shift, no separate fix-up needed
        return (acc >> np.uint64(1)).astype(np.int64)


def _sketch_bands(ids: np.ndarray, sh: np.ndarray, par: np.ndarray,
                  n: int, hasher: "MinHasher", bands: int) -> pa.Table:
    """Signatures -> band rows for one batch, emitting rows ONLY for docs
    that produced at least one shingle: shingle-less docs (fewer tokens/
    chars than the gram width) all share the sentinel signature and would
    otherwise flood a single LSH bucket with O(s²) candidate pairs —
    and the exact verify (and the SQL oracles) define them as never-dup
    anyway."""
    sigs = hasher.signatures(sh, par, n)
    present = (np.bincount(par, minlength=n) > 0 if len(par)
               else np.zeros(n, dtype=bool))
    return _band_rows(ids[present], sigs[present], bands)


def _band_rows(ids: np.ndarray, sigs: np.ndarray, bands: int) -> pa.Table:
    """Fold signatures into per-band hashes -> (id, band_id, band_hash)."""
    n, perms = sigs.shape
    rows_per_band = perms // bands
    out_id, out_band, out_hash = [], [], []
    for b in range(bands):
        chunk = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
        bh = np.zeros(n, dtype=np.uint64)
        for j in range(rows_per_band):
            bh = _splitmix64(bh ^ chunk[:, j].astype(np.uint64))
        out_id.append(ids)
        out_band.append(np.full(n, b, dtype=np.int32))
        out_hash.append((bh & _MASK63).astype(np.int64))
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_id)),
        "band_id": pa.array(np.concatenate(out_band)),
        "band_hash": pa.array(np.concatenate(out_hash)),
    })


def _candidate_pairs_ds(band_ds, coarse_buckets: int = 64):
    """(band_id, band_hash) buckets -> within-bucket pairs, as a Dataset.

    One groupby over COARSE buckets (band_hash % coarse_buckets), with the
    fine per-band grouping vectorized in pandas inside each coarse group —
    a groupby per *fine* bucket would pay Ray per-group overhead on
    millions of (mostly singleton) buckets.  A pair can surface from
    several bands (different coarse buckets), so the dedup is a second
    distributed groupby over pair-hash buckets — collision-sized data,
    never the driver."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket",
            pc.cast(pc.bit_wise_and(t["band_hash"],
                                    coarse_buckets - 1), pa.int32()))

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Emit all within-(band_id, band_hash) pairs.  On a dup-heavy
        corpus most groups have size exactly 2 — that path is fully
        vectorized (one sort + boundary masks); only the rare larger
        groups loop (bounded by the 2000 mega-bucket guard)."""
        df = df.sort_values(["band_id", "band_hash", "doc_id"],
                            kind="mergesort")
        bid = df["band_id"].to_numpy()
        bh = df["band_hash"].to_numpy()
        ids = df["doc_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        new = np.ones(n, dtype=bool)
        new[1:] = (bh[1:] != bh[:-1]) | (bid[1:] != bid[:-1])
        gidx = np.cumsum(new) - 1
        sizes = np.bincount(gidx)
        size_per_row = sizes[gidx]
        starts2 = np.nonzero(new & (size_per_row == 2))[0]
        out_a = [ids[starts2]]
        out_b = [ids[starts2 + 1]]
        big_starts = np.nonzero(new & (size_per_row >= 3)
                                & (size_per_row <= 2000))[0]
        for s in big_starts:  # mega-buckets >2000 are guarded out above
            sz = sizes[gidx[s]]
            grp = ids[s:s + sz]  # already sorted by doc_id
            a, b = np.triu_indices(sz, k=1)
            out_a.append(grp[a])
            out_b.append(grp[b])
        return pd.DataFrame({"doc_a": np.concatenate(out_a).astype(np.int64),
                             "doc_b": np.concatenate(out_b).astype(np.int64)})

    cand = (band_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pandas"))
    return _dedup_pairs_ds(cand)


def _dedup_pairs_ds(pairs_ds, extra_cols: tuple[str, ...] = ()):
    """Distributed (doc_a, doc_b) pair dedup: co-locate by a pair-hash
    bucket (collisions only co-locate — the in-group dedup keys on the
    real columns), drop duplicates per group."""

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        key = _splitmix64(df["doc_a"].to_numpy().astype(np.uint64)
                          ^ _splitmix64(df["doc_b"].to_numpy().astype(np.uint64)))
        return df.assign(pb=(key % np.uint64(_PAIR_BUCKETS)).astype(np.int64))

    def drop_dups(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["doc_a", "doc_b"]).drop(columns=["pb"])

    return (pairs_ds.map_batches(add_pb, batch_format="pandas")
            .groupby("pb")
            .map_groups(drop_dups, batch_format="pandas"))


# ---------------------------------------------------------------------------
# exact verification (driver kernel + distributed join path)
# ---------------------------------------------------------------------------

def _jaccard_rows(texts_a, texts_b, shingler_batch,
                  threshold: float) -> tuple[list, np.ndarray]:
    """Row-aligned exact Jaccard between two text columns.  Shingles are
    computed for the whole batch by the vectorized kernel; only the
    per-row sorted-set intersection loops (candidate-sized)."""
    n = len(texts_a)
    sa, pa_ = shingler_batch(texts_a)
    sb, pb_ = shingler_batch(texts_b)
    la = split_by_doc(sa, pa_, n)
    lb = split_by_doc(sb, pb_, n)
    keep_idx, js = [], []
    for i in range(n):
        x, y = la[i], lb[i]
        if len(x) == 0 or len(y) == 0:
            continue
        inter = len(np.intersect1d(x, y, assume_unique=True))
        union = len(x) + len(y) - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            keep_idx.append(i)
            js.append(j)
    return keep_idx, np.asarray(js, dtype=np.float64)


def _verify_pairs_driver(sf_dir: str, pairs_df: pd.DataFrame, shingler_batch,
                         metric: str, threshold: float,
                         rows_fn=_jaccard_rows) -> pa.Table:
    """Exact verification on candidates, driver-side: bounded by
    driver_pair_threshold (the dispatch in dedup_minhash/_ngram)."""
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      metric: pa.array([], pa.float64())})
    if len(pairs_df) == 0:
        return empty
    ids = np.unique(np.concatenate([pairs_df["doc_a"], pairs_df["doc_b"]]))
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                      filters=[("doc_id", "in", ids.tolist())])
    pos = {i: k for k, i in enumerate(t["doc_id"].to_pylist())}
    ta = t["text"].take(pa.array([pos[int(a)] for a in pairs_df["doc_a"]]))
    tb = t["text"].take(pa.array([pos[int(b)] for b in pairs_df["doc_b"]]))
    keep_idx, js = rows_fn(ta, tb, shingler_batch, threshold)
    if not keep_idx:
        return empty
    out = pa.table({
        "doc_a": pa.array(pairs_df["doc_a"].to_numpy()[keep_idx], pa.int64()),
        "doc_b": pa.array(pairs_df["doc_b"].to_numpy()[keep_idx], pa.int64()),
        metric: pa.array(_round_half_away(js), pa.float64()),
    })
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def _verify_pairs_distributed(docs_ds, pairs_ds, shingler_batch, metric: str,
                              threshold: float,
                              num_partitions: int | None = None,
                              rows_fn=_jaccard_rows):
    """Scale-path verification: hash-partitioned pairs⋈documents join on
    doc_a then doc_b (texts travel worker-to-worker through the shuffle,
    never to the driver), exact Jaccard inside map_batches.

    Partition sizing: each Dataset.join runs num_partitions hash-shuffle
    aggregator ACTORS; two joins in one streaming graph therefore need
    2×num_partitions actor slots alongside the map tasks — oversubscribe
    a small cluster and the graph deadlocks (observed at 2×16 actors on
    4 CPUs).  Default: half the cluster CPUs per join, min 2."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 2)

    def _rename(col_from: str, col_to: str):
        def fn(t: pa.Table) -> pa.Table:
            names = [col_to if n == col_from else n for n in t.column_names]
            return t.rename_columns(names)
        return fn

    # Dataset.join drops the right-side key column from the output
    j1 = (pairs_ds.join(docs_ds, join_type="inner",
                        num_partitions=num_partitions,
                        on=("doc_a",), right_on=("doc_id",))
          .map_batches(_rename("text", "text_a"), batch_format="pyarrow"))
    j2 = (j1.join(docs_ds, join_type="inner",
                  num_partitions=num_partitions,
                  on=("doc_b",), right_on=("doc_id",))
          .map_batches(_rename("text", "text_b"), batch_format="pyarrow"))

    def verify(t: pa.Table) -> pa.Table:
        keep_idx, js = rows_fn(t["text_a"], t["text_b"],
                               shingler_batch, threshold)
        sub = t.take(pa.array(keep_idx, pa.int64()))
        return pa.table({
            "doc_a": sub["doc_a"],
            "doc_b": sub["doc_b"],
            metric: pa.array(_round_half_away(js), pa.float64()),
        })

    return (j2.map_batches(verify, batch_format="pyarrow")
            .sort(["doc_a", "doc_b"]))


def _verify_dispatch(sf_dir: str, docs_ds, cand_ds, shingler_batch,
                     metric: str, threshold: float,
                     verify_distributed: bool | None,
                     driver_pair_threshold: int,
                     rows_fn=_jaccard_rows):
    cand_ds = cand_ds.materialize()
    n_pairs = cand_ds.count()
    if verify_distributed is None:
        verify_distributed = n_pairs > driver_pair_threshold
    if verify_distributed:
        return _verify_pairs_distributed(docs_ds, cand_ds, shingler_batch,
                                         metric, threshold, rows_fn=rows_fn)
    pairs_df = cand_ds.to_pandas()  # bounded by driver_pair_threshold
    return _verify_pairs_driver(sf_dir, pairs_df, shingler_batch,
                                metric, threshold, rows_fn=rows_fn)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def dedup_minhash(sf_dir: str, threshold: float = 0.8, num_perms: int = 64,
                  bands: int = 16, verify_distributed: bool | None = None,
                  driver_pair_threshold: int = 200_000):
    """MinHash+LSH near-duplicate pairs verified by exact word-3-gram
    Jaccard >= threshold.  16 bands x 4 rows: P(candidate) ~ 1-(1-s^4)^16,
    >99.9% for s>=0.8."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    hasher = MinHasher(num_perms=num_perms)

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sh, par = word_shingle_hashes(t["text"])
        return _sketch_bands(ids, sh, par, t.num_rows, hasher, bands)

    cand = _candidate_pairs_ds(
        ds.map_batches(sketch, batch_format="pyarrow", batch_size=4096))
    return _verify_dispatch(sf_dir, ds, cand, word_shingle_hashes,
                            "jaccard", threshold,
                            verify_distributed, driver_pair_threshold)


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.8,
                        verify_distributed: bool | None = None,
                        driver_pair_threshold: int = 200_000):
    """Same LSH machinery over char-4-gram shingles (catches small edits
    that word shingles miss)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    hasher = MinHasher(num_perms=64, seed=77)

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sh, par = char_ngram_hashes(t["text"], 4)
        return _sketch_bands(ids, sh, par, t.num_rows, hasher, 16)

    cand = _candidate_pairs_ds(
        ds.map_batches(sketch, batch_format="pyarrow", batch_size=4096))
    return _verify_dispatch(sf_dir, ds, cand,
                            lambda col: char_ngram_hashes(col, 4),
                            "jaccard", threshold,
                            verify_distributed, driver_pair_threshold)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def dedup_simhash(sf_dir: str, max_hamming: int = 3,
                  sig_fn=None):
    """SimHash near-dups: 64-bit signature, candidates bucketed by 4
    16-bit bands (any pair within hamming<=3 shares >=1 exact band),
    verified by exact hamming distance.  Fully distributed: the pair
    stream is deduped by a pair-bucket groupby, never on the driver
    (hamming is a pure function of the two signatures, so duplicate
    emissions agree and any one row can be kept).  `sig_fn` swaps the
    signature kernel (dedup_simhash_tok8's SQL-replicable variant)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    sig_fn = sig_fn or simhash_batch

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sigs = sig_fn(t["text"])
        bands = []
        for b in range(4):
            bands.append(pa.table({
                "doc_id": pa.array(ids),
                "band_id": pa.array(np.full(len(ids), b, dtype=np.int32)),
                "band_hash": pa.array((sigs >> (16 * b)) & 0xFFFF),
                "sig": pa.array(sigs),
            }))
        return pa.concat_tables(bands)

    band_ds = ds.map_batches(sketch, batch_format="pyarrow", batch_size=4096)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["band_hash"], 63), pa.int32()))

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                              "doc_b": pd.Series([], dtype=np.int64),
                              "hamming": pd.Series([], dtype=np.int64)})
        sizes = df.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
        sub = df[sizes >= 2]
        outs = []
        for _, g in sub.groupby(["band_id", "band_hash"]):
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sigs = g["sig"].to_numpy()
            if len(ids) > 2000:
                continue
            a, b = np.triu_indices(len(ids), k=1)
            x = np.bitwise_xor(sigs[a].astype(np.uint64), sigs[b].astype(np.uint64))
            # vectorized popcount: 8 bytes per value -> unpackbits -> sum
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                                axis=1).sum(axis=1).astype(np.int64)
            keep = ham <= max_hamming
            if keep.any():
                outs.append(pd.DataFrame({"doc_a": ids[a][keep],
                                          "doc_b": ids[b][keep],
                                          "hamming": ham[keep]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    pairs = (band_ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(pairs_in_bucket, batch_format="pandas"))
    return _dedup_pairs_ds(pairs).sort(["doc_a", "doc_b"])


def dedup_simhash_tok8(sf_dir: str, max_hamming: int = 3):
    """dedup_simhash over the SQL-replicable tok8 signature (splitmix64
    of each token's first 8 bytes; common/tokens.tok8_hashes): same
    banding, verification and pair dedup, but a DuckDB oracle can
    recompute every signature bit and popcount the pair distances —
    moving SimHash from a rows-only check to a hash-matched one."""
    from ..common.tokens import simhash_batch_tok8

    return dedup_simhash(sf_dir, max_hamming=max_hamming,
                         sig_fn=simhash_batch_tok8)


def _sql_splitmix64(x_expr: str) -> str:
    """DuckDB expression for splitmix64(x_expr) — HUGEINT arithmetic
    with an explicit 32-bit-split wrapping multiply (BIGINT would raise
    on overflow where numpy wraps).  Verified bit-exact against
    state/bloom._splitmix64 across the uint64 domain."""
    M = 1 << 64

    def mul(a: str, b: int) -> str:
        return (f"(((({a}) % 4294967296) * {b}::HUGEINT + "
                f"(((({a}) // 4294967296) * {b}::HUGEINT) % 4294967296)"
                f" * 4294967296) % {M})")

    def xshift(a: str, s: int) -> str:
        return (f"CAST(xor(CAST(({a}) AS UBIGINT), "
                f"CAST(({a}) AS UBIGINT) >> {s}) AS HUGEINT)")

    e = f"((({x_expr}) + 11400714819323198485::HUGEINT) % {M})"
    e = xshift(e, 30)
    e = mul(e, 13787848793156543929)
    e = xshift(e, 27)
    e = mul(e, 10723151780598845931)
    e = xshift(e, 31)
    return f"CAST(({e}) % {M} AS UBIGINT)"


def simhash_tok8_oracle_sql(max_hamming: int = 3) -> str:
    """Generated DuckDB replica of dedup_simhash_tok8: pack each
    token's first 8 ASCII bytes little-endian, splitmix64 them with
    wrap-exact HUGEINT arithmetic (_sql_splitmix64), vote ±1 per bit
    per occurrence, rebuild the 63-bit signature, and popcount ALL
    ordered pairs — any signature-bit or banding-recall divergence in
    the pipeline hash-mismatches this oracle."""
    packed = " + ".join(
        f"(CASE WHEN length(t) >= {i} THEN "
        f"ascii(substr(t, {i}, 1))::HUGEINT * {1 << (8 * (i - 1))} "
        f"ELSE 0 END)" for i in range(1, 9))
    votes = ",\n                 ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(63))
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(63))
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
          FROM documents
        ),
        th AS (
          SELECT doc_id, {_sql_splitmix64(f'({packed})')} AS h FROM toks
        ),
        votes AS (
          SELECT doc_id,
                 {votes}
          FROM th GROUP BY doc_id
        ),
        sigs AS (
          SELECT d.doc_id,
                 COALESCE({sig}, 0)::BIGINT AS sig
          FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
        ORDER BY doc_a, doc_b
    """


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (exact, blocked matmul)
# ---------------------------------------------------------------------------

def dedup_embedding(sf_dir: str, threshold: float = 0.40):
    """Embedding near-dup pairs by exact cosine >= threshold.  Executed
    as a blocked matmul: each batch of vectors multiplies against the
    full (broadcast) matrix — O(n^2 d) flops but streaming over blocks;
    the 10^10-scale path swaps the broadcast for IVF cells (see
    pipelines/ann.py).  SQL-checked against DuckDB list_cosine_similarity.
    Default threshold is calibrated to the synthetic corpus (max pairwise
    cosine ~0.51 — there are no true near-dups, so 0.40 exercises the
    machinery; production near-dup would use ~0.95)."""
    import ray

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(emb["vec_id"], dtype=np.int64)
    mat = np.stack(emb["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, mat))

    import ray.data as rd

    ds = rd.from_arrow(pa.table({"row": pa.array(np.arange(len(ids)))}))
    ds = ds.repartition(16)

    def block(t: pa.Table) -> pa.Table:
        all_ids, m = ray.get(mat_ref)
        rows = np.asarray(t["row"])
        sims = m[rows] @ m.T
        out_a, out_b, out_c = [], [], []
        for local_i, i in enumerate(rows):
            js = np.nonzero(sims[local_i] >= threshold)[0]
            for j in js:
                if all_ids[i] < all_ids[j]:  # each pair once
                    out_a.append(all_ids[i])
                    out_b.append(all_ids[j])
                    out_c.append(float(_round_half_away(
                        np.float64(sims[local_i, j]))))
        return pa.table({"vec_a": pa.array(out_a, pa.int64()),
                         "vec_b": pa.array(out_b, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})

    return ds.map_batches(block, batch_format="pyarrow", batch_size=512)


# ---------------------------------------------------------------------------
# Edit-distance-1 similarity join (SymSpell deletion blocking)
# ---------------------------------------------------------------------------

_E1_OFFSET = np.uint64(14695981039346656037)  # FNV-1a basis
_E1_PRIME = np.uint64(1099511628211)
_E1_MAX_LEN = 128  # loud bound: L+1 deletion variants per key


def _e1_row_hash(M: np.ndarray) -> np.ndarray:
    """FNV-1a over each row of a (n, L) uint8 matrix, length mixed in —
    equal strings hash equal (the blocking invariant); collisions only
    add candidates (exact verification removes them).  The column loop
    is bounded by _E1_MAX_LEN; every step is vectorized over rows."""
    h = np.full(M.shape[0], _E1_OFFSET, np.uint64)
    for j in range(M.shape[1]):
        h = (h ^ M[:, j].astype(np.uint64)) * _E1_PRIME
    return ((h ^ np.uint64(M.shape[1])) * _E1_PRIME).view(np.int64)


def _ascii_matrix(rows: np.ndarray, off: np.ndarray,
                  data: np.ndarray, length: int) -> np.ndarray:
    """Gather equal-length string rows into an (n, length) uint8 matrix
    — one fancy-indexed read of the Arrow data buffer, no Python rows."""
    if length == 0:
        return np.empty((len(rows), 0), np.uint8)
    return data[off[rows][:, None]
                + np.arange(length, dtype=np.int64)[None, :]]


def _str_buf(col) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = _string_offsets(arr)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(off)
    if len(lens) and lens.max() > _E1_MAX_LEN:
        raise ValueError(
            f"edit1 join key longer than {_E1_MAX_LEN} bytes — "
            "not an entity key; block on a hash of it instead")
    return arr, off[:-1], data, lens


def _deletion_key_rows(t: pa.Table, id_col: str, name_col: str) -> pa.Table:
    """(id, name) batch -> (doc_id, band_id=0, band_hash) rows: one key
    for the name itself plus one per single-character deletion — two
    ASCII keys at Levenshtein distance <= 1 always share a key
    (substitution: same-position deletions agree; indel: the shorter IS
    a deletion of the longer), so blocking loses nothing."""
    ids = np.asarray(t[id_col], dtype=np.int64)
    _, off, data, lens = _str_buf(t[name_col])
    out_ids, out_hash = [], []
    for L in np.unique(lens):
        rows = np.flatnonzero(lens == L)
        M = _ascii_matrix(rows, off, data, int(L))
        out_ids.append(ids[rows])
        out_hash.append(_e1_row_hash(M))
        for i in range(int(L)):
            V = np.concatenate([M[:, :i], M[:, i + 1:]], axis=1)
            out_ids.append(ids[rows])
            out_hash.append(_e1_row_hash(V))
    if not out_ids:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "band_id": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64())})
    all_ids = np.concatenate(out_ids)
    return pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "band_id": pa.array(np.zeros(len(all_ids), np.int32), pa.int32()),
        "band_hash": pa.array(np.concatenate(out_hash), pa.int64()),
    })


def _edit1_mask(col_a, col_b) -> np.ndarray:
    """Row-aligned exact check: Levenshtein(a, b) == 1 for ASCII keys,
    fully vectorized per (len_a, len_b) combination — equal lengths are
    a Hamming==1 test; off-by-one lengths test 'shorter equals longer
    with position p removed' where p = first mismatch."""
    _, off_a, data_a, la = _str_buf(col_a)
    _, off_b, data_b, lb = _str_buf(col_b)
    n = len(la)
    mask = np.zeros(n, bool)
    combos = np.unique(np.stack([la, lb], axis=1), axis=0)
    for LA, LB in combos:
        if abs(int(LA) - int(LB)) > 1:
            continue
        rows = np.flatnonzero((la == LA) & (lb == LB))
        A = _ascii_matrix(rows, off_a, data_a, int(LA))
        B = _ascii_matrix(rows, off_b, data_b, int(LB))
        if LA == LB:
            mask[rows] = (A != B).sum(axis=1) == 1
            continue
        if LA < LB:  # make A the longer side
            A, B, LA, LB = B, A, LB, LA
        if LB == 0:
            mask[rows] = True  # one char vs empty
            continue
        neq = A[:, :int(LB)] != B
        p = np.where(neq.any(axis=1), neq.argmax(axis=1), int(LB))
        cols = np.arange(int(LB), dtype=np.int64)[None, :]
        idx = cols + (cols >= p[:, None])
        mask[rows] = (np.take_along_axis(A, idx, axis=1) == B).all(axis=1)
    return mask


def edit1_pairs(ds, id_col: str = "doc_id", name_col: str = "name",
                force_distributed: bool = False,
                driver_broadcast_max: int = 5_000_000):
    """Similarity join on dirty string keys: all pairs of rows whose
    `name_col` values are at Levenshtein distance EXACTLY 1 (ASCII
    byte-level) — the entity-resolution primitive (misspelled hosts,
    off-by-one ids, OCR'd names).  Returns (a_key, b_key), a < b by id,
    sorted.

    Scale shape = the repo's LSH recipe with SymSpell deletion blocking
    (Garbe's symmetric-delete idea: distance-<=1 strings always share a
    deletion variant): one map pass emits L+1 variant-hash keys per row,
    the shared coarse-bucket machinery (_candidate_pairs_ds) turns
    shared keys into distinct candidate id pairs, and verification is
    the vectorized exact distance-1 test.  Never an all-pairs product —
    candidates are bounded by real key collisions.

    Verification paths (both forced in tests):
      broadcast  (default while the (id, name) table fits a worker,
                 like the graph broadcast tiers): names ray.put once,
                 candidate batches gather by searchsorted.
      join       force_distributed=True or a table above
                 driver_broadcast_max rows: pairs⋈names⋈names via
                 hash-partitioned Dataset.join — names travel only
                 through the shuffle."""
    import ray
    import ray.data as rd

    ds = ds.materialize()
    keys = ds.map_batches(
        lambda t: _deletion_key_rows(t, id_col, name_col),
        batch_format="pyarrow", batch_size=4096)
    cand = _candidate_pairs_ds(keys).materialize()
    empty = pa.table({"a_key": pa.array([], pa.int64()),
                      "b_key": pa.array([], pa.int64())})
    if cand.count() == 0:
        return rd.from_arrow(empty)

    n_rows = ds.count()
    if not force_distributed and n_rows <= driver_broadcast_max:
        tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
        order = pc.sort_indices(tbl[id_col])
        tbl = tbl.take(order).combine_chunks()
        ref = ray.put((np.asarray(tbl[id_col], dtype=np.int64),
                       tbl[name_col]))

        def verify_b(t: pa.Table, _ref=ref) -> pa.Table:
            ids_sorted, names = ray.get(_ref)
            ia = np.searchsorted(ids_sorted,
                                 np.asarray(t["doc_a"], dtype=np.int64))
            ib = np.searchsorted(ids_sorted,
                                 np.asarray(t["doc_b"], dtype=np.int64))
            na = names.take(pa.array(ia, pa.int64()))
            nb = names.take(pa.array(ib, pa.int64()))
            keep = _edit1_mask(na, nb)
            sub = t.filter(pa.array(keep))
            return pa.table({"a_key": pc.cast(sub["doc_a"], pa.int64()),
                             "b_key": pc.cast(sub["doc_b"], pa.int64())})

        return (cand.map_batches(verify_b, batch_format="pyarrow")
                .sort(["a_key", "b_key"]))

    cpus = int(ray.cluster_resources().get("CPU", 8))
    num_partitions = max(2, cpus // 2)
    names_ds = ds.map_batches(
        lambda t: pa.table({"nid": pc.cast(t[id_col], pa.int64()),
                            "nm": t[name_col]}),
        batch_format="pyarrow")

    def _rename(col_from: str, col_to: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [col_to if n == col_from else n for n in t.column_names])
        return fn

    j1 = (cand.join(names_ds, join_type="inner",
                    num_partitions=num_partitions,
                    on=("doc_a",), right_on=("nid",))
          .map_batches(_rename("nm", "nm_a"), batch_format="pyarrow"))
    j2 = (j1.join(names_ds, join_type="inner",
                  num_partitions=num_partitions,
                  on=("doc_b",), right_on=("nid",))
          .map_batches(_rename("nm", "nm_b"), batch_format="pyarrow"))

    def verify_j(t: pa.Table) -> pa.Table:
        keep = _edit1_mask(t["nm_a"], t["nm_b"])
        sub = t.filter(pa.array(keep))
        return pa.table({"a_key": pc.cast(sub["doc_a"], pa.int64()),
                         "b_key": pc.cast(sub["doc_b"], pa.int64())})

    return (j2.map_batches(verify_j, batch_format="pyarrow")
            .sort(["a_key", "b_key"]))


def fuzzy_match_customer_names(sf_dir: str,
                               force_distributed: bool = False):
    """Driver query: customer-name pairs at edit distance exactly 1 —
    zero-padded ids make single-digit substitutions abundant, the dirty
    -key join every entity-resolution pipeline runs before a merge."""
    ds = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    return edit1_pairs(ds, id_col="c_custkey", name_col="c_name",
                       force_distributed=force_distributed)


# ---------------------------------------------------------------------------
# Containment dedup (asymmetric near-dup: small doc inside a big one)
# ---------------------------------------------------------------------------

def dedup_containment(sf_dir: str, threshold: float = 0.9,
                      verify_distributed: bool | None = None,
                      driver_row_threshold: int = 200_000,
                      driver_pair_budget: int = 50_000_000,
                      pair_buckets: int = 64):
    """Ordered near-dup pairs under set CONTAINMENT |A∩B|/|A| >=
    threshold over word-3-gram shingles (Broder 1997's asymmetric
    resemblance) — catches a short page quoted wholesale inside a long
    one, where Jaccard stays low and MinHash-LSH never pairs them.

    Computed as ONE count-join — the same plan as the SQL oracle: the
    (shingle, doc) stream self-joins on the shingle, per-block pair
    partials pre-aggregate the match counts, one grouped sum yields the
    EXACT |A∩B| per ordered pair (shingle sets are distinct per doc),
    and containment = count / |A| under the identical float division.
    No text enters any shuffle and there is no separate verification
    pass (round-2's prefix-filter + pairs⋈docs⋈docs text join spent
    ~20× this plan's wall re-shingling each doc once per candidate
    pair).  Join volume is Σ_sh df(sh)² — the SAME hot-shingle term the
    prefix filter's candidate join carried; boilerplate mega-shingles
    should be fought upstream (paragraph_dedup / repetition filters),
    not inside an exact operator.

    Adaptive dispatch: the driver tier is taken when BOTH the
    (shingle, doc) row count ≤ driver_row_threshold (bounds the pull)
    AND the exact Σ df² ≤ driver_pair_budget (bounds the expansion
    work — the true driver cost, computed from the pulled rows for
    free); otherwise the distributed count-join runs.  The driver
    kernel itself chunks its expansion, so even a forced driver run
    (verify_distributed=False in tests) stays memory-bounded.  The
    cross-check tests pin both tiers equal."""
    import ray
    import ray.data as rd

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def sh_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sh, par = word_shingle_hashes(t["text"])  # distinct+sorted per doc
        if len(sh) == 0:
            return pa.table({"sh": pa.array([], pa.int64()),
                             "doc_a": pa.array([], pa.int64()),
                             "n_a": pa.array([], pa.int64())})
        n = np.bincount(par, minlength=t.num_rows).astype(np.int64)
        return pa.table({"sh": pa.array(sh, pa.int64()),
                         "doc_a": pa.array(ids[par], pa.int64()),
                         "n_a": pa.array(n[par], pa.int64())})

    rows = ds.map_batches(sh_rows, batch_format="pyarrow").materialize()
    n_rows = rows.count()
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "containment": pa.array([], pa.float64())})
    if n_rows == 0:
        return rd.from_arrow(empty)
    if verify_distributed is None and n_rows <= driver_row_threshold:
        t = rows.to_pandas()  # bounded by driver_row_threshold
        sh_np = t["sh"].to_numpy(np.int64)
        # the true driver cost is Σ df², not the row count: one hot
        # boilerplate shingle can make a small row set explode — route
        # oversized expansions to the distributed count-join
        _, df_cnt = np.unique(sh_np, return_counts=True)
        if int((df_cnt.astype(np.int64) ** 2).sum()) <= driver_pair_budget:
            out = _containment_counts_driver(
                sh_np, t["doc_a"].to_numpy(np.int64),
                t["n_a"].to_numpy(np.int64), threshold)
            return rd.from_arrow(out).sort(["doc_a", "doc_b"])
    elif verify_distributed is False:
        t = rows.to_pandas()  # caller forced the driver tier (tests)
        out = _containment_counts_driver(
            t["sh"].to_numpy(np.int64), t["doc_a"].to_numpy(np.int64),
            t["n_a"].to_numpy(np.int64), threshold)
        return rd.from_arrow(out).sort(["doc_a", "doc_b"])

    # no empty blocks into the hash join (Ray drops them and the join
    # then fails on the key field)
    probe = rows.repartition(max(1, min(16, n_rows)))
    index = (rows.map_batches(
        lambda t: pa.table({"sh": t["sh"], "doc_b": t["doc_a"]}),
        batch_format="pyarrow")
        .repartition(max(1, min(16, n_rows))))
    cpus = int(ray.cluster_resources().get("CPU", 8))
    matched = probe.join(index, join_type="inner",
                         num_partitions=max(2, min(16, cpus // 2)),
                         on=("sh",), right_on=("sh",))

    # per-block pair partials, then the shared pair-bucket pattern:
    # groupby a LOW-cardinality bucket (pair-hash % B) + one vectorized
    # pandas aggregate per bucket.  A groupby().aggregate() keyed on the
    # 10^6-cardinality pair itself costs ~10x this plan's wall (Ray's
    # per-group finalization dominates); the bucket keeps Ray's shuffle
    # 64-ary while the real reduce stays a C-speed groupby inside the
    # group task.  B bounds per-task rows at pairs/B — scale B with the
    # corpus (kwarg), not with a code change.
    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_a"].to_numpy() != df["doc_b"].to_numpy()]
        g = (df.groupby(["doc_a", "doc_b"], sort=False)
             .agg(i=("n_a", "size"), n_a=("n_a", "first")).reset_index())
        key = _splitmix64(g["doc_a"].to_numpy().astype(np.uint64)
                          ^ _splitmix64(g["doc_b"].to_numpy().astype(np.uint64)))
        g["pb"] = (key % np.uint64(pair_buckets)).astype(np.int64)
        return g

    def count_group(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["doc_a", "doc_b"], sort=False)
             .agg(i=("i", "sum"), n_a=("n_a", "first")).reset_index())
        c = g["i"].to_numpy(np.int64) / g["n_a"].to_numpy(np.int64)
        keep = c >= threshold
        out = g.loc[keep, ["doc_a", "doc_b"]].copy()
        out["containment"] = _round_half_away(c[keep])
        return out

    return (matched.map_batches(pair_partials, batch_format="pandas")
            .groupby("pb").map_groups(count_group, batch_format="pandas")
            .sort(["doc_a", "doc_b"]))


def _containment_counts_driver(sh: np.ndarray, doc: np.ndarray,
                               n_a: np.ndarray, threshold: float,
                               chunk_rows: int = 4_000_000) -> pa.Table:
    """Driver-tier exact pair counts: sort by shingle, expand each
    shingle group's doc list to ordered pairs with repeat/modulo
    arithmetic, then np.unique counts — the same |A∩B| the distributed
    groupby computes.  The Σ df² expansion is CHUNKED (≤ chunk_rows
    expanded pairs per slice, pre-reduced with np.unique per chunk)
    so driver memory is O(chunk_rows + distinct pairs), never the full
    Σ df² — one hot boilerplate shingle with df≈20k would otherwise
    materialize ~4e8 rows in a single allocation."""
    order = np.argsort(sh, kind="mergesort")
    sh_s, doc_s = sh[order], doc[order]
    n_by = {}
    for d, n in zip(doc, n_a):
        n_by[int(d)] = int(n)
    starts = np.nonzero(np.r_[True, sh_s[1:] != sh_s[:-1]])[0]
    counts = np.diff(np.r_[starts, len(sh_s)])
    multi = counts > 1
    starts, counts = starts[multi], counts[multi]
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "containment": pa.array([], pa.float64())})
    if not len(counts):
        return empty
    sq = counts.astype(np.int64) ** 2
    # slice shingle groups into chunks of ≤ chunk_rows expanded pairs
    # (a single group larger than the budget becomes its own chunk —
    # its expansion is df², the irreducible unit of this exact plan)
    bounds = [0]
    acc = 0
    for i, s in enumerate(sq):
        if acc and acc + s > chunk_rows:
            bounds.append(i)
            acc = 0
        acc += int(s)
    bounds.append(len(sq))
    part_pairs, part_cnts = [], []
    for lo, hi in zip(bounds, bounds[1:]):
        sq_c, starts_c, counts_c = sq[lo:hi], starts[lo:hi], counts[lo:hi]
        tot = int(sq_c.sum())
        grp = np.repeat(np.arange(hi - lo), sq_c)
        pos = (np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(sq_c) - sq_c, sq_c))
        c_g = counts_c[grp]
        s_g = starts_c[grp]
        a = doc_s[s_g + pos // c_g]
        b = doc_s[s_g + pos % c_g]
        m = a != b
        pairs = np.stack([a[m], b[m]], axis=1)
        if len(pairs):
            uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
            part_pairs.append(uniq)
            part_cnts.append(cnt.astype(np.int64))
    if not part_pairs:
        return empty
    allp = np.concatenate(part_pairs)
    allc = np.concatenate(part_cnts)
    uniq, inv = np.unique(allp, axis=0, return_inverse=True)
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, inv.ravel(), allc)
    na = np.asarray([n_by[int(x)] for x in uniq[:, 0]], dtype=np.int64)
    c = cnt / na
    keep = c >= threshold
    return pa.table({
        "doc_a": pa.array(uniq[:, 0][keep], pa.int64()),
        "doc_b": pa.array(uniq[:, 1][keep], pa.int64()),
        "containment": pa.array(_round_half_away(c[keep]), pa.float64()),
    })


# ---------------------------------------------------------------------------
# IDF-weighted set-cosine similarity join (tf-idf cosine over shingles)
# ---------------------------------------------------------------------------

def simjoin_tfidf_cosine(sf_dir: str, threshold: float = 0.8,
                         verify_distributed: bool | None = None,
                         driver_row_threshold: int = 200_000,
                         driver_pair_budget: int = 50_000_000,
                         pair_buckets: int = 64):
    """The documents-table query wrapper — see simjoin_tfidf_cosine_ds
    for semantics and scale shape."""
    from . import table_num_rows

    return simjoin_tfidf_cosine_ds(
        _rp(sf_dir, "documents", ["doc_id", "text"]),
        table_num_rows(sf_dir, "documents"), threshold=threshold,
        verify_distributed=verify_distributed,
        driver_row_threshold=driver_row_threshold,
        driver_pair_budget=driver_pair_budget, pair_buckets=pair_buckets)


def simjoin_tfidf_cosine_ds(ds, n_docs: int, threshold: float = 0.8,
                            verify_distributed: bool | None = None,
                            driver_row_threshold: int = 200_000,
                            driver_pair_budget: int = 50_000_000,
                            pair_buckets: int = 64):
    """Unordered near-dup pairs under IDF-WEIGHTED COSINE over distinct
    word-3-gram shingles — the sparse-vector similarity join (Bayardo
    2007's all-pairs problem) with binary tf and w(sh) = ln(N/df(sh)):
    cosine(A,B) = Σ_{sh∈A∩B} w² / (‖A‖·‖B‖).  Complements the suite's
    other similarity notions: containment is asymmetric overlap, Jaccard
    ignores term rarity — idf-cosine DISCOUNTS boilerplate shingles, so
    two docs agreeing only on ubiquitous template text never pair.

    Same plan family as dedup_containment: the (sh, doc) stream
    self-joins on the shingle and per-pair partials reduce through the
    shared pair-bucket pattern — but each matched row carries w²(sh)
    (attached by ONE vocab-sized df join) and the reduce SUMS weights
    instead of counting; ‖doc‖ comes from a per-doc grouped Σw² the
    final pair table joins twice (pair-volume-sized, never the corpus).
    Both engines round the cosine to 4 digits BEFORE the threshold so a
    last-ulp ln()/summation difference can never flip the cutoff.

    Adaptive dispatch mirrors dedup_containment (row-count bound on the
    pull, exact Σ df² budget on the expansion; the driver kernel chunks
    its expansion).  Collision caveat as paragraph_dedup: identity is
    the 63-bit shingle hash; the SQL oracle compares true strings and
    would flag an actual collision.

    `ds` is any Dataset with (doc_id, text); `n_docs` is the caller's
    corpus size for the idf denominator (the composed prep pipelines
    pass the SURVIVOR count of their upstream stage)."""
    import ray
    import ray.data as rd

    from ray.data.aggregate import Sum

    def sh_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sh, par = word_shingle_hashes(t["text"])  # distinct+sorted per doc
        return pa.table({"sh": pa.array(sh, pa.int64()),
                         "doc_a": pa.array(ids[par], pa.int64())})

    rows = ds.map_batches(sh_rows, batch_format="pyarrow").materialize()
    n_rows = rows.count()
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if n_rows == 0:
        return rd.from_arrow(empty)
    if verify_distributed is None and n_rows <= driver_row_threshold:
        t = rows.to_pandas()  # bounded by driver_row_threshold
        sh_np = t["sh"].to_numpy(np.int64)
        _, df_cnt = np.unique(sh_np, return_counts=True)
        if int((df_cnt.astype(np.int64) ** 2).sum()) <= driver_pair_budget:
            out = _idf_cosine_driver(sh_np, t["doc_a"].to_numpy(np.int64),
                                     n_docs, threshold)
            return rd.from_arrow(out).sort(["doc_a", "doc_b"])
    elif verify_distributed is False:
        t = rows.to_pandas()  # caller forced the driver tier (tests)
        out = _idf_cosine_driver(t["sh"].to_numpy(np.int64),
                                 t["doc_a"].to_numpy(np.int64),
                                 n_docs, threshold)
        return rd.from_arrow(out).sort(["doc_a", "doc_b"])

    # ---- distributed tier -------------------------------------------
    # df(sh): per-block partial counts -> ONE vocab-keyed grouped sum
    # (rows are distinct per doc, so block partials sum to true df)
    def df_partials(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"sh": t["sh"]}),
                            ["sh"]).aggregate([([], "count_all")])
        return g.rename_columns(["sh", "c"])

    df_tab = (rows.map_batches(df_partials, batch_format="pyarrow")
              .groupby("sh").aggregate(Sum("c", alias_name="df")))

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(16, cpus // 2))
    # attach w²(sh) to every row with ONE hash join on the shingle —
    # the df table is vocab-sized, which at web scale is corpus-sized:
    # never broadcast it
    probe = rows.repartition(max(1, min(16, n_rows)))
    rows_w = probe.join(df_tab.repartition(4), join_type="inner",
                        num_partitions=nparts, on=("sh",), right_on=("sh",))

    def w2_col(t: pa.Table) -> pa.Table:
        df_v = np.asarray(t["df"], dtype=np.float64)
        w = np.log(float(n_docs) / df_v)
        return pa.table({"sh": t["sh"], "doc_a": t["doc_a"],
                         "w2": pa.array(w * w, pa.float64())})

    rows_w = rows_w.map_batches(w2_col, batch_format="pyarrow").materialize()

    # per-doc squared norms: block partials -> doc-keyed grouped sum
    def nrm_partials(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"doc": t["doc_a"], "w2": t["w2"]}),
                            ["doc"]).aggregate([("w2", "sum")])
        return g.rename_columns(["doc", "n2"])

    norms = (rows_w.map_batches(nrm_partials, batch_format="pyarrow")
             .groupby("doc").aggregate(Sum("n2", alias_name="n2")))

    index = rows_w.map_batches(
        lambda t: pa.table({"sh": t["sh"], "doc_b": t["doc_a"]}),
        batch_format="pyarrow")
    matched = rows_w.join(index, join_type="inner",
                          num_partitions=nparts, on=("sh",), right_on=("sh",))

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy()
        b = df["doc_b"].to_numpy()
        df = df[a < b]  # unordered pairs once (cosine is symmetric)
        g = (df.groupby(["doc_a", "doc_b"], sort=False)
             .agg(dot=("w2", "sum")).reset_index())
        key = _splitmix64(g["doc_a"].to_numpy().astype(np.uint64)
                          ^ _splitmix64(g["doc_b"].to_numpy().astype(np.uint64)))
        g["pb"] = (key % np.uint64(pair_buckets)).astype(np.int64)
        return g

    def dot_group(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["doc_a", "doc_b"], sort=False)
                .agg(dot=("dot", "sum")).reset_index())

    pairs = (matched.map_batches(pair_partials, batch_format="pandas")
             .groupby("pb").map_groups(dot_group, batch_format="pandas"))

    # attach both norms (pair-volume-sized joins), then the final filter
    na = norms.map_batches(
        lambda t: pa.table({"doc_a": t["doc"], "na2": t["n2"]}),
        batch_format="pyarrow").repartition(4)
    nb = norms.map_batches(
        lambda t: pa.table({"doc_b": t["doc"], "nb2": t["n2"]}),
        batch_format="pyarrow").repartition(4)
    pairs = pairs.repartition(4).join(
        na, join_type="inner", num_partitions=nparts,
        on=("doc_a",), right_on=("doc_a",))
    pairs = pairs.repartition(4).join(
        nb, join_type="inner", num_partitions=nparts,
        on=("doc_b",), right_on=("doc_b",))

    def finalize(t: pa.Table) -> pa.Table:
        na2 = np.asarray(t["na2"], dtype=np.float64)
        nb2 = np.asarray(t["nb2"], dtype=np.float64)
        dot = np.asarray(t["dot"], dtype=np.float64)
        ok = (na2 > 0) & (nb2 > 0)
        cos = np.zeros(len(dot))
        cos[ok] = dot[ok] / (np.sqrt(na2[ok]) * np.sqrt(nb2[ok]))
        cos_r = _round_half_away(cos)
        keep = ok & (cos_r >= threshold)
        return pa.table({
            "doc_a": pc.array_filter(t["doc_a"], pa.array(keep)),
            "doc_b": pc.array_filter(t["doc_b"], pa.array(keep)),
            "cosine": pa.array(cos_r[keep], pa.float64())})

    # union a typed empty table AFTER the sort so the all-filtered
    # corner (e.g. every shared shingle at df=n -> both norms 0) yields
    # the SAME (doc_a, doc_b, cosine) schema as the driver tier instead
    # of a schema-less empty dataset (round-4 ADVICE).  Order: union
    # concatenates operands, and the leading block carries zero rows,
    # so the sorted sequence is unchanged; unioning BEFORE the sort
    # does not work — Sort on an all-empty input re-emits schema-less
    # blocks and drops the typed one.
    return rd.from_arrow(empty).union(
        pairs.map_batches(finalize, batch_format="pyarrow")
        .sort(["doc_a", "doc_b"]))


def _idf_cosine_driver(sh: np.ndarray, doc: np.ndarray, n_docs: int,
                       threshold: float,
                       chunk_rows: int = 4_000_000) -> pa.Table:
    """Driver-tier exact idf-cosine pairs: the containment kernel's
    chunked shingle-group expansion, accumulating Σ w²(sh) per unordered
    pair instead of counts (np.add.at with weights), plus the per-doc
    squared-norm reduce.  Memory stays O(chunk_rows + distinct pairs)."""
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if not len(sh):
        return empty
    u, inv, cnt = np.unique(sh, return_inverse=True, return_counts=True)
    w2 = np.log(float(n_docs) / cnt.astype(np.float64)) ** 2
    w2_row = w2[inv]
    docs_u, dinv = np.unique(doc, return_inverse=True)
    n2 = np.zeros(len(docs_u))
    np.add.at(n2, dinv, w2_row)
    nrm = np.sqrt(n2)
    order = np.argsort(sh, kind="mergesort")
    sh_s, doc_s, w2_s = sh[order], doc[order], w2_row[order]
    starts = np.nonzero(np.r_[True, sh_s[1:] != sh_s[:-1]])[0]
    counts = np.diff(np.r_[starts, len(sh_s)])
    multi = counts > 1
    starts, counts = starts[multi], counts[multi]
    if not len(counts):
        return empty
    sq = counts.astype(np.int64) ** 2
    bounds = [0]
    acc = 0
    for i, s in enumerate(sq):
        if acc and acc + s > chunk_rows:
            bounds.append(i)
            acc = 0
        acc += int(s)
    bounds.append(len(sq))
    part_pairs, part_dots = [], []
    for lo, hi in zip(bounds, bounds[1:]):
        sq_c, starts_c, counts_c = sq[lo:hi], starts[lo:hi], counts[lo:hi]
        tot = int(sq_c.sum())
        grp = np.repeat(np.arange(hi - lo), sq_c)
        pos = (np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(sq_c) - sq_c, sq_c))
        c_g = counts_c[grp]
        s_g = starts_c[grp]
        a = doc_s[s_g + pos // c_g]
        b = doc_s[s_g + pos % c_g]
        wv = w2_s[s_g]  # w² is constant within a shingle group
        m = a < b  # each unordered pair once per shared shingle
        pairs = np.stack([a[m], b[m]], axis=1)
        if len(pairs):
            uniq, pinv = np.unique(pairs, axis=0, return_inverse=True)
            dots = np.zeros(len(uniq))
            np.add.at(dots, pinv.ravel(), wv[m])
            part_pairs.append(uniq)
            part_dots.append(dots)
    if not part_pairs:
        return empty
    allp = np.concatenate(part_pairs)
    alld = np.concatenate(part_dots)
    uniq, pinv = np.unique(allp, axis=0, return_inverse=True)
    dot = np.zeros(len(uniq))
    np.add.at(dot, pinv.ravel(), alld)
    # docs_u is sorted (np.unique): vectorized norm gather, no Python
    # loop over the distinct-pair table (which can reach millions of
    # rows under the 50M expansion budget)
    na = nrm[np.searchsorted(docs_u, uniq[:, 0])]
    nb = nrm[np.searchsorted(docs_u, uniq[:, 1])]
    ok = (na > 0) & (nb > 0)
    cos = np.zeros(len(dot))
    cos[ok] = dot[ok] / (na[ok] * nb[ok])
    cos_r = _round_half_away(cos)
    keep = ok & (cos_r >= threshold)
    return pa.table({
        "doc_a": pa.array(uniq[:, 0][keep], pa.int64()),
        "doc_b": pa.array(uniq[:, 1][keep], pa.int64()),
        "cosine": pa.array(cos_r[keep], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Prefix dedup (first-n-token identity)
# ---------------------------------------------------------------------------

def dedup_prefix_tokens(sf_dir: str, n_tokens: int = 12):
    """Prefix dedup — docs sharing their first n_tokens lowercase tokens
    collapse to one keeper: the cheap high-recall pass real web prep
    runs BEFORE fuzzy dedup (mirror pages and templated articles share
    long prefixes even when tails diverge; CCNet/RefinedWeb both ship a
    variant).  Returns one row per prefix group: keeper doc_id (min) +
    group size, like dedup_exact.

    Scale shape: the group key is the shared prefix_chain_hashes kernel
    (common/tokens — a uint64 splitmix64 chain over the first n token
    hashes, n vectorized rounds over the batch, length mixed in), so
    ONLY (hash, doc_id) int64 pairs enter the grouped (Min, Count)
    reduce; text never shuffles.  A 3-token doc never collides with a
    12-token doc sharing those 3 (length is part of the chain).
    Identity is the 64-bit chain (collision caveat as dedup_exact's
    hash keying; the SQL oracle groups true prefix strings)."""
    from ray.data.aggregate import Count, Min

    from ..common.tokens import prefix_chain_hashes

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def prefix_hash(t: pa.Table) -> pa.Table:
        h = prefix_chain_hashes(t["text"], n_tokens)
        return pa.table({
            "doc_id": t["doc_id"],
            "prefix_hash": pa.array((h & _MASK63).astype(np.int64))})

    out = (ds.map_batches(prefix_hash, batch_format="pyarrow")
           .groupby("prefix_hash")
           .aggregate(Min("doc_id", alias_name="doc_id"),
                      Count(alias_name="n_dups")))
    return out.drop_columns(["prefix_hash"]).sort("doc_id")
