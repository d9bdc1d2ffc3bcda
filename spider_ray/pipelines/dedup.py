"""Deduplication suite over the `documents` / `embeddings` tables:
exact, MinHash+LSH, SimHash, char-n-gram Jaccard, embedding-cosine.

Shared shape (the scalable pattern from the build brief):
  shingle/sketch per doc (vectorized map_batches)
    -> explode to (band_id, band_hash, id) rows
    -> groupby(band) -> candidate pairs within buckets
    -> pair dedup -> exact verification on the candidate set only.

At sandbox scale the verification gathers candidate payloads via a
filtered parquet read; at 10^10-doc scale the same verification is a
hash-partitioned join of (pair, id) against the sketch table — the
candidate-generation math is unchanged.  All hash functions are seeded
and deterministic (common/hashing.hash64 + splitmix64 permutations).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..common.hashing import hash64
from ..state.bloom import _splitmix64

_WORD = re.compile(r"[A-Za-z0-9_]+")


from . import read_table as _rp  # shared column-pruned read (one definition)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition by content hash, keep first (min
    doc_id) per group.  Grouping key is the 63-bit content hash — at
    10^10 docs the text column never moves through the shuffle."""
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
# sketches (vectorized per batch)
# ---------------------------------------------------------------------------

_MASK63 = np.uint64((1 << 63) - 1)


def _word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct word-k-gram hashes.  Per-word blake2b (few per doc), then
    a vectorized splitmix64 chain combines each window of k word hashes —
    no per-gram Python."""
    toks = _WORD.findall(text.lower())
    if not toks:
        return np.zeros(0, dtype=np.int64)
    wh = np.fromiter((hash64(t) for t in toks), dtype=np.uint64, count=len(toks))
    if len(wh) < k:
        comb = wh[:1]
        for w in wh[1:]:
            comb = _splitmix64(comb ^ w)
        return np.unique((comb & _MASK63).astype(np.int64))
    acc = _splitmix64(wh[: len(wh) - k + 1])
    for j in range(1, k):
        acc = _splitmix64(acc ^ wh[j : len(wh) - k + 1 + j])
    return np.unique((acc & _MASK63).astype(np.int64))


_NGRAM_POWS = {}


def _char_ngrams(text: str, n: int = 4) -> np.ndarray:
    """Distinct char-n-gram hashes via a fully vectorized polynomial
    window hash over the utf-8 bytes (FNV prime base) + splitmix64 mix."""
    from numpy.lib.stride_tricks import sliding_window_view

    b = np.frombuffer(text.lower().encode("utf-8", "replace"), dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.int64)
    if len(b) < n:
        return np.array([hash64(text.lower())], dtype=np.int64)
    if n not in _NGRAM_POWS:
        base = np.uint64(1099511628211)
        p = np.ones(n, dtype=np.uint64)
        for i in range(n - 2, -1, -1):
            p[i] = p[i + 1] * base
        _NGRAM_POWS[n] = p
    pows = _NGRAM_POWS[n]
    with np.errstate(over="ignore"):
        h = (sliding_window_view(b, n).astype(np.uint64) * pows[None, :]).sum(axis=1)
        h = _splitmix64(h)
    return np.unique((h & _MASK63).astype(np.int64))


class MinHasher:
    """num_perms multiply-add permutations in uint64 wraparound
    arithmetic (h_i(x) = a_i*x + b_i mod 2^64, odd a_i) — the standard
    multiply-shift universal-hash family, fully vectorized: one
    (n_shingles × n_perms) broadcast min per doc.  Parameters derive from
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
        out_hash.append((bh & np.uint64((1 << 63) - 1)).astype(np.int64))
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_id)),
        "band_id": pa.array(np.concatenate(out_band)),
        "band_hash": pa.array(np.concatenate(out_hash)),
    })


def _candidate_pairs(band_ds, coarse_buckets: int = 64) -> pd.DataFrame:
    """(band_id, band_hash) buckets -> within-bucket pairs.

    One groupby over COARSE buckets (band_hash % coarse_buckets), with the
    fine per-band grouping vectorized in pandas inside each coarse group —
    a groupby per *fine* bucket would pay Ray per-group overhead on
    millions of (mostly singleton) buckets.  Coarse bucket count scales
    with data volume; the emitted pair set is collision-sized (small),
    deduped in pandas (scale path: one more groupby when pairs outgrow
    the driver)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket",
            pc.cast(pc.bit_wise_and(t["band_hash"],
                                    coarse_buckets - 1), pa.int32()))

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
        sub = df[sizes >= 2]
        out_a, out_b = [], []
        for _, g in sub.groupby(["band_id", "band_hash"]):
            ids = np.sort(g["doc_id"].to_numpy())
            if len(ids) > 2000:  # guard degenerate mega-buckets
                continue
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    cand = (band_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pandas")
            .to_pandas())
    return cand.drop_duplicates(ignore_index=True)


def _gather_texts(sf_dir: str, ids: np.ndarray) -> dict[int, str]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                      filters=[("doc_id", "in", ids.tolist())])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _verify_pairs(sf_dir: str, pairs_df: pd.DataFrame, shingler, metric: str,
                  threshold: float) -> pa.Table:
    """Exact verification on candidates only.  Driver-side gather is
    bounded by the candidate count (scale path: partitioned pair join)."""
    if len(pairs_df) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         metric: pa.array([], pa.float64())})
    ids = np.unique(np.concatenate([pairs_df["doc_a"], pairs_df["doc_b"]]))
    texts = _gather_texts(sf_dir, ids)
    cache: dict[int, np.ndarray] = {}

    def sh(i: int) -> np.ndarray:
        if i not in cache:
            cache[i] = shingler(texts[i])
        return cache[i]

    out_a, out_b, out_m = [], [], []
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        sa, sb = sh(int(a)), sh(int(b))
        if len(sa) == 0 or len(sb) == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_m.append(round(j, 4))
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     metric: pa.array(out_m, pa.float64())})


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def dedup_minhash(sf_dir: str, threshold: float = 0.8, num_perms: int = 64,
                  bands: int = 16):
    """MinHash+LSH near-duplicate pairs verified by exact word-3-gram
    Jaccard >= threshold.  16 bands x 4 rows: P(candidate) ~ 1-(1-s^4)^16,
    >99.9% for s>=0.8."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    hasher = MinHasher(num_perms=num_perms)

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sigs = np.stack([hasher.signature(_word_shingles(s))
                         for s in t["text"].to_pylist()])
        return _band_rows(ids, sigs, bands)

    cand = _candidate_pairs(ds.map_batches(sketch, batch_format="pyarrow"))
    return _verify_pairs(sf_dir, cand, _word_shingles, "jaccard", threshold)


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.8):
    """Same LSH machinery over char-4-gram shingles (catches small edits
    that word shingles miss)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    hasher = MinHasher(num_perms=64, seed=77)

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sigs = np.stack([hasher.signature(_char_ngrams(s))
                         for s in t["text"].to_pylist()])
        return _band_rows(ids, sigs, 16)

    cand = _candidate_pairs(ds.map_batches(sketch, batch_format="pyarrow"))
    return _verify_pairs(sf_dir, cand, _char_ngrams, "jaccard", threshold)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def _simhash64(text: str) -> int:
    toks = _WORD.findall(text.lower())
    if not toks:
        return 0
    hs = np.fromiter((hash64(t) for t in toks), dtype=np.uint64, count=len(toks))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    score = bits.astype(np.int32).sum(axis=0) * 2 - len(hs)
    sig = np.uint64(0)
    for b in np.nonzero(score > 0)[0]:
        sig |= np.uint64(1) << np.uint64(b)
    return int(sig & np.uint64((1 << 63) - 1))


def dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dups: 64-bit signature, candidates bucketed by 4
    16-bit bands (any pair within hamming<=3 shares >=1 exact band),
    verified by exact hamming distance."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sigs = np.fromiter((_simhash64(s) for s in t["text"].to_pylist()),
                           dtype=np.int64, count=t.num_rows)
        bands = []
        for b in range(4):
            bands.append(pa.table({
                "doc_id": pa.array(ids),
                "band_id": pa.array(np.full(len(ids), b, dtype=np.int32)),
                "band_hash": pa.array((sigs >> (16 * b)) & 0xFFFF),
                "sig": pa.array(sigs),
            }))
        return pa.concat_tables(bands)

    band_ds = ds.map_batches(sketch, batch_format="pyarrow")

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
            ham = np.array([bin(v).count("1") for v in x], dtype=np.int64)
            keep = ham <= max_hamming
            if keep.any():
                outs.append(pd.DataFrame({"doc_a": ids[a][keep],
                                          "doc_b": ids[b][keep],
                                          "hamming": ham[keep]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    pairs = (band_ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(pairs_in_bucket, batch_format="pandas")
             .to_pandas())
    # a pair can surface from several bands -> keep one row (hamming is
    # identical either way: it is a function of the two signatures)
    pairs = pairs.drop_duplicates(subset=["doc_a", "doc_b"],
                                  ignore_index=True)
    return pa.Table.from_pandas(pairs, preserve_index=False)


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
                    out_c.append(round(float(sims[local_i, j]), 4))
        return pa.table({"vec_a": pa.array(out_a, pa.int64()),
                         "vec_b": pa.array(out_b, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})

    return ds.map_batches(block, batch_format="pyarrow", batch_size=512)
