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
_P61 = np.int64((1 << 61) - 1)  # Mersenne prime for minhash permutations


def _rp(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


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

def _word_shingles(text: str, k: int = 3) -> np.ndarray:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.fromiter((hash64(g) for g in grams),
                                 dtype=np.int64, count=len(grams)))


def _char_ngrams(text: str, n: int = 4) -> np.ndarray:
    s = text.lower()
    if len(s) < n:
        grams = [s] if s else []
    else:
        grams = [s[i:i + n] for i in range(len(s) - n + 1)]
    if not grams:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.fromiter((hash64(g) for g in grams),
                                 dtype=np.int64, count=len(grams)))


class MinHasher:
    """num_perms universal-hash permutations (a*x+b mod p), vectorized:
    one (n_shingles × n_perms) broadcast min per doc.  Permutation
    parameters derive from splitmix64(seed) — deterministic."""

    def __init__(self, num_perms: int = 64, seed: int = 1234):
        idx = np.arange(2 * num_perms, dtype=np.uint64) + np.uint64(seed)
        mixed = _splitmix64(idx).astype(np.int64) & ((1 << 61) - 1)
        self.a = (mixed[:num_perms] | 1).astype(np.int64)
        self.b = mixed[num_perms:].astype(np.int64)
        self.num_perms = num_perms

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perms, np.iinfo(np.int64).max, dtype=np.int64)
        x = shingles.astype(object)[:, None]  # object -> exact python-int mod
        vals = (x * self.a[None, :] + self.b[None, :]) % int(_P61)
        return vals.min(axis=0).astype(np.int64)


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


def _candidate_pairs(band_ds):
    """groupby(band) -> within-bucket pairs -> global pair dedup."""
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > 2000:  # guard degenerate mega-buckets
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    from ray.data.aggregate import Count

    cand = (band_ds.groupby(["band_id", "band_hash"])
            .map_groups(pairs, batch_format="pandas"))
    uniq = (cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="nb"))
            .drop_columns(["nb"]))
    return uniq


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
    return _verify_pairs(sf_dir, cand.to_pandas(), _word_shingles,
                         "jaccard", threshold)


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
    return _verify_pairs(sf_dir, cand.to_pandas(), _char_ngrams,
                         "jaccard", threshold)


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

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        ids = df["doc_id"].to_numpy()
        sigs = df["sig"].to_numpy()
        if len(ids) < 2 or len(ids) > 2000:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        a, b = np.triu_indices(len(ids), k=1)
        x = np.bitwise_xor(sigs[a].astype(np.uint64), sigs[b].astype(np.uint64))
        ham = np.array([bin(v).count("1") for v in x], dtype=np.int64)
        keep = ham <= 3
        return pd.DataFrame({"doc_a": ids[a][keep], "doc_b": ids[b][keep],
                             "hamming": ham[keep]})

    from ray.data.aggregate import Min

    out = (band_ds.groupby(["band_id", "band_hash"])
           .map_groups(pairs, batch_format="pandas")
           .groupby(["doc_a", "doc_b"])
           .aggregate(Min("hamming", alias_name="hamming")))
    return out


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
