"""Webtext corpus-prep operators the training-data pipeline runs beyond
per-document stats: Gopher-style repetition filters, near-dup CLUSTERING
(connected components over the verified pair stream), INCREMENTAL dedup
(new batch vs existing corpus, cross-side candidates only), keyword
search over the corpus's own term statistics, bigram-LM scoring,
sequence packing by global prefix sum, and weighted domain mixing.

Same design rules as the rest of the suite: vectorized Arrow/numpy
kernels inside map_batches, pre-aggregation before every shuffle,
broadcast-once for every model-parameter-sized side table, and a DuckDB
oracle per operator (rounding/ordering rules shared verbatim).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import read_table as _rp

_TOKEN_PAT = r"[A-Za-z0-9_]+"  # suite-wide word class (oracle-shared)


def _rnd4(x: np.ndarray) -> np.ndarray:
    """round-half-away-from-zero at 4 digits (matches DuckDB round)."""
    return np.floor(np.abs(x) * 1e4 + 0.5) / 1e4 * np.sign(x)


# ---------------------------------------------------------------------------
# Gopher-style repetition filters
# ---------------------------------------------------------------------------

def repetition_stats(sf_dir: str, top2_max: float = 0.20,
                     dup5_max: float = 0.20):
    """Repetition quality rules (the Gopher/MassiveText repetition
    filters, Rae et al. 2021 §A1.1 — public paper): per document, the
    fraction of tokens covered by the single most frequent word-2-gram
    and the duplicate fraction of word-5-gram occurrences; `flagged`
    marks documents breaching either threshold.

    Everything finalizes inside the batch (a document never splits
    across batches): shingles are shifted token slices joined
    element-wise, per-document maxima/distincts are Arrow groupbys over
    batch-local row indices + bincounts — no shuffle, no Python row
    loop."""
    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _grams(flat, parent, n, starts=None):
        m = len(flat) - (n - 1)
        if m <= 0:
            return None, None
        valid = parent[:m] == parent[n - 1:]
        idx = np.flatnonzero(valid)
        if len(idx) == 0:
            return None, None
        slices = [flat.slice(i, m).take(pa.array(idx)) for i in range(n)]
        return pc.binary_join_element_wise(*slices, " "), parent[idx]

    def fn(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        n_rows = t.num_rows
        n_tok = np.bincount(parent, minlength=n_rows).astype(np.int64)

        # most frequent 2-gram count per document
        max2 = np.zeros(n_rows, dtype=np.int64)
        g2, p2 = _grams(flat, parent, 2)
        if g2 is not None:
            counts = pa.TableGroupBy(
                pa.table({"d": pa.array(p2), "g": g2}),
                ["d", "g"]).aggregate([([], "count_all")])
            d = np.asarray(counts["d"])
            c = np.asarray(counts["count_all"])
            np.maximum.at(max2, d, c)

        # duplicate word-5-gram occurrence fraction per document
        tot5 = np.zeros(n_rows, dtype=np.int64)
        uni5 = np.zeros(n_rows, dtype=np.int64)
        g5, p5 = _grams(flat, parent, 5)
        if g5 is not None:
            tot5 = np.bincount(p5, minlength=n_rows).astype(np.int64)
            distinct = pa.TableGroupBy(
                pa.table({"d": pa.array(p5), "g": g5}),
                ["d", "g"]).aggregate([])
            uni5 = np.bincount(np.asarray(distinct["d"]),
                               minlength=n_rows).astype(np.int64)

        top2 = _rnd4(np.where(n_tok >= 2, 2.0 * max2 / np.maximum(n_tok, 1),
                              0.0))
        dup5 = _rnd4(np.where(tot5 > 0, 1.0 - uni5 / np.maximum(tot5, 1),
                              0.0))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "top2_frac": pa.array(top2, pa.float64()),
            "dup5_frac": pa.array(dup5, pa.float64()),
            "flagged": pa.array((top2 > top2_max) | (dup5 > dup5_max)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the verified pair stream
# ---------------------------------------------------------------------------

_CLUSTER_DRIVER_MAX_PAIRS = 200_000  # same dispatch idea as dedup's verify


def dedup_minhash_clusters(sf_dir: str, threshold: float = 0.8,
                           force_distributed: bool = False):
    """Duplicate-cluster assignment: connected components over the
    MinHash-verified near-dup pairs (the step after pair finding that a
    real dedup needs — a 3-doc chain a~b~c is ONE cluster even when a~c
    never surfaced as a pair).  Returns (cluster_id, doc_id) for every
    clustered document, cluster_id = min doc_id of the component.

    Adaptive dispatch mirroring dedup._verify_dispatch: below a pair
    count threshold the component labels come from a driver union-find
    over the (dup-set-sized, not corpus-sized) pair list; above it,
    distributed min-label propagation — labels and edges stay Datasets,
    each round is one hash join + grouped min, convergence is checked
    via a count aggregate (label propagation converges in <= diameter
    rounds; hub-and-spoke dup clusters have tiny diameters).  Both paths
    are forced in tests and must agree."""
    import ray.data as rd

    from .dedup import dedup_minhash

    pairs = dedup_minhash(sf_dir, threshold=threshold)
    if isinstance(pairs, pa.Table):  # driver verify path returns Arrow
        pairs = rd.from_arrow(pairs)
    n_pairs = pairs.count()
    empty = pa.table({"cluster_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})
    if n_pairs == 0:
        return rd.from_arrow(empty)

    if n_pairs <= _CLUSTER_DRIVER_MAX_PAIRS and not force_distributed:
        df = pairs.select_columns(["doc_a", "doc_b"]).to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(df["doc_a"], df["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # union by min id keeps the representative deterministic
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        rows = sorted((find(n), n) for n in parent)
        return rd.from_arrow(pa.table({
            "cluster_id": pa.array([r[0] for r in rows], pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        }))

    # distributed min-label propagation, join-free: each round is ONE
    # groupby over (label rows ∪ edge rows) keyed on node — the group
    # fn takes the node's current min label and sends it along its
    # out-edges (classic message-passing connected components; no
    # Dataset.join, whose hash-shuffle rejects the schema-less empty
    # blocks grouped aggregates can emit)
    def to_msgs(t: pa.Table) -> pa.Table:
        a = pc.cast(t["doc_a"], pa.int64()).combine_chunks()
        b = pc.cast(t["doc_b"], pa.int64()).combine_chunks()
        null = pa.nulls(len(a) + len(b), pa.int64())
        return pa.table({
            "node": pa.concat_arrays([a, b]),
            "lbl": null,
            "dst": pa.concat_arrays([b, a]),
        })

    edges = pairs.map_batches(to_msgs, batch_format="pyarrow").materialize()

    def seed(t: pa.Table) -> pa.Table:
        # initial label of a node = itself (carried as a label row)
        return pa.table({
            "node": pc.cast(t["node"], pa.int64()),
            "lbl": pc.cast(t["node"], pa.int64()),
            "dst": pa.nulls(t.num_rows, pa.int64()),
        })

    labels = edges.map_batches(seed, batch_format="pyarrow")

    def propagate(g: pa.Table) -> pa.Table:
        node = int(g["node"][0].as_py())
        m = pc.min(g["lbl"]).as_py()
        m = node if m is None else min(m, node)
        dsts = g["dst"].drop_null()
        out_nodes = pa.concat_arrays(
            [pa.array([node], pa.int64())] + dsts.chunks)
        k = len(out_nodes)
        return pa.table({
            "node": out_nodes,
            "lbl": pa.array([m] * k, pa.int64()),
            "dst": pa.nulls(k, pa.int64()),
        })

    from ray.data.aggregate import Min, Sum

    prev_sum = None
    # labels hop one edge per round => fixpoint within the largest dup
    # cluster's diameter; the generous cap turns pathological
    # non-convergence into a loud error, never a silently-partial
    # clustering
    for _ in range(4096):
        labels = (labels.union(edges).groupby("node")
                  .map_groups(propagate, batch_format="pyarrow")
                  ).materialize()
        # min-propagation is monotone: the per-node min-label sum
        # strictly decreases every non-converged round, so a fixpoint
        # == an unchanged sum (tiny aggregates — no convergence join)
        mins = (labels.groupby("node")
                .aggregate(Min("lbl", alias_name="lbl")))
        cur_sum = mins.aggregate(Sum("lbl", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            labels = mins
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            "dedup_minhash_clusters: min-label propagation did not "
            "converge within 4096 rounds")
    return (labels.map_batches(
        lambda t: pa.table({"cluster_id": t["lbl"], "doc_id": t["node"]}),
        batch_format="pyarrow").sort(["cluster_id", "doc_id"]))


# ---------------------------------------------------------------------------
# Keyword search (inverted term statistics + tf-idf scoring)
# ---------------------------------------------------------------------------

SEARCH_TERMS = ("spark", "window", "hash")  # fixed driver-query terms


def keyword_search_topk(sf_dir: str, terms: tuple[str, ...] = SEARCH_TERMS,
                        k: int = 10):
    """Keyword search over the corpus: score(doc) = Σ_t tf(doc,t) ·
    ln(N/df(t)) for the query terms, top-k by (rounded score desc,
    doc_id).  Pass 1 computes df per query term (per-batch distinct
    (doc,term) pairs are globally distinct — a document never splits
    across batches — so the aggregate input is query-term-count-sized
    per batch) and N; the resulting idf weights broadcast like any
    model parameters.  Pass 2 scores every document inside its own
    batch (index_in + weighted bincount) and runs the usual per-block
    top-k combiner.  Ordering uses the ROUNDED score in both engines."""
    import ray
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    term_arr = pa.array(list(terms), pa.string())
    n_docs = _rp(sf_dir, "documents", ["doc_id"]).count()

    def _term_idx(flat) -> np.ndarray:
        # index_in yields null for misses; fill with -1 for numpy masking
        return np.asarray(pc.fill_null(pc.index_in(flat, value_set=term_arr),
                                       -1)).astype(np.int64)

    def df_partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        idx = _term_idx(flat)
        hit = idx >= 0
        distinct = pa.TableGroupBy(pa.table({
            "term": np.asarray(idx[hit], dtype=np.int64),
            "d": parent[hit],
        }), ["term", "d"]).aggregate([])
        g = pa.TableGroupBy(distinct, ["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "df"])

    df = (ds.map_batches(df_partials, batch_format="pyarrow")
          .groupby("term").aggregate(Sum("df", alias_name="df"))
          .to_pandas())
    idf = np.zeros(len(terms), dtype=np.float64)
    for ti, dfi in zip(df["term"], df["df"]):
        if dfi > 0:
            idf[int(ti)] = np.log(float(n_docs) / float(dfi))
    idf_ref = ray.put(idf)

    def score(t: pa.Table) -> pa.Table:
        w = ray.get(idf_ref)
        flat, parent = split_tokens(t["text"], lower=True)
        idx = _term_idx(flat)
        hit = idx >= 0
        s = np.bincount(parent[hit], weights=w[idx[hit]],
                        minlength=t.num_rows)
        keep = s > 0
        return pa.table({
            "doc_id": pc.take(t["doc_id"],
                              pa.array(np.flatnonzero(keep), pa.int64())),
            "score": pa.array(_rnd4(s[keep]), pa.float64()),
        })

    def local_topk(df_: pd.DataFrame) -> pd.DataFrame:
        df_ = df_.assign(neg=-df_["score"])
        return (df_.sort_values(["neg", "doc_id"], kind="mergesort")
                .head(k).drop(columns=["neg"]))

    scored = ds.map_batches(score, batch_format="pyarrow")
    return (scored.map_batches(local_topk, batch_format="pandas",
                               zero_copy_batch=True)
            .sort([("score"), ("doc_id")], descending=[True, False])
            .limit(k))


# ---------------------------------------------------------------------------
# Bigram-LM scoring (the step up from the unigram perplexity proxy)
# ---------------------------------------------------------------------------

def bigram_logprob_score(sf_dir: str):
    """Bigram-LM quality scoring: mean ln P(w_i | w_{i-1}) per document
    under the corpus's own bigram model, P(w2|w1) = c(w1 w2) / Σ_x
    c(w1 x).  Pass 1 is a pre-aggregated bigram-count groupby (one
    (bigram, count) row per batch enters the shuffle); the prefix
    totals come from re-aggregating the BIGRAM-TYPE-sized count table,
    and the resulting log-prob table broadcasts once via ray.put (LM
    parameters are vocabulary-bounded, not corpus-bounded; at 100 TB
    the keys would be the common.tokens bigram hashes).  Pass 2 scores
    each document inside its batch — one index_in probe + bincount
    mean, no shuffle.  Documents with < 2 tokens have no bigrams and
    drop (the SQL join rule)."""
    import ray
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _bigrams(flat, parent):
        m = len(flat) - 1
        if m <= 0:
            return None, None
        valid = parent[:m] == parent[1:]
        idx = np.flatnonzero(valid)
        if len(idx) == 0:
            return None, None
        g = pc.binary_join_element_wise(
            flat.slice(0, m).take(pa.array(idx)),
            flat.slice(1, m).take(pa.array(idx)), " ")
        return g, parent[idx]

    def count_partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        g, _ = _bigrams(flat, parent)
        if g is None:
            return pa.table({"g": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        gb = pa.TableGroupBy(pa.table({"g": g}), ["g"]).aggregate(
            [([], "count_all")])
        return gb.rename_columns(["g", "c"])

    counts = (ds.map_batches(count_partials, batch_format="pyarrow")
              .groupby("g").aggregate(Sum("c", alias_name="c"))
              .to_pandas())
    w1 = counts["g"].str.split(" ", n=1).str[0]
    prefix_tot = counts.groupby(w1)["c"].transform("sum")
    logp = np.log(counts["c"].to_numpy(np.float64)
                  / prefix_tot.to_numpy(np.float64))
    lm_ref = ray.put((pa.array(counts["g"], pa.string()), logp))

    def score(t: pa.Table) -> pa.Table:
        vocab, lp = ray.get(lm_ref)
        flat, parent = split_tokens(t["text"], lower=True)
        g, par = _bigrams(flat, parent)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_bigrams": pa.array([], pa.int64()),
                          "avg_logprob": pa.array([], pa.float64())})
        if g is None:
            return empty
        idx = np.asarray(pc.index_in(g, value_set=vocab))
        tok_lp = lp[idx]  # every bigram is in-vocab (LM trained on corpus)
        n = np.bincount(par, minlength=t.num_rows)
        s = np.bincount(par, weights=tok_lp, minlength=t.num_rows)
        has = n > 0
        avg = s[has] / n[has]
        return pa.table({
            "doc_id": pc.take(t["doc_id"],
                              pa.array(np.flatnonzero(has), pa.int64())),
            "n_bigrams": pa.array(n[has].astype(np.int64)),
            "avg_logprob": pa.array(_rnd4(avg), pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sequence packing by global ordered prefix sum
# ---------------------------------------------------------------------------

def pack_documents(sf_dir: str, budget: int = 2048, range_width: int = 64):
    """Sequence packing (the context-window packer every LLM trainer
    runs): documents in doc_id order are assigned to fixed-token-budget
    packs, pack_id = floor(exclusive_prefix_sum(n_tokens) / budget) —
    the cumulative-quota rule, deterministic and integer-exact.

    The global ordered prefix sum is two passes, the same shape as the
    crawl's order shards: pass 1 pre-aggregates token totals per
    RANGE (doc_id // range_width) — the shuffle carries one row per
    (range, block) — and the driver turns the range-count-sized total
    table into exclusive range offsets (broadcast once).  Pass 2 is a
    per-range map_groups: each group is range_width documents, sorted
    by doc_id, offset + in-range cumsum.  At 10^10 docs range_width
    scales up (10^5-10^6 docs/range keeps the offset table small and
    each group a few MB); a third level would cap both if ever needed."""
    import ray
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], pattern=_TOKEN_PAT),
                    pa.int64())
        rng = pc.divide(t["doc_id"], pa.scalar(range_width, pa.int64()))
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n,
                         "range_id": rng})

    toks = ds.map_batches(tokens, batch_format="pyarrow").materialize()

    range_tot = (toks.groupby("range_id")
                 .aggregate(Sum("n_tokens", alias_name="tot"))
                 .to_pandas().sort_values("range_id"))
    offs = np.concatenate([[0], np.cumsum(range_tot["tot"].to_numpy(
        np.int64))[:-1]])
    off_map = dict(zip(range_tot["range_id"].astype(np.int64), offs))
    off_ref = ray.put(off_map)

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(off_ref)[int(g["range_id"].iloc[0])]
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy(np.int64)
        excl = base + np.cumsum(n) - n
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tokens": n,
            "pack_id": (excl // budget).astype(np.int64),
        })

    return toks.groupby("range_id").map_groups(per_range,
                                               batch_format="pandas")


# ---------------------------------------------------------------------------
# Weighted domain mixing
# ---------------------------------------------------------------------------

def domain_mix_sample(sf_dir: str, cap: int = 10):
    """Weighted domain mixing (the over-represented-domain downsampler):
    each source is kept at rate min(1, cap/n_source), realized by the
    deterministic multiplicative-hash rule
    (doc_id · 40503) mod 65536 < min(65536·cap // n, 65536) —
    integer-exact and overflow-safe in int64, so the distributed result
    hash-matches the SQL verbatim.  Pass 1 is a tiny per-source count
    aggregate (pre-aggregated per block); the per-source thresholds
    broadcast once; pass 2 filters each batch with one index_in lookup,
    no shuffle."""
    import ray
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "documents", ["doc_id", "source", "lang"])

    def count_partials(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["source"]), ["source"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["source", "n"])

    counts = (ds.map_batches(count_partials, batch_format="pyarrow")
              .groupby("source").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    src_arr = pa.array(counts["source"], pa.string())
    thresh = np.minimum(65536 * cap // counts["n"].to_numpy(np.int64), 65536)
    bc = ray.put((src_arr, thresh))

    def filt(t: pa.Table) -> pa.Table:
        srcs, th = ray.get(bc)
        idx = np.asarray(pc.fill_null(
            pc.index_in(t["source"], value_set=srcs), -1)).astype(np.int64)
        h = (np.asarray(t["doc_id"], dtype=np.int64) * 40503) % 65536
        return t.filter(pa.array(h < th[idx]))

    return ds.map_batches(filt, batch_format="pyarrow")


def temperature_mix_allocation(sf_dir: str, temperature: float = 0.7,
                               budget_tokens: int = 1_000_000):
    """Temperature-scaled language mixing (the mC4/UniMax allocation
    step, Xue et al. 2021 / Chung et al. 2023): per-lang sampling
    weight w_i = n_i^T / Σ n_j^T flattens the head languages at T < 1;
    the token budget splits by the ROUNDED weights (so both engines
    allocate from identical 4-digit numbers) and epochs_i = budget_i /
    n_i reports how many passes over each language the mix implies
    (epochs >> 1 on a tail language is the overfitting warning UniMax
    caps).  Returns (lang, n_tokens, weight, budget_tokens, epochs).

    Scale shape: one pass of per-block (lang, token-count) partials +
    one ≤n_langs-row grouped sum; the allocation math runs on the
    lang-domain-sized aggregate only (single tiny block)."""
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["lang", "text"])

    def count_partials(t: pa.Table) -> pa.Table:
        _, parent = split_tokens(t["text"])
        per_doc = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "lang": t["lang"],
            "n": pa.array(per_doc),
        }), ["lang"]).aggregate([("n", "sum")])
        return g.rename_columns(["lang", "n_tokens"])

    counts = (ds.map_batches(count_partials, batch_format="pyarrow")
              .groupby("lang").aggregate(Sum("n_tokens",
                                             alias_name="n_tokens")))

    def alloc(df: pd.DataFrame) -> pd.DataFrame:
        # a lang whose docs have no word-class tokens is ABSENT from
        # the oracle's unnested token CTE — drop it here too (and its
        # 0/0 epochs): it cannot receive budget
        df = df[df["n_tokens"] > 0]
        df = df.sort_values("lang").reset_index(drop=True)
        n = df["n_tokens"].to_numpy(np.float64)
        p = n ** temperature
        w = _rnd4(p / p.sum())
        b = np.floor(budget_tokens * w + 0.5).astype(np.int64)
        e = _rnd4(b / n)
        return pd.DataFrame({"lang": df["lang"], "n_tokens": df["n_tokens"],
                             "weight": w, "budget_tokens": b, "epochs": e})

    # the aggregate is lang-domain-sized: ONE block through the math
    return (counts.repartition(1)
            .map_batches(alloc, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus (cross-side only)
# ---------------------------------------------------------------------------

def dedup_incremental(sf_dir: str, threshold: float = 0.8,
                      num_perms: int = 64, bands: int = 16,
                      verify_distributed: bool | None = None,
                      driver_pair_threshold: int = 200_000):
    """Incremental near-dup detection — the daily-ingest mode: a NEW
    document batch (doc_id % 2 == 1 here, standing in for today's
    crawl) is deduped against the EXISTING corpus (doc_id % 2 == 0)
    without ever comparing new-vs-new or existing-vs-existing.  Returns
    (doc_a = existing, doc_b = new, jaccard >= threshold) pairs.

    Same banded-MinHash machinery as dedup_minhash, with the candidate
    stage emitting only CROSS-side pairs inside each LSH bucket — the
    work is |new| × bucket-collision-sized, independent of how large
    the existing corpus grows.  In production the existing side's band
    rows are the persisted signature index (written once, like the IVF
    cell index); here both sides sketch in one pass because the corpus
    is one table.  Verification reuses the adaptive driver/distributed
    exact-Jaccard dispatch."""
    from ..common.tokens import word_shingle_hashes
    from .dedup import (MinHasher, _dedup_pairs_ds, _sketch_bands,
                        _verify_dispatch)

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    hasher = MinHasher(num_perms=num_perms)

    def sketch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"])
        sh, par = word_shingle_hashes(t["text"])
        rows = _sketch_bands(ids, sh, par, t.num_rows, hasher, bands)
        return rows.append_column(
            "side", pc.cast(pc.bit_wise_and(rows["doc_id"], 1), pa.int8()))

    band_ds = ds.map_batches(sketch, batch_format="pyarrow", batch_size=4096)
    coarse_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["band_hash"],
                                              coarse_buckets - 1), pa.int32()))

    cand = _dedup_pairs_ds(
        band_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_cross_side_pairs, batch_format="pandas"))
    return _verify_dispatch(sf_dir, ds, cand, word_shingle_hashes,
                            "jaccard", threshold,
                            verify_distributed, driver_pair_threshold)


def _cross_side_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Within each (band_id, band_hash) bucket emit ONLY pairs with
    one existing-side (side=0) and one new-side (side=1) doc, oriented
    (existing, new).  Size-2 groups (the common case) are fully
    vectorized; larger groups loop over a bounded bucket size.  Shared
    by the one-pass incremental dedup and the persisted-index probe."""
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64)})
    df = df.sort_values(["band_id", "band_hash", "doc_id"],
                        kind="mergesort")
    bid = df["band_id"].to_numpy()
    bh = df["band_hash"].to_numpy()
    ids = df["doc_id"].to_numpy()
    side = df["side"].to_numpy()
    n = len(ids)
    if n < 2:
        return empty
    new = np.ones(n, dtype=bool)
    new[1:] = (bh[1:] != bh[:-1]) | (bid[1:] != bid[:-1])
    gidx = np.cumsum(new) - 1
    sizes = np.bincount(gidx)
    size_per_row = sizes[gidx]
    # size-2 fast path: keep only mixed-side groups
    s2 = np.nonzero(new & (size_per_row == 2))[0]
    mixed = side[s2] != side[s2 + 1]
    s2 = s2[mixed]
    first_is_new = (side[s2] == 1)
    out_a = [np.where(first_is_new, ids[s2 + 1], ids[s2])]
    out_b = [np.where(first_is_new, ids[s2], ids[s2 + 1])]
    big = np.nonzero(new & (size_per_row >= 3)
                     & (size_per_row <= 2000))[0]
    for st in big:
        sz = sizes[gidx[st]]
        g_ids, g_side = ids[st:st + sz], side[st:st + sz]
        ex, nw = g_ids[g_side == 0], g_ids[g_side == 1]
        if len(ex) and len(nw):
            a, b = np.meshgrid(ex, nw, indexing="ij")
            out_a.append(a.ravel())
            out_b.append(b.ravel())
    if not out_a:
        return empty
    return pd.DataFrame({"doc_a": np.concatenate(out_a).astype(np.int64),
                         "doc_b": np.concatenate(out_b).astype(np.int64)})


# ---------------------------------------------------------------------------
# Persisted MinHash signature index + partition-pruned incremental probe —
# the production daily-ingest shape: the 100 TB corpus is sketched ONCE
# and its band rows live on disk; each day's batch probes the index
# without re-reading (or re-sketching) the corpus
# ---------------------------------------------------------------------------

_MINHASH_INDEX_ROOT = "/tmp/spider_ray_minhash_idx"
_IDX_PARTS = 128  # hive partitions; probes read only their hashes' parts


def build_minhash_index(sf_dir: str, num_perms: int = 64, bands: int = 16,
                        index_root: str = _MINHASH_INDEX_ROOT) -> str:
    """One-time LSH signature-index build over the EXISTING corpus
    (doc_id % 8 != 1 here, standing in for everything ingested before
    today): ONE streaming sketch pass writes the band rows
    (doc_id, band_id, band_hash) hive-partitioned by
    pidx = band_hash & (_IDX_PARTS-1) — a materialized, resumable
    inverted file, the same shape as the IVF cell index.  Probes read
    only the partitions their own band hashes land in.  Idempotent via
    a marker keyed on source identity (mtime+size+rows) and params."""
    import hashlib
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    from ..common.tokens import word_shingle_hashes
    from .dedup import MinHasher, _sketch_bands

    path = f"{sf_dir}/documents.parquet"
    _st = _os.stat(path)
    key = _json.dumps({"src": _os.path.abspath(path),
                       "mtime": _st.st_mtime, "size": _st.st_size,
                       "rows": _pq.ParquetFile(path).metadata.num_rows,
                       "perms": num_perms, "bands": bands,
                       "parts": _IDX_PARTS, "v": 1}, sort_keys=True)
    idx_dir = _os.path.join(index_root, hashlib.blake2s(
        key.encode(), digest_size=10).hexdigest())
    marker = _os.path.join(idx_dir, "_SUCCESS")
    if _os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == key:
                return idx_dir

    hasher = MinHasher(num_perms=num_perms)

    def sketch_existing(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(
            pc.bit_wise_and(t["doc_id"], 7), 1))
        ids = np.asarray(t["doc_id"])
        sh, par = word_shingle_hashes(t["text"])
        rows = _sketch_bands(ids, sh, par, t.num_rows, hasher, bands)
        return rows.append_column("pidx", pc.cast(
            pc.bit_wise_and(rows["band_hash"], _IDX_PARTS - 1),
            pa.int32()))

    (_rp(sf_dir, "documents", ["doc_id", "text"])
     .map_batches(sketch_existing, batch_format="pyarrow",
                  batch_size=4096)
     .write_parquet(idx_dir, partition_cols=["pidx"], mode="overwrite"))
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(key + "\n")
    _os.replace(tmp, marker)
    return idx_dir


def dedup_incremental_indexed(sf_dir: str, threshold: float = 0.8,
                              num_perms: int = 64, bands: int = 16,
                              verify_distributed: bool | None = None,
                              driver_pair_threshold: int = 200_000,
                              index_root: str = _MINHASH_INDEX_ROOT):
    """Incremental near-dup detection against the PERSISTED signature
    index: today's batch (doc_id % 8 == 1) sketches itself, reads ONLY
    the index partitions its band hashes hit (measured read fraction
    printed — the pruning an in-one-pass run can't have), and emits
    cross-side (existing, new) pairs through the same bucket machinery
    and adaptive exact-Jaccard verify as dedup_incremental.  The corpus
    text is touched only to verify surviving candidate pairs."""
    import os as _os

    import ray.data as rd

    from ..common.tokens import word_shingle_hashes
    from .dedup import MinHasher, _dedup_pairs_ds, _sketch_bands, \
        _verify_dispatch

    idx_dir = build_minhash_index(sf_dir, num_perms=num_perms, bands=bands,
                                  index_root=index_root)
    hasher = MinHasher(num_perms=num_perms)
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    _ROWS_SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("band_id", pa.int32()),
        ("band_hash", pa.int64()), ("side", pa.int8())])

    def sketch_new(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 7), 1))
        ids = np.asarray(t["doc_id"])
        sh, par = word_shingle_hashes(t["text"])
        rows = _sketch_bands(ids, sh, par, t.num_rows, hasher, bands)
        return pa.table({
            "doc_id": pc.cast(rows["doc_id"], pa.int64()),
            "band_id": rows["band_id"],
            "band_hash": rows["band_hash"],
            "side": pa.array(np.ones(rows.num_rows, np.int8), pa.int8()),
        }, schema=_ROWS_SCHEMA)

    new_rows = (ds.map_batches(sketch_new, batch_format="pyarrow",
                               batch_size=4096).materialize())
    # the new batch's hit partitions (<= _IDX_PARTS values, driver-tiny)
    hit = sorted(int(h) & (_IDX_PARTS - 1)
                 for h in new_rows.unique("band_hash"))
    hit = sorted(set(hit))
    all_parts = sorted(d for d in _os.listdir(idx_dir)
                       if d.startswith("pidx="))
    hit_dirs = [d for d in all_parts
                if int(d.split("=", 1)[1]) in set(hit)]
    files = [_os.path.join(idx_dir, d, f)
             for d in hit_dirs
             for f in sorted(_os.listdir(_os.path.join(idx_dir, d)))
             if f.endswith(".parquet")]
    print(f"[dedup_incremental_indexed] probing {len(hit_dirs)}/"
          f"{len(all_parts)} index partitions "
          f"(read fraction {len(hit_dirs) / max(len(all_parts), 1):.3f})")

    def tag_existing(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "band_id": pc.cast(t["band_id"], pa.int32()),
            "band_hash": pc.cast(t["band_hash"], pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
        }, schema=_ROWS_SCHEMA)

    if files:
        existing_rows = rd.read_parquet(files).map_batches(
            tag_existing, batch_format="pyarrow")
    else:  # a shingle-less new batch probes nothing
        existing_rows = rd.from_arrow(_ROWS_SCHEMA.empty_table())

    coarse_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["band_hash"],
                                              coarse_buckets - 1),
                              pa.int32()))

    cand = _dedup_pairs_ds(
        existing_rows.union(new_rows)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_cross_side_pairs, batch_format="pandas"))
    return _verify_dispatch(sf_dir, ds, cand, word_shingle_hashes,
                            "jaccard", threshold,
                            verify_distributed, driver_pair_threshold)


# ---------------------------------------------------------------------------
# Train/val/test split and deterministic global shuffle
# ---------------------------------------------------------------------------

def train_val_test_split(sf_dir: str, pct_train: int = 80, pct_val: int = 10):
    """Deterministic train/val/test assignment — the split every training
    run needs to be reproducible and stable under re-runs: bucket =
    (doc_id · 25781) mod 100 against the percentage thresholds.  Pure
    per-batch map (integer-exact, hash-matches the SQL CASE verbatim);
    adding documents later never reassigns existing ones."""
    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])

    def fn(t: pa.Table) -> pa.Table:
        h = (np.asarray(t["doc_id"], dtype=np.int64) * 25781) % 100
        split = np.where(h < pct_train, "train",
                         np.where(h < pct_train + pct_val, "val", "test"))
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def global_shuffle_rank(sf_dir: str, buckets: int = 64):
    """Deterministic global shuffle for training-example ordering:
    position = dense rank of ((doc_id · 48271) mod 65536, doc_id) — a
    seeded permutation both engines compute identically (unlike
    random_shuffle, it is stable across re-runs and resumable).

    The global rank is the same two-pass ordered-prefix-sum shape as
    pack_documents, keyed on the HASH this time: per-bucket
    (hash-range) counts -> driver exclusive offsets (buckets rows,
    broadcast once) -> per-bucket map_groups sort + arange.  The
    multiplicative hash is uniform, so bucket sizes are balanced and
    each group is ~n/buckets rows."""
    import ray
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "documents", ["doc_id"])
    width = 65536 // buckets

    def key(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        h = (ids * 48271) % 65536
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(h),
                         "bucket": pa.array(h // width)})

    keyed = ds.map_batches(key, batch_format="pyarrow").materialize()

    def count_partials(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["bucket"]), ["bucket"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["bucket", "n"])

    counts = (keyed.map_batches(count_partials, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("bucket"))
    offs = np.concatenate([[0], np.cumsum(
        counts["n"].to_numpy(np.int64))[:-1]])
    off_ref = ray.put(dict(zip(counts["bucket"].astype(np.int64), offs)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(off_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        return pd.DataFrame({
            "position": base + np.arange(len(g), dtype=np.int64),
            "doc_id": g["doc_id"].to_numpy(np.int64),
        })

    return keyed.groupby("bucket").map_groups(per_bucket,
                                              batch_format="pandas")


# ---------------------------------------------------------------------------
# Sub-document (paragraph-level) dedup — CCNet-style line dedup re-expressed
# over deterministic fixed-width character chunks (the corpus carries no
# newline structure; the chunk grid is the shared "paragraph" contract)
# ---------------------------------------------------------------------------

_PARA_DRIVER_MAX_DUPS = 500_000


def paragraph_dedup(sf_dir: str, width: int = 80,
                    force_distributed: bool = False):
    """CCNet-style sub-document dedup over the documents table — see
    paragraph_dedup_ds for semantics and scale shape."""
    return paragraph_dedup_ds(_rp(sf_dir, "documents", ["doc_id", "text"]),
                              width=width,
                              force_distributed=force_distributed)


def paragraph_dedup_ds(docs, width: int = 80,
                       force_distributed: bool = False):
    """CCNet-style sub-document dedup (Wenzek et al. 2019 dedup stage):
    split every document into fixed-width character chunks, keep ONE
    occurrence of every distinct chunk corpus-wide (keeper = min
    (doc_id, chunk_idx), packed as one int64), drop the rest, and
    reconstruct each document from its surviving chunks.  Returns
    (doc_id, kept_chunks, text_dedup); documents that lose every chunk
    drop out.

    Scale shape — the text never shuffles on the common path, and
    nothing per-group runs in Python:
      phase 1  chunk per batch -> hash64(chunk) -> ONLY the int64 pair
               (h, ck) enters ONE grouped (Min, Count) aggregate; the
               hashes with count > 1 plus their keeper ck — the
               DUP-VOLUME-sized table — are all that leaves it.
      phase 2  adaptive: below _PARA_DRIVER_MAX_DUPS the dup table is
               broadcast (ray.put, two sorted int64 arrays) and removal
               detection folds into the reconstruction pass — a
               document's chunks never leave their batch; above the
               threshold the chunk stream LEFT-joins the dup table on h
               (one content-sized hash shuffle, the same cost CCNet
               pays) and reconstruction is a doc_id groupby.  Both
               paths are forced in tests and must agree.
    Collision caveat: dedup keys on the 64-bit chunk hash alone (the
    text is not shipped), so two distinct chunks colliding would merge;
    at n chunks the probability is ~n^2/2^64 and the SQL oracle (which
    compares true text) would flag any actual collision."""
    import ray
    import ray.data as rd

    from ray.data.aggregate import Count, Min

    from spider_ray.common.tokens import hash_string_array

    def _chunks(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"]
        lens = s.str.len().to_numpy()
        n_chunks = -(-lens // width)
        kmax = int(n_chunks.max()) if len(n_chunks) else 0
        parts = []
        for ki in range(kmax):
            m = n_chunks > ki
            chunk = s[m].str.slice(ki * width, (ki + 1) * width)
            parts.append(pd.DataFrame({
                "doc_id": df.loc[m, "doc_id"].to_numpy(),
                "chunk_idx": np.full(int(m.sum()), ki, np.int64),
                "chunk_text": chunk.to_numpy(),
            }))
        if not parts:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "chunk_idx": pd.Series([], dtype=np.int64),
                "chunk_text": pd.Series([], dtype=str)})
        out = pd.concat(parts, ignore_index=True)
        return out.sort_values(["doc_id", "chunk_idx"], ignore_index=True)

    def _with_keys(df: pd.DataFrame) -> pd.DataFrame:
        c = _chunks(df)
        h = hash_string_array(pa.array(c["chunk_text"], pa.string()))
        c["h"] = h.view(np.int64)
        ids = c["doc_id"].to_numpy().astype(np.int64)
        idx = c["chunk_idx"].to_numpy().astype(np.int64)
        # 21-bit chunk slot: doc_id < 2^42 (4.4e12 docs) and <= 2^21
        # chunks/doc (168 MB of text at width 80) — checked loudly, a
        # silent overflow would corrupt keeper selection
        if len(ids) and (int(ids.max()) >= 1 << 42
                         or int(idx.max()) >= 1 << 21):
            raise ValueError(
                "paragraph_dedup packing overflow: need doc_id < 2^42 "
                f"and chunk_idx < 2^21 (got max doc_id={ids.max()}, "
                f"max chunk_idx={idx.max()})")
        c["ck"] = (ids << np.int64(21)) | idx
        return c

    # per-block (h -> min ck, count) partials, then the shared
    # pair-bucket reduce (64-ary groupby + one vectorized pandas
    # aggregate per bucket): a groupby("h").aggregate() keyed on the
    # distinct-chunk cardinality pays Ray's per-group finalization on
    # every chunk hash — measured ~4x this plan's wall at sf0.1
    from ..state.bloom import _splitmix64

    def meta_partials(df: pd.DataFrame) -> pd.DataFrame:
        c = _with_keys(df)[["h", "ck"]]
        g = (c.groupby("h", sort=False)
             .agg(keep_ck=("ck", "min"), cnt=("ck", "size")).reset_index())
        g["pb"] = (_splitmix64(g["h"].to_numpy().astype(np.uint64))
                   % np.uint64(64)).astype(np.int64)
        return g

    _DUPS_SCHEMA = pa.schema([("h", pa.int64()), ("keep_ck", pa.int64())])

    def reduce_dups(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("h", sort=False)
             .agg(keep_ck=("keep_ck", "min"), cnt=("cnt", "sum"))
             .reset_index())
        g = g[g["cnt"] > 1]
        return pd.DataFrame({"h": g["h"].to_numpy(np.int64),
                             "keep_ck": g["keep_ck"].to_numpy(np.int64)})

    dups = (docs.map_batches(meta_partials, batch_format="pandas")
            .groupby("pb").map_groups(reduce_dups, batch_format="pandas")
            .materialize())
    n_dup = dups.count()

    def _reconstruct_batch(c: pd.DataFrame) -> pd.DataFrame:
        if not len(c):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "kept_chunks": pd.Series([], dtype=np.int64),
                "text_dedup": pd.Series([], dtype=str)})
        g = c.groupby("doc_id", sort=True)
        return pd.DataFrame({
            "doc_id": np.fromiter(g.groups.keys(), np.int64),
            "kept_chunks": g.size().to_numpy().astype(np.int64),
            "text_dedup": g["chunk_text"].agg("".join).to_numpy(),
        })

    if n_dup == 0:
        # nothing duplicated: reconstruction is the identity per batch —
        # taken even under force_distributed (an all-empty dup Dataset
        # has no schema, which Ray's hash-shuffle join rejects; with
        # zero removals the join path IS the identity anyway — the join
        # machinery is force-exercised by the constructed dup corpora)
        return docs.map_batches(
            lambda df: _reconstruct_batch(_chunks(df)),
            batch_format="pandas")

    if n_dup <= _PARA_DRIVER_MAX_DUPS and not force_distributed:
        dd = dups.to_pandas().sort_values("h", ignore_index=True)
        dup_ref = ray.put((dd["h"].to_numpy(np.int64),
                           dd["keep_ck"].to_numpy(np.int64)))

        def apply_rm(df: pd.DataFrame) -> pd.DataFrame:
            hs, keep_ck = ray.get(dup_ref)  # zero-copy shm views
            c = _with_keys(df)
            hv = c["h"].to_numpy()
            pos = np.searchsorted(hs, hv)
            pos_c = np.minimum(pos, max(len(hs) - 1, 0))
            matched = (len(hs) > 0) & (hs[pos_c] == hv)
            rm = matched & (c["ck"].to_numpy() != keep_ck[pos_c])
            return _reconstruct_batch(c[~rm])

        return docs.map_batches(apply_rm, batch_format="pandas")

    # distributed removal application: one content-sized shuffle (the
    # CCNet cost) — LEFT-join the chunk stream against the dup table on
    # h, drop non-keeper matches, reconstruct by doc groupby
    _CHUNK_SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
        ("chunk_text", pa.string()), ("h", pa.int64()), ("ck", pa.int64())])

    def chunk_rows(df: pd.DataFrame) -> pa.Table:
        # explicit schema on EVERY block: an upstream filter can empty a
        # whole batch, and an empty pandas frame round-trips to a
        # schema-less Arrow block that the hash-shuffle join rejects
        return pa.Table.from_pandas(_with_keys(df), schema=_CHUNK_SCHEMA,
                                    preserve_index=False)

    chunk_ds = docs.map_batches(chunk_rows, batch_format="pandas")
    # sparse side LEFT + right_outer keeps every chunk row exactly once.
    # repartition first so the sparse side has NO empty blocks: the hash
    # shuffle silently drops empty input blocks, and a join partition
    # that then receives nothing from one side builds a zero-column
    # table pyarrow rejects ("no match for key field").
    dups_nonempty = dups.repartition(max(1, min(16, n_dup)))
    joined = dups_nonempty.join(chunk_ds, join_type="right_outer",
                                on=("h",), num_partitions=16)

    def drop_removed(t: pa.Table) -> pa.Table:
        # null-safe int64 compare in ARROW: a pandas round-trip would
        # promote the nullable keep_ck to float64 and lose exactness
        # for ck >= 2^53
        rm = pc.fill_null(pc.not_equal(t["ck"], t["keep_ck"]), False)
        return t.filter(pc.invert(rm))

    joined = joined.map_batches(drop_removed, batch_format="pyarrow")

    def reconstruct(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("chunk_idx", kind="mergesort")
        if not len(g):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "kept_chunks": pd.Series([], dtype=np.int64),
                "text_dedup": pd.Series([], dtype=str)})
        return pd.DataFrame({
            "doc_id": g["doc_id"].iloc[:1].astype(np.int64).to_numpy(),
            "kept_chunks": np.array([len(g)], np.int64),
            "text_dedup": np.array(["".join(g["chunk_text"])], object),
        })

    return joined.groupby("doc_id").map_groups(
        reconstruct, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4-style rule-battery quality filter (Raffel et al. 2020 §2.2 shape)
# ---------------------------------------------------------------------------

C4_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
C4_BLOCKLIST = ("dup",)
C4_MIN_TOKENS, C4_MAX_TOKENS = 20, 5000
C4_MIN_MEAN_LEN, C4_MAX_MEAN_LEN = 3, 10  # ints: compares stay integer-exact
C4_MIN_STOP_PCT = 3


def c4_style_filter(sf_dir: str):
    """C4-style quality filter (the rule-battery shape of Raffel et al.
    2020 §2.2, constants adapted to this corpus): per document, the
    FIRST failing rule in a fixed precedence order becomes its reason;
    kept == no rule fired.  Rules: token count in [20, 5000]; mean
    token length in [3, 10] (compared as integer cross-products, never
    a float mean); stopword fraction >= 3% (stopn*100 >= 3*n); no
    blocklisted term.  Fully in-batch — tokenize once with the shared
    kernel, every rule is a bincount/is_in over the flat token array,
    zero shuffle, nothing on the driver."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n, reason = _c4_reasons(t["text"], t.num_rows)
        return pa.table({
            "doc_id": t["doc_id"],
            "kept": pa.array(reason == "ok"),
            "n_tokens": pa.array(n, pa.int64()),
            "reason": pa.array(reason, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _c4_counts(text_col, rows: int
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc (n_tokens, sum_token_len, n_stopwords, n_blocklisted) —
    the integer counts behind the C4 rules; also the feature source for
    the quality classifier."""
    from spider_ray.common.tokens import split_tokens

    stop_set = pa.array(list(C4_STOPWORDS), pa.string())
    block_set = pa.array(list(C4_BLOCKLIST), pa.string())
    flat, parent = split_tokens(text_col)
    n = np.zeros(rows, np.int64)
    np.add.at(n, parent, 1)
    lens = np.asarray(pc.binary_length(flat), dtype=np.int64)
    sumlen = np.zeros(rows, np.int64)
    np.add.at(sumlen, parent, lens)
    stopm = np.asarray(pc.is_in(flat, value_set=stop_set))
    stopn = np.zeros(rows, np.int64)
    np.add.at(stopn, parent[stopm], 1)
    blockm = np.asarray(pc.is_in(flat, value_set=block_set))
    blockn = np.zeros(rows, np.int64)
    np.add.at(blockn, parent[blockm], 1)
    return n, sumlen, stopn, blockn


def _c4_reasons(text_col, rows: int) -> tuple[np.ndarray, np.ndarray]:
    """The C4 rule kernel: (n_tokens, reason) arrays for a text column —
    shared by c4_style_filter and the composed webtext_prep_v2."""
    n, sumlen, stopn, blockn = _c4_counts(text_col, rows)
    reason = np.select(
        [n < C4_MIN_TOKENS,
         n > C4_MAX_TOKENS,
         sumlen < C4_MIN_MEAN_LEN * n,
         sumlen > C4_MAX_MEAN_LEN * n,
         stopn * 100 < C4_MIN_STOP_PCT * n,
         blockn > 0],
        ["too_few_tokens", "too_many_tokens", "short_tokens",
         "long_tokens", "low_stopword", "blocklisted"],
        default="ok")
    return n, reason


def webtext_prep_v2(sf_dir: str, force_distributed: bool = False):
    """Composed modern-webtext prep, hash-checked END TO END against ONE
    SQL statement: C4 rule filter → CCNet paragraph dedup over the
    SURVIVING documents → deterministic train/val/test split → per-split
    integer stats (docs, kept chunks, reconstructed chars).

    Scale shape: the filter finalizes in-batch (rejected docs never
    leave their read batch), the dedup is paragraph_dedup_ds's
    dup-table-broadcast machinery over the filtered stream, and the
    split/stats tail is a pure map + per-block count partials + one
    grouped sum over ≤3 rows per block.  All outputs are integers, so
    the composition hash-matches the oracle at any parallelism."""
    from ray.data.aggregate import Sum

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def keep(t: pa.Table) -> pa.Table:
        _, reason = _c4_reasons(t["text"], t.num_rows)
        return t.filter(pa.array(reason == "ok"))

    # materialize the filtered stream: paragraph_dedup_ds consumes it
    # twice (keeper aggregate, then reconstruction), and re-running the
    # C4 tokenize battery — the pipeline's heaviest kernel — per pass
    # would double the dominant cost
    kept = docs.map_batches(keep, batch_format="pyarrow").materialize()
    deduped = paragraph_dedup_ds(kept,
                                 force_distributed=force_distributed)

    def split_partials(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        b = (ids * 25781) % 100
        split = np.where(b < 80, "train",
                         np.where(b < 90, "val", "test"))
        out = pa.table({
            "split": pa.array(split, pa.string()),
            "kept_chunks": t["kept_chunks"],
            "chars": pc.utf8_length(t["text_dedup"]),
        })
        g = pa.TableGroupBy(out, ["split"]).aggregate(
            [("kept_chunks", "sum"), ("chars", "sum"),
             ([], "count_all")])
        return g.rename_columns(["split", "chunks", "chars", "docs"])

    return (deduped.map_batches(split_partials, batch_format="pyarrow")
            .groupby("split")
            .aggregate(Sum("docs", alias_name="docs"),
                       Sum("chunks", alias_name="chunks"),
                       Sum("chars", alias_name="chars"))
            .sort("split"))


# ---------------------------------------------------------------------------
# Exact substring-span dedup (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better") — the ExactSubstr duplicate-span REPORT,
# re-expressed over word-k-gram shingles instead of a suffix array: a token
# position is duplicated iff it is covered by some k-token window whose
# token sequence also occurs at an earlier (doc_id, pos) anywhere in the
# corpus; maximal runs of covered positions are the output spans.
# ---------------------------------------------------------------------------

_SPAN_DRIVER_MAX_DUPS = 500_000
_SPAN_K = 8


def dedup_substring_spans(sf_dir: str, k: int = _SPAN_K,
                          force_distributed: bool = False):
    """Duplicate-span report over the documents table — see
    substring_spans_ds for semantics and scale shape."""
    return substring_spans_ds(_rp(sf_dir, "documents", ["doc_id", "text"]),
                              k=k, force_distributed=force_distributed)


def substring_spans_ds(docs, k: int = _SPAN_K,
                       force_distributed: bool = False):
    """Exact substring-span dedup report: (doc_id, span_start, span_end,
    n_tokens) for every maximal duplicated token run, positions 1-based
    in the doc's token sequence (the suite-wide [a-z0-9_]+ class).
    First-wins: of all occurrences of a given k-token window, the
    minimum (doc_id, pos) is the keeper; every other occurrence marks
    its k covered positions as duplicated.  Overlapping/adjacent covered
    windows merge (gap in occurrence starts <= k tokens).

    Scale shape — text never shuffles, and every token is touched twice:
      phase 1  tokenize per batch with the shared kernel -> positional
               k-window splitmix chain over the token hashes -> ONLY the
               int64 pair (h, packed=(doc_id<<21|pos)) enters ONE grouped
               (Min, Count) aggregate; hashes with count > 1 plus their
               keeper key — the DUP-VOLUME-sized table — are all that
               leaves it.
      phase 2  adaptive: below _SPAN_DRIVER_MAX_DUPS the dup table is
               broadcast (ray.put, two sorted int64 arrays) and span
               detection folds into a second tokenize pass — a document's
               occurrences never leave their batch, islands merge with
               one vectorized boundary scan; above the threshold the
               occurrence stream RIGHT-joins the dup table on h (one
               int64-only shuffle), and islands merge per doc in
               map_groups (groups = docs-with-duplicates, each
               dup-occurrence-sized).  Both paths forced in tests and
               hash-matched against the SQL oracle (windowed string_agg
               shingles + row_number first-wins + gaps-and-islands).
    Collision caveat: spans key on the 63-bit shingle hash chain (the
    shingle text is never shipped), so two distinct windows colliding
    would merge; at n windows the probability is ~n^2/2^63 and the SQL
    oracle (which compares true shingle strings) would flag any actual
    collision."""
    import ray
    import ray.data as rd

    from ray.data.aggregate import Count, Min

    from spider_ray.common.tokens import (_MASK63, token_hashes,
                                          window_hash_chain)

    _OUT_SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("span_start", pa.int64()),
        ("span_end", pa.int64()), ("n_tokens", pa.int64())])

    def _occurrences(t: pa.Table):
        """(h, doc, pos, packed) int64 arrays for one batch of docs —
        every occurrence of every k-window, doc-major / pos-ascending."""
        th, parent = token_hashes(t["text"])
        n = len(th)
        acc, valid = window_hash_chain(th, parent, k)  # shared kernel
        m = len(acc)
        if m == 0:
            z = np.zeros(0, np.int64)
            return z, z, z, z
        # 1-based position within the doc: parent is ascending, so the
        # first flat index of each doc is a searchsorted over itself
        first = np.searchsorted(parent, parent)
        pos = (np.arange(n, dtype=np.int64) - first + 1)[:m][valid]
        par = parent[:m][valid]
        doc = np.asarray(t["doc_id"], dtype=np.int64)[par]
        h = (acc[valid] & _MASK63).view(np.int64)
        # 21-bit position slot: every packed quantity downstream —
        # keeper keys here, span_end (= start+k-1) in the apply join,
        # full TOKEN positions in _reconstruct — must fit, so the bound
        # is on the doc's token count, not just window starts: doc_id
        # < 2^42 and < 2^21 - k (~2M) tokens per doc, checked loudly (a
        # silent overflow would corrupt keeper ordering / span removal)
        if len(doc) and (int(doc.max()) >= 1 << 42
                         or int(pos.max()) + k - 1 >= 1 << 21):
            raise ValueError(
                "substring_spans packing overflow: need doc_id < 2^42 "
                f"and token count < 2^21 - {k} (got max doc_id="
                f"{doc.max()}, max window pos={pos.max()})")
        packed = (doc << np.int64(21)) | pos
        return h, doc, pos, packed

    # per-block (h -> min pk, count) partials + 64-ary bucket reduce —
    # the same high-cardinality-groupby replacement as
    # paragraph_dedup_ds (Ray's per-group finalization on one group per
    # distinct 8-gram chain dominated this stage)
    from ..state.bloom import _splitmix64

    def occ_partials(t: pa.Table) -> pd.DataFrame:
        h, _doc, _pos, packed = _occurrences(t)
        c = pd.DataFrame({"h": h, "pk": packed})
        g = (c.groupby("h", sort=False)
             .agg(keep_pk=("pk", "min"), cnt=("pk", "size")).reset_index())
        g["pb"] = (_splitmix64(g["h"].to_numpy().astype(np.uint64))
                   % np.uint64(64)).astype(np.int64)
        return g

    _DUPS_SCHEMA = pa.schema([("h", pa.int64()), ("keep_pk", pa.int64())])

    def reduce_dups(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("h", sort=False)
             .agg(keep_pk=("keep_pk", "min"), cnt=("cnt", "sum"))
             .reset_index())
        g = g[g["cnt"] > 1]
        return pd.DataFrame({"h": g["h"].to_numpy(np.int64),
                             "keep_pk": g["keep_pk"].to_numpy(np.int64)})

    dups = (docs.map_batches(occ_partials, batch_format="pyarrow")
            .groupby("pb").map_groups(reduce_dups, batch_format="pandas")
            .materialize())
    n_dup = dups.count()

    def _merge_islands(doc: np.ndarray, pos: np.ndarray) -> pa.Table:
        """Maximal covered spans from dup occurrence starts, which MUST
        arrive doc-contiguous and pos-ascending within each doc.  Two
        occurrences p1 < p2 cover overlapping/adjacent token ranges
        [p,p+k-1] iff p2 - p1 <= k."""
        if len(pos) == 0:
            return _OUT_SCHEMA.empty_table()
        boundary = np.ones(len(pos), dtype=bool)
        boundary[1:] = (doc[1:] != doc[:-1]) | (pos[1:] - pos[:-1] > k)
        starts = np.flatnonzero(boundary)
        last = np.r_[starts[1:], len(pos)] - 1
        span_start = pos[starts]
        span_end = pos[last] + k - 1
        return pa.table({
            "doc_id": pa.array(doc[starts], pa.int64()),
            "span_start": pa.array(span_start, pa.int64()),
            "span_end": pa.array(span_end, pa.int64()),
            "n_tokens": pa.array(span_end - span_start + 1, pa.int64()),
        })

    if n_dup == 0:
        # nothing duplicated: the report is the empty table — returned
        # as ONE schema-carrying literal block (a map over docs emitting
        # empties loses the schema at to_pandas; and an all-empty dup
        # Dataset has no schema for the join path, which with zero dups
        # IS the empty report anyway — so this branch is taken even
        # under force_distributed)
        return rd.from_arrow(_OUT_SCHEMA.empty_table())

    if n_dup <= _SPAN_DRIVER_MAX_DUPS and not force_distributed:
        dd = dups.to_pandas().sort_values("h", ignore_index=True)
        dup_ref = ray.put((dd["h"].to_numpy(np.int64),
                           dd["keep_pk"].to_numpy(np.int64)))

        def spans_batch(t: pa.Table) -> pa.Table:
            hs, keep_pk = ray.get(dup_ref)  # zero-copy shm views
            h, doc, pos, packed = _occurrences(t)
            idx = np.searchsorted(hs, h)
            idx_c = np.minimum(idx, max(len(hs) - 1, 0))
            matched = (len(hs) > 0) & (hs[idx_c] == h)
            dup_mask = matched & (packed != keep_pk[idx_c])
            # occurrences are doc-major / pos-ascending by construction
            return _merge_islands(doc[dup_mask], pos[dup_mask])

        return docs.map_batches(spans_batch, batch_format="pyarrow")

    # distributed: the occurrence stream (int64s only, never text)
    # RIGHT-joins the dup table on h; non-keeper matches are the dup
    # occurrences; islands merge per doc (groups = docs-with-dups)
    _OCC_SCHEMA = pa.schema([
        ("h", pa.int64()), ("pk", pa.int64()),
        ("doc_id", pa.int64()), ("pos", pa.int64())])

    def occ_rows(t: pa.Table) -> pa.Table:
        h, doc, pos, packed = _occurrences(t)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "pk": pa.array(packed, pa.int64()),
                         "doc_id": pa.array(doc, pa.int64()),
                         "pos": pa.array(pos, pa.int64())},
                        schema=_OCC_SCHEMA)

    occ_ds = docs.map_batches(occ_rows, batch_format="pyarrow")
    # no empty blocks on the sparse side (hash shuffle drops them and
    # the join then builds a zero-column table) — see paragraph_dedup_ds
    dups_nonempty = dups.repartition(max(1, min(16, n_dup)))
    joined = dups_nonempty.join(occ_ds, join_type="right_outer",
                                on=("h",), num_partitions=16)

    def dup_occurrences(t: pa.Table) -> pa.Table:
        # null-safe int64 compare in ARROW (a pandas round-trip would
        # promote nullable keep_pk to float64, losing >2^53 exactness)
        is_dup = pc.fill_null(pc.not_equal(t["pk"], t["keep_pk"]), False)
        t = t.filter(is_dup)
        return t.select(["doc_id", "pos"])

    dup_occ = joined.map_batches(dup_occurrences, batch_format="pyarrow")

    def doc_spans(g: pd.DataFrame) -> pd.DataFrame:
        pos = np.sort(g["pos"].to_numpy(np.int64))
        doc = np.full(len(pos), int(g["doc_id"].iloc[0]), np.int64)
        return _merge_islands(doc, pos).to_pandas()

    return dup_occ.groupby("doc_id").map_groups(
        doc_spans, batch_format="pandas")


def dedup_substring_apply(sf_dir: str, k: int = _SPAN_K,
                          force_distributed: bool = False):
    """Apply substring-span removal over the documents table — see
    substring_apply_ds for semantics and scale shape."""
    return substring_apply_ds(
        lambda: _rp(sf_dir, "documents", ["doc_id", "text"]), k=k,
        force_distributed=force_distributed)


def substring_apply_ds(docs_factory, k: int = _SPAN_K,
                       force_distributed: bool = False, spans=None):
    """Lee et al. 2021 ExactSubstr REMOVAL: drop every duplicated token
    (positions covered by the spans substring_spans_ds reports) and
    reconstruct each document as its kept normalized token sequence —
    (doc_id, n_tokens_kept, text_dedup), space-joined lowercased tokens
    in original order.  Documents with zero tokens or zero kept tokens
    drop out (the SQL-group semantics).

    ``docs_factory`` is a zero-arg callable returning a FRESH documents
    Dataset — the span phase and the apply phase each consume one (a
    shared lazy Dataset would re-execute anyway; the factory makes the
    two-pass shape explicit).

    Scale shape: spans come from substring_spans_ds (only int64s
    shuffle); removal application is IN-BATCH on both paths — the text
    column never shuffles on the driver path (span table broadcast as
    three sorted int64 arrays, interval membership one searchsorted),
    and on the distributed path pays ONE doc-keyed text shuffle: spans
    pre-fold to one (doc_id, starts, ends) list-row per dup doc
    (dup-volume-sized map_groups), LEFT-join against the docs — one row
    per doc, reconstruction stays in-batch (never a corpus-scale
    per-doc Python group)."""
    import ray

    from spider_ray.common.tokens import split_tokens

    _APPLY_SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens_kept", pa.int64()),
        ("text_dedup", pa.string())])

    if spans is None:
        spans = substring_spans_ds(docs_factory(), k=k,
                                   force_distributed=force_distributed)
    # else: a precomputed span report (e.g. the spans stage's parquet in
    # jobs/run_exactsubstr.py) — MUST be the same corpus and k
    spans = spans.materialize()
    n_span = spans.count()

    def _reconstruct(t: pa.Table, sp_doc: np.ndarray,
                     sp_start: np.ndarray, sp_end: np.ndarray) -> pa.Table:
        """Drop covered tokens and rejoin — fully vectorized.  Span
        arrays must be sorted by (doc, start); spans of one doc are
        disjoint (maximal islands), so a token at pos is covered iff
        the FLOOR span by (doc, start) is its doc's and ends at/after
        pos."""
        flat, parent = split_tokens(t["text"])
        if len(flat) == 0:
            return _APPLY_SCHEMA.empty_table()
        doc = np.asarray(t["doc_id"], dtype=np.int64)[parent]
        first = np.searchsorted(parent, parent)
        pos = np.arange(len(parent), dtype=np.int64) - first + 1
        if len(sp_doc):
            # same packing domain as the span phase (checked there)
            tok_key = (doc << np.int64(21)) | pos
            sp_key = (sp_doc << np.int64(21)) | sp_start
            idx = np.searchsorted(sp_key, tok_key, side="right") - 1
            idx_c = np.maximum(idx, 0)
            covered = ((idx >= 0) & (sp_doc[idx_c] == doc)
                       & (sp_end[idx_c] >= pos))
            keep = ~covered
        else:
            keep = np.ones(len(parent), dtype=bool)
        flat = flat.filter(pa.array(keep))
        kept_counts = np.bincount(parent[keep], minlength=t.num_rows)
        nz = kept_counts > 0
        offsets = np.concatenate(
            [[0], np.cumsum(kept_counts[nz])]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         flat)
        return pa.table({
            "doc_id": pa.array(
                np.asarray(t["doc_id"], dtype=np.int64)[nz], pa.int64()),
            "n_tokens_kept": pa.array(kept_counts[nz], pa.int64()),
            "text_dedup": pc.binary_join(lists, " "),
        })

    if n_span == 0:
        def apply_none(t: pa.Table) -> pa.Table:
            z = np.zeros(0, np.int64)
            return _reconstruct(t, z, z, z)

        return docs_factory().map_batches(apply_none,
                                          batch_format="pyarrow")

    if n_span <= _SPAN_DRIVER_MAX_DUPS and not force_distributed:
        sp = (spans.to_pandas()
              .sort_values(["doc_id", "span_start"], ignore_index=True))
        sp_ref = ray.put((sp["doc_id"].to_numpy(np.int64),
                          sp["span_start"].to_numpy(np.int64),
                          sp["span_end"].to_numpy(np.int64)))

        def apply_bcast(t: pa.Table) -> pa.Table:
            sd, ss, se = ray.get(sp_ref)  # zero-copy shm views
            return _reconstruct(t, sd, ss, se)

        return docs_factory().map_batches(apply_bcast,
                                          batch_format="pyarrow")

    # distributed: fold spans to ONE list-row per dup doc (map_groups
    # over docs-with-dups only — dup-volume-sized), LEFT-join the docs
    # against it (the one text shuffle), reconstruct in-batch
    def fold_spans(g: pd.DataFrame) -> pa.Table:
        # Arrow's hash join rejects list-typed payload columns, so the
        # per-doc span list crosses the shuffle as ONE string of packed
        # (start<<21|end) ints — both < 2^21 (checked in the span
        # phase), comma-separated, start-ascending
        g = g.sort_values("span_start", kind="mergesort")
        packed = ((g["span_start"].to_numpy(np.int64) << np.int64(21))
                  | g["span_end"].to_numpy(np.int64))
        return pa.table({
            "doc_id": pa.array([int(g["doc_id"].iloc[0])], pa.int64()),
            "spans_packed": pa.array(
                [",".join(map(str, packed.tolist()))], pa.string()),
        })

    span_lists = spans.groupby("doc_id").map_groups(
        fold_spans, batch_format="pandas")
    span_lists = span_lists.repartition(
        max(1, min(16, span_lists.count())))
    joined = span_lists.join(docs_factory(), join_type="right_outer",
                             on=("doc_id",), num_partitions=16)

    def apply_joined(t: pa.Table) -> pa.Table:
        doc_ids = np.asarray(t["doc_id"], dtype=np.int64)
        enc = t["spans_packed"].to_pylist()
        docs_l, packs = [], []
        for d, s in zip(doc_ids.tolist(), enc):
            if not s:
                continue  # doc with no spans (join null)
            p = np.array(s.split(","), dtype=np.int64)
            packs.append(p)
            docs_l.append(np.full(len(p), d, np.int64))
        if packs:
            sp_doc = np.concatenate(docs_l)
            packed = np.concatenate(packs)
            sp_start = packed >> np.int64(21)
            sp_end = packed & np.int64((1 << 21) - 1)
            # join output rows are not doc-sorted: sort by (doc, start)
            # for the floor-span searchsorted
            order = np.lexsort((sp_start, sp_doc))
            sp_doc, sp_start, sp_end = (sp_doc[order], sp_start[order],
                                        sp_end[order])
        else:
            sp_doc = sp_start = sp_end = np.zeros(0, np.int64)
        return _reconstruct(t.select(["doc_id", "text"]),
                            sp_doc, sp_start, sp_end)

    return joined.map_batches(apply_joined, batch_format="pyarrow")


def webtext_prep_v3(sf_dir: str, force_distributed: bool = False):
    """Composed modern-webtext prep v3, hash-checked END TO END against
    ONE SQL statement: C4 rule filter → ExactSubstr duplicate-span
    REMOVAL over the SURVIVING documents (Lee et al. 2021 applied
    corpus-wide) → deterministic train/val/test split → per-split
    integer stats (docs, kept tokens, reconstructed chars).

    Scale shape: the filter finalizes in-batch (rejected docs never
    leave their read batch); the span machinery sees only the filtered
    stream (its aggregate shuffles int64 pairs only); removal applies
    in-batch on the broadcast path; the split/stats tail is a pure map
    + per-block count partials + one grouped sum over ≤3 rows per
    block.  All outputs are integers, so the composition hash-matches
    the oracle at any parallelism."""
    from ray.data.aggregate import Sum

    def kept_factory():
        docs = _rp(sf_dir, "documents", ["doc_id", "text"])

        def keep(t: pa.Table) -> pa.Table:
            _, reason = _c4_reasons(t["text"], t.num_rows)
            return t.filter(pa.array(reason == "ok"))

        return docs.map_batches(keep, batch_format="pyarrow")

    deduped = substring_apply_ds(kept_factory,
                                 force_distributed=force_distributed)

    def split_partials(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        b = (ids * 25781) % 100
        split = np.where(b < 80, "train",
                         np.where(b < 90, "val", "test"))
        out = pa.table({
            "split": pa.array(split, pa.string()),
            "kept_tokens": t["n_tokens_kept"],
            "chars": pc.utf8_length(t["text_dedup"]),
        })
        g = pa.TableGroupBy(out, ["split"]).aggregate(
            [("kept_tokens", "sum"), ("chars", "sum"),
             ([], "count_all")])
        return g.rename_columns(["split", "tokens", "chars", "docs"])

    return (deduped.map_batches(split_partials, batch_format="pyarrow")
            .groupby("split")
            .aggregate(Sum("docs", alias_name="docs"),
                       Sum("tokens", alias_name="tokens"),
                       Sum("chars", alias_name="chars"))
            .sort("split"))


def webtext_prep_v4(sf_dir: str, cosine_threshold: float = 0.8,
                    min_tokens: int = 15, prefix_n: int = 12,
                    force_distributed: bool = False,
                    bcast_max_drops: int = 2_000_000):
    """Composed webtext prep v4, hash-checked END TO END against ONE
    SQL statement: token-PREFIX dedup (keep min doc_id per first-12-
    token group) → IDF-COSINE near-dup removal over the SURVIVORS
    (drop the higher id of every pair ≥ threshold; idf denominator =
    survivor count, matching the oracle's staged CTEs) → token-count
    floor → per-lang integer stats (docs, tokens, chars).

    Scale shape: prefix keepers reduce over (hash, doc_id) int64 pairs
    only; the survivor filter is ONE hash join on the prefix hash (the
    single content-sized shuffle, the same cost class CCNet's dedup
    apply pays); the cosine stage inherits simjoin_tfidf_cosine_ds's
    adaptive plan; the drop list is dup-volume-sized — broadcast as a
    sorted int64 array below bcast_max_drops, hash anti-join above (or
    with force_distributed, which tests pin equal); the stats tail is
    per-block partials + one ≤n_langs-row grouped sum.  All outputs are
    integers, so the composition hash-matches at any parallelism."""
    import ray
    from ray.data.aggregate import Count, Min, Sum

    from ..common.tokens import (_MASK63, prefix_chain_hashes,
                                 split_tokens)
    from .dedup import simjoin_tfidf_cosine_ds

    docs = _rp(sf_dir, "documents", ["doc_id", "lang", "text"])

    def with_ph(t: pa.Table) -> pa.Table:
        h = prefix_chain_hashes(t["text"], prefix_n)
        return t.append_column(
            "ph", pa.array((h & _MASK63).astype(np.int64)))

    tagged = docs.map_batches(with_ph, batch_format="pyarrow").materialize()

    keepers = (tagged.map_batches(
        lambda t: pa.table({"ph": t["ph"], "doc_id": t["doc_id"]}),
        batch_format="pyarrow")
        .groupby("ph").aggregate(Min("doc_id", alias_name="keep_id")))

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(16, cpus // 2))
    joined = tagged.join(keepers.repartition(4), join_type="inner",
                         num_partitions=nparts, on=("ph",), right_on=("ph",))
    survivors = joined.map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["keep_id"]))
                   .drop_columns(["ph", "keep_id"]),
        batch_format="pyarrow").materialize()
    n_surv = survivors.count()

    pairs = simjoin_tfidf_cosine_ds(
        survivors, n_surv, threshold=cosine_threshold,
        verify_distributed=True if force_distributed else None
    ).materialize()
    n_pairs = pairs.count()

    if n_pairs == 0:  # nothing to drop (and an empty join side would
        kept = survivors  # lose its key field — same guard as dedup)
    elif force_distributed or n_pairs > bcast_max_drops:
        # distinct drop ids -> LEFT OUTER join; unmatched right = keep
        drops = (pairs.map_batches(
            lambda t: pa.table({"doc_id": t["doc_b"]}),
            batch_format="pyarrow")
            .groupby("doc_id").aggregate(Count(alias_name="n_hits")))
        marked = survivors.join(
            drops.repartition(4), join_type="left_outer",
            num_partitions=nparts, on=("doc_id",), right_on=("doc_id",))
        kept = marked.map_batches(
            lambda t: t.filter(pc.is_null(t["n_hits"]))
                       .drop_columns(["n_hits"]),
            batch_format="pyarrow")
    else:
        drop_ids = np.unique(
            pairs.to_pandas()["doc_b"].to_numpy(np.int64))  # ≤ bcast_max
        drop_ref = ray.put(drop_ids)

        def drop_filter(t: pa.Table, _ref=drop_ref) -> pa.Table:
            d = ray.get(_ref)
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            pos = np.searchsorted(d, ids)
            hit = (pos < len(d)) & (d[np.clip(pos, 0, len(d) - 1)] == ids)
            return t.filter(pa.array(~hit))

        kept = survivors.map_batches(drop_filter, batch_format="pyarrow")

    def stats_partials(t: pa.Table) -> pa.Table:
        _, parent = split_tokens(t["text"])
        ntok = (np.bincount(parent, minlength=t.num_rows)
                .astype(np.int64) if t.num_rows else
                np.zeros(0, np.int64))
        m = ntok >= min_tokens
        out = pa.table({
            "lang": t["lang"].filter(pa.array(m)),
            "tokens": pa.array(ntok[m]),
            "chars": pc.cast(pc.utf8_length(
                t["text"].filter(pa.array(m))), pa.int64()),
        })
        g = pa.TableGroupBy(out, ["lang"]).aggregate(
            [([], "count_all"), ("tokens", "sum"), ("chars", "sum")])
        return g.rename_columns(["lang", "docs", "tokens", "chars"])

    return (kept.map_batches(stats_partials, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("docs", alias_name="docs"),
                       Sum("tokens", alias_name="tokens"),
                       Sum("chars", alias_name="chars"))
            .sort("lang"))


# ---------------------------------------------------------------------------
# Persisted inverted index (postings file) + partition-pruned boolean search
# ---------------------------------------------------------------------------

_TEXT_INDEX_ROOT = "/tmp/spider_ray_text_idx"
_TIDX_PARTS = 64  # hive partitions; a k-term query reads <= k of them


def build_text_index(sf_dir: str, index_root: str = _TEXT_INDEX_ROOT) -> str:
    """One-time inverted-file build over the corpus: (doc_id, token, tf)
    postings rows hive-partitioned by pidx = token_hash & (_TIDX_PARTS-1)
    — the materialized search index every retrieval stack keeps beside a
    web corpus (the same resumable index shape as build_minhash_index /
    the IVF cell files).  One streaming tokenize pass; per-batch
    (doc, token) groupby pre-aggregates tf IN-BATCH (a document never
    splits across batches, so per-batch rows are globally final — the
    write shuffles nothing).  Idempotent via a marker keyed on source
    identity (mtime+size+rows) and params."""
    import hashlib
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    from ..common.tokens import hash_string_array, split_tokens

    path = f"{sf_dir}/documents.parquet"
    _st = _os.stat(path)
    key = _json.dumps({"src": _os.path.abspath(path),
                       "mtime": _st.st_mtime, "size": _st.st_size,
                       "rows": _pq.ParquetFile(path).metadata.num_rows,
                       "parts": _TIDX_PARTS, "v": 1}, sort_keys=True)
    idx_dir = _os.path.join(index_root, hashlib.blake2s(
        key.encode(), digest_size=10).hexdigest())
    marker = _os.path.join(idx_dir, "_SUCCESS")
    if _os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == key:
                return idx_dir

    def postings(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"])
        ids = np.asarray(t["doc_id"], dtype=np.int64)[parent]
        pairs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                          "token": flat})
        g = pa.TableGroupBy(pairs, ["doc_id", "token"]).aggregate(
            [("token", "count")])
        h = hash_string_array(g["token"].combine_chunks()
                              if isinstance(g["token"], pa.ChunkedArray)
                              else g["token"])
        return pa.table({
            "doc_id": pc.cast(g["doc_id"], pa.int64()),
            "token": g["token"],
            "tf": pc.cast(g["token_count"], pa.int64()),
            "pidx": pa.array((h & np.uint64(_TIDX_PARTS - 1))
                             .astype(np.int32), pa.int32()),
        })

    (_rp(sf_dir, "documents", ["doc_id", "text"])
     .map_batches(postings, batch_format="pyarrow", batch_size=4096)
     .write_parquet(idx_dir, partition_cols=["pidx"], mode="overwrite"))
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(key + "\n")
    _os.replace(tmp, marker)
    return idx_dir


def index_boolean_search(sf_dir: str,
                         terms: tuple[str, ...] = SEARCH_TERMS,
                         index_root: str = _TEXT_INDEX_ROOT):
    """AND-semantics boolean retrieval against the PERSISTED inverted
    file: documents containing EVERY query term, with total_tf = Σ tf
    over the terms.  Reads ONLY the partitions the query terms' hashes
    land in (measured read fraction printed) — a k-term query touches
    ≤ k/_TIDX_PARTS of the index however large the corpus, the pruning
    a scan-the-text search can't have.  Per-posting work is one is_in
    mask; the only shuffle is the doc-keyed aggregate over
    matched-postings-sized rows."""
    import os as _os

    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..common.tokens import hash_string_array

    terms = tuple(dict.fromkeys(terms))  # distinct, order-stable
    idx_dir = build_text_index(sf_dir, index_root=index_root)
    term_arr = pa.array(list(terms), pa.string())
    th = hash_string_array(term_arr)
    hit = {int(h) & (_TIDX_PARTS - 1) for h in th}
    all_parts = sorted(d for d in _os.listdir(idx_dir)
                       if d.startswith("pidx="))
    hit_dirs = [d for d in all_parts
                if int(d.split("=", 1)[1]) in hit]
    files = [_os.path.join(idx_dir, d, f)
             for d in hit_dirs
             for f in sorted(_os.listdir(_os.path.join(idx_dir, d)))
             if f.endswith(".parquet")]
    print(f"[index_boolean_search] probing {len(hit_dirs)}/"
          f"{len(all_parts)} index partitions "
          f"(read fraction {len(hit_dirs) / max(len(all_parts), 1):.3f})")
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "total_tf": pa.array([], pa.int64())})
    if not files:
        return rd.from_arrow(empty)

    def probe(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["token"], value_set=term_arr))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "tf": pc.cast(t["tf"], pa.int64()),
            # postings are unique per (doc, token), so summing 1s counts
            # DISTINCT matched terms — the AND predicate's left side
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        })

    agg = (rd.read_parquet(files)
           .map_batches(probe, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("tf", alias_name="total_tf"),
                      Sum("one", alias_name="n_terms")))
    k = len(terms)

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["n_terms"], k))
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "total_tf": pc.cast(t["total_tf"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016, public algorithm)
# ---------------------------------------------------------------------------

def _bpe_apply_merges(sym: np.ndarray, parent: np.ndarray,
                      merges: list) -> tuple[np.ndarray, np.ndarray]:
    """Apply learned merges IN ORDER to a flat (symbol, word-index)
    stream — vectorized per merge: match adjacent (L, R) within a word,
    resolve overlapping matches (runs of identical symbols) by keeping
    even offsets within each run (greedy leftmost-first, the standard
    rule), rewrite in one masked copy."""
    for left, right in merges:
        if len(sym) < 2:
            break
        m = ((sym[:-1] == left) & (sym[1:] == right)
             & (parent[:-1] == parent[1:]))
        pos = np.flatnonzero(m)
        if len(pos) == 0:
            continue
        # overlaps only arise in runs of consecutive matches (requires
        # L == R): keep even offsets within each run
        new_run = np.ones(len(pos), bool)
        new_run[1:] = np.diff(pos) != 1
        run_id = np.cumsum(new_run) - 1
        run_start = pos[new_run][run_id]
        take = pos[((pos - run_start) & 1) == 0]
        keep = np.ones(len(sym), bool)
        keep[take + 1] = False
        sym = sym.copy()
        sym[take] = left + right
        sym, parent = sym[keep], parent[keep]
    return sym, parent


def _bpe_chars(words: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Word-type column -> flat (char-symbol, word-index) stream, from
    the Arrow buffers (no per-word Python)."""
    from ..common.tokens import _as_array, _string_offsets

    arr = _as_array(words)
    off = _string_offsets(arr)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(off)
    total = int(lens.sum())
    if total == 0:
        return (np.array([], dtype=object), np.array([], np.int64))
    starts = np.repeat(off[:-1], lens)
    idx = starts + (np.arange(total) -
                    np.repeat(np.cumsum(lens) - lens, lens))
    chars = data[idx]
    # single-char symbol strings without a per-char Python loop:
    # bytes -> S1 -> U1 -> object, all vectorized casts
    sym = np.frombuffer(chars.tobytes(), dtype="S1") \
        .astype("U1").astype(object)
    parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return sym, parent


def _bpe_pair_partials(t: pa.Table, merges: list) -> pa.Table:
    """One block of the word-frequency table -> in-batch pre-aggregated
    adjacent-pair counts under the merges learned so far."""
    freq = np.asarray(t["freq"], dtype=np.int64)
    sym, parent = _bpe_chars(t["word"])
    sym, parent = _bpe_apply_merges(sym, parent, merges)
    if len(sym) < 2:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    m = parent[:-1] == parent[1:]
    tbl = pa.table({
        "left": pa.array(sym[:-1][m], pa.string()),
        "right": pa.array(sym[1:][m], pa.string()),
        "cnt": pa.array(freq[parent[:-1][m]], pa.int64()),
    })
    g = pa.TableGroupBy(tbl, ["left", "right"]).aggregate([("cnt", "sum")])
    return pa.table({"left": g["left"], "right": g["right"],
                     "cnt": g["cnt_sum"]})


def _bpe_top1(t: pa.Table) -> pa.Table:
    """Per-block argmax by (cnt desc, left asc, right asc)."""
    if t.num_rows == 0:
        return t
    order = pc.sort_indices(t, sort_keys=[("cnt", "descending"),
                                          ("left", "ascending"),
                                          ("right", "ascending")])
    return t.take(order[:1])


def bpe_train_merges(sf_dir: str, n_merges: int = 12,
                     force_distributed: bool = False,
                     driver_vocab_max: int = 2_000_000):
    """Learn the first n_merges byte-pair-encoding merges from the
    corpus (Sennrich et al. 2016 §3.2): word-frequency model, then
    iteratively merge the most frequent adjacent symbol pair (ties →
    lexicographically smallest (left, right) — a fixed rule both tiers
    share).  Returns (merge_rank, left, right, pair_count), one row per
    learned merge (fewer if the pair stream dries up).

    Scale shape: BPE trains on the word-TYPE table, never the token
    stream — one grouped count makes (word, freq) [vocab-sized], and
    each round is map_batches pair-counting (merges-so-far broadcast,
    in-batch pre-aggregation) + one grouped sum + per-block argmax
    partials reduced on the driver (model-sized rows, like the idf /
    centroid broadcasts).  Driver tier below driver_vocab_max word
    types runs the identical kernels locally; both tiers forced in
    tests and equal.  rows-only for the driver gate: the argmax of
    round k feeds round k+1 — not expressible as one SQL statement;
    pytest pins both tiers to an independent dict-based reference."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["text"])

    def word_partials(t: pa.Table) -> pa.Table:
        flat, _ = split_tokens(t["text"])
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64())})
        g = pa.TableGroupBy(pa.table({"word": flat}), ["word"]) \
            .aggregate([("word", "count")])
        return pa.table({"word": g["word"],
                         "freq": pc.cast(g["word_count"], pa.int64())})

    words = (ds.map_batches(word_partials, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("freq", alias_name="freq"))
             .materialize())
    n_types = words.count()
    merges: list[tuple[str, str]] = []
    out_cnt: list[int] = []

    use_driver = (not force_distributed) and n_types <= driver_vocab_max
    if use_driver:
        # empty aggregate blocks arrive schema-less — drop before concat
        tabs = [t for t in ray.get(words.to_arrow_refs())
                if t.num_rows > 0]
        local = (pa.concat_tables(tabs).combine_chunks() if tabs else
                 pa.table({"word": pa.array([], pa.string()),
                           "freq": pa.array([], pa.int64())}))
        for _ in range(n_merges):
            part = _bpe_pair_partials(local, merges)
            top = _bpe_top1(part)
            if top.num_rows == 0:
                break
            merges.append((top["left"][0].as_py(),
                           top["right"][0].as_py()))
            out_cnt.append(top["cnt"][0].as_py())
    else:
        for _ in range(n_merges):
            mref = ray.put(list(merges))

            def partials(t: pa.Table, _m=mref) -> pa.Table:
                return _bpe_pair_partials(t, ray.get(_m))

            summed = (words.map_batches(partials, batch_format="pyarrow")
                      .groupby(["left", "right"])
                      .aggregate(Sum("cnt", alias_name="cnt")))
            # per-block argmax partials; the driver reduces ≤ blocks rows
            tops = (summed.map_batches(_bpe_top1, batch_format="pyarrow")
                    .to_pandas())
            if len(tops) == 0 or "cnt" not in tops.columns:
                break
            tops = tops.sort_values(
                ["cnt", "left", "right"],
                ascending=[False, True, True], ignore_index=True)
            merges.append((tops["left"][0], tops["right"][0]))
            out_cnt.append(int(tops["cnt"][0]))

    return rd.from_arrow(pa.table({
        "merge_rank": pa.array(np.arange(len(merges), dtype=np.int64),
                               pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array(out_cnt, pa.int64()),
    }))


def bpe_tokenize_stats(sf_dir: str, n_merges: int = 8):
    """Apply the learned BPE merges back to the corpus: per document,
    the whitespace-token count and the BPE-piece count under the first
    n_merges merges — the token-budget accounting step of a tokenizer
    rollout (how much does the learned vocab compress the corpus?).

    Model-broadcast shape: merges come from bpe_train_merges (a
    model-sized table); piece counts are computed ONCE PER WORD TYPE
    with the same vectorized kernels (vocab-sized work) and broadcast
    as (sorted words, n_pieces) int-indexed vectors; each corpus batch
    then only does a searchsorted gather + per-doc bincount — the token
    stream is never segmented row-by-row.  rows-only for the driver
    (depends on the trained merges); pytest recomputes piece counts
    from the independent reference trainer and matches exactly."""
    import ray
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    merges_df = bpe_train_merges(sf_dir, n_merges=n_merges).to_pandas()
    merges = list(zip(merges_df["left"], merges_df["right"]))

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    from . import distinct_tokens

    vocab = distinct_tokens(ds, column_out="word")
    words_arr = pa.array(vocab["word"].to_numpy(), pa.string())
    sym, parent = _bpe_chars(words_arr)
    sym, parent = _bpe_apply_merges(sym, parent, merges)
    n_pieces = (np.bincount(parent, minlength=len(words_arr))
                .astype(np.int64) if len(parent)
                else np.zeros(len(words_arr), np.int64))
    # broadcast the Arrow vocab + int vector; the per-batch gather is
    # a hashed index_in (vectorized), not per-token Python compares
    ref = ray.put((words_arr, n_pieces))

    def per_doc(t: pa.Table, _ref=ref) -> pa.Table:
        vocab_arr, pieces = ray.get(_ref)
        flat, par = split_tokens(t["text"])
        n_tok = (np.bincount(par, minlength=t.num_rows).astype(np.int64)
                 if len(par) else np.zeros(t.num_rows, np.int64))
        if len(flat):
            wi = np.asarray(pc.index_in(flat, value_set=vocab_arr),
                            dtype=np.int64)
            per_tok = pieces[wi]
            n_pc = np.zeros(t.num_rows, np.int64)
            np.add.at(n_pc, par, per_tok)
        else:
            n_pc = np.zeros(t.num_rows, np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_pieces": pa.array(n_pc, pa.int64())})

    return ds.map_batches(per_doc, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Quality classifier: distributed logistic-regression training
# ---------------------------------------------------------------------------

_QC_DIM = 8


def _quality_xy(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch -> (doc_id, X (rows × 8 float64), y).  Features are the C4
    counts as ratios with quadratic terms for the two-sided rules —
    [1, ln(1+n), stopfrac, meanlen/10, (meanlen/10)², ln(1+n)²,
    stopfrac², has_blocklisted] — and labels are the rule battery's
    kept verdicts, so training distills the hand rules into a smooth
    scorer (the fasttext-style quality-classifier shape, with
    public-feature inputs; measured rule agreement ≈0.94 at sf0.01)."""
    ids = np.asarray(t["doc_id"], dtype=np.int64)
    n, sumlen, stopn, blockn = _c4_counts(t["text"], t.num_rows)
    nf = n.astype(np.float64)
    safe = np.maximum(nf, 1.0)
    ln = np.log1p(nf)
    sfr = stopn / safe
    ml = (sumlen / safe) / 10.0
    X = np.stack([np.ones(len(ids)), ln, sfr, ml, ml * ml, ln * ln,
                  sfr * sfr, (blockn > 0).astype(np.float64)], axis=1)
    kept = ((n >= C4_MIN_TOKENS) & (n <= C4_MAX_TOKENS)
            & (sumlen >= C4_MIN_MEAN_LEN * n)
            & (sumlen <= C4_MAX_MEAN_LEN * n)
            & (stopn * 100 >= C4_MIN_STOP_PCT * n) & (blockn == 0))
    return ids, X, kept.astype(np.float64)


def _quality_features_ds(sf_dir: str):
    """ONE tokenize pass over the corpus -> materialized (doc_id, f0..f7,
    y) feature table — the expensive RE2/token work happens once; the
    IRLS iterations and the scoring pass then touch only 10 numeric
    columns."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def featurize(t: pa.Table) -> pa.Table:
        ids, X, y = _quality_xy(t)
        cols = {"doc_id": pa.array(ids, pa.int64())}
        for j in range(_QC_DIM):
            cols[f"f{j}"] = pa.array(X[:, j], pa.float64())
        cols["y"] = pa.array(y, pa.float64())
        return pa.table(cols)

    return ds.map_batches(featurize, batch_format="pyarrow").materialize()


def _feat_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    X = np.stack([np.asarray(t[f"f{j}"], dtype=np.float64)
                  for j in range(_QC_DIM)], axis=1)
    return X, np.asarray(t["y"], dtype=np.float64)


def _quality_train_on(feats, iters: int = 8,
                      ridge: float = 1e-6) -> np.ndarray:
    """Newton/IRLS over a materialized feature Dataset (converges in a
    handful of passes where plain GD needs thousands), Ray-Data-
    parallel: per iteration the weight vector broadcasts (ray.put —
    model-sized, like every parameter broadcast here); each block
    computes its partial gradient Xᵀ(y − p) AND its 8×8 Hessian partial
    Xᵀdiag(p(1−p))X IN-BATCH; the driver reduces the block partials
    (sorted canonically so the float accumulation order is
    reproducible) and solves the tiny ridge-damped 8×8 system.  Nothing
    example-sized ever reaches the driver."""
    import ray

    w = np.zeros(_QC_DIM, np.float64)
    for _ in range(iters):
        wref = ray.put(w)

        def hg_partial(t: pa.Table, _w=wref) -> pa.Table:
            wb = ray.get(_w)
            X, y = _feat_matrix(t)
            z = np.clip(X @ wb, -30, 30)
            p = 1.0 / (1.0 + np.exp(-z))
            g = X.T @ (y - p)
            H = X.T @ (X * (p * (1.0 - p))[:, None])
            row = np.concatenate([g, H.ravel()])
            return pa.table({"hg": pa.array([row.tolist()],
                                            pa.list_(pa.float64()))})

        parts = (feats.map_batches(hg_partial, batch_format="pyarrow")
                 .to_pandas())
        M = np.asarray([np.asarray(v, np.float64)
                        for v in parts["hg"]], np.float64)
        order = np.lexsort(M.T)  # canonical sum order: reproducible
        ssum = M[order].sum(axis=0)
        g, H = ssum[:_QC_DIM], ssum[_QC_DIM:].reshape(_QC_DIM, _QC_DIM)
        w = w + np.linalg.solve(H + ridge * np.eye(_QC_DIM), g)
    return w


def quality_classifier_train(sf_dir: str, iters: int = 8,
                             ridge: float = 1e-6) -> np.ndarray:
    """Train the logistic-regression quality classifier ON the corpus:
    one tokenize/featurize pass (materialized), then _quality_train_on's
    distributed IRLS.  Returns the weight vector (8 floats)."""
    return _quality_train_on(_quality_features_ds(sf_dir), iters=iters,
                             ridge=ridge)


def quality_classifier_scores(sf_dir: str, iters: int = 8):
    """Apply the trained classifier back to the corpus: per document
    the predicted keep-probability (round 4), the thresholded verdict,
    and the rule battery's actual verdict — the distillation-quality
    view (where does the smooth scorer disagree with the rules?).  The
    materialized feature table serves BOTH training and scoring, so the
    corpus text is tokenized exactly once.  rows-only for the driver
    (GD weights aren't SQL); pytest pins the weights to an independent
    single-machine reference within float tolerance and requires high
    agreement with the rule labels."""
    import ray

    feats = _quality_features_ds(sf_dir)
    w = _quality_train_on(feats, iters=iters)
    wref = ray.put(w)

    def score(t: pa.Table, _w=wref) -> pa.Table:
        wb = ray.get(_w)
        X, y = _feat_matrix(t)
        p = 1.0 / (1.0 + np.exp(-np.clip(X @ wb, -30, 30)))
        return pa.table({
            "doc_id": t["doc_id"],
            "p_kept": pa.array(np.round(p, 4), pa.float64()),
            "predicted": pa.array(p >= 0.5),
            "rule_kept": pa.array(y > 0.5),
        })

    return feats.map_batches(score, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Cluster representative selection: keep the BEST copy, not an arbitrary one
# ---------------------------------------------------------------------------

def dedup_cluster_keep_best(sf_dir: str, threshold: float = 0.8,
                            force_distributed: bool = False):
    """Representative selection over the near-dup clusters: per cluster
    keep the LONGEST document (n_chars, tie-break min doc_id) — what a
    real prep pipeline does instead of dedup_exact's arbitrary min-id
    keeper (the shortest copy of a page is usually the truncated one).
    Returns (cluster_id, keep_doc_id, keep_chars, n_members).

    Clusters come from dedup_minhash_clusters (dup-set-sized, not
    corpus-sized); n_chars arrives via ONE hash-partitioned
    Dataset.join against the column-pruned documents read — the text
    column never loads.  The winner + member count reduce in one
    grouped pass over per-block argmax/count partials (≤1 row per
    (cluster, block) enters the shuffle)."""
    import ray
    import ray.data as rd

    clusters = dedup_minhash_clusters(sf_dir, threshold=threshold,
                                      force_distributed=force_distributed)
    clusters = clusters.materialize()
    n_clustered = clusters.count()
    empty = pa.table({"cluster_id": pa.array([], pa.int64()),
                      "keep_doc_id": pa.array([], pa.int64()),
                      "keep_chars": pa.array([], pa.int64()),
                      "n_members": pa.array([], pa.int64())})
    if n_clustered == 0:
        return rd.from_arrow(empty)
    # repartition the dup-sized side so the hash join sees no empty
    # blocks (Ray's join drops them and then finds "no match for key
    # field"); documents stays streaming
    clusters = clusters.repartition(max(1, min(16, n_clustered)))
    docs = _rp(sf_dir, "documents", ["doc_id", "n_chars"])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    joined = clusters.join(docs, join_type="inner",
                           num_partitions=max(2, min(16, cpus // 2)),
                           on=("doc_id",), right_on=("doc_id",))

    def partials(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("cluster_id", "ascending"), ("n_chars", "descending"),
            ("doc_id", "ascending")])
        t = t.take(idx)
        c = np.asarray(t["cluster_id"])
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        uniq, counts = np.unique(c, return_counts=True)
        best = t.filter(pa.array(first))
        return pa.table({
            "cluster_id": best["cluster_id"],
            "keep_doc_id": best["doc_id"],
            "keep_chars": pc.cast(best["n_chars"], pa.int64()),
            "n_members": pa.array(counts, pa.int64()),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["keep_chars", "keep_doc_id"],
                            ascending=[False, True], kind="mergesort")
        top = df.iloc[:1]
        return pd.DataFrame({
            "cluster_id": top["cluster_id"].to_numpy(),
            "keep_doc_id": top["keep_doc_id"].to_numpy(),
            "keep_chars": top["keep_chars"].to_numpy(),
            "n_members": [int(df["n_members"].sum())],
        })

    return (joined.map_batches(partials, batch_format="pyarrow")
            .groupby("cluster_id").map_groups(final, batch_format="pandas")
            .sort("cluster_id"))


# ---------------------------------------------------------------------------
# N-gram novelty: how much of a document exists nowhere else
# ---------------------------------------------------------------------------

def ngram_novelty(sf_dir: str):
    """Per-document novelty: the fraction of its distinct word-3-grams
    that occur in NO other document — the inverse of the boilerplate
    signal (repeated_shingles_topk finds what everyone shares; this
    scores what only this page says).  Returns (doc_id, n_shingles,
    novel_frac) for every doc with >= 1 shingle.

    One corpus-scale groupby total: shingle rows reduce to (shingle ->
    doc_count, min_doc); a df==1 shingle's min_doc IS its sole owner,
    so per-doc novel counts come from re-aggregating the unique-shingle
    slice — no (shingle,doc)⋈df join.  Per-doc totals fall out of the
    sketch pass in-batch; the two doc-sized partial tables merge with
    the union + grouped-sum pattern (no sparse-side join hazard)."""
    from ray.data.aggregate import Sum

    from ..common.tokens import word_shingle_hashes

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def totals(t: pa.Table) -> pa.Table:
        sh, par = word_shingle_hashes(t["text"])
        ids = np.asarray(t["doc_id"])
        n = np.bincount(par, minlength=t.num_rows).astype(np.int64)
        keep = n > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_shingles": pa.array(n[keep], pa.int64()),
            "n_novel": pa.array(np.zeros(int(keep.sum()), np.int64)),
        })

    # per-block (sh -> df, min owner) partials + 64-ary bucket reduce
    # (the high-cardinality-groupby replacement shared with
    # paragraph_dedup_ds / dedup_containment — Ray's per-group
    # finalization on one group per distinct shingle dominated this)
    from ..state.bloom import _splitmix64

    def sh_partials(t: pa.Table) -> pd.DataFrame:
        sh, par = word_shingle_hashes(t["text"])
        ids = np.asarray(t["doc_id"])
        c = pd.DataFrame({"sh": sh, "doc_id": ids[par]})
        g = (c.groupby("sh", sort=False)
             .agg(df=("doc_id", "size"), owner=("doc_id", "min"))
             .reset_index())
        g["pb"] = (_splitmix64(g["sh"].to_numpy().astype(np.uint64))
                   % np.uint64(64)).astype(np.int64)
        return g

    def reduce_uniq(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("sh", sort=False)
             .agg(df=("df", "sum"), owner=("owner", "min")).reset_index())
        g = g[g["df"] == 1]
        return pd.DataFrame({"owner": g["owner"].to_numpy(np.int64)})

    uniq = (ds.map_batches(sh_partials, batch_format="pyarrow")
            .groupby("pb").map_groups(reduce_uniq, batch_format="pandas"))

    def novel_partials(t: pa.Table) -> pa.Table:
        # pre-aggregate the unique-shingle slice per owner in-batch
        g = pa.TableGroupBy(t.select(["owner"]), ["owner"]).aggregate(
            [([], "count_all")])
        k = g.num_rows
        return pa.table({
            "doc_id": pc.cast(g["owner"], pa.int64()),
            "n_shingles": pa.array(np.zeros(k, np.int64)),
            "n_novel": pc.cast(g["count_all"], pa.int64()),
        })

    merged = (ds.map_batches(totals, batch_format="pyarrow")
              .union(uniq.map_batches(novel_partials,
                                      batch_format="pyarrow"))
              .groupby("doc_id")
              .aggregate(Sum("n_shingles", alias_name="n_shingles"),
                         Sum("n_novel", alias_name="n_novel")))

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_shingles"], dtype=np.float64)
        k = np.asarray(t["n_novel"], dtype=np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_shingles": t["n_shingles"],
            "novel_frac": pa.array(_rnd4(k / n), pa.float64()),
        })

    return (merged.map_batches(finish, batch_format="pyarrow")
            .sort("doc_id"))


def bm25_search_topk(sf_dir: str, terms: tuple[str, ...] = SEARCH_TERMS,
                     k: int = 10, k1: float = 1.2, b: float = 0.75):
    """BM25 ranking (Robertson/Lucene idf variant) over the corpus —
    the production search scorer beside keyword_search_topk's plain
    tf-idf: saturating term frequency and document-length
    normalization.  score(d) = Σ_t ln((N−df+0.5)/(df+0.5)+1) ·
    tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).

    Same two-pass shape as keyword search: pass 1 aggregates df per
    query term, N and Σdl (integer-exact; avgdl = one float division
    identical in the SQL); the parameters broadcast; pass 2 scores each
    document inside its batch (per-(doc,term) tf via one flat bincount,
    fully vectorized) and the usual per-block top-k combiner finishes.
    Ordering uses the ROUNDED score in both engines."""
    import ray
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    term_arr = pa.array(list(terms), pa.string())
    nt = len(terms)

    def _term_idx(flat) -> np.ndarray:
        return np.asarray(pc.fill_null(pc.index_in(flat, value_set=term_arr),
                                       -1)).astype(np.int64)

    def stat_partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        idx = _term_idx(flat)
        hit = idx >= 0
        distinct = pa.TableGroupBy(pa.table({
            "term": np.asarray(idx[hit], dtype=np.int64),
            "d": parent[hit],
        }), ["term", "d"]).aggregate([])
        g = pa.TableGroupBy(distinct, ["term"]).aggregate(
            [([], "count_all")]).rename_columns(["term", "df"])
        # doc-count / token-total partials ride as sentinel terms
        extra = pa.table({"term": pa.array([-1, -2], pa.int64()),
                          "df": pa.array([t.num_rows, len(flat)],
                                         pa.int64())})
        return pa.concat_tables([pa.table({
            "term": g["term"], "df": pc.cast(g["df"], pa.int64())}), extra])

    agg = (ds.map_batches(stat_partials, batch_format="pyarrow")
           .groupby("term").aggregate(Sum("df", alias_name="df"))
           .to_pandas())
    stats = dict(zip(agg["term"], agg["df"]))
    n_docs = int(stats.get(-1, 0))
    avgdl = float(stats.get(-2, 0)) / max(n_docs, 1)
    idf = np.zeros(nt, dtype=np.float64)
    for ti in range(nt):
        dfi = float(stats.get(ti, 0))
        idf[ti] = np.log((n_docs - dfi + 0.5) / (dfi + 0.5) + 1.0)
    params_ref = ray.put((idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        w, ad = ray.get(params_ref)
        flat, parent = split_tokens(t["text"], lower=True)
        dl = np.bincount(parent, minlength=t.num_rows).astype(np.float64)
        idx = _term_idx(flat)
        hit = idx >= 0
        tf = np.bincount(parent[hit] * nt + idx[hit],
                         minlength=t.num_rows * nt).reshape(
            t.num_rows, nt).astype(np.float64)
        norm = tf + k1 * (1.0 - b + b * dl[:, None] / ad)
        s = (w[None, :] * tf * (k1 + 1.0)
             / np.where(norm > 0, norm, 1.0)).sum(axis=1)
        keep = s > 0
        return pa.table({
            "doc_id": pc.take(t["doc_id"],
                              pa.array(np.flatnonzero(keep), pa.int64())),
            "score": pa.array(_rnd4(s[keep]), pa.float64()),
        })

    def local_topk(df_: pd.DataFrame) -> pd.DataFrame:
        df_ = df_.assign(neg=-df_["score"])
        return (df_.sort_values(["neg", "doc_id"], kind="mergesort")
                .head(k).drop(columns=["neg"]))

    scored = ds.map_batches(score, batch_format="pyarrow")
    return (scored.map_batches(local_topk, batch_format="pandas",
                               zero_copy_batch=True)
            .sort([("score"), ("doc_id")], descending=[True, False])
            .limit(k))


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

def _dsir_logratio_vec(sf_dir: str, target_lang: str,
                       m: int) -> np.ndarray:
    """Pass 1 of DSIR (Xie et al. 2023, arXiv:2302.03169 — public
    method): fit the hashed bag-of-ngrams target distribution p and
    raw distribution q in ONE corpus pass, and return the m-bucket
    int64 fixed-point log-ratio vector round((ln p_b - ln q_b)·1e9).

    The bucket is the suite's SQL-replicable tok8 hash mod m, so a
    DuckDB oracle can rebuild every feature (see dsir_oracle_sql).
    Both distributions use add-1 smoothing over the m-bucket domain.

    Scale shape: the per-block partial pre-reduces each batch to at
    most m (bucket, target_count, all_count) rows, so the groupby
    shuffle is bucket-bounded regardless of corpus size, and the
    finished log-ratio table is model-parameter-sized (m int64s) —
    it broadcasts via ray.put like the paper's fitted importance
    estimator would."""
    from ray.data.aggregate import Sum

    from ..common.tokens import tok8_hashes

    ds = _rp(sf_dir, "documents", ["text", "lang"])

    def partials(t: pa.Table) -> pa.Table:
        h, parent = tok8_hashes(t["text"])
        b = (h % np.uint64(m)).astype(np.int64)
        is_target = np.asarray(pc.equal(t["lang"], target_lang))
        wt = is_target[parent].astype(np.int64)
        ct = np.bincount(b, weights=wt, minlength=m)  # exact (< 2^53)
        ca = np.bincount(b, minlength=m)
        nz = np.flatnonzero(ca)
        return pa.table({
            "b": pa.array(nz, pa.int64()),
            "ct": pa.array(ct[nz].astype(np.int64)),
            "ca": pa.array(ca[nz].astype(np.int64)),
        })

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("b")
           .aggregate(Sum("ct", alias_name="ct"),
                      Sum("ca", alias_name="ca"))
           .to_pandas())  # <= m rows: bounded by the feature dim
    ct = agg["ct"].to_numpy(np.float64)
    ca = agg["ca"].to_numpy(np.float64)
    tt = float(ct.sum())
    ta = float(ca.sum())
    lr = (np.log((ct + 1.0) / (tt + m)) - np.log((ca + 1.0) / (ta + m)))
    # int64 fixed-point (1e9, half-away like DuckDB round): per-doc
    # SUMS of these are exact integers in any accumulation order, so
    # the distributed score hash-matches the SQL GROUP BY
    lri = (np.floor(np.abs(lr) * 1e9 + 0.5) * np.sign(lr)).astype(np.int64)
    vec = np.zeros(m, np.int64)
    vec[agg["b"].to_numpy(np.int64)] = lri
    return vec


def dsir_logratio(sf_dir: str, target_lang: str = "en",
                  num_buckets: int = 8192):
    """DSIR importance scoring (Xie et al. 2023): per-document log
    importance weight log w(x) = Σ_tokens (ln p_b - ln q_b) under
    hashed-unigram bag-of-words models of a target domain p (here:
    documents with lang == target_lang, the paper's target-corpus
    slot) versus the raw corpus q.  High scores mark documents most
    target-like; dsir_resample applies the paper's Gumbel top-k
    selection on top of these scores.

    Pass 1 fits both distributions in one bucket-bounded pass
    (_dsir_logratio_vec) and broadcasts the m-int64 log-ratio vector;
    pass 2 scores every document inside its own batch — one tok8 hash
    + one bincount-weighted sum per batch, no shuffle, no per-row
    loop.  Zero-token documents drop (the SQL join convention shared
    with unigram_logprob_score)."""
    import ray

    from ..common.tokens import tok8_hashes

    vec = _dsir_logratio_vec(sf_dir, target_lang, num_buckets)
    vec_ref = ray.put(vec)

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        lrv = ray.get(vec_ref)  # local object-store hit per task
        h, parent = tok8_hashes(t["text"])
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        n = np.bincount(parent, minlength=t.num_rows)
        s = np.bincount(parent, weights=lrv[b].astype(np.float64),
                        minlength=t.num_rows)  # exact int sums (< 2^53)
        has = n > 0
        logw = _rnd4(s[has] / 1e9)
        return pa.table({
            "doc_id": pc.take(t["doc_id"],
                              pa.array(np.flatnonzero(has), pa.int64())),
            "n_tokens": pa.array(n[has].astype(np.int64)),
            "dsir_logw": pa.array(logw, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_oracle_sql(target_lang: str = "en",
                    num_buckets: int = 8192) -> str:
    """Generated DuckDB replica of dsir_logratio: tok8-pack each
    token, splitmix64 it with wrap-exact HUGEINT arithmetic
    (dedup._sql_splitmix64), bucket mod num_buckets, fit both add-1
    smoothed distributions, quantize each bucket's log-ratio to int64
    fixed-point (1e9), and sum per document — any feature-hash,
    smoothing or scoring divergence in the pipeline hash-mismatches
    this oracle."""
    from .dedup import _sql_splitmix64

    m = num_buckets
    packed = " + ".join(
        f"(CASE WHEN length(t) >= {i} THEN "
        f"ascii(substr(t, {i}, 1))::HUGEINT * {1 << (8 * (i - 1))} "
        f"ELSE 0 END)" for i in range(1, 9))
    return f"""
        WITH tok AS (
          SELECT doc_id, lang,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
          FROM documents
        ),
        th AS (
          SELECT doc_id,
                 lang,
                 CAST({_sql_splitmix64(f'({packed})')} % {m} AS BIGINT) AS b
          FROM tok
        ),
        cnt AS (
          SELECT b,
                 SUM(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)
                     AS ct,
                 COUNT(*) AS ca
          FROM th GROUP BY b
        ),
        tot AS (SELECT SUM(ct) AS tt, SUM(ca) AS ta FROM cnt),
        lr AS (
          SELECT b,
                 CAST(round((ln((ct + 1.0) / (tt + {m}))
                             - ln((ca + 1.0) / (ta + {m}))) * 1e9)
                      AS BIGINT) AS lri
          FROM cnt, tot
        )
        SELECT doc_id, count(*) AS n_tokens,
               round(SUM(lri) / 1e9, 4) AS dsir_logw
        FROM th JOIN lr USING (b)
        GROUP BY doc_id
    """


def dsir_resample(sf_dir: str, k: int = 64, target_lang: str = "en",
                  num_buckets: int = 8192, seed: int = 7):
    """DSIR selection step (Xie et al. 2023 §2): sample k documents
    WITHOUT replacement with probability ∝ w(x) via the Gumbel
    top-k trick — key_i = log w_i + Gumbel_i, take the k largest.
    The Gumbel noise is deterministic (splitmix64 of doc_id ⊕
    mixed seed → uniform in (0,1) → -ln(-ln u)), so runs are exactly
    reproducible and blocking-independent.

    Scale shape: the scored stream (dsir_logratio) never gathers —
    each block emits only its local top-k rows, the driver sees
    ≤ k·num_blocks candidate rows, and the final exact top-k is a
    numpy sort over that bounded pool (the per-block-combiner top-k
    pattern shared with bm25_search_topk).  rows-only for the driver
    (the Gumbel perturbation is not one SQL statement cross-engine);
    pytest pins an independent single-machine reference, re-run
    determinism, and the importance property (selected docs skew
    toward the target language)."""
    from ..state.bloom import _splitmix64

    # 1-element array: scalar uint64 multiplies raise numpy overflow
    # warnings where array ops wrap silently
    seed_mix = _splitmix64(np.array([seed & (2**64 - 1)],
                                    dtype=np.uint64))[0]

    def add_key_topk(t: pa.Table) -> pa.Table:
        did = np.asarray(t["doc_id"], np.int64)
        h = _splitmix64(did.astype(np.uint64) ^ seed_mix)
        u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0 ** -53
        g = -np.log(-np.log(u))
        key = np.asarray(t["dsir_logw"], np.float64) + g
        # local top-k: sort by (-key, doc_id) for a deterministic head
        order = np.lexsort((did, -key))[:k]
        idx = pa.array(np.sort(order), pa.int64())  # keep input order
        sub = t.take(idx)
        return pa.table({
            "doc_id": sub["doc_id"],
            "n_tokens": sub["n_tokens"],
            "dsir_logw": sub["dsir_logw"],
            "gumbel_key": pa.array(
                key[np.sort(order)], pa.float64()),
        })

    pool = (dsir_logratio(sf_dir, target_lang=target_lang,
                          num_buckets=num_buckets)
            .map_batches(add_key_topk, batch_format="pyarrow")
            .to_pandas())  # bounded: <= k rows per block
    order = np.lexsort((pool["doc_id"].to_numpy(np.int64),
                        -pool["gumbel_key"].to_numpy(np.float64)))[:k]
    sel = pool.iloc[order].reset_index(drop=True)
    sel["gumbel_key"] = _rnd4(sel["gumbel_key"].to_numpy(np.float64))
    return pa.Table.from_pandas(sel, preserve_index=False)


def source_overlap_matrix(sf_dir: str, k: int = 5):
    """Cross-source contamination matrix — the corpus-level
    generalization of decontaminate_docs: for every ORDERED source pair
    (a, b), the fraction of a's distinct word-k-grams that also occur
    anywhere in b (the eval-contamination report run before trusting a
    held-out source).  Returns (source_a, source_b, shared, frac).

    Scale shape: the stream reduces to DISTINCT (gram-hash, source)
    int64/dict pairs (one grouped aggregate — text never shuffles); the
    pair join multiplies each gram by at most n_sources² (sources are a
    config-sized domain, so the expansion is bounded by |grams| ×
    n_sources², never doc-pairs); denominators and the matrix are
    n_sources²-sized.  Identity is the 63-bit gram hash (collision
    caveat as paragraph_dedup; the SQL oracle compares true strings)."""
    from ray.data.aggregate import Count, Sum

    from ..common.tokens import word_shingle_hashes

    ds = _rp(sf_dir, "documents", ["source", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        sh, par = word_shingle_hashes(t["text"], k=k)
        src = np.asarray(t["source"], dtype=object)[par]
        # in-block distinct first: repeats within a block never shuffle
        g = pa.TableGroupBy(pa.table({
            "g": pa.array(sh, pa.int64()),
            "source": pa.array(src, pa.string()),
        }), ["g", "source"]).aggregate([])
        return g

    rows = (ds.map_batches(gram_rows, batch_format="pyarrow")
            .groupby(["g", "source"]).aggregate(Count(alias_name="c"))
            .map_batches(lambda t: t.drop_columns(["c"]),
                         batch_format="pyarrow")).materialize()
    n_rows = rows.count()
    if n_rows == 0:
        # zero-row guard: a corpus where every doc has < k word tokens
        # yields no (gram, source) rows, and the self-join below would
        # raise ArrowInvalid on the schema-less empty side; the oracle
        # returns an empty result for this input, so match it with a
        # typed empty table (mirrors simjoin_tfidf_cosine_ds's guard).
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "shared": pa.array([], pa.int64()),
            "frac": pa.array([], pa.float64()),
        }))

    sizes = rows.groupby("source").aggregate(Count(alias_name="n"))

    index = rows.map_batches(
        lambda t: pa.table({"g": t["g"], "source_b": t["source"]}),
        batch_format="pyarrow")
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(16, cpus // 2))
    # the self-join inputs are the big intermediates: spread them to the
    # join's own width (clamped by row count so no block is empty — Ray
    # drops empty blocks and the join then fails on the key field)
    big = max(1, min(nparts, n_rows))
    matched = rows.repartition(big).join(
        index.repartition(big), join_type="inner", num_partitions=nparts,
        on=("g",), right_on=("g",))

    def pair_partials(t: pa.Table) -> pa.Table:
        tb = pa.table({"source_a": t["source"], "source_b": t["source_b"]})
        tb = tb.filter(pc.not_equal(tb["source_a"], tb["source_b"]))
        g = pa.TableGroupBy(tb, ["source_a", "source_b"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["source_a", "source_b", "shared"])

    pairs = (matched.map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["source_a", "source_b"])
             .aggregate(Sum("shared", alias_name="shared")))

    sizes_a = sizes.map_batches(
        lambda t: pa.table({"source_a": t["source"], "n_a": t["n"]}),
        batch_format="pyarrow")
    out = pairs.repartition(4).join(
        sizes_a.repartition(4), join_type="inner", num_partitions=nparts,
        on=("source_a",), right_on=("source_a",))

    def finish(t: pa.Table) -> pa.Table:
        frac = (np.asarray(t["shared"], np.float64)
                / np.asarray(t["n_a"], np.float64))
        return pa.table({"source_a": t["source_a"],
                         "source_b": t["source_b"],
                         "shared": pc.cast(t["shared"], pa.int64()),
                         "frac": pa.array(_rnd4(frac), pa.float64())})

    return (out.map_batches(finish, batch_format="pyarrow")
            .sort(["source_a", "source_b"]))
