"""Mergeable sketches as Ray Data aggregations.

Pattern (ray_guide "Aggregation at scale"): emit ONE serialized sketch
per batch inside map_batches, merge the (tiny) sketches in a final
reduce — a shuffle of kilobytes instead of the raw key stream.

HyperLogLog (Flajolet et al. 2007, public algorithm) with the standard
bias corrections; p=12 → 4096 byte registers, ~1.6% typical error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.bloom import _splitmix64

class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized register update from uint64 hashes."""
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # top (64-p) bits now leading
        # rank = position of first 1-bit in the remaining bits, 1-based
        nbits = 64 - self.p
        rank = np.full(len(h), nbits + 1, dtype=np.uint8)
        found = np.zeros(len(h), dtype=bool)
        for b in range(nbits):
            bit = (rest >> np.uint64(63 - b)) & np.uint64(1)
            newly = (~found) & (bit == 1)
            rank[newly] = b + 1
            found |= newly
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)


def approx_distinct_tokens(sf_dir: str, p: int = 12):
    """Approximate distinct-token count over documents.text: one HLL per
    batch (register array travels as a single list row), merged at the
    end — the mergeable-sketch aggregation pattern.  rows-only for the
    driver; the error bound vs exact is asserted in tests.  Token hashing
    is the vectorized common/tokens kernel (Arrow RE2 split + one numpy
    polynomial hash) — no per-token Python."""
    import ray.data as rd

    from ..common.tokens import token_hashes

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def sketch_batch(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        th, _ = token_hashes(t["text"], lower=False)
        hll.add_hashes(_splitmix64(th))
        return pa.table({"registers": pa.array([hll.registers.tolist()],
                                               pa.list_(pa.uint8()))})

    merged = HyperLogLog(p)
    for batch in ds.map_batches(sketch_batch, batch_format="pyarrow") \
                   .iter_batches(batch_size=64, batch_format="pyarrow"):
        for regs in batch["registers"].to_pylist():
            other = HyperLogLog(p)
            other.registers = np.asarray(regs, dtype=np.uint8)
            merged.merge(other)
    return pa.table({"approx_distinct_tokens":
                     pa.array([int(round(merged.estimate()))], pa.int64())})


def heavy_hitter_tokens(sf_dir: str, k: int = 20, capacity: int = 8192):
    """Exact top-k token frequencies at stream scale via the mergeable
    Misra-Gries heavy-hitters sketch (Misra & Gries 1982) + an exact
    second pass:

      pass 1  each block emits its Misra-Gries summary — exact block
              counts compressed to `capacity` entries by subtracting the
              (capacity+1)-th largest count — and a distributed
              groupby(token).sum merges the summaries (summed MG lower
              bounds; kilobytes per block, never the raw token stream).
              Guarantee: a block's decrement is ≤ n_block/(capacity+1),
              so any token with TOTAL count > N/(capacity+1) survives in
              at least one summary and is a candidate.
      pass 2  exact counts for the candidate set only (sorted candidate
              array broadcast via ray.put, np.isin membership per
              block), exact top-k by (count desc, token asc).

    Candidate rule (sound, not a silent top-M cut): with D = N/(C+1)
    bounding the total decrement, any true top-k token t satisfies
    cnt_lb(t) ≥ c(t) − D ≥ c_kth − D ≥ L_k − D where L_k is the k-th
    largest merged lower bound — so candidates = {cnt_lb ≥ L_k − D}.
    The result is then EXACT (and DuckDB-hash-matched) whenever the
    k-th count clears the bound; both sides of that check, and any
    candidate-cap fallback, are printed so a miss is visible,
    mirroring the ANN pruned-fraction logs."""
    import ray
    import ray.data as rd
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from ..common.tokens import split_tokens

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def mg_summary(t: pa.Table) -> pa.Table:
        flat, _ = split_tokens(t["text"], lower=False)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "n_tok": pa.array([], pa.int64())})
        arr = np.asarray(flat, dtype=object)
        vc = pd.Series(arr).value_counts()
        n_tok = int(vc.sum())
        if len(vc) > capacity:
            d = int(vc.iloc[capacity])
            vc = vc.iloc[:capacity] - d
            vc = vc[vc > 0]
        if len(vc) == 0:
            # a fully-decremented block (every count equals the cutoff,
            # e.g. all-unique tokens) must still report its n_tok or the
            # guarantee bound N/(C+1) is computed from an undercounted N
            # — carry it on one zero-count row (cnt 0 adds nothing to
            # any token's lower bound)
            vc = pd.Series([0], index=[arr[0]])
        # the block's token total rides on its FIRST summary row (zeros
        # elsewhere, so Σ n_tok over all rows = N) — out-of-band in a
        # column, never a sentinel row (ADVICE r2)
        n_col = np.zeros(len(vc), np.int64)
        n_col[0] = n_tok
        return pa.table({"token": pa.array(vc.index.to_numpy(dtype=object),
                                           pa.string()),
                         "cnt": pa.array(vc.to_numpy(), pa.int64()),
                         "n_tok": pa.array(n_col, pa.int64())})

    # materialize: summary-sized (≤ capacity × blocks rows), and it is
    # consumed twice (candidate top-k + the N total) — without this the
    # corpus would be re-tokenized per consumer
    merged = (ds.map_batches(mg_summary, batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("cnt", alias_name="cnt_lb"),
                         Sum("n_tok", alias_name="n_part"))
              .materialize())
    n_total = int(merged.aggregate(Sum("n_part", alias_name="N"))["N"])
    bound = n_total / (capacity + 1)
    topk_lb = (merged.sort([("cnt_lb"), ("token")],
                           descending=[True, False]).limit(k).to_pandas())
    l_k = int(topk_lb["cnt_lb"].iloc[-1]) if len(topk_lb) >= k else 0
    thresh = l_k - bound

    import pyarrow.compute as pc

    cand_df = (merged.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt_lb"], thresh)),
        batch_format="pyarrow").to_pandas())
    cand_sound = True
    max_cand = 1_000_000
    if len(cand_df) > max_cand:   # near-flat distribution: cap loudly
        print(f"[heavy_hitters] candidate cap hit: {len(cand_df)} -> "
              f"{max_cand}; exactness no longer guaranteed", flush=True)
        cand_df = cand_df.nlargest(max_cand, "cnt_lb")
        cand_sound = False
    cand = sorted(cand_df["token"])
    cand_ref = ray.put(np.asarray(cand, dtype=object))

    def exact_counts(t: pa.Table) -> pa.Table:
        flat, _ = split_tokens(t["text"], lower=False)
        v = np.asarray(flat, dtype=object)
        keep = np.isin(v, ray.get(cand_ref))
        return pa.table({"token": pa.array(v[keep], pa.string())})

    out = (ds.map_batches(exact_counts, batch_format="pyarrow")
           .groupby("token").aggregate(Count(alias_name="n"))
           .sort([("n"), ("token")], descending=[True, False]).limit(k)
           .to_pandas())
    kth = int(out["n"].iloc[-1]) if len(out) else 0
    print(f"[heavy_hitters] N={n_total} bound=N/(C+1)={bound:.1f} "
          f"L_k={l_k} candidates={len(cand)} "
          f"exact_guaranteed={cand_sound and kth > bound}", flush=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def approx_quantile_event_value(sf_dir: str, qs=(0.5, 0.9, 0.99),
                                s: int = 1024):
    """Approximate global quantiles via a mergeable per-block quantile
    summary (the GK/KLL-family ε-summary pattern, ε = 1/s per block):
    each block emits s equally-spaced order statistics with integer
    weights that sum exactly to the block size, so the merged summary's
    weighted rank of any value is within Σ n_block/s = N/s of its true
    rank — a one-pass, shuffle-free alternative to the exact
    histogram rank-select (quantile_event_value_global) when a bounded
    rank error is acceptable.  The summary is s × n_blocks rows
    (kilobytes); the final weighted select runs on the driver like the
    HLL merge.  rows-only for the driver; the rank-error bound vs the
    exact order statistic is asserted in tests."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def summary(t: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(t["value"], dtype=np.float64))
        n = len(v)
        if n == 0:
            return pa.table({"val": pa.array([], pa.float64()),
                             "w": pa.array([], pa.int64())})
        s_eff = min(s, n)
        ranks = ((np.arange(s_eff) + 0.5) * n / s_eff).astype(np.int64)
        # weights = interval-boundary differences: they sum EXACTLY to n
        # AND stay within ±1 of the uniform spacing the midpoint ranks
        # assume (a lumped remainder would skew merged ranks coherently)
        bounds = np.arange(s_eff + 1, dtype=np.int64) * n // s_eff
        w = np.diff(bounds)
        return pa.table({"val": pa.array(v[ranks]), "w": pa.array(w)})

    rows = (ds.map_batches(summary, batch_format="pyarrow")
            .sort("val").to_pandas())
    vals = rows["val"].to_numpy(np.float64)
    w = rows["w"].to_numpy(np.int64)
    cumw = np.cumsum(w)
    n_total = int(cumw[-1]) if len(cumw) else 0
    # a summary point's value sits at its source block's MIDPOINT rank,
    # so its effective global rank is cumw - w/2 (uncentred cumw would
    # bias every estimate high by ~N/2s)
    mid = cumw - w / 2.0
    out = {"n_events": pa.array([n_total], pa.int64())}
    for q in qs:
        target = q * (n_total - 1)
        i = int(np.searchsorted(mid, target, side="left"))
        out[f"p{int(q * 100)}"] = pa.array(
            [float(vals[min(i, len(vals) - 1)])], pa.float64())
    return pa.table(out)


def approx_distinct_tokens_by_lang(sf_dir: str, p: int = 12):
    """GROUPED approximate distinct: one HLL per (batch, lang), merged
    per language by a grouped register-max — the mergeable-sketch
    pattern keyed.  The shuffle carries |langs|×4 KB register rows per
    block, never the token stream; the final merge is a groupby over a
    lang-cardinality-sized sketch table.  rows-only for the driver
    (approximate by construction); the per-group error bound vs the
    exact distinct count is asserted in tests."""
    import ray.data as rd

    from ..common.tokens import token_hashes

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang"])

    def sketch_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        langs = pc.unique(t["lang"]).to_pylist()
        out_lang, out_regs = [], []
        for lang in langs:  # few langs per batch; work inside is batched
            sub = t.filter(pc.equal(t["lang"], lang))
            hll = HyperLogLog(p)
            th, _ = token_hashes(sub["text"], lower=False)
            hll.add_hashes(_splitmix64(th))
            out_lang.append(lang)
            out_regs.append(hll.registers.tolist())
        return pa.table({"lang": pa.array(out_lang, pa.string()),
                         "registers": pa.array(out_regs,
                                               pa.list_(pa.uint8()))})

    def merge_group(t: pa.Table) -> pa.Table:
        merged = HyperLogLog(p)
        for regs in t["registers"].to_pylist():
            other = HyperLogLog(p)
            other.registers = np.asarray(regs, dtype=np.uint8)
            merged.merge(other)
        return pa.table({
            "lang": pa.array([t["lang"][0].as_py()], pa.string()),
            "approx_distinct": pa.array([int(round(merged.estimate()))],
                                        pa.int64()),
        })

    return (ds.map_batches(sketch_batch, batch_format="pyarrow")
            .groupby("lang").map_groups(merge_group,
                                        batch_format="pyarrow")
            .sort("lang"))


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public
    algorithm): depth × width int64 counters, row hashes from the
    multiply-add family (splitmix-derived, deterministic).  One-sided
    guarantee: estimate ≥ true count always; estimate ≤ true +
    (e/width)·N with probability 1 − e^(−depth).  Mergeable by
    elementwise sum — the per-block sketch is depth·width·8 bytes
    however many tokens the block holds."""

    def __init__(self, width: int = 4096, depth: int = 4, seed: int = 99):
        mixed = _splitmix64(np.arange(2 * depth, dtype=np.uint64)
                            + np.uint64(seed))
        self.a = mixed[:depth] | np.uint64(1)
        self.b = mixed[depth:]
        self.width, self.depth = width, depth
        self.table = np.zeros((depth, width), np.int64)

    def _idx(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            v = h[None, :] * self.a[:, None] + self.b[:, None]
        # top bits are the well-mixed ones in multiply-add families
        return ((v >> np.uint64(32)) % np.uint64(self.width)).astype(np.int64)

    def add(self, hashes: np.ndarray, counts: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx = self._idx(hashes)
        for d in range(self.depth):  # depth is 4-8; rows are vectorized
            np.add.at(self.table[d], idx[d], counts)

    def estimate(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, np.int64)
        idx = self._idx(hashes)
        return np.min(np.stack([self.table[d][idx[d]]
                                for d in range(self.depth)]), axis=0)

    def merge(self, other: "CountMinSketch") -> None:
        self.table += other.table


def cms_token_counts(sf_dir: str, width: int = 4096, depth: int = 4):
    """Approximate per-token frequencies from ONE mergeable Count-Min
    pass: each block pre-aggregates its token counts in-batch and emits
    a 128 KB sketch row; the driver sums the tables (kilobytes per
    block — the raw token stream never shuffles) and probes the corpus
    vocabulary.  rows-only for the driver (a sketch's estimates aren't
    SQL-expressible); pytest asserts the one-sided guarantee
    (estimate ≥ exact everywhere, and ≤ exact + (e/width)·N) plus a
    forced-collision regime at tiny width."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..common.tokens import hash_string_array, split_tokens

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def sketch_batch(t: pa.Table) -> pa.Table:
        cms = CountMinSketch(width, depth)
        flat, _ = split_tokens(t["text"])
        if len(flat):
            h = hash_string_array(flat)
            uh, counts = np.unique(h, return_counts=True)
            cms.add(uh, counts.astype(np.int64))
        return pa.table({"table": pa.array([cms.table.ravel().tolist()],
                                           pa.list_(pa.int64()))})

    merged = CountMinSketch(width, depth)
    for batch in ds.map_batches(sketch_batch, batch_format="pyarrow") \
                   .iter_batches(batch_size=64, batch_format="pyarrow"):
        for tbl in batch["table"].to_pylist():
            other = CountMinSketch(width, depth)
            other.table = np.asarray(tbl, np.int64).reshape(depth, width)
            merged.merge(other)

    # probe set: the corpus vocabulary (shared helper — one definition
    # next to the tokenizer so probes can never drift from it)
    from . import distinct_tokens

    vocab = distinct_tokens(ds, column_out="token")
    toks = pa.array(vocab["token"].to_numpy(), pa.string())
    est = merged.estimate(hash_string_array(toks)) if len(toks) else \
        np.zeros(0, np.int64)
    return pa.table({"token": toks,
                     "approx_count": pa.array(est, pa.int64())})
