"""Text-analysis operators over the `documents` table: token counting,
quality scoring, language-ID, document fingerprinting — the per-document
stages a large-scale training-data pipeline runs before dedup/filtering.

All stages are map_batches over Arrow/pandas batches; the stateful ones
(compiled regexes, stopword tables) are actor-pool classes with setup in
__init__.  Everything is deterministic; where a DuckDB oracle exists the
kernels use RE2-compatible regex semantics shared with the SQL string.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..common.hashing import hash64

_TOKEN_PAT = r"[A-Za-z0-9_]+"  # shared with oracle SQL regexp_extract_all


from . import read_table as _rp  # shared column-pruned read (one definition)


def doc_stats_by_lang(sf_dir: str):
    """Per-language corpus stats (groupby aggregate)."""
    from ray.data.aggregate import Count, Mean, Sum

    out = (
        _rp(sf_dir, "documents", ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_chars", alias_name="total_chars"),
                   Mean("n_chars", alias_name="avg_chars"))
    )

    def rnd(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("avg_chars")
        return t.set_column(i, "avg_chars",
                            pc.round(t["avg_chars"], ndigits=4,
                                     round_mode="half_towards_infinity"))
    return out.map_batches(rnd, batch_format="pyarrow")


def token_count(sf_dir: str):
    """Whitespace/word token count per document — vectorized via pyarrow's
    RE2 count_substring_regex (identical semantics to the DuckDB oracle)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pattern=_TOKEN_PAT)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(sf_dir: str):
    """Heuristic quality features: alpha/digit/whitespace ratios + mean
    token length, and a combined score — all vectorized Arrow kernels.
    The exact formulas are mirrored in the oracle SQL."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        n = pc.cast(pc.utf8_length(text), pa.float64())
        n_safe = pc.max_element_wise(n, pa.scalar(1.0))
        n_alpha = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(text, pattern="[^A-Za-z]", replacement="")),
            pa.float64())
        n_digit = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(text, pattern="[^0-9]", replacement="")),
            pa.float64())
        n_ws = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(text, pattern="[^ ]", replacement="")),
            pa.float64())
        rnd = lambda x: pc.round(x, ndigits=4, round_mode="half_towards_infinity")
        alpha_ratio = pc.divide(n_alpha, n_safe)
        digit_ratio = pc.divide(n_digit, n_safe)
        ws_ratio = pc.divide(n_ws, n_safe)
        score = pc.subtract(alpha_ratio, digit_ratio)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(n, pa.int64()),
            "alpha_ratio": rnd(alpha_ratio),
            "digit_ratio": rnd(digit_ratio),
            "ws_ratio": rnd(ws_ratio),
            "quality": rnd(score),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_text(sf_dir: str):
    """Text normalization: lowercase + whitespace collapse + trim —
    vectorized Arrow kernels, RE2 semantics shared with the oracle SQL."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(t["text"]),
                                       pattern=r"\s+", replacement=" "))
        return pa.table({"doc_id": t["doc_id"], "norm_text": norm})

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """n-gram/stopword heuristic language ID — an actor-pool stage: the
    stopword tables and compiled regexes are built ONCE per actor
    (SURVEY.md §2 #13: config loaded at worker start, not per message)."""

    STOPWORDS = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "with"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"},
        "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "que"},
        "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "que"},
    }
    PRIORITY = ["en", "de", "fr", "es"]  # deterministic tie-break order

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.cjk = re.compile(r"[一-鿿぀-ヿ]")

    def classify(self, text: str) -> str:
        if self.cjk.search(text):
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "und"
        best, best_hits = "und", 0
        for lang in self.PRIORITY:
            hits = sum(1 for w in words if w in self.STOPWORDS[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df["lang_pred"] = [self.classify(t) for t in df["text"]]
        return df[["doc_id", "lang_pred"]]


def lang_id(sf_dir: str):
    """Language-ID over documents (rows-only: the heuristic isn't SQL).
    Accuracy against the table's `lang` labels is asserted in tests."""
    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", concurrency=2, num_cpus=1)


class Fingerprinter:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03 —
    public algorithm): rolling window over token hashes, keep the min
    hash per window; the fingerprint is the min over the document plus
    a count of distinct window minima.  Deterministic; actor-pool stage."""

    def __init__(self, window: int = 4):
        self.window = window
        self.word = re.compile(_TOKEN_PAT)

    def fingerprint(self, text: str) -> tuple[int, int]:
        toks = self.word.findall(text.lower())
        if not toks:
            return 0, 0
        hs = np.fromiter((hash64(t) for t in toks), dtype=np.int64, count=len(toks))
        w = self.window
        if len(hs) <= w:
            return int(hs.min()), 1
        # rolling min via stride trick
        from numpy.lib.stride_tricks import sliding_window_view

        mins = sliding_window_view(hs, w).min(axis=1)
        return int(mins.min()), int(len(np.unique(mins)))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fps = [self.fingerprint(t) for t in df["text"]]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "fingerprint": np.array([f[0] for f in fps], dtype=np.int64),
            "n_distinct_windows": np.array([f[1] for f in fps], dtype=np.int64),
        })


def fingerprints(sf_dir: str):
    """Rolling-hash winnowing fingerprints (rows-only)."""
    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        Fingerprinter, batch_format="pandas", concurrency=2, num_cpus=1)


def lexical_diversity(sf_dir: str):
    """Type-token ratio per document (lexical-diversity quality signal):
    n_tokens, n_unique, ttr = n_unique/n_tokens.  Pure per-batch map —
    token counts via one bincount over parent indices, distinct counts
    via an Arrow composite-key groupby then a second bincount — no
    Python row loop, no shuffle."""
    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        n = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        distinct = pa.TableGroupBy(
            pa.table({"d": pa.array(parent), "token": flat}),
            ["d", "token"]).aggregate([])
        uniq = np.bincount(np.asarray(distinct["d"]),
                           minlength=t.num_rows).astype(np.int64)
        ttr = uniq / np.maximum(n, 1)
        ttr = np.floor(ttr * 1e4 + 0.5) / 1e4  # ratios are >= 0
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n), "n_unique": pa.array(uniq),
            "ttr": pa.array(ttr, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def token_entropy_by_lang(sf_dir: str):
    """Shannon entropy (log2) of the token distribution per language —
    the information-theoretic corpus-quality signal (near-zero entropy
    = degenerate/repeated text).  One grouped term-count aggregate
    (pre-aggregated per block), then the entropy closed form over each
    language's count vector — the per-group input is vocabulary-sized,
    never corpus-sized."""
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["lang", "text"])

    def tf_partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        g = pa.TableGroupBy(pa.table({
            "lang": pc.take(t["lang"], pa.array(parent)),
            "token": flat,
        }), ["lang", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "token", "tf"])

    tf = (ds.map_batches(tf_partials, batch_format="pyarrow")
          .groupby(["lang", "token"]).aggregate(Sum("tf", alias_name="tf")))

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        c = g["tf"].to_numpy(dtype=np.float64)
        n = c.sum()
        p = c / n
        h = float(-(p * np.log2(p)).sum())
        h = np.floor(h * 1e4 + 0.5) / 1e4
        return pd.DataFrame({"lang": [g["lang"].iloc[0]],
                             "n_tokens": [np.int64(n)],
                             "vocab": [np.int64(len(c))],
                             "token_entropy": [h]})

    return (tf.groupby("lang").map_groups(entropy, batch_format="pandas")
            .sort("lang"))


def tfidf_top_terms_per_lang(sf_dir: str, k: int = 10):
    """Corpus-level TF-IDF: top-k terms per language by
    tf(lang, token) · ln(N / df(token)).  Three streaming aggregates —
    term counts per (lang, token); document frequency per token, where
    distinct-within-batch IS globally distinct because a document's
    tokens never split across batches; and the corpus size — joined
    hash-partitioned on token, then the group-wise top-k combiner.
    Ordering uses the ROUNDED score in both engines so a last-ulp ln()
    difference can never flip the cutoff."""
    import ray
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "lang", "text"])
    n_docs = _rp(sf_dir, "documents", ["doc_id"]).count()

    def tf_partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        g = pa.TableGroupBy(pa.table({
            "lang": pc.take(t["lang"], pa.array(parent)),
            "token": flat,
        }), ["lang", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "token", "tf"])

    def df_partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        pair = pa.table({"token": flat, "d": pa.array(parent)})
        distinct = pa.TableGroupBy(pair, ["token", "d"]).aggregate([])
        g = pa.TableGroupBy(distinct, ["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "df"])

    from . import coalesce_for_join, join_partitions, table_num_rows

    tf = (ds.map_batches(tf_partials, batch_format="pyarrow")
          .groupby(["lang", "token"]).aggregate(Sum("tf", alias_name="tf")))
    df = (ds.map_batches(df_partials, batch_format="pyarrow")
          .groupby("token").aggregate(Sum("df", alias_name="df")))
    # partition count sized from DATA (vocab scales with the corpus —
    # the documents row count is the metadata-cheap proxy), never from
    # the CPU count: at sf0.01 the vocabulary is ~31 tokens and a
    # 16-way join left right-side partitions holding only Ray's
    # schema-less empty aggregate blocks, which Acero rejects.  The
    # coalesce guard makes the join robust even when partitions
    # outnumber distinct keys (see coalesce_for_join).
    nparts = join_partitions(table_num_rows(sf_dir, "documents"))
    joined = coalesce_for_join(tf, nparts).join(
        coalesce_for_join(df, nparts), join_type="inner",
        num_partitions=nparts, on=("token",))

    def score(t: pa.Table) -> pa.Table:
        tfv = np.asarray(t["tf"], dtype=np.float64)
        dfv = np.asarray(t["df"], dtype=np.float64)
        s = tfv * np.log(float(n_docs) / dfv)
        s = np.floor(s * 1e4 + 0.5) / 1e4  # scores are >= 0
        return pa.table({"lang": t["lang"], "token": t["token"],
                         "tf": pc.cast(t["tf"], pa.int64()),
                         "tfidf": pa.array(s, pa.float64())})

    def local_topk(df_: pd.DataFrame) -> pd.DataFrame:
        df_ = df_.assign(neg=-df_["tfidf"])
        df_ = df_.sort_values(["lang", "neg", "token"], kind="mergesort")
        return df_.groupby("lang", sort=False).head(k).drop(columns=["neg"])

    def final_topk(df_: pd.DataFrame) -> pd.DataFrame:
        df_ = df_.assign(neg=-df_["tfidf"])
        df_ = df_.sort_values(["neg", "token"], kind="mergesort")
        return df_.head(k).drop(columns=["neg"])

    return (joined.map_batches(score, batch_format="pyarrow")
            .map_batches(local_topk, batch_format="pandas",
                         zero_copy_batch=True)
            .groupby("lang")
            .map_groups(final_topk, batch_format="pandas")
            .sort(["lang", "token"]))


def repeated_shingles_topk(sf_dir: str, n: int = 5, k: int = 20):
    """Boilerplate detection (the C4/Gopher-style repeated-passage
    scan): word-n-gram shingles appearing in more than one document,
    top-k by distinct-document count.  Shingle strings are built
    vectorized — binary_join_element_wise over n shifted token slices,
    masked to same-document windows — and per-batch distinct
    (doc, shingle) pairs are globally distinct because a document never
    splits across batches, so the shuffle carries one pre-counted row
    per (shingle, batch).  At corpus scale the identical pipeline runs
    on shingle HASHES (common.tokens kernels) with a second pass
    re-deriving only the winners' strings."""
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        m = len(flat) - (n - 1)
        if m <= 0:
            return pa.table({"shingle": pa.array([], pa.string()),
                             "nd": pa.array([], pa.int64())})
        valid = parent[:m] == parent[n - 1:]
        starts = np.flatnonzero(valid)
        slices = [flat.slice(i, m).take(pa.array(starts)) for i in range(n)]
        sh = pc.binary_join_element_wise(*slices, " ")
        pair = pa.table({
            "doc": pc.take(pa.array(np.asarray(t["doc_id"])),
                           pa.array(parent[starts])),
            "shingle": sh,
        })
        distinct = pa.TableGroupBy(pair, ["shingle", "doc"]).aggregate([])
        g = pa.TableGroupBy(distinct, ["shingle"]).aggregate([([], "count_all")])
        return g.rename_columns(["shingle", "nd"])

    out = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("shingle").aggregate(Sum("nd", alias_name="n_docs"))
           .map_batches(lambda t: t.filter(pc.greater(t["n_docs"], 1)),
                        batch_format="pyarrow"))
    return (out.sort([("n_docs"), ("shingle")], descending=[True, False])
            .limit(k))


# PII scrub patterns, applied IN ORDER (emails before bare digit runs so
# an address is one <EMAIL>, not letters plus a <NUM>).  RE2 syntax only
# — the same strings run verbatim in pyarrow (RE2) and the DuckDB oracle
# (also RE2), so the scrub is hash-checkable end to end.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+", "<EMAIL>"),
    (r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+", "<IP>"),
    (r"[0-9]+", "<NUM>"),
]


def pii_scrub_props(sf_dir: str):
    """PII / identifier scrubbing — the redaction stage a training-data
    pipeline runs before publishing text.  Chained vectorized RE2
    replacements (email → IP → digit-run) over the events `props`
    payload column; `changed` marks rows the scrub touched.  Pure
    per-batch map, no shuffle, no Python row loop."""
    ds = _rp(sf_dir, "events", ["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        clean = t["props"]
        for pat, repl in PII_PATTERNS:
            clean = pc.replace_substring_regex(clean, pattern=pat,
                                               replacement=repl)
        return pa.table({
            "event_id": t["event_id"],
            "clean_props": clean,
            "changed": pc.not_equal(clean, t["props"]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def json_extract_props_stats(sf_dir: str):
    """JSON payload extraction + aggregate — the reference's records ARE
    free-form JSON strings (`Values`, SURVEY.md §1.1), and this is the
    rebuild's vectorized path for pulling a typed field out of such a
    column: an RE2 capture of the flat key (`"k": <int>`) executed as
    one Arrow extract_regex kernel, then the usual per-block
    pre-aggregation before a tiny grouped reduce.  (Nested / non-flat
    JSON would swap the kernel for an orjson actor stage; the pipeline
    shape is unchanged.)"""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "events", ["event_type", "props"])

    def partials(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?[0-9]+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t2 = pa.table({
            "event_type": t["event_type"],
            "n": pc.cast(pc.is_valid(k), pa.int64()),
            "sum_k": pc.coalesce(k, pa.scalar(0, pa.int64())),
        })
        g = pa.TableGroupBy(t2, ["event_type"]).aggregate(
            [("n", "sum"), ("sum_k", "sum")])
        return g.rename_columns(["event_type", "n", "sum_k"])

    merged = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby("event_type")
              .aggregate(Sum("n", alias_name="n_with_k"),
                         Sum("sum_k", alias_name="sum_k")))

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.divide(pc.cast(t["sum_k"], pa.float64()),
                        pc.cast(t["n_with_k"], pa.float64()))
        return pa.table({
            "event_type": t["event_type"],
            "n_with_k": pc.cast(t["n_with_k"], pa.int64()),
            "sum_k": pc.cast(t["sum_k"], pa.int64()),
            "avg_k": pc.round(avg, ndigits=4,
                              round_mode="half_towards_infinity"),
        })

    return (merged.map_batches(finish, batch_format="pyarrow")
            .sort("event_type"))


def _doc_word_shingles(t: pa.Table, n: int) -> pa.Table:
    """Distinct (row index, word-n-gram shingle string) pairs for a
    pyarrow batch of documents — the vectorized shingle kernel shared by
    boilerplate detection and benchmark decontamination (shifted token
    slices joined element-wise, masked to same-document windows)."""
    from ..common.tokens import split_tokens

    empty = pa.table({"row": pa.array([], pa.int64()),
                      "shingle": pa.array([], pa.string())})
    flat, parent = split_tokens(t["text"], lower=True)
    m = len(flat) - (n - 1)
    if m <= 0:
        return empty
    valid = parent[:m] == parent[n - 1:]
    starts = np.flatnonzero(valid)
    if len(starts) == 0:
        return empty
    slices = [flat.slice(i, m).take(pa.array(starts)) for i in range(n)]
    sh = pc.binary_join_element_wise(*slices, " ")
    pairs = pa.table({"row": pa.array(parent[starts].astype(np.int64)),
                      "shingle": sh})
    return pa.TableGroupBy(pairs, ["row", "shingle"]).aggregate([])


def chunk_documents(sf_dir: str, width: int = 120):
    """Context-window chunking (the training-prep splitter): each
    document becomes ceil(len/width) fixed-width character chunks — a
    flat_map (1 row -> k rows) executed as vectorized per-chunk-index
    string slices, never a per-row Python loop (the loop is over the
    max chunk COUNT, a handful of iterations regardless of batch size).
    Zero shuffle; empty documents produce zero chunks (the SQL rule)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
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
                "chunk_len": chunk.str.len().to_numpy().astype(np.int64),
                "chunk_text": chunk.to_numpy(),
            }))
        if not parts:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "chunk_idx": pd.Series([], dtype=np.int64),
                                 "chunk_len": pd.Series([], dtype=np.int64),
                                 "chunk_text": pd.Series([], dtype=str)})
        return pd.concat(parts, ignore_index=True)

    return ds.map_batches(fn, batch_format="pandas")


def decontaminate_docs(sf_dir: str, n: int = 5, mod: int = 97):
    """Benchmark decontamination (the eval-leakage scan every training
    corpus runs): flag corpus documents sharing any word-n-gram with a
    benchmark set.  The benchmark here is the deterministic slice
    doc_id % mod == 0 (standing in for a real eval set, which is small
    and fixed by definition).

    Scale design — the canonical broadcast decontamination: pass 1
    collects the benchmark's DISTINCT shingles (bounded by benchmark
    size, kilobytes-to-megabytes for real eval suites) and ships them
    once via ray.put; pass 2 is a single map_batches over the corpus
    with a vectorized pc.is_in membership probe — per-document verdicts
    finalize inside the batch (a document never splits across batches),
    so NOTHING shuffles.  At 100 TB the broadcast set would be the
    shingle HASHES (common.tokens kernels) instead of strings."""
    import ray

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def bench_shingles(t: pa.Table) -> pa.Table:
        keep = np.asarray(t["doc_id"]) % mod == 0
        pairs = _doc_word_shingles(t.filter(pa.array(keep)), n)
        g = pa.TableGroupBy(pairs, ["shingle"]).aggregate([])
        return g

    bench = (ds.map_batches(bench_shingles, batch_format="pyarrow")
             .groupby("shingle").count().drop_columns(["count()"])
             .to_pandas())
    bench_ref = ray.put(pa.array(bench["shingle"], pa.string()))

    def probe(t: pa.Table) -> pa.Table:
        bench_arr = ray.get(bench_ref)  # local object-store hit per task
        keep = np.asarray(t["doc_id"]) % mod != 0
        t = t.filter(pa.array(keep))
        pairs = _doc_word_shingles(t, n)
        hit = np.asarray(pc.is_in(pairs["shingle"], value_set=bench_arr))
        counts = np.bincount(np.asarray(pairs["row"])[hit],
                             minlength=t.num_rows).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_hit_shingles": pa.array(counts),
            "contaminated": pa.array(counts > 0),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def unigram_logprob_score(sf_dir: str):
    """Perplexity-proxy quality scoring (the CCNet/Gopher-style LM
    filter, with the unigram LM as the vectorizable baseline): score
    each document by the mean log-probability of its tokens under the
    corpus's own unigram distribution.

    Scale design: pass 1 is a pre-aggregated token-count groupby (one
    (token, count) row per batch enters the shuffle); the resulting
    log-prob table is VOCABULARY-sized — bounded by the language, not
    the corpus — so it broadcasts via ray.put like a real LM's
    parameters would.  Pass 2 scores every document inside its own
    batch: one pc.index_in probe + one bincount-weighted mean, no
    shuffle, no per-row loop."""
    import ray
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def count_partials(t: pa.Table) -> pa.Table:
        flat, _ = split_tokens(t["text"], lower=True)
        g = pa.TableGroupBy(pa.table({"token": flat}), ["token"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["token", "c"])

    counts = (ds.map_batches(count_partials, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("c", alias_name="c"))
              .to_pandas())
    total = float(counts["c"].sum())
    logp = np.log(counts["c"].to_numpy(dtype=np.float64) / total)
    lm_ref = ray.put((pa.array(counts["token"], pa.string()), logp))

    def score(t: pa.Table) -> pa.Table:
        vocab, lp = ray.get(lm_ref)  # local object-store hit per task
        flat, parent = split_tokens(t["text"], lower=True)
        idx = np.asarray(pc.index_in(flat, value_set=vocab))
        tok_lp = lp[idx]  # every token is in-vocab (LM trained on corpus)
        n = np.bincount(parent, minlength=t.num_rows)
        s = np.bincount(parent, weights=tok_lp, minlength=t.num_rows)
        has = n > 0  # SQL's join drops zero-token docs
        avg = s[has] / n[has]
        rnd = np.floor(np.abs(avg) * 1e4 + 0.5) / 1e4 * np.sign(avg)
        return pa.table({
            "doc_id": pc.take(t["doc_id"],
                              pa.array(np.flatnonzero(has), pa.int64())),
            "n_tokens": pa.array(n[has].astype(np.int64)),
            "avg_logprob": pa.array(rnd),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def compression_ratio(sf_dir: str):
    """Gopher/CCNet-family quality signal: zlib compressibility per
    document (highly repetitive machine-generated text compresses far
    below organic prose — Rae et al. 2021 use exactly this family of
    repetition signals).  Deterministic: zlib level pinned, byte counts
    integer, ratio rounded half-away at the end.  Per-batch C-speed
    zlib over utf-8 bytes; zero shuffle.  Rows-only for the driver (SQL
    has no zlib); pytest pins determinism and the repetitive-vs-organic
    ordering on constructed docs."""
    import zlib

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        raw = [s.encode("utf-8") for s in texts]
        comp = np.array([len(zlib.compress(b, 6)) for b in raw], np.int64)
        orig = np.array([len(b) for b in raw], np.int64)
        ratio = np.floor(comp * 1e4 / np.maximum(orig, 1) + 0.5) / 1e4
        return pa.table({
            "doc_id": t["doc_id"],
            "orig_bytes": pa.array(orig, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64()),
            "compression_ratio": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def pmi_adjacent_tokens(sf_dir: str, min_count: int = 30, k: int = 20):
    """Pointwise mutual information of adjacent token pairs — the
    collocation-mining statistic (Church & Hanks 1990) every phrase
    extractor runs over a web corpus: PMI(w1,w2) = ln(c12·N / (cl·cr))
    over the ADJACENT-pair distribution (marginals cl/cr re-aggregate
    the pair-TYPE table, so every denominator comes from one pass).
    Top-k by (rounded pmi desc, w1, w2) among pairs with
    pair_count ≥ min_count.

    Scale shape: shifted-slice pair extraction + in-batch (w1,w2)
    pre-aggregation -> ONE grouped sum [pair-type-sized shuffle];
    marginals and N are pair-type re-aggregates broadcast like model
    parameters (the tfidf idf pattern); scoring is an index_in gather
    per block with a per-block top-k combiner."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["text"])

    def pair_partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"])
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "pair_count": pa.array([], pa.int64())})
        m = parent[:-1] == parent[1:]
        sym = np.asarray(flat, dtype=object)
        tbl = pa.table({"w1": pa.array(sym[:-1][m], pa.string()),
                        "w2": pa.array(sym[1:][m], pa.string())})
        g = pa.TableGroupBy(tbl, ["w1", "w2"]).aggregate([("w1", "count")])
        return pa.table({"w1": g["w1"], "w2": g["w2"],
                         "pair_count": pc.cast(g["w1_count"], pa.int64())})

    pairs = (ds.map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["w1", "w2"])
             .aggregate(Sum("pair_count", alias_name="pair_count"))
             .materialize())
    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "pair_count": pa.array([], pa.int64()),
                      "pmi": pa.array([], pa.float64())})
    if pairs.count() == 0:
        # guard BEFORE touching columns: an all-empty aggregated
        # Dataset loses its schema at to_pandas() (repo gotcha)
        return rd.from_arrow(empty)

    def left_part(t: pa.Table) -> pa.Table:
        return pa.table({"w": t["w1"], "c": t["pair_count"]})

    def right_part(t: pa.Table) -> pa.Table:
        return pa.table({"w": t["w2"], "c": t["pair_count"]})

    lt = (pairs.map_batches(left_part, batch_format="pyarrow")
          .groupby("w").aggregate(Sum("c", alias_name="c")).to_pandas())
    rt = (pairs.map_batches(right_part, batch_format="pyarrow")
          .groupby("w").aggregate(Sum("c", alias_name="c")).to_pandas())
    n_total = int(lt["c"].sum())
    # marginals as float64: an int64 product cl*cr wraps once marginal
    # counts pass ~3e9 (the SQL side promotes to HUGEINT); the division
    # below is double anyway
    ref = ray.put((pa.array(lt["w"].to_numpy(), pa.string()),
                   lt["c"].to_numpy(np.int64).astype(np.float64),
                   pa.array(rt["w"].to_numpy(), pa.string()),
                   rt["c"].to_numpy(np.int64).astype(np.float64),
                   float(n_total)))

    def score(t: pa.Table, _ref=ref, _k=k) -> pa.Table:
        lw, lc, rw, rc, n = ray.get(_ref)
        t = t.filter(pc.greater_equal(t["pair_count"], min_count))
        if t.num_rows == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "pair_count": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        li = np.asarray(pc.index_in(t["w1"], value_set=lw))
        ri = np.asarray(pc.index_in(t["w2"], value_set=rw))
        c12 = np.asarray(t["pair_count"], dtype=np.float64)
        pmi = np.round(np.log(c12 * n / (lc[li] * rc[ri])), 4)
        out = pa.table({"w1": t["w1"], "w2": t["w2"],
                        "pair_count": t["pair_count"],
                        "pmi": pa.array(pmi, pa.float64())})
        # per-block top-k combiner (same ordering as the final sort)
        order = pc.sort_indices(out, sort_keys=[("pmi", "descending"),
                                                ("w1", "ascending"),
                                                ("w2", "ascending")])
        return out.take(order[:_k])

    return (pairs.map_batches(score, batch_format="pyarrow")
            .sort(["pmi", "w1", "w2"], descending=[True, False, False])
            .limit(k))


def _q_score_batch(t: pa.Table) -> pa.Table:
    """The suite's shared quality score — (alpha ratio − digit ratio)
    rounded half-away at 4dp so thresholds and orderings computed from
    it are bit-identical to the SQL oracles' round().  One definition,
    used by quality_quantile_gate and select_token_budget.  Passes
    doc_id plus any of lang/text's siblings already projected."""
    text = t["text"]
    n_safe = pc.max_element_wise(
        pc.cast(pc.utf8_length(text), pa.float64()), pa.scalar(1.0))
    n_alpha = pc.cast(pc.utf8_length(pc.replace_substring_regex(
        text, pattern="[^A-Za-z]", replacement="")), pa.float64())
    n_digit = pc.cast(pc.utf8_length(pc.replace_substring_regex(
        text, pattern="[^0-9]", replacement="")), pa.float64())
    s = pc.round(pc.subtract(pc.divide(n_alpha, n_safe),
                             pc.divide(n_digit, n_safe)),
                 ndigits=4, round_mode="half_towards_infinity")
    cols = {"doc_id": t["doc_id"]}
    if "lang" in t.column_names:
        cols["lang"] = t["lang"]
    cols["q_score"] = s
    return pa.table(cols)


def quality_quantile_gate(sf_dir: str, q: float = 0.75):
    """Per-language quality gating — keep each language's top quality
    quartile (what curation pipelines actually do with a quality score:
    threshold RELATIVE to the language, since absolute scores aren't
    comparable across languages).  Returns the kept (doc_id, lang,
    q_score) rows.

    Two stages over a materialized doc-sized score table (the text
    column is read once and never again): per-lang exact order
    statistic at floor(q·(n−1)) (lang domain is tiny — one map_groups
    over ≤|langs| groups), thresholds broadcast like model parameters,
    then a vectorized per-batch filter.  Score = the text_quality_score
    formula rounded at 4dp in BOTH engines, so the threshold value is
    bit-identical to the SQL's."""
    import ray

    ds = _rp(sf_dir, "documents", ["doc_id", "lang", "text"])
    scored = ds.map_batches(_q_score_batch, batch_format="pyarrow") \
               .materialize()

    def group_thr(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        v = np.sort(df["q_score"].to_numpy())
        r = int(np.floor(q * (len(v) - 1)))
        return pd.DataFrame({"lang": df["lang"].iloc[:1],
                             "thr": [float(v[r])]})

    thr_df = (scored.groupby("lang")
              .map_groups(group_thr, batch_format="pandas").to_pandas())
    thr_ref = ray.put(dict(zip(thr_df["lang"], thr_df["thr"])))

    def gate(t: pa.Table, _thr=thr_ref) -> pa.Table:
        thr = ray.get(_thr)
        langs = t["lang"].to_pylist()  # lang-domain-sized dict lookup
        bounds = np.fromiter((thr[l] for l in langs), np.float64,
                             count=t.num_rows)
        return t.filter(pa.array(
            np.asarray(t["q_score"], dtype=np.float64) >= bounds))

    return (scored.map_batches(gate, batch_format="pyarrow")
            .sort("doc_id"))


def select_token_budget(sf_dir: str, budget: int = 20_000):
    """Token-budget-constrained corpus selection — the curation step
    that turns a quality score into a training set of a TARGET SIZE:
    greedily keep the highest-quality documents (q_score DESC, doc_id
    ASC tie-break) while the running token total stays ≤ budget — i.e.
    exactly SQL's `SUM(n_tokens) OVER (ORDER BY q_score DESC, doc_id)
    <= budget`.

    Scale shape: NO global sort.  One scoring pass emits (doc_id,
    q_score, n_tokens); the budget boundary is found on the SCORE
    DOMAIN — a grouped Σ n_tokens per distinct 4dp score (≤ 20,001
    tiers regardless of corpus size) cumsummed on the driver — and only
    the single boundary tier's (doc_id, n_tokens) pairs are pulled to
    resolve the intra-tier doc_id prefix (tier-sized ints; a degenerate
    corpus where every doc shares one score pulls id-pairs for all of
    them — still two int64s per doc, never text).  The final pass is a
    broadcast-threshold filter."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def score_tokens(t: pa.Table) -> pa.Table:
        out = _q_score_batch(t)
        _, parent = split_tokens(t["text"], lower=True)
        n_tok = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        return out.append_column("n_tokens", pa.array(n_tok, pa.int64()))

    scored = ds.map_batches(score_tokens, batch_format="pyarrow") \
               .materialize()

    tiers = (scored.groupby("q_score")
             .aggregate(Sum("n_tokens", alias_name="tok"))
             .to_pandas())  # score-DOMAIN-sized (≤ 20,001 rows at 4dp)
    tiers = tiers.sort_values("q_score", ascending=False,
                              ignore_index=True)
    cum = tiers["tok"].cumsum()
    over = np.nonzero(cum.to_numpy() > budget)[0]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "q_score": pa.array([], pa.float64()),
                      "n_tokens": pa.array([], pa.int64())})
    if len(tiers) == 0:
        return rd.from_arrow(empty)
    if len(over) == 0:
        return scored.sort("doc_id")  # whole corpus fits the budget

    bi = int(over[0])
    b_score = float(tiers["q_score"].iloc[bi])
    spent = int(cum.iloc[bi - 1]) if bi else 0
    remaining = budget - spent

    # resolve the boundary tier's doc_id prefix (tier-sized pull)
    btier = (scored.map_batches(
        lambda t: t.filter(pc.equal(t["q_score"], pa.scalar(b_score)))
                   .select(["doc_id", "n_tokens"]),
        batch_format="pyarrow").to_pandas()
        .sort_values("doc_id", ignore_index=True))
    keep_mask = btier["n_tokens"].cumsum() <= remaining
    cutoff = int(btier.loc[keep_mask, "doc_id"].max()) \
        if keep_mask.any() else -1

    bs_ref = ray.put((b_score, cutoff))

    def gate(t: pa.Table, _b=bs_ref) -> pa.Table:
        s, cut = ray.get(_b)
        qs = np.asarray(t["q_score"], dtype=np.float64)
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        return t.filter(pa.array((qs > s) | ((qs == s) & (ids <= cut))))

    return rd.from_arrow(empty).union(
        scored.map_batches(gate, batch_format="pyarrow").sort("doc_id"))


def zipf_slope_by_lang(sf_dir: str, top_ranks: int = 30):
    """Zipf's-law fit per language: OLS slope of ln(freq) on ln(rank)
    over the top-`top_ranks` token frequencies — the corpus-health
    diagnostic web-text prep runs to spot boilerplate-dominated or
    machine-generated slices (natural language sits near −1; a flat or
    cliffed slope flags template text).  Returns (lang, n_ranks,
    zipf_slope); rank order is (freq DESC, token ASC) in both engines
    so ties can never flip a rank.

    Scale shape: per-block (lang, token) partial counts -> ONE grouped
    sum (vocab-sized shuffle, same as tfidf) -> per-lang fit inside
    map_groups on the top-K rows only.  The slope uses the textbook
    regr_slope form ((Σxy − ΣxΣy/n) / (Σx² − (Σx)²/n)) so DuckDB's
    aggregate reproduces it to 4 digits."""
    from ray.data.aggregate import Sum

    from ..common.tokens import split_tokens

    ds = _rp(sf_dir, "documents", ["lang", "text"])

    def tf_partials(t: pa.Table) -> pa.Table:
        flat, parent = split_tokens(t["text"], lower=True)
        g = pa.TableGroupBy(pa.table({
            "lang": pc.take(t["lang"], pa.array(parent)),
            "token": flat,
        }), ["lang", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "token", "tf"])

    tf = (ds.map_batches(tf_partials, batch_format="pyarrow")
          .groupby(["lang", "token"]).aggregate(Sum("tf", alias_name="tf")))

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(neg=-df["tf"])
        df = df.sort_values(["neg", "token"], kind="mergesort")
        f = df["tf"].to_numpy(np.float64)[:top_ranks]
        n = len(f)
        if n < 2:  # slope undefined (SQL regr_slope is NULL): drop
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "n_ranks": pd.Series([], dtype=np.int64),
                                 "zipf_slope": pd.Series([], dtype=float)})
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(f)
        sx, sy = x.sum(), y.sum()
        slope = ((x * y).sum() - sx * sy / n) / ((x * x).sum() - sx * sx / n)
        slope = np.floor(np.abs(slope) * 1e4 + 0.5) / 1e4 * np.sign(slope)
        return pd.DataFrame({"lang": df["lang"].iloc[:1],
                             "n_ranks": [n],
                             "zipf_slope": [float(slope)]})

    return (tf.groupby("lang").map_groups(fit, batch_format="pandas")
            .sort("lang"))
