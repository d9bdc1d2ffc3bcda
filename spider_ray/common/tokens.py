"""Vectorized tokenization + 64-bit token hashing over Arrow string columns.

The round-1 sketch stages (HLL token counting, MinHash shingles, SimHash)
hashed one Python string per token — ~10× the CPU of the arithmetic they
feed.  This module replaces that with batch-at-a-time kernels:

  * tokenization  — Arrow RE2 `split_pattern_regex` over the whole
                    column (no per-row Python), parent indices via
                    `list_parent_indices`;
  * token hashing — one numpy polynomial hash over the flat token-byte
                    buffer: tokens are gathered into (n × CAP) byte
                    matrices (CAP=16) one CAP-chunk at a time, each
                    chunk dotted with a power ladder in uint64
                    wraparound arithmetic and splitmix64-chained into
                    the accumulator, so EVERY byte of every token is
                    hashed (tokens longer than CAP cost one extra
                    vectorized pass per extra chunk — no loop runs per
                    token or per byte); length is mixed in at the end.
  * shingling     — word-k-gram / char-n-gram window hashes combined
                    across the whole flat array with doc-boundary masks.

All outputs are deterministic pure functions of the input bytes (seeded
splitmix64 — common/state.bloom), so sketch and verify stages agree on
any worker.  The URL identity hash (common/hashing.hash64, blake2b)
is intentionally NOT changed: frontier/bloom capacity math documents it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.bloom import _splitmix64

_CAP = 16  # bytes hashed per vectorized chunk; ALL chunks are hashed
_BASE = np.uint64(1099511628211)  # FNV prime
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MASK63 = np.uint64((1 << 63) - 1)

with np.errstate(over="ignore"):
    _POWS = np.ones(_CAP, dtype=np.uint64)
    for _i in range(_CAP - 2, -1, -1):
        _POWS[_i] = _POWS[_i + 1] * _BASE


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _string_offsets(arr: pa.Array) -> np.ndarray:
    """int64 value offsets of a string/large_string array (large_string
    shows up when a text block crosses 2 GiB — real at corpus scale)."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        return np.frombuffer(arr.buffers()[1], dtype=np.int64,
                             count=len(arr) + 1, offset=arr.offset * 8).copy()
    return np.frombuffer(arr.buffers()[1], dtype=np.int32,
                         count=len(arr) + 1,
                         offset=arr.offset * 4).astype(np.int64)


def hash_string_array(arr: pa.Array) -> np.ndarray:
    """uint64 hash per string of an Arrow string array — zero-copy from
    the Arrow offsets/data buffers, no per-row Python.  Every byte of
    every string participates: strings are consumed in CAP-byte chunks,
    each chunk's polynomial hash splitmix64-chained into the accumulator
    (rows shorter than the current chunk offset drop out of the pass, so
    the common ≤16-byte token costs exactly one vectorized pass)."""
    arr = _as_array(arr)
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    offs = _string_offsets(arr)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lengths = offs[1:] - offs[:-1]
    starts = offs[:-1]
    colidx = np.arange(_CAP, dtype=np.int64)
    maxlen = int(lengths.max())
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for chunk in range(0, max(maxlen, 1), _CAP):
            if chunk == 0:
                rows = slice(None)
                row_starts, row_lens = starts, lengths
            else:
                idx = np.nonzero(lengths > chunk)[0]
                if len(idx) == 0:
                    break
                rows = idx
                row_starts, row_lens = starts[idx], lengths[idx]
            L = np.minimum(row_lens - chunk, _CAP)
            mat = np.zeros((len(row_starts), _CAP), dtype=np.uint8)
            mask = colidx[None, :] < L[:, None]
            gather = (row_starts + chunk)[:, None] + colidx[None, :]
            mat[mask] = data[gather[mask]]
            ch = (mat.astype(np.uint64) * _POWS[None, :]).sum(
                axis=1, dtype=np.uint64)
            h[rows] = _splitmix64(h[rows] ^ ch)
        h = _splitmix64(h ^ (lengths.astype(np.uint64) * _GOLDEN))
    return h


def split_tokens(col, lower: bool = True,
                 pattern: str | None = None) -> tuple[pa.Array, np.ndarray]:
    """Tokenize a string column into (flat_tokens, parent_doc_index).
    Default pattern matches the suite-wide word class [A-Za-z0-9_]+
    (split on its complement, empties dropped)."""
    col = _as_array(col)
    if lower:
        col = pc.utf8_lower(col)
    pat = pattern or ("[^a-z0-9_]+" if lower else "[^A-Za-z0-9_]+")
    lists = _as_array(pc.split_pattern_regex(col, pattern=pat))
    flat = lists.flatten()
    parent = np.asarray(pc.list_parent_indices(lists))
    if len(flat):
        keep = np.asarray(pc.greater(pc.binary_length(flat), 0))
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            parent = parent[keep]
    return flat, parent


def token_hashes(col, lower: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 token hashes, parent doc index) for a string column."""
    flat, parent = split_tokens(col, lower=lower)
    return hash_string_array(flat), parent


def tok8_hashes(col, lower: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 token hashes, parent doc index) where the hash is
    splitmix64 over the token's FIRST 8 BYTES packed little-endian — a
    deliberately SQL-replicable variant (DuckDB reproduces the packing
    with ascii()/substr() and the mix with HUGEINT wrap arithmetic; see
    dedup.simhash_tok8_oracle_sql).  Tokens from the suite's word class
    are ASCII, so byte == codepoint; tokens sharing an 8-byte prefix
    collide by design — acceptable for SimHash voting, NOT a general
    replacement for hash_string_array."""
    flat, parent = split_tokens(col, lower=lower)
    flat = _as_array(flat)
    n = len(flat)
    if n == 0:
        return np.zeros(0, dtype=np.uint64), parent
    offs = _string_offsets(flat)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    lengths = offs[1:] - offs[:-1]
    starts = offs[:-1]
    L = np.minimum(lengths, 8)
    colidx = np.arange(8, dtype=np.int64)
    mat = np.zeros((n, 8), dtype=np.uint8)
    mask = colidx[None, :] < L[:, None]
    gather = starts[:, None] + colidx[None, :]
    mat[mask] = data[gather[mask]]
    with np.errstate(over="ignore"):
        packed = (mat.astype(np.uint64)
                  << (np.uint64(8) * np.arange(8, dtype=np.uint64))[None, :]
                  ).sum(axis=1, dtype=np.uint64)
        return _splitmix64(packed), parent


def _unique_per_doc(h: np.ndarray, parent: np.ndarray,
                    n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (parent, hash) pairs, sorted by (parent, hash)."""
    if len(h) == 0:
        return h.astype(np.int64), parent
    order = np.lexsort((h, parent))
    hs, ps = h[order], parent[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = (hs[1:] != hs[:-1]) | (ps[1:] != ps[:-1])
    return hs[keep].astype(np.int64), ps[keep]


def window_hash_chain(th: np.ndarray, parent: np.ndarray,
                      k: int) -> tuple[np.ndarray, np.ndarray]:
    """splitmix64 chain over every k-window of a flat token-hash array:
    (uint64 window hashes, in-doc validity mask), both of length
    n-k+1 (window start index) — a window is valid iff all k tokens
    share the window start's parent doc.  THE single definition of the
    word-window hash: word_shingle_hashes (MinHash/Jaccard dedup) and
    the ExactSubstr span machinery both chain through here, so their
    window identities cannot diverge."""
    n = len(th)
    m = n - k + 1
    if m <= 0:
        return np.zeros(0, np.uint64), np.zeros(0, dtype=bool)
    acc = _splitmix64(th[:m])
    for j in range(1, k):
        acc = _splitmix64(acc ^ th[j:m + j])
    valid = parent[:m] == parent[k - 1:]
    return acc, valid


def word_shingle_hashes(col, k: int = 3,
                        lower: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Distinct word-k-gram hashes per doc over a whole column:
    splitmix64-chains each window of k token hashes, masking windows that
    cross doc boundaries.  Docs with fewer than k tokens contribute NO
    shingles — the standard k-shingle semantics, and what the SQL
    conformance oracles' generate_series(1, len-k+1) produces, so short
    docs are never near-dup candidates in either system (round-3 review:
    the earlier one-chained-shingle special case made two distinct short
    docs with equal token sequences jaccard-1.0 in the engine only).
    Returns (int64 shingle hashes, parent doc index), sorted per doc."""
    col = _as_array(col)
    th, parent = token_hashes(col, lower=lower)
    acc, valid = window_hash_chain(th, parent, k)
    if len(acc) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    m = len(acc)
    sh, sp = acc[valid], parent[:m][valid]
    return _unique_per_doc(sh & _MASK63, sp, len(col))


def char_ngram_hashes(col, ngram: int = 4,
                      lower: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Distinct char-n-gram hashes per doc, vectorized across the whole
    column: one sliding-window polynomial hash over the concatenated
    utf-8 byte buffer with doc-boundary masking.  Docs shorter than n
    bytes contribute one whole-doc hash; empty docs none."""
    from numpy.lib.stride_tricks import sliding_window_view

    col = _as_array(col)
    if lower:
        col = pc.utf8_lower(col)
    n_docs = len(col)
    if n_docs == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if col.null_count:
        col = pc.fill_null(col, "")
    offs = _string_offsets(col)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    lengths = offs[1:] - offs[:-1]
    total = int(offs[-1] - offs[0])
    out_h, out_p = [], []
    if total >= ngram:
        buf = data[offs[0]:offs[-1]]
        byte_parent = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
        m = len(buf) - ngram + 1
        pows = _POWS[_CAP - ngram:]
        with np.errstate(over="ignore"):
            h = (sliding_window_view(buf, ngram).astype(np.uint64)
                 * pows[None, :]).sum(axis=1, dtype=np.uint64)
            h = _splitmix64(h)
        valid = byte_parent[:m] == byte_parent[ngram - 1:]
        out_h.append(h[valid])
        out_p.append(byte_parent[:m][valid])
    short = np.nonzero((lengths > 0) & (lengths < ngram))[0]
    if len(short):
        sub = col.take(pa.array(short, pa.int64()))
        out_h.append(hash_string_array(sub))
        out_p.append(short)
    if not out_h:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return _unique_per_doc(np.concatenate(out_h) & _MASK63,
                           np.concatenate(out_p), n_docs)


def simhash_batch(col, lower: bool = True) -> np.ndarray:
    """64-bit SimHash per doc over a whole column: per-token hash bits
    vote ±1, summed per doc with one reduceat — no per-doc Python."""
    col = _as_array(col)
    th, parent = token_hashes(col, lower=lower)
    return _simhash_from_hashes(th, parent, len(col))


def simhash_batch_tok8(col, lower: bool = True) -> np.ndarray:
    """SimHash variant over the SQL-replicable tok8 hash (see
    tok8_hashes) — identical voting machinery, different token hash, so
    a DuckDB oracle can recompute every signature bit."""
    col = _as_array(col)
    th, parent = tok8_hashes(col, lower=lower)
    return _simhash_from_hashes(th, parent, len(col))


def _simhash_from_hashes(th: np.ndarray, parent: np.ndarray,
                         n_docs: int) -> np.ndarray:
    sigs = np.zeros(n_docs, dtype=np.uint64)
    if len(th) == 0:
        return (sigs & _MASK63).astype(np.int64)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32)
    # parent is nondecreasing (tokens flatten in doc order) -> reduceat
    counts = np.bincount(parent, minlength=n_docs)
    nz = np.nonzero(counts)[0]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[nz]
    votes = np.add.reduceat(bits * 2 - 1, starts, axis=0)
    pos = votes > 0
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    sigs[nz] = (pos.astype(np.uint64) * weights[None, :]).sum(
        axis=1, dtype=np.uint64)
    return (sigs & _MASK63).astype(np.int64)


def split_by_doc(values: np.ndarray, parent: np.ndarray,
                 n_docs: int) -> list[np.ndarray]:
    """Per-doc views of a (parent-sorted) flat array — cheap np.split."""
    counts = np.bincount(parent, minlength=n_docs)
    return np.split(values, np.cumsum(counts)[:-1])


def prefix_chain_hashes(col, n_tokens: int = 12) -> np.ndarray:
    """Per-doc uint64 identity of the first n_tokens lowercase tokens:
    a splitmix64 chain over the token hashes (n vectorized rounds — the
    hash_string_array loop pattern) with min(len, n) mixed in, so a
    short doc never collides with a longer one sharing its tokens.
    Shared by dedup_prefix_tokens and the composed prep pipelines."""
    col = _as_array(col)
    th, parent = token_hashes(col)
    nd = len(col)
    idx = np.arange(nd, dtype=np.int64)
    starts = np.searchsorted(parent, idx, side="left")
    ends = np.searchsorted(parent, idx, side="right")
    ln = ends - starts
    h = np.full(nd, np.uint64(0x9E3779B97F4A7C15), np.uint64)
    for j in range(n_tokens):
        rows = ln > j
        if not rows.any():
            break
        h[rows] = _splitmix64(h[rows] ^ th[starts[rows] + j])
    return _splitmix64(h ^ np.minimum(ln, n_tokens).astype(np.uint64))
