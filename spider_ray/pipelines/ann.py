"""Similarity search over the embedding column (list<float>, dim 64).

Baseline: exact brute-force cosine top-k — a blocked numpy matmul per
batch against a broadcast query matrix (ray.put once, ray.get in each
task — never re-shipped per batch).

Scale path: LSH-bucketed ANN (random hyperplane signatures): each vector
lands in one bucket per table; a query's candidates are the union of its
matching buckets, and similarities are computed ONLY for candidate rows
(the matmul shrinks from nq×batch to nq×candidates).  The per-run
candidate fraction is measured and logged — no silent cap.  Recall vs
the brute-force baseline is asserted in tests.  An IVF variant is the
same shape with k-means cells; hyperplanes avoid an extra training pass.

Query loading never materializes the corpus on the driver: the
n smallest vec_ids come from a per-block combiner over a vec_id-only
column read, then one filtered parquet read fetches just those query
vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.bloom import _splitmix64


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _load_queries(sf_dir: str, n_queries: int):
    """Query vectors for the first n_queries vec_ids (by sorted id),
    WITHOUT a full-corpus driver materialization: a vec_id-only column
    read with a per-block smallest-n combiner (tiny partials), then a
    predicate-pushdown read of just those rows."""
    import ray.data as rd

    path = f"{sf_dir}/embeddings.parquet"

    def smallest(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        return pa.table({"vec_id": pa.array(np.sort(ids)[:n_queries])})

    part = (rd.read_parquet(path, columns=["vec_id"])
            .map_batches(smallest, batch_format="pyarrow").to_pandas())
    q_ids = np.sort(part["vec_id"].to_numpy())[:n_queries]
    emb = pq.read_table(path, columns=["vec_id", "embedding"],
                        filters=[("vec_id", "in", q_ids.tolist())])
    order = np.argsort(np.asarray(emb["vec_id"], dtype=np.int64))
    ids = np.asarray(emb["vec_id"], dtype=np.int64)[order]
    mat = np.stack(emb["embedding"].to_numpy(zero_copy_only=False))[order]
    return ids, _normalize(mat.astype(np.float64))


def _final_topk(partials: pd.DataFrame, k: int) -> pa.Table:
    """Top-k per query over the per-block partials (tiny), with the
    suite's half-away-from-zero rounding (matches DuckDB round())."""
    out = (partials.sort_values(["query_id", "cosine", "neighbor_id"],
                                ascending=[True, False, True], kind="mergesort")
           .groupby("query_id", sort=True).head(k).reset_index(drop=True))
    c = out["cosine"].to_numpy()
    out["cosine"] = np.floor(np.abs(c) * 1e4 + 0.5) / 1e4 * np.sign(c)
    return pa.Table.from_pandas(out, preserve_index=False)


def ann_topk_bruteforce(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Exact top-k neighbors (cosine, self excluded) for the first
    n_queries vec_ids.  Per-batch partial top-k (combiner) + tiny final
    reduce — the corpus streams, queries are broadcast."""
    import ray
    import ray.data as rd

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((q_ids, q_mat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def partial_topk(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        cids = np.asarray(t["vec_id"], dtype=np.int64)
        cm = _normalize(np.stack(
            t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64))
        sims = qm @ cm.T                      # (nq, batch)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = cids != qids[qi]           # exclude self
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            top = cand_idx[np.lexsort((cids[cand_idx], -s[cand_idx]))[:k]]
            out_q += [qids[qi]] * len(top)
            out_n += cids[top].tolist()
            out_s += s[top].tolist()
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    return _final_topk(partials, k)


class _Hyperplanes:
    """Deterministic random hyperplanes from splitmix64 streams."""

    def __init__(self, dim: int, n_bits: int, seed: int = 99):
        raw = _splitmix64(np.arange(dim * n_bits, dtype=np.uint64)
                          + np.uint64(seed * 1_000_003))
        # map uint64 -> (-1, 1) uniformly enough for LSH purposes
        self.planes = (raw.astype(np.float64) / 2**63 - 1.0).reshape(n_bits, dim)

    def signature(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0
        sig = np.zeros(len(vecs), dtype=np.uint64)
        for b in range(bits.shape[1]):
            sig |= bits[:, b].astype(np.uint64) << np.uint64(b)
        return sig


def ann_lsh_topk(sf_dir: str, n_queries: int = 10, k: int = 5,
                 n_bits: int = 6, n_tables: int = 8,
                 log_stats: bool = True):
    """LSH-bucketed approximate top-k: n_tables independent signatures;
    a query's candidates = union of its buckets across tables, and the
    similarity matmul runs ONLY over the candidate union of each block
    (nq × |candidates| instead of nq × batch) — strictly less compute
    than brute force, at measured recall (tested vs the baseline).
    The scanned→candidate fraction is aggregated across blocks and
    printed, so pruning is observable rather than assumed.

    Parameter regime: P(candidate) per table = (1-θ/π)^n_bits.  For true
    near-dups (cos>=0.9) 12 bits x 4 tables give >0.99 recall at high
    selectivity; THIS corpus's top neighbors are weak (cos~0.45, θ~63°),
    so defaults are 6 bits x 8 tables (~0.4-0.6 recall, ~15% selectivity)
    — the honest tradeoff when similarity structure is shallow."""
    import ray
    import ray.data as rd

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    dim = q_mat.shape[1]
    tables = [_Hyperplanes(dim, n_bits, seed=99 + t) for t in range(n_tables)]
    q_sigs = np.stack([h.signature(q_mat) for h in tables])  # (T, nq)
    q_ref = ray.put((q_ids, q_mat, q_sigs))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def probe(t: pa.Table) -> pa.Table:
        qids, qm, qsigs = ray.get(q_ref)
        cids = np.asarray(t["vec_id"], dtype=np.int64)
        cm = _normalize(np.stack(
            t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64))
        csigs = np.stack([h.signature(cm) for h in tables])  # (T, batch)
        # per-query candidate mask: any table with a signature match
        cand = np.zeros((len(qids), len(cids)), dtype=bool)
        for ti in range(len(tables)):
            cand |= qsigs[ti][:, None] == csigs[ti][None, :]
        cand &= cids[None, :] != qids[:, None]     # exclude self
        union = np.nonzero(cand.any(axis=0))[0]    # candidate rows only
        out_q, out_n, out_s = [], [], []
        if len(union):
            sims_u = qm @ cm[union].T              # (nq, |candidates|)
            cand_u = cand[:, union]
            for qi in range(len(qids)):
                idx = np.nonzero(cand_u[qi])[0]
                if len(idx) == 0:
                    continue
                s = sims_u[qi][idx]
                ordr = np.lexsort((cids[union][idx], -s))[:k]
                out_q += [qids[qi]] * len(ordr)
                out_n += cids[union][idx][ordr].tolist()
                out_s += s[ordr].tolist()
        # per-block scan/candidate counters ride along as sentinel rows
        # (query_id = -1) so the driver can report the measured pruning
        # without a second execution; dropped before returning
        out_q.append(-1)
        out_n.append(len(cids) * len(qids))        # scanned (q,row) cells
        out_s.append(float(int(cand.sum())))       # candidate cells
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    stats = partials[partials["query_id"] == -1]
    scanned = int(stats["neighbor_id"].sum())
    candidates = int(stats["cosine"].sum())
    if log_stats and scanned:
        print(f"[ann_lsh_topk] candidate fraction: "
              f"{candidates}/{scanned} = {candidates / scanned:.4f}")
    partials = partials[partials["query_id"] >= 0]
    return _final_topk(partials, k)
