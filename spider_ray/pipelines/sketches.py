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
