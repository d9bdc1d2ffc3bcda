"""Bloom / cuckoo / seen-shard tests (property: no false negatives;
dedup idempotence — SURVEY.md §5 layer 1)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from spider_ray.state.bloom import BloomFilter
from spider_ray.state.cuckoo import CuckooFilter
from spider_ray.state.seen import SeenShardState


def _keys(n, seed=0):
    return np.random.default_rng(seed).integers(0, 2**62, size=n, dtype=np.int64)


class TestBloom:
    def test_no_false_negatives(self):
        b = BloomFilter(10_000, 0.01)
        keys = _keys(10_000)
        b.add_many(keys)
        assert b.contains_many(keys).all()

    def test_fp_rate_bounded(self):
        b = BloomFilter(10_000, 0.01)
        b.add_many(_keys(10_000, seed=1))
        probe = _keys(20_000, seed=2)
        fp = b.contains_many(probe).mean()
        assert fp < 0.03

    def test_empty(self):
        b = BloomFilter(100)
        assert b.contains_many(np.array([], dtype=np.int64)).shape == (0,)
        assert not b.contains_many(_keys(100)).any()


class TestCuckoo:
    def test_no_false_negatives_at_load(self):
        c = CuckooFilter(10_000)
        keys = np.unique(_keys(9_000, seed=3))
        failed = c.add_many(keys)
        assert failed == 0
        assert c.contains_many(keys).all()

    def test_fp_rate(self):
        c = CuckooFilter(10_000)
        c.add_many(np.unique(_keys(8_000, seed=4)))
        probe = _keys(50_000, seed=5)
        assert c.contains_many(probe).mean() < 0.01

    def test_overfull_reports_failures(self):
        c = CuckooFilter(64)
        keys = np.unique(_keys(5_000, seed=6))
        failed = c.add_many(keys)
        assert failed > 0  # table full -> failures reported, not silent


class TestSeenShard:
    def test_check_add_roundtrip(self):
        s = SeenShardState(capacity=4096)
        a = np.unique(_keys(3_000, seed=7))
        assert s.check(a).all()           # all new before add
        assert s.add(a) == len(a)
        assert not s.check(a).any()       # none new after add
        assert s.add(a) == 0              # idempotent

    def test_interleaved_exactness(self):
        s = SeenShardState(capacity=1024)
        rng = np.random.default_rng(8)
        truth: set[int] = set()
        for _ in range(20):
            batch = rng.integers(0, 5_000, size=200).astype(np.int64)
            new = s.check(batch)
            for h, n in zip(batch.tolist(), new.tolist()):
                assert n == (h not in truth), f"hash {h}"
            admitted = np.unique(batch[new])
            s.add(admitted)
            truth.update(admitted.tolist())
        assert s.size() == len(truth)
        assert list(s.dump()) == sorted(truth)

    def test_exact_under_overflow(self):
        # tiny cuckoo forces insert failures; exactness must survive
        s = SeenShardState(capacity=64)
        keys = np.unique(_keys(4_000, seed=9))
        s.add(keys)
        assert not s.check(keys).any()    # no false "new" (= no false negative)
        other = np.setdiff1d(np.unique(_keys(4_000, seed=10)), keys)
        assert s.check(other).all()       # exact layer resolves fps

    def test_fused_check_add_matches_two_phase(self):
        """check_add == (check; add of the new subset), including the
        in-batch duplicate case the 10M-url stress exposed: a hash
        repeated WITHIN one call admits and reports True exactly once
        (first occurrence), so sum(mask) == actually-admitted — the
        split protocol's add()-side dedup semantics."""
        rng = np.random.default_rng(11)
        fused = SeenShardState(capacity=4096)
        split = SeenShardState(capacity=4096)
        total_f = total_s = 0
        for _ in range(15):
            batch = rng.integers(0, 3_000, size=400).astype(np.int64)
            # in-batch duplicates are frequent at this key range
            mask = fused.check_add(batch)
            total_f += int(mask.sum())
            new = split.check(batch)
            total_s += split.add(batch[new])
            # the sets stay identical after every call
            probe = np.arange(0, 3_000, dtype=np.int64)
            assert (fused.check(probe) == split.check(probe)).all()
        assert total_f == total_s == fused.size() == split.size()

    def test_fused_check_add_collision_support(self):
        """Two distinct urls sharing a hash64 in ONE fused call must
        BOTH admit (collision layer), while a true (hash, url)
        duplicate admits once."""
        s = SeenShardState(capacity=256)
        h = np.array([42, 42, 42], dtype=np.int64)
        u = np.array(["http://a/", "http://b/", "http://a/"], dtype=object)
        mask = s.check_add(h, u)
        assert mask.tolist() == [True, True, False]
        # all three rows are now seen
        assert (~s.check(h, u)).all()

    @given(st.lists(st.integers(0, 2**61), max_size=300))
    @settings(max_examples=30, deadline=None)
    def test_property_matches_set(self, xs):
        s = SeenShardState(capacity=512)
        truth: set[int] = set()
        arr = np.array(xs or [0], dtype=np.int64)[: len(xs)]
        for i in range(0, len(arr), 50):
            chunk = arr[i : i + 50]
            got = s.check(chunk)
            want = np.array([h not in truth for h in chunk.tolist()])
            assert (got == want).all()
            adm = np.unique(chunk[got])
            s.add(adm)
            truth.update(adm.tolist())


@pytest.mark.usefixtures("ray_session")
def test_sharded_checker_actors():
    from spider_ray.state.seen import SeenChecker, make_seen_shards

    shards = make_seen_shards(4, capacity_per_shard=2048)
    chk = SeenChecker(shards)
    a = np.unique(_keys(2_000, seed=11))
    assert chk.check(a).all()
    chk.add(a)
    assert not chk.check(a).any()
    assert chk.total() == len(a)
    b = np.setdiff1d(np.unique(_keys(2_000, seed=12)), a)
    mixed = np.concatenate([a[:100], b[:100]])
    got = chk.check(mixed)
    assert not got[:100].any() and got[100:].all()


class TestSeenSpill:
    """The 10^10-scale exact layer (round-2 verdict item 1): a shard
    whose exact resolver is forced far past its in-memory capacity must
    keep a BOUNDED resident set (spilled sorted-Parquet runs + fence
    probes) while staying exactly equal to a dict oracle."""

    def test_spill_bounded_and_exact(self, tmp_path):
        rng = np.random.default_rng(11)
        s = SeenShardState(capacity=1 << 18,
                           spill_dir=str(tmp_path / "spill"),
                           mem_capacity=4096)
        oracle: set[int] = set()
        total = 0
        for i in range(40):
            batch = rng.integers(0, 2**62, size=5_000, dtype=np.int64)
            urls = np.array([f"http://h/{int(h)}" for h in batch],
                            dtype=object)
            new = s.check(batch, urls)
            exp = np.array([int(h) not in oracle for h in batch])
            # within-batch duplicates: check() is a pure read, so both
            # report vs the pre-batch state — exp computed the same way
            np.testing.assert_array_equal(new, exp)
            adm = batch[new]
            total += s.add(adm, urls[new])
            oracle.update(int(h) for h in np.unique(adm))
            # the resident exact set must stay bounded by
            # mem_capacity + pending_cap at every step
            assert s.resident_exact() <= 4096 + s.pending_cap
        assert total == len(oracle)
        assert s.size() == len(oracle)
        assert len(s.runs) >= 1, "expected spilled runs"
        assert len(s.runs) <= s.run_target, "compaction never ran"
        # full membership after heavy spilling
        probe = np.fromiter(oracle, dtype=np.int64)
        urls = np.array([f"http://h/{int(h)}" for h in probe], dtype=object)
        assert not s.check(probe, urls).any()
        fresh = rng.integers(0, 2**62, size=20_000, dtype=np.int64)
        fresh = fresh[~np.isin(fresh, probe)]
        assert s.check(fresh).all()
        # idempotent re-add straight from the spilled layer
        assert s.add(probe[:1000], urls[:1000]) == 0

    def test_spilled_hash_collision_resolves_on_url(self, tmp_path):
        """Two distinct urls sharing a url_hash: once the first is
        spilled to disk, the second must still read as NEW (the spilled
        layer keys on canonical_url) and both must coexist."""
        s = SeenShardState(capacity=1 << 14,
                           spill_dir=str(tmp_path / "spill"),
                           mem_capacity=64)
        h = np.array([12345], dtype=np.int64)
        assert s.add(h, np.array(["http://a/"], dtype=object)) == 1
        # force merge + spill so the entry lands in a run
        filler = np.arange(100_000, 101_000, dtype=np.int64)
        s.add(filler, np.array([f"http://f/{i}" for i in filler],
                               dtype=object))
        s._merge_pending()
        s._spill()
        assert s.resident_exact() == 0
        assert not s.check(h, np.array(["http://a/"], dtype=object))[0]
        assert s.check(h, np.array(["http://b/"], dtype=object))[0], (
            "distinct url colliding in hash must be NEW once spilled")
        assert s.add(h, np.array(["http://b/"], dtype=object)) == 1
        s._merge_pending()
        s._spill()
        assert not s.check(h, np.array(["http://a/"], dtype=object))[0]
        assert not s.check(h, np.array(["http://b/"], dtype=object))[0]
        assert s.check(h, np.array(["http://c/"], dtype=object))[0]

    def test_url_less_probe_hash_decides(self, tmp_path):
        s = SeenShardState(capacity=1 << 14,
                           spill_dir=str(tmp_path / "spill"),
                           mem_capacity=16)
        h = np.arange(100, dtype=np.int64)
        s.add(h, np.array([f"http://u/{i}" for i in h], dtype=object))
        s._merge_pending()
        s._spill()
        assert not s.check(h).any()  # no urls -> hash-keyed membership


class TestCollisionResolution:
    """hash64-collision handling in the spillable exact layer (round-3
    review findings: row-group straddle + same-batch pair dedup)."""

    def test_sorted_run_straddling_equal_hash_range(self, tmp_path):
        """An equal-hash range split across a row-group boundary must be
        probed in EVERY covering group, not just the first."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from spider_ray.state.seen import _SortedRun

        t = pa.table({"url_hash": pa.array([1, 5, 5, 9], pa.int64()),
                      "canonical_url": pa.array(["x", "A", "B", "y"])})
        path = str(tmp_path / "run.parquet")
        pq.write_table(t, path, row_group_size=2)
        run = _SortedRun(path)
        probes = np.array([5, 5, 5, 2], dtype=np.int64)
        urls = np.array(["A", "B", "C", "nope"], dtype=object)
        seen = run.contains(probes, urls)
        assert seen.tolist() == [True, True, False, False]

    def test_same_batch_collision_pair_both_recorded(self, tmp_path):
        """Two DISTINCT urls sharing a hash64 added in ONE batch must both
        record their url string, so after spilling neither is re-admitted."""
        s = SeenShardState(capacity=1 << 12, spill_dir=str(tmp_path / "sp"),
                           mem_capacity=4, run_target=2)
        h = np.array([42, 42], dtype=np.int64)
        urls = np.array(["http://a/", "http://b/"], dtype=object)
        added = s.add(h, urls)
        assert added == 2
        # force the pair out of the resident levels onto disk
        filler_h = np.arange(100, 200, dtype=np.int64)
        filler_u = np.array([f"http://f{i}/" for i in range(100)],
                            dtype=object)
        s.add(filler_h, filler_u)
        s._merge_pending()
        s._spill()
        assert s.resident_exact() == 0
        new = s.check(h, urls)
        assert new.tolist() == [False, False], \
            "both colliding urls must be recorded as seen"
        # a THIRD url on the same hash is still new (collision resolution)
        assert s.check(np.array([42], dtype=np.int64),
                       np.array(["http://c/"], dtype=object)).tolist() == [True]
