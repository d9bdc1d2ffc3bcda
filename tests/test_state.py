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
