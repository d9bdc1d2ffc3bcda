"""Checkpoint/resume conformance (SURVEY.md §5 layer 4): interrupt after
epoch K, resume, final state byte-identical to an uninterrupted run."""

import json

import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_resume_identical(smoke_fixture, tmp_path):
    from spider_ray.engine import CrawlEngine

    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))
    pol = {**pol, "max_epochs": 4}

    # uninterrupted reference run
    full = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "full"),
                       num_parts=4, seen_shards=2)
    full.run(seeds=seeds)

    # interrupted run: stop after 2 epochs (simulates a crash at the epoch
    # barrier — mid-epoch crashes restart the epoch: writes are
    # overwrite-by-partition and seen admission is two-phase, so replaying
    # an epoch is idempotent)
    pol_short = {**pol, "max_epochs": 2}
    part1 = CrawlEngine(smoke_fixture["pages"], pol_short, str(tmp_path / "resume"),
                        num_parts=4, seen_shards=2)
    m1 = part1.run(seeds=seeds)
    assert m1["next_epoch"] == 2

    # resume with a FRESH engine object (state must come from checkpoints)
    part2 = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "resume"),
                        num_parts=4, seen_shards=2)
    m2 = part2.run(resume=True)
    assert m2["next_epoch"] == 4
    assert [e["epoch"] for e in m2["epochs"]] == [0, 1, 2, 3]

    assert part2.seen_table().equals(full.seen_table())
    assert part2.order_table().equals(full.order_table())
    assert part2.text_table().equals(full.text_table())


@pytest.mark.usefixtures("ray_session")
def test_resume_of_done_run_is_noop(smoke_fixture, tmp_path):
    from spider_ray.engine import CrawlEngine

    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))
    pol = {**pol, "max_epochs": 2}
    eng = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "c"),
                      num_parts=4, seen_shards=2)
    eng.run(seeds=seeds)
    before = eng.order_table()
    eng2 = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "c"),
                       num_parts=4, seen_shards=2)
    m = eng2.run(resume=True)
    assert m["done"]
    assert eng2.order_table().equals(before)


@pytest.mark.usefixtures("ray_session")
def test_resume_across_execution_paths(smoke_fixture, tmp_path):
    """Crash-at-barrier after DISTRIBUTED epochs, resume on the DRIVER
    path (and vice versa): the checkpoint layouts (per-part frontier
    shards vs single file, order/ dir vs order.parquet, hive admitted)
    must interoperate byte-identically — this also gates the stale-shard
    cleanup on epoch rerun (ADVICE.md round 1)."""
    from spider_ray.engine import CrawlEngine

    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))
    pol = {**pol, "max_epochs": 4}

    full = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "full"),
                       num_parts=4, seen_shards=2)
    full.run(seeds=seeds)

    for name, first_kw, second_kw in [
        ("dist_then_small", dict(force_distributed=True), dict()),
        ("small_then_dist", dict(), dict(force_distributed=True)),
    ]:
        ck = str(tmp_path / name)
        p1 = CrawlEngine(smoke_fixture["pages"], {**pol, "max_epochs": 2},
                         ck, num_parts=4, seen_shards=2, **first_kw)
        p1.run(seeds=seeds)
        p2 = CrawlEngine(smoke_fixture["pages"], pol, ck,
                         num_parts=4, seen_shards=2, **second_kw)
        m = p2.run(resume=True)
        assert m["next_epoch"] == 4, name
        assert p2.seen_table().equals(full.seen_table()), name
        assert p2.order_table().equals(full.order_table()), name
        assert p2.text_table().equals(full.text_table()), name


@pytest.mark.usefixtures("ray_session")
def test_fused_admit_task_replay_idempotent(tmp_path):
    """A Ray retry of the fused per-partition epoch-tail task must not
    change data or counters: the replay finds the atomically-written
    admitted checkpoint and reuses its committed phase-1 verdicts
    (re-checking after its own phase-2 adds would wrongly reject every
    url it just admitted)."""
    import ray
    import numpy as np
    import pyarrow as pa

    from spider_ray.engine import _admit_frontier_part
    from spider_ray.state.seen import SeenChecker, make_seen_shards

    shards = make_seen_shards(2, capacity_per_shard=1 << 12)
    checker = SeenChecker(shards)
    urls = [f"http://h{i}.example/p{i}" for i in range(40)]
    from spider_ray.common.hashing import hash64_many
    h = hash64_many(urls)
    # pre-seed half as already seen
    checker.add(h[:20], np.asarray(urls[:20], dtype=object))
    links = pa.table({
        "url_hash": pa.array(h, pa.int64()),
        "canonical_url": pa.array(urls, pa.string()),
        "priority": pa.array([1.0] * 40, pa.float64()),
    })
    args = (0, [ray.put(links)], [], [], shards, 3,
            str(tmp_path / "adm" / "part-00000.parquet"),
            str(tmp_path / "fr" / "part-00000.parquet"))
    first = _admit_frontier_part(*args)
    assert first == {"links": 40, "admitted": 20, "frontier": 20}
    seen_after_first = checker.total()
    fr_bytes = open(args[7], "rb").read()
    # replay: same args, checkpoint present, shards already contain the
    # admitted urls — counters and files must be unchanged
    second = _admit_frontier_part(*args)
    assert second == first
    assert checker.total() == seen_after_first
    assert open(args[7], "rb").read() == fr_bytes
    for s in shards:
        ray.kill(s)


@pytest.mark.usefixtures("ray_session")
def test_seen_actor_loss_fails_fast_then_resume_matches(smoke_fixture,
                                                        tmp_path):
    """Actor-loss semantics (SURVEY §7.4): losing a seen-shard actor
    mid-run FAILS the run (no silent duplicate admission — the shards
    are not restartable in-place by design), and a fresh engine resumed
    from the checkpoint tree reproduces the uninterrupted run exactly
    (shards rebuild from the admitted deltas)."""
    import ray

    from spider_ray.engine import CrawlEngine

    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))
    pol = {**pol, "max_epochs": 3}

    full = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "full"),
                       num_parts=4, seen_shards=2)
    full.run(seeds=seeds)

    crash = CrawlEngine(smoke_fixture["pages"], pol,
                        str(tmp_path / "crash"), num_parts=4,
                        seen_shards=2)
    manifest = crash.prepare(seeds=seeds)
    ray.kill(crash._checker.shards[0])
    with pytest.raises(Exception):
        crash.run_epochs(manifest)
    crash.close()

    fresh = CrawlEngine(smoke_fixture["pages"], pol,
                        str(tmp_path / "crash"), num_parts=4,
                        seen_shards=2)
    fresh.run(resume=True)
    assert fresh.seen_table().equals(full.seen_table())
    assert fresh.order_table().equals(full.order_table())
    assert fresh.text_table().equals(full.text_table())


@pytest.mark.usefixtures("ray_session")
def test_fetch_actor_loss_fails_fast_then_resume_matches(smoke_fixture,
                                                         tmp_path):
    """Same failure model for the fetch pool: a dead fetch actor fails
    the run (its shard cache and stashed state are gone), and resume
    from the checkpoint tree reproduces the uninterrupted run."""
    import ray

    from spider_ray.engine import CrawlEngine

    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))
    pol = {**pol, "max_epochs": 3}

    full = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "full"),
                       num_parts=4, seen_shards=2, fetch_concurrency=2)
    full.run(seeds=seeds)

    crash = CrawlEngine(smoke_fixture["pages"], pol,
                        str(tmp_path / "crash"), num_parts=4,
                        seen_shards=2, fetch_concurrency=2)
    manifest = crash.prepare(seeds=seeds)
    ray.kill(crash._fetch_pool[0])
    with pytest.raises(Exception):
        crash.run_epochs(manifest)
    crash.close()

    fresh = CrawlEngine(smoke_fixture["pages"], pol,
                        str(tmp_path / "crash"), num_parts=4,
                        seen_shards=2, fetch_concurrency=2)
    fresh.run(resume=True)
    assert fresh.seen_table().equals(full.seen_table())
    assert fresh.order_table().equals(full.order_table())
    assert fresh.text_table().equals(full.text_table())


@pytest.mark.usefixtures("ray_session")
def test_crash_between_check_and_add_resumes_to_oracle_20k(tmp_path):
    """Chaos test for the distributed epoch tail's crash-replay seam
    (round-4 verdict item 6): the fused admit task for one partition
    dies AFTER its admitted checkpoint is on disk but BEFORE the seen
    shards received the phase-2 add — so on resume the checkpoint's
    committed verdicts must be replayed, not re-checked (re-checking
    after sibling parts' adds could flip verdicts).  A fresh engine
    resumed from the checkpoint tree must equal the uninterrupted run
    AND the oracle exactly, at the 20k fixture with the fully
    distributed spine."""
    import spider_ray.engine as eng_mod
    from spider_ray.datagen import default_politeness, write_fixture
    from spider_ray.engine import CrawlEngine
    from spider_ray.oracle import crawl_oracle

    def _crashing_admit(*args):
        """Injected epoch-tail task: for part 0 of epoch 2, die BETWEEN
        the admitted-checkpoint write (phase 1) and the seen-shard add
        (phase 2) — the exact seam the two-phase protocol exists for —
        and keep dying on in-run retries (a hard host crash, not a
        transient fault).  Defined INSIDE the test so cloudpickle
        serializes it by value into the worker process (a test-module
        global is pickled by reference and fails to import there)."""
        import os

        import spider_ray.state.seen as seenmod
        from spider_ray.engine import _admit_frontier_part as real

        part, epoch, adm_path = args[0], args[5], args[6]
        if part == 0 and epoch == 2:
            if os.path.exists(adm_path):
                raise RuntimeError("injected: host still down")
            orig = seenmod.SeenChecker.add

            def boom(self, *a, **k):
                raise RuntimeError("injected crash between check and add")

            seenmod.SeenChecker.add = boom
            try:
                return real(*args)
            finally:
                seenmod.SeenChecker.add = orig
        return real(*args)

    pol = default_politeness(max_per_host_per_epoch=8, max_epochs=4)
    paths = write_fixture("/tmp/spider_ray_testfix/n20000_r5", n_pages=20_000,
                          seed=42, politeness=pol)
    pages = pq.read_table(paths["pages"])
    seeds = pq.read_table(paths["seeds"])

    kw = dict(num_parts=8, seen_shards=4, fetch_concurrency=4,
              force_distributed=True, driver_threshold=0)
    full = CrawlEngine(paths["pages"], pol, str(tmp_path / "full"), **kw)
    full.run(seeds=seeds)

    orig_fn = eng_mod._admit_frontier_part
    old_rfns = eng_mod._RFNS
    eng_mod._RFNS = None  # rebuild the remote-fn table with the poison
    eng_mod._admit_frontier_part = _crashing_admit
    try:
        crash = CrawlEngine(paths["pages"], pol, str(tmp_path / "crash"),
                            **kw)
        with pytest.raises(Exception, match="injected"):
            crash.run(seeds=seeds)
        crash.close()
    finally:
        eng_mod._admit_frontier_part = orig_fn
        eng_mod._RFNS = None  # next engine rebuilds with the real task
        del old_rfns

    # the crashed state is exactly mid-seam: part 0's epoch-2 admitted
    # checkpoint reached disk (phase 1 committed) even though its
    # phase-2 add never hit the shards — that file is what resume's
    # replay must honor instead of re-checking
    import glob
    adm2 = glob.glob(str(tmp_path / "crash" / "epoch_0002" / "admitted" /
                         "*.parquet"))
    assert adm2, "expected the phase-1 admitted checkpoint on disk"

    fresh = CrawlEngine(paths["pages"], pol, str(tmp_path / "crash"), **kw)
    m = fresh.run(resume=True)
    assert m["done"]
    assert fresh.seen_table().equals(full.seen_table())
    assert fresh.order_table().equals(full.order_table())
    assert fresh.text_table().equals(full.text_table())

    oracle_res = crawl_oracle(pages, seeds, pol)
    assert fresh.seen_table().equals(oracle_res.seen_table())
    assert fresh.order_table().equals(oracle_res.order_table())
