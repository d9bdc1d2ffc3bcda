"""End-to-end conformance: Ray engine vs the single-threaded oracle
(SURVEY.md §5 layer 3) — seen-set equality, crawl-order equality,
byte-identical extracted text, at two parallelism configs."""

import json

import pyarrow.parquet as pq
import pytest

from spider_ray.oracle import crawl_oracle


def _assert_matches_oracle(eng, oracle_res):
    seen_e = eng.seen_table()
    seen_o = oracle_res.seen_table()
    assert seen_e.num_rows == seen_o.num_rows, (
        f"seen size {seen_e.num_rows} != oracle {seen_o.num_rows}"
    )
    assert seen_e.equals(seen_o), "seen set mismatch"

    order_e = eng.order_table()
    order_o = oracle_res.order_table()
    assert order_e.num_rows == order_o.num_rows
    assert order_e.equals(order_o), "crawl order mismatch"

    text_e = eng.text_table()
    text_o = oracle_res.text_table()
    assert text_e.equals(text_o), "extracted text mismatch (byte-identical required)"


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle(smoke_fixture, tmp_path):
    pages = pq.read_table(smoke_fixture["pages"])
    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))

    oracle_res = crawl_oracle(pages, seeds, pol)

    from spider_ray.engine import CrawlEngine

    eng = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "ckpt"),
                      num_parts=8, seen_shards=4, fetch_concurrency=2)
    manifest = eng.run(seeds=seeds)
    assert manifest["done"]
    _assert_matches_oracle(eng, oracle_res)
    # metrics parity with the oracle's per-epoch counters
    for m_e, m_o in zip(manifest["epochs"], oracle_res.metrics):
        for k in ("selected", "ok", "miss", "robots", "admitted", "frontier_after"):
            assert m_e[k] == m_o[k], f"epoch {m_e['epoch']} metric {k}"


@pytest.mark.usefixtures("ray_session")
def test_parallelism_invariance(smoke_fixture, tmp_path):
    """Different partition/shard/pool sizes + forced salted scheduler
    must produce the identical crawl (SURVEY.md §7.4)."""
    pages = pq.read_table(smoke_fixture["pages"])
    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))
    pol = {**pol, "max_epochs": 3}
    oracle_res = crawl_oracle(pages, seeds, pol)

    from spider_ray.engine import CrawlEngine

    for i, kw in enumerate([
        dict(num_parts=2, seen_shards=1, fetch_concurrency=1),
        dict(num_parts=16, seen_shards=8, fetch_concurrency=4,
             force_salted_scheduler=True, force_distributed=True),
        dict(num_parts=8, seen_shards=4, fetch_concurrency=2,
             driver_threshold=0),  # distributed via threshold
    ]):
        eng = CrawlEngine(smoke_fixture["pages"], pol,
                          str(tmp_path / f"ckpt{i}"), **kw)
        eng.run(seeds=seeds)
        _assert_matches_oracle(eng, oracle_res)


@pytest.mark.usefixtures("ray_session")
def test_seen_spill_conformance(smoke_fixture, tmp_path):
    """Round-3: the spillable exact layer under pressure — shard
    mem_capacity far below the admitted volume, distributed epochs with
    shard-pushed admission — must still match the oracle byte-for-byte,
    and the shards must actually have spilled."""
    import json as _json

    import ray

    pages = pq.read_table(smoke_fixture["pages"])
    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = _json.load(open(smoke_fixture["politeness"]))
    oracle_res = crawl_oracle(pages, seeds, pol)

    from spider_ray.engine import CrawlEngine

    eng = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "ckpt"),
                      num_parts=8, seen_shards=2, fetch_concurrency=2,
                      seen_mem_capacity=64, force_distributed=True,
                      driver_threshold=0)
    manifest = eng.prepare(seeds=seeds)
    # run epochs manually so shard internals are inspectable pre-close
    try:
        e = manifest["next_epoch"]
        spilled = False
        while e < eng.max_epochs and eng._frontier_rows(e - 1) > 0:
            stats = eng._run_epoch(e, eng._frontier_rows(e - 1))
            manifest["epochs"].append(stats)
            manifest["next_epoch"] = e + 1
            manifest["next_seq"] = eng._seq
            eng._write_manifest(manifest)
            e += 1
        residents = ray.get([s.resident_exact.remote()
                             for s in eng._checker.shards])
        sizes = ray.get([s.size.remote() for s in eng._checker.shards])
        spilled = any(sz > r for r, sz in zip(residents, sizes))
        assert spilled, f"no shard spilled (residents={residents}, sizes={sizes})"
        assert all(r <= 64 + (1 << 15) for r in residents)
        manifest["done"] = True
        eng._write_manifest(manifest)
    finally:
        eng.close()
    _assert_matches_oracle(eng, oracle_res)


def test_effective_threshold_cpu_adaptive(tmp_path):
    """Round-4 adaptive dispatch: the driver/distributed switch point
    floors at 150k rows (control-sized frontiers stay on the driver
    kernels at any CPU count — measured faster at both 8 and 32 CPUs),
    rises 8k rows/CPU on bigger nodes, and is always capped by the
    constructor's driver_threshold (the driver-memory bound; 0 still
    forces every epoch distributed)."""
    from spider_ray.engine import CrawlEngine

    def eng(**kw):
        e = CrawlEngine("unused.parquet", {"max_per_host_per_epoch": 1,
                                           "max_epochs": 1},
                        str(tmp_path / "c"), **kw)
        return e

    e = eng()
    for ncpu, want in [(2, 150_000), (8, 150_000), (16, 150_000),
                       (32, 256_000), (64, 512_000), (1024, 2_000_000)]:
        e._cluster_cpus = ncpu
        assert e._effective_threshold() == want, ncpu
    e0 = eng(driver_threshold=0)
    e0._cluster_cpus = 32
    assert e0._effective_threshold() == 0  # tests' force-distributed knob
