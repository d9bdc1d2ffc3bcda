"""Engine-vs-oracle conformance at sf-test scale (~20k pages,
FIXTURES.md scale points) — the same equality gates as the smoke-scale
test, an order of magnitude more link/dedup/budget interactions.
Fixture + crawl cached under /tmp (idempotent) so reruns are cheap."""

import json

import pyarrow.parquet as pq
import pytest

from spider_ray.oracle import crawl_oracle


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_20k(tmp_path):
    from spider_ray.datagen import default_politeness, write_fixture
    from spider_ray.engine import CrawlEngine

    pol = default_politeness(max_per_host_per_epoch=8, max_epochs=6)
    paths = write_fixture("/tmp/spider_ray_testfix/n20000", n_pages=20_000,
                          seed=42, politeness=pol)
    pages = pq.read_table(paths["pages"])
    seeds = pq.read_table(paths["seeds"])
    oracle_res = crawl_oracle(pages, seeds, pol)

    eng = CrawlEngine(paths["pages"], pol, str(tmp_path / "ckpt"),
                      num_parts=16, seen_shards=8, fetch_concurrency=4)
    manifest = eng.run(seeds=seeds)
    assert manifest["done"]
    assert eng.seen_table().equals(oracle_res.seen_table())
    assert eng.order_table().equals(oracle_res.order_table())
    assert eng.text_table().equals(oracle_res.text_table())
    for m_e, m_o in zip(manifest["epochs"], oracle_res.metrics):
        for k in ("selected", "ok", "miss", "robots", "admitted",
                  "frontier_after"):
            assert m_e[k] == m_o[k], f"epoch {m_e['epoch']} metric {k}"


@pytest.mark.usefixtures("ray_session")
def test_distributed_engine_matches_oracle_20k(tmp_path):
    """The fully distributed epoch spine (driver_threshold=0 AND
    force_distributed=True — every stage runs as Dataset stages /
    partition-aligned tasks) must stay byte-equal to the oracle at the
    20k scale point."""
    from spider_ray.datagen import default_politeness, write_fixture
    from spider_ray.engine import CrawlEngine

    pol = default_politeness(max_per_host_per_epoch=8, max_epochs=6)
    paths = write_fixture("/tmp/spider_ray_testfix/n20000", n_pages=20_000,
                          seed=42, politeness=pol)
    pages = pq.read_table(paths["pages"])
    seeds = pq.read_table(paths["seeds"])
    oracle_res = crawl_oracle(pages, seeds, pol)

    eng = CrawlEngine(paths["pages"], pol, str(tmp_path / "ckpt_dist"),
                      num_parts=16, seen_shards=8, fetch_concurrency=4,
                      force_distributed=True, driver_threshold=0)
    manifest = eng.run(seeds=seeds)
    assert manifest["done"]
    assert eng.seen_table().equals(oracle_res.seen_table())
    assert eng.order_table().equals(oracle_res.order_table())
    assert eng.text_table().equals(oracle_res.text_table())
