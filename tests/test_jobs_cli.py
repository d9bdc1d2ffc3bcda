"""Smoke tests for the ray-job-submit entry points (jobs/run_crawl.py):
the CLI must run a fresh crawl standalone in its own process, resume
from the checkpoint manifest, and leave oracle-equal results — the
wire-level contract a cluster submission relies on."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args):
    env = dict(os.environ, RAY_ADDRESS="local")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_crawl.py"), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420)


def test_run_crawl_cli_fresh_and_resume(tmp_path):
    from spider_ray.datagen import default_politeness, write_fixture
    from spider_ray.oracle import crawl_oracle

    pol = default_politeness(max_per_host_per_epoch=8, max_epochs=4)
    paths = write_fixture(str(tmp_path / "fix"), n_pages=800, seed=7,
                          politeness=pol)
    ckpt = str(tmp_path / "ckpt")
    base = ["--pages", paths["pages"], "--ckpt", ckpt,
            "--politeness", paths["politeness"],
            "--num-parts", "4", "--seen-shards", "2",
            "--fetch-concurrency", "2", "--num-cpus", "2"]
    r = _run_cli([*base, "--seeds", paths["seeds"]])
    assert r.returncode == 0, r.stderr[-2000:]
    with open(os.path.join(ckpt, "manifest.json")) as f:
        man = json.load(f)
    assert man["done"]

    # resume on a completed run must be a no-op success (idempotent)
    r2 = _run_cli([*base, "--resume"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    with open(os.path.join(ckpt, "manifest.json")) as f:
        assert json.load(f)["epochs"] == man["epochs"]

    # the CLI's results equal the single-threaded oracle
    from spider_ray.engine import CrawlEngine

    oracle = crawl_oracle(pq.read_table(paths["pages"]),
                          pq.read_table(paths["seeds"]), pol)
    eng = CrawlEngine(paths["pages"], pol, ckpt, num_parts=4, seen_shards=2)
    assert eng.seen_table().equals(oracle.seen_table())
    assert eng.order_table().equals(oracle.order_table())
    assert eng.text_table().equals(oracle.text_table())
