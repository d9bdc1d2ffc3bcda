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


def test_run_graph_cli_stages_and_resume(tmp_path):
    """run_graph.py must derive edges, rank them, label host
    components, write stage markers — and skip completed stages on
    rerun."""
    from spider_ray.datagen import default_politeness, write_fixture

    pol = default_politeness(max_per_host_per_epoch=8, max_epochs=2)
    paths = write_fixture(str(tmp_path / "fix"), n_pages=600, seed=11,
                          politeness=pol)
    out = str(tmp_path / "graph")
    env = dict(os.environ, RAY_ADDRESS="local")
    args = [sys.executable, os.path.join(REPO, "jobs", "run_graph.py"),
            "--pages", paths["pages"], "--out", out,
            "--iters", "3", "--components", "--num-cpus", "2"]
    r = subprocess.run(args, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    for stage in ("edges", "ranks", "components"):
        assert os.path.exists(os.path.join(out, stage, "_SUCCESS")), stage
    edges = pq.read_table(os.path.join(out, "edges"))
    ranks = pq.read_table(os.path.join(out, "ranks"))
    comps = pq.read_table(os.path.join(out, "components"))
    assert edges.num_rows > 0 and ranks.num_rows > 0 and comps.num_rows > 0
    # rank universe == node universe of the edge table
    nodes = set(edges["src"].to_pylist()) | set(edges["dst"].to_pylist())
    assert set(ranks["node"].to_pylist()) == nodes
    # components are host-level
    assert all("/" not in n for n in comps["node"].to_pylist())
    # resume: a rerun skips every stage (markers echoed, fast)
    r2 = subprocess.run(args, capture_output=True, text=True, env=env,
                        cwd=REPO, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r2.stdout.count('"done": true') == 0  # markers not rewritten


def test_crawl_edges_feed_graph_job(tmp_path):
    """Composition: run_crawl --emit-edges produces edge shards that
    run_graph --edges-from ranks without re-parsing html."""
    import glob

    from spider_ray.datagen import default_politeness, write_fixture

    pol = default_politeness(max_per_host_per_epoch=8, max_epochs=2)
    paths = write_fixture(str(tmp_path / "fix"), n_pages=500, seed=3,
                          politeness=pol)
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_crawl.py"),
         "--pages", paths["pages"], "--ckpt", ckpt,
         "--politeness", paths["politeness"], "--seeds", paths["seeds"],
         "--num-parts", "4", "--seen-shards", "2",
         "--fetch-concurrency", "2", "--num-cpus", "2", "--emit-edges"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    shards = glob.glob(os.path.join(ckpt, "epoch_*", "edges", "*.parquet"))
    assert shards
    out = str(tmp_path / "graph")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_graph.py"),
         "--edges-from", os.path.join(ckpt, "epoch_*", "edges"),
         "--out", out, "--iters", "3", "--num-cpus", "2"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    ranks = pq.read_table(os.path.join(out, "ranks"))
    assert ranks.num_rows > 0


def test_run_exactsubstr_cli_stages_and_resume(tmp_path):
    """run_exactsubstr.py must write the span report + deduped corpus
    with per-stage _SUCCESS markers, resume idempotently, and its
    parquet output must equal the driver-facing queries."""
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "xs")
    env = dict(os.environ, RAY_ADDRESS="local")
    args = [sys.executable, os.path.join(REPO, "jobs", "run_exactsubstr.py"),
            "--docs", sf, "--out", out, "--k", "8", "--num-cpus", "2"]
    r = subprocess.run(args, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["done"] and len(summary["stages"]) == 2
    assert os.path.exists(os.path.join(out, "spans", "_SUCCESS"))
    assert os.path.exists(os.path.join(out, "dedup", "_SUCCESS"))

    # rerun = pure marker read, byte-identical summary stages
    r2 = subprocess.run(args, capture_output=True, text=True, env=env,
                        cwd=REPO, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert json.loads(r2.stdout.strip().splitlines()[-1])["stages"] \
        == summary["stages"]

    # rerun with a DIFFERENT k against the same --out must refuse, not
    # silently mix stages computed under different settings
    args_k4 = [a if a != "8" else "4" for a in args]
    r3 = subprocess.run(args_k4, capture_output=True, text=True, env=env,
                        cwd=REPO, timeout=420)
    assert r3.returncode != 0
    assert "use a fresh --out" in (r3.stderr + r3.stdout)

    # parquet output equals the driver-facing queries
    import __ray_entry__ as entry

    def _read(d):
        files = [os.path.join(root, f) for root, _, fs in os.walk(d)
                 for f in fs if f.endswith(".parquet")]
        return pd.concat([pd.read_parquet(f) for f in files],
                         ignore_index=True)

    got = _read(os.path.join(out, "dedup")).sort_values(
        "doc_id", ignore_index=True)
    want = (entry.queries()["dedup_substring_apply"](sf).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_run_index_cli_builds_and_probes(tmp_path):
    """run_index.py must build the text + minhash indexes standalone,
    probe them (search hits + read fractions printed), and skip both
    builds on rerun (marker resume)."""
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "idx")
    env = dict(os.environ, RAY_ADDRESS="local")

    def run(extra):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "run_index.py"),
             "--sf", sf, "--out", out, "--num-cpus", "2", *extra],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=420)

    r = run(["--text", "--minhash", "--search", "spark,window"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.splitlines()
             if x.startswith("{")]
    done = [x for x in lines if x.get("done")][0]
    assert os.path.exists(os.path.join(done["text_index"], "_SUCCESS"))
    assert os.path.exists(os.path.join(done["minhash_index"], "_SUCCESS"))
    assert done["search_hits"] > 0
    assert "index partitions" in r.stdout  # measured pruning printed

    # rerun: both builders hit their markers and return the same dirs
    r2 = run(["--text", "--minhash"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    done2 = [json.loads(x) for x in r2.stdout.splitlines()
             if x.startswith("{")][-1]
    assert done2["text_index"] == done["text_index"]
    assert done2["minhash_index"] == done["minhash_index"]


def test_run_ingest_cli_exactly_once(tmp_path):
    """run_ingest.py must process landing shards exactly once across
    passes: wave 2 re-runs touch only the new shard, and kept counts
    equal a direct DuckDB filter."""
    import duckdb
    import pyarrow as pa

    incoming = tmp_path / "landing"
    out = tmp_path / "ingested"
    incoming.mkdir()
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    pq.write_table(src.slice(0, 200), incoming / "shard-000.parquet")
    pq.write_table(src.slice(200, 200), incoming / "shard-001.parquet")

    env = dict(os.environ, RAY_ADDRESS="local")

    def run():
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "run_ingest.py"),
             "--incoming", str(incoming), "--out", str(out),
             "--num-cpus", "2"],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=420)

    r = run()
    assert r.returncode == 0, r.stderr[-2000:]
    done = json.loads(r.stdout.splitlines()[-1])
    assert sorted(done["processed"]) == ["shard-000", "shard-001"]

    # wave 2: one more shard lands; only it is processed
    pq.write_table(src.slice(400, 100), incoming / "shard-002.parquet")
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-2000:]
    done2 = json.loads(r2.stdout.splitlines()[-1])
    assert done2["processed"] == ["shard-002"]
    assert sorted(done2["skipped"]) == ["shard-000", "shard-001"]

    # exactly-once + correctness: kept rows == direct C4 filter verdicts
    con = duckdb.connect()
    total_kept = 0
    for stem in ("shard-000", "shard-001", "shard-002"):
        with open(out / stem / "_SUCCESS") as f:
            total_kept += json.loads(f.read())["n_kept"]
    expect = con.execute(f"""
        WITH tok AS (SELECT doc_id,
                            regexp_extract_all(lower(text),
                                               '[a-z0-9_]+') AS t
                     FROM read_parquet(
                         '/root/testdata/sf0.001/documents.parquet')
                     WHERE doc_id < 500),
        m AS (SELECT doc_id, len(t) AS n,
                     list_sum(list_transform(t, x -> length(x)))
                         AS sumlen,
                     len(list_filter(t, x -> x IN
                         ('the','a','of','to','and','in','is','it')))
                         AS stopn,
                     list_contains(t, 'dup') AS blocked
              FROM tok)
        SELECT count(*) FROM m
        WHERE n >= 20 AND n <= 5000 AND sumlen >= 3 * n
          AND sumlen <= 10 * n AND stopn * 100 >= 3 * n
          AND NOT blocked""").fetchone()[0]
    assert total_kept == expect


def test_run_seenstress_cli(tmp_path):
    """The seen-set stress job must hold the exactness and resident-bound
    contracts at a forced-spill size (tiny mem_capacity) and exit 0."""
    env = dict(os.environ, RAY_ADDRESS="local")
    spill = str(tmp_path / "spill")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_seenstress.py"),
         "--urls", "120000", "--batch", "16384", "--shards", "2",
         "--mem-capacity", "8192", "--capacity", "262144",
         "--dup-frac", "0.4", "--spill-root", spill, "--num-cpus", "2"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["exact"] and rep["resident_within_bound"]
    assert rep["admitted"] == rep["oracle_distinct"]
    assert rep["spilled_rows"] > 0          # the log structure engaged
    assert rep["spill_files"] > 0
