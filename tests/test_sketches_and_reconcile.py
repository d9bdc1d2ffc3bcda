"""HLL sketch accuracy + per-epoch config reconcile (SURVEY.md §2 #18)."""

import json

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestHLL:
    def test_accuracy_vs_exact(self):
        from spider_ray.pipelines.sketches import HyperLogLog
        from spider_ray.state.bloom import _splitmix64

        rng = np.random.default_rng(3)
        for true_n in (100, 5_000, 200_000):
            keys = rng.integers(0, 2**63, size=true_n, dtype=np.int64)
            uniq = len(np.unique(keys))
            hll = HyperLogLog(p=12)
            hll.add_hashes(_splitmix64(keys.astype(np.uint64)))
            err = abs(hll.estimate() - uniq) / uniq
            assert err < 0.05, f"n={true_n} err={err:.3f}"

    def test_merge_equals_union(self):
        from spider_ray.pipelines.sketches import HyperLogLog
        from spider_ray.state.bloom import _splitmix64

        rng = np.random.default_rng(4)
        a_keys = _splitmix64(rng.integers(0, 2**62, 10_000).astype(np.uint64))
        b_keys = _splitmix64(rng.integers(0, 2**62, 10_000).astype(np.uint64))
        a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
        a.add_hashes(a_keys)
        b.add_hashes(b_keys)
        u.add_hashes(np.concatenate([a_keys, b_keys]))
        a.merge(b)
        assert (a.registers == u.registers).all()

    @pytest.mark.usefixtures("ray_session")
    def test_pipeline_close_to_exact(self):
        import duckdb

        from spider_ray.pipelines.sketches import approx_distinct_tokens

        approx = approx_distinct_tokens(SF)["approx_distinct_tokens"][0].as_py()
        exact = duckdb.connect().execute(
            f"""SELECT count(DISTINCT token) FROM (
                  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS token
                  FROM read_parquet('{SF}/documents.parquet'))"""
        ).fetchone()[0]
        assert abs(approx - exact) / exact < 0.1, (approx, exact)


@pytest.mark.usefixtures("ray_session")
def test_config_reconcile_between_epochs(smoke_fixture, tmp_path):
    """Budget change written to the politeness file between epochs takes
    effect at the next epoch; robots additions propagate to fetch actors."""
    from spider_ray.engine import CrawlEngine

    pol = json.load(open(smoke_fixture["politeness"]))
    pol.update({"max_per_host_per_epoch": 5, "max_epochs": 1})
    pol_path = str(tmp_path / "politeness.json")
    with open(pol_path, "w") as f:
        json.dump(pol, f)
    seeds = pq.read_table(smoke_fixture["seeds"])

    eng = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "ckpt"),
                      num_parts=4, seen_shards=2, politeness_path=pol_path)
    m = eng.run(seeds=seeds)
    per_host_e0 = {}
    for r in eng.order_table().to_pylist():
        per_host_e0[r["host"]] = per_host_e0.get(r["host"], 0) + 1
    assert max(per_host_e0.values()) <= 5

    # raise budget + extend epochs + fully deny host000 via the file
    pol2 = {**pol, "max_per_host_per_epoch": 11, "max_epochs": 3,
            "robots": {**pol["robots"], "host000.example": ["/"]}}
    with open(pol_path, "w") as f:
        json.dump(pol2, f)
    eng2 = CrawlEngine(smoke_fixture["pages"], pol, str(tmp_path / "ckpt"),
                       num_parts=4, seen_shards=2, politeness_path=pol_path)
    m2 = eng2.run(resume=True)
    assert m2["next_epoch"] == 3
    later = [r for r in eng2.order_table().to_pylist() if r["epoch"] >= 1]
    per_host = {}
    for r in later:
        key = (r["epoch"], r["host"])
        per_host[key] = per_host.get(key, 0) + 1
    assert max(per_host.values()) <= 11
    assert max(per_host.values()) > 5  # new budget actually used
    # robots deny applied by the actors from epoch 1 on
    host0 = [r for r in later if r["host"] == "host000.example"]
    assert host0 and all(r["outcome"] == "robots" for r in host0)


@pytest.mark.usefixtures("ray_session")
class TestQuantileSummary:
    """Mergeable per-block quantile summary: the returned value's TRUE
    rank must be within the documented N/s bound of the target rank."""

    @pytest.mark.parametrize("s", [64, 1024])
    def test_rank_error_within_bound(self, s):
        from spider_ray.pipelines.sketches import approx_quantile_event_value

        out = approx_quantile_event_value(SF, qs=(0.5, 0.9, 0.99),
                                          s=s).to_pandas()
        exact = np.sort(np.asarray(
            pq.read_table(f"{SF}/events.parquet", columns=["value"])["value"],
            dtype=np.float64))
        n = len(exact)
        assert int(out["n_events"].iloc[0]) == n
        for q in (0.5, 0.9, 0.99):
            got = float(out[f"p{int(q * 100)}"].iloc[0])
            target = int(np.floor(q * (n - 1)))
            true_rank = int(np.searchsorted(exact, got, side="left"))
            # bound: N/s per the summary contract (+1 discretization)
            assert abs(true_rank - target) <= n / s + 1, \
                f"q={q} s={s}: rank {true_rank} vs {target}"

    def test_tight_summary_is_near_exact(self):
        """s >= block size => every block is represented losslessly up
        to the midpoint rule; p50 must land within a handful of ranks."""
        from spider_ray.pipelines.sketches import approx_quantile_event_value

        out = approx_quantile_event_value(SF, qs=(0.5,), s=100_000).to_pandas()
        exact = np.sort(np.asarray(
            pq.read_table(f"{SF}/events.parquet", columns=["value"])["value"],
            dtype=np.float64))
        n = len(exact)
        got = float(out["p50"].iloc[0])
        true_rank = int(np.searchsorted(exact, got, side="left"))
        assert abs(true_rank - int(np.floor(0.5 * (n - 1)))) <= 2


class TestCountMin:
    """Count-Min frequency sketch: one-sided guarantee vs exact counts,
    in the roomy regime (estimates exact) and a forced-collision regime
    (tiny width: overestimates occur, bound still holds)."""

    def _exact(self):
        import duckdb

        con = duckdb.connect()
        return con.execute(f"""
            SELECT t AS token, count(*) AS n FROM (
              SELECT unnest(regexp_extract_all(lower(text),
                                               '[a-z0-9_]+')) AS t
              FROM read_parquet('{SF}/documents.parquet'))
            GROUP BY t ORDER BY t""").fetchdf().set_index("token")["n"]

    @pytest.mark.parametrize("width", [4096, 8])
    def test_one_sided_bound(self, width):
        import math

        from spider_ray.pipelines.sketches import cms_token_counts

        r = cms_token_counts(SF, width=width).to_pandas() \
            .set_index("token")["approx_count"]
        exact = self._exact()
        assert sorted(r.index) == sorted(exact.index)
        n_total = int(exact.sum())
        eps_n = math.e / width * n_total
        assert (r >= exact).all()          # CMS never undercounts
        assert (r <= exact + eps_n).all()  # and overcounts within eps*N
        if width == 4096:
            # roomy sketch on a 31-word vocab: collisions can't occur
            assert (r == exact).all()
        else:
            # 31 tokens into 8 columns MUST collide somewhere
            assert (r > exact).any()
