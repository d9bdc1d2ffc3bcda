"""Regression tests for the round-4 verdict items: joins whose
partition count exceeds the key cardinality (the tfidf 32-CPU crash)
and the empty-result corners of the pair pipelines (round-4 ADVICE)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
class TestJoinOverPartitioned:
    def test_tfidf_survives_partitions_over_vocab(self, monkeypatch):
        """r4's only driver failure: at num_cpus=32 the tf join df got
        16 partitions for a ~31-token vocabulary, some right-side join
        partitions held only Ray's schema-less empty aggregate blocks,
        and Acero raised 'No match ... for key field reference'.  Force
        the failing 16-way split (any CPU count) and require the result
        to equal the data-sized plan's output."""
        import spider_ray.pipelines as P
        from spider_ray.pipelines.textstats import tfidf_top_terms_per_lang

        sf = "/root/testdata/sf0.001"
        base = tfidf_top_terms_per_lang(sf).to_pandas()
        assert len(base) > 0
        monkeypatch.setattr(P, "join_partitions", lambda *a, **k: 16)
        forced = tfidf_top_terms_per_lang(sf).to_pandas()
        assert base.equals(forced)

    def test_coalesce_for_join_absorbs_schemaless_empties(self):
        """coalesce_for_join merges an Aggregate's schema-less empty
        blocks into typed non-empty ones (the join-side precondition)."""
        import ray
        import ray.data as rd

        from ray.data.aggregate import Sum
        from spider_ray.pipelines import coalesce_for_join

        ds = rd.from_arrow(pa.table({
            "k": pa.array(["a", "b", "a", "c"], pa.string()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        })).groupby("k").aggregate(Sum("v", alias_name="v"))
        m = coalesce_for_join(ds, 2).materialize()
        blocks = [ray.get(ref) for bundle in m.iter_internal_ref_bundles()
                  for ref, _ in bundle.blocks]
        assert all(b.num_rows > 0 for b in blocks)
        assert all(b.schema.names == ["k", "v"] for b in blocks)
        assert sum(b.num_rows for b in blocks) == 3


@pytest.mark.usefixtures("ray_session")
class TestJoinCardinalityProperty:
    def test_join_correct_across_cardinality_partition_grid(self):
        """Property sweep over the r4 crash class: an aggregate-fed
        inner join must equal the pandas merge for every (distinct-key
        count, partition count) combination — including partitions >>
        keys, the shape where Ray's schema-broadcast race bites."""
        import pandas as pd
        import ray.data as rd

        from ray.data.aggregate import Sum
        from spider_ray.pipelines import coalesce_for_join

        rng = np.random.default_rng(11)
        for n_keys in (1, 3, 7):
            for nparts in (2, 5, 11):
                n = 200
                k = rng.integers(0, n_keys, n).astype(np.int64)
                v = rng.integers(1, 100, n).astype(np.int64)
                left = (rd.from_arrow(pa.table({"k": pa.array(k),
                                                "v": pa.array(v)}))
                        .groupby("k").aggregate(Sum("v", alias_name="v")))
                rk = np.arange(n_keys, dtype=np.int64)
                right = (rd.from_arrow(pa.table({
                    "rk": pa.array(np.repeat(rk, 2)),
                    "w": pa.array(np.tile([1, 2], n_keys).astype(np.int64)),
                })).groupby("rk").aggregate(Sum("w", alias_name="w")))
                got = (coalesce_for_join(left, nparts)
                       .join(coalesce_for_join(right, nparts),
                             join_type="inner", num_partitions=nparts,
                             on=("k",), right_on=("rk",))
                       .to_pandas()
                       .sort_values("k", ignore_index=True))
                exp_l = (pd.DataFrame({"k": k, "v": v})
                         .groupby("k", as_index=False)["v"].sum())
                exp = (exp_l.assign(w=3)
                       .sort_values("k", ignore_index=True))
                pd.testing.assert_frame_equal(
                    got[["k", "v", "w"]], exp[["k", "v", "w"]],
                    check_dtype=False,
                    obj=f"join grid n_keys={n_keys} nparts={nparts}")


@pytest.mark.usefixtures("ray_session")
class TestPriorityRevenueDispatch:
    def test_broadcast_and_join_paths_match_oracle(self):
        """hash_join_priority_revenue's size-adaptive dispatch: the
        broadcast map-side path (adaptive at test scale) and the forced
        Dataset.join twin (the 100 TB path) must both match DuckDB."""
        import duckdb

        from spider_ray.pipelines.relational import hash_join_priority_revenue

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        exp = con.execute(f"""
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM read_parquet('{sf}/lineitem.parquet') l
            JOIN read_parquet('{sf}/orders.parquet') o
              ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """).fetchdf()
        for force in (None, "join_only"):
            got = (hash_join_priority_revenue(sf, force=force).to_pandas()
                   .sort_values("o_orderpriority", ignore_index=True)
                   [["o_orderpriority", "revenue", "n_items"]])
            import pandas as pd
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestEmptyResultCorners:
    def test_source_overlap_matrix_short_docs(self, tmp_path):
        """r4 ADVICE: every doc shorter than k=5 word tokens used to
        raise ArrowInvalid in the self-join; the oracle returns empty."""
        from spider_ray.pipelines.webtext import source_overlap_matrix

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["a", "b"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "text": pa.array(["one two", "three"], pa.string()),
        }), str(tmp_path / "documents.parquet"))
        out = source_overlap_matrix(str(tmp_path)).to_pandas()
        assert len(out) == 0

    def test_simjoin_distributed_empty_blocks_typed(self):
        """r4 ADVICE: when every candidate pair is filtered (all shared
        shingles at df=n so both norms are 0) the distributed tier used
        to return a schema-less empty dataset; now both tiers emit
        typed (doc_a, doc_b, cosine) blocks."""
        import ray
        import ray.data as rd

        from spider_ray.pipelines.dedup import simjoin_tfidf_cosine_ds

        txt = "alpha beta gamma delta epsilon zeta eta theta"
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([txt] * 3, pa.string()),
        }))
        out = simjoin_tfidf_cosine_ds(ds, 3, verify_distributed=True)
        m = out.materialize()
        assert m.count() == 0
        blocks = [ray.get(ref) for bundle in m.iter_internal_ref_bundles()
                  for ref, _ in bundle.blocks]
        typed = [b for b in blocks if b.num_columns > 0]
        assert typed, "expected at least one typed block"
        assert all(b.schema.names == ["doc_a", "doc_b", "cosine"]
                   for b in typed)


@pytest.mark.usefixtures("ray_session")
class TestSelectTokenBudgetCorners:
    def _write(self, tmp_path, texts):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_single_score_tier_prefix_by_doc_id(self, tmp_path):
        """Degenerate corpus where every doc shares one q_score: the
        budget boundary falls inside the only tier and the kept set is
        the doc_id-ascending prefix — exactly the SQL window rule."""
        from spider_ray.pipelines.textstats import select_token_budget

        sf = self._write(tmp_path, ["alpha beta gamma"] * 10)  # 3 tokens
        out = select_token_budget(sf, budget=7).to_pandas()
        assert out["doc_id"].tolist() == [1, 2]  # 3+3 <= 7, +3 would be 9

    def test_zero_budget_returns_typed_empty(self, tmp_path):
        from spider_ray.pipelines.textstats import select_token_budget

        sf = self._write(tmp_path, ["alpha beta", "gamma delta"])
        out = select_token_budget(sf, budget=0).to_pandas()
        assert len(out) == 0

    def test_budget_covers_all(self, tmp_path):
        from spider_ray.pipelines.textstats import select_token_budget

        sf = self._write(tmp_path, ["alpha beta", "gamma"])
        out = select_token_budget(sf, budget=100).to_pandas()
        assert sorted(out["doc_id"].tolist()) == [1, 2]


@pytest.mark.usefixtures("ray_session")
class TestWatermarkLateData:
    def test_out_of_order_arrivals_marked_late(self, tmp_path):
        """The testdata event log arrives in event-time order, so the
        driver oracle never exercises the LATE branch; pin it with a
        crafted out-of-order log: a straggler whose hour window closed
        under the watermark (running max event time - delay) must land
        in n_late, checked against the same SQL window oracle."""
        import duckdb
        import pandas as pd

        from spider_ray.pipelines.relational import hourly_counts_watermark

        base = np.datetime64("2026-01-01T00:00:00", "us")
        h = np.timedelta64(3600, "s")
        # arrivals (event_id order): two in hour 0, one in hour 2 that
        # advances the watermark past hour 0's close, then a straggler
        # whose event time is back in hour 0 -> LATE; and one slightly
        # old event still within the 15-min grace -> on time
        ts = [base, base + np.timedelta64(10, "m"),
              base + 2 * h + np.timedelta64(30, "m"),   # watermark mover
              base + np.timedelta64(20, "m"),           # straggler: late
              base + 2 * h + np.timedelta64(20, "m")]   # within grace
        pq.write_table(pa.table({
            "event_id": pa.array(range(1, 6), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["e"] * 5, pa.string()),
            "value": pa.array([1.0] * 5, pa.float64()),
            "props": pa.array(["{}"] * 5, pa.string()),
        }), str(tmp_path / "events.parquet"))

        got = (hourly_counts_watermark(str(tmp_path), buckets=3)
               .to_pandas())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/events.parquet')")
        import __ray_entry__ as entry
        exp = con.execute(entry.oracle_sql()["hourly_counts_watermark"]) \
                 .fetchdf()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True),
            check_dtype=False)
        assert int(got["n_late"].sum()) == 1  # exactly the straggler
