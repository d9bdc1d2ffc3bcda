"""Engine-conformance layer (SURVEY.md §5 layer 2): the reference's
capability surface — mapper modes, $trigger alias, port routing, 1→10
fan-out, disabled filter, version bump, pagination — on the rebuild."""

import json

import pytest

from spider_ray.flow import (
    Action,
    FlowSpec,
    FlowStore,
    Mapper,
    compile_expr,
    ExprError,
)


class TestExpr:
    """Catalogue from examples/expression/main.go:65-90."""

    ENV = {
        "ctx1": {"id": "AAA", "balance": 100.0, "total_orders": 2, "active": True,
                 "devices": [{"id": "D1", "name": "iphone"}, {"id": "D2", "name": "ipad"}]},
        "success_orders": [{"User": {"ID": 1, "Username": "alice"}},
                           {"User": {"ID": 2, "Username": "bob"}}],
        "failed_order": [{"User": {"ID": 3, "Username": "eve"}}],
        "len": len,
        "get_referred_username": lambda i: f"ref_{i}",
        "test": {"a1": {"output": {"value": "kk"}}},
    }

    @pytest.mark.parametrize(
        "src,expected",
        [
            ("success_orders[0].User.Username + '_test1_' + \"_test2_\"", "alice_test1__test2_"),
            ("len(success_orders) + len(failed_order)", 3),
            ("len(failed_order)/(len(success_orders) + len(failed_order))", 1 / 3),
            ("get_referred_username(success_orders[0].User.ID)", "ref_1"),
            ("test.a1.output.value", "kk"),
            ("test.a1.output.value == ctx1.id", False),
            ("test.a1.output.value == 'll'", False),
            ("test.a1.output.value == 'kk'", True),
            ("test.a1.output.value == 'kk' || test.a1.output.value == 'll'", True),
            ("test.a1.output.value == 'kk' && test.a1.output.value == 'll'", False),
            ("(test.a1.output.value == 'kk' && test.a1.output.value == 'll') || 1 == 1 && 1 < 2", True),
            ("ctx1.devices[1].name", "ipad"),
            ("-ctx1.balance + 1.5", -98.5),
            ("!ctx1.active", False),
            ("10 % 3", 1),
            ("2 * 3 + 4", 10),
            ("2 + 3 * 4", 14),
            ("(2 + 3) * 4", 20),
            ("1 != 2", True),
            ("2 >= 2 && 1 <= 0 || true", True),
            ("nil == nil", True),
        ],
    )
    def test_catalogue(self, src, expected):
        assert compile_expr(src)(self.ENV) == expected

    @pytest.mark.parametrize("bad", ["1 +", "a .", "f(", "@", "'unterminated",
                                     "a[1", "(1"])
    def test_syntax_errors(self, bad):
        with pytest.raises(ExprError):
            compile_expr(bad)

    def test_unknown_identifier_at_eval(self):
        f = compile_expr("missing_var + 1")
        with pytest.raises(ExprError):
            f({})

    def test_compile_once_eval_many(self):
        f = compile_expr("x * 2")
        assert [f({"x": i}) for i in range(3)] == [0, 2, 4]


def _basic_spec() -> FlowSpec:
    """The examples/basic 3-node DAG (SURVEY.md §3.2) + condition + fan."""
    spec = FlowSpec(tenant_id="t1", workflow_id="wa", name="basic")
    spec.actions["a1"] = Action("a1", "test-action-a", {"test": "a"})
    spec.actions["a2"] = Action("a2", "test-action-b", {"test": "b"},
                                {"value": Mapper("expression", "a1.output.value + '_updatedx1'")})
    spec.actions["a3"] = Action("a3", "test-action-b", {"test": "c"},
                                {"value": Mapper("expression", "a2.output.value + '_updatedx2'")})
    spec.peers += [
        __import__("spider_ray.flow.spec", fromlist=["Peer"]).Peer("a1", "triggered", "a2"),
        __import__("spider_ray.flow.spec", fromlist=["Peer"]).Peer("a2", "success", "a3"),
    ]
    return spec


@pytest.mark.usefixtures("ray_session")
class TestFlowRuntime:
    def test_basic_dag_end_to_end(self):
        from spider_ray.flow import FlowRuntime

        spec = _basic_spec()
        res = FlowRuntime(spec).run(
            [{"key": "a1", "meta_output": "triggered",
              "values": json.dumps({"value": "v-0001"})}]
        )
        leaves = [json.loads(r["values"]) for r in res["leaves"]]
        assert leaves == [{"value": "v-0001_updatedx1_updatedx2"}]
        # outputs seen at every hop
        vals = sorted(json.loads(r["values"])["value"] for r in res["outputs"])
        assert vals == ["v-0001_updatedx1", "v-0001_updatedx1_updatedx2"]

    def test_trigger_alias_and_mapper_modes(self):
        from spider_ray.flow import FlowRuntime
        from spider_ray.flow.spec import Peer

        spec = FlowSpec(tenant_id="t1", workflow_id="wm")
        spec.actions["a1"] = Action("a1", "test-action-a")
        spec.actions["a2"] = Action("a2", "test-action-b", mapper={
            "fixed_f": Mapper("fixed", "const"),
            "empty_f": Mapper("expression", ""),          # empty -> ""
            "trig_f": Mapper("key", "$trigger.output.value"),
            "expr_f": Mapper("expression", "a1.output.n * 2 + 1"),
            "str_f": Mapper("expression", "builtin.string(a1.output.n)"),
        })
        spec.peers.append(Peer("a1", "triggered", "a2"))
        res = FlowRuntime(spec).run(
            [{"key": "a1", "values": json.dumps({"value": "V", "n": 20})}]
        )
        leaf = json.loads(res["leaves"][0]["values"])
        assert leaf == {"fixed_f": "const", "empty_f": "", "trig_f": "V",
                        "expr_f": 41, "str_f": "20"}

    def test_condition_ports_and_fan_out(self):
        from spider_ray.flow import FlowRuntime
        from spider_ray.flow.spec import Peer

        # a trigger event represents the *emission* of its node (the node's
        # own handler does not run — workflow.go:83-203), so the condition
        # node sits downstream of a source node
        spec = FlowSpec(tenant_id="t1", workflow_id="wc")
        spec.actions["src"] = Action("src", "test-action-a")
        spec.actions["cond"] = Action("cond", "condition-action", mapper={
            "condition": Mapper("expression", "$trigger.output.go")})
        spec.actions["fan"] = Action("fan", "fd-order-action")
        spec.actions["sink"] = Action("sink", "test-action-b", mapper={
            "value": Mapper("fixed", "no-branch")})
        spec.peers += [Peer("src", "triggered", "cond"),
                       Peer("cond", "yes", "fan"), Peer("cond", "no", "sink")]

        res_yes = FlowRuntime(spec).run(
            [{"key": "src", "meta_output": "triggered",
              "values": json.dumps({"go": True})}])
        orders = sorted(json.loads(r["values"])["order_id"] for r in res_yes["leaves"])
        assert orders == sorted(f"order@{i+1}" for i in range(10))

        res_no = FlowRuntime(spec).run(
            [{"key": "src", "meta_output": "triggered",
              "values": json.dumps({"go": False})}])
        assert [json.loads(r["values"]) for r in res_no["leaves"]] == [{"value": "no-branch"}]

    def test_disabled_node_filter(self):
        from spider_ray.flow import FlowRuntime

        spec = _basic_spec()
        spec.disable_action("a3")
        res = FlowRuntime(spec).run(
            [{"key": "a1", "values": json.dumps({"value": "x"})}])
        # a2 output has an edge to a3, but a3 is disabled -> a2's output is
        # dropped silently (reference: workflow.go:222-224); no leaves for a3
        vals = [json.loads(r["values"]) for r in res["leaves"]]
        assert vals == []
        assert len(res["outputs"]) == 1  # only a2 ran

    def test_multi_session_parallel_triggers(self):
        from spider_ray.flow import FlowRuntime

        spec = _basic_spec()
        trigs = [{"key": "a1", "values": json.dumps({"value": f"v-{i:04d}"})}
                 for i in range(20)]
        res = FlowRuntime(spec).run(trigs)
        leaves = sorted(json.loads(r["values"])["value"] for r in res["leaves"])
        assert leaves == sorted(f"v-{i:04d}_updatedx1_updatedx2" for i in range(20))
        assert len({r["session_id"] for r in res["leaves"]}) == 20
        # determinism: rerun gives identical ordering and ids
        res2 = FlowRuntime(spec).run(trigs)
        assert res2["leaves"] == res["leaves"]

    def test_scheduled_trigger_runs(self):
        """Schedule-triggered flow: each tick = one empty 'triggered'
        event (cron-trigger semantics, cmd/cron-trigger/main.go:60-65)."""
        from spider_ray.flow import FlowRuntime
        from spider_ray.flow.spec import Peer

        spec = FlowSpec(tenant_id="t1", workflow_id="ws",
                        trigger_type="schedule")
        spec.actions["cron"] = Action("cron", "cron-trigger-action")
        spec.actions["b"] = Action("b", "test-action-b", mapper={
            "value": Mapper("fixed", "tick")})
        spec.peers.append(Peer("cron", "triggered", "b"))
        res = FlowRuntime(spec).run_scheduled("cron", n_ticks=5)
        assert len(res["leaves"]) == 5
        assert all(json.loads(r["values"]) == {"value": "tick"}
                   for r in res["leaves"])
        assert len({r["session_id"] for r in res["leaves"]}) == 5

    def test_worker_error_captured(self):
        from spider_ray.flow import FlowRuntime, register_worker
        from spider_ray.flow.spec import Peer

        @register_worker("boom-action")
        def _boom(values, config):
            raise RuntimeError("boom")

        spec = FlowSpec(tenant_id="t1", workflow_id="we")
        spec.actions["a"] = Action("a", "test-action-a")
        spec.actions["b"] = Action("b", "boom-action")
        spec.peers.append(Peer("a", "triggered", "b"))
        res = FlowRuntime(spec).run([{"key": "a", "values": "{}"}])
        assert len(res["errors"]) == 1
        assert "boom" in res["errors"][0]["values"]

    def test_cycle_guard(self):
        from spider_ray.flow import FlowRuntime
        from spider_ray.flow.spec import Peer

        spec = FlowSpec(tenant_id="t1", workflow_id="wl")
        spec.actions["a"] = Action("a", "test-action-b")
        spec.peers.append(Peer("a", "success", "a"))
        with pytest.raises(RuntimeError, match="max_hops"):
            FlowRuntime(spec, max_hops=5).run(
                [{"key": "a", "meta_output": "success", "values": "{}"}])


class TestStore:
    def test_version_bump_and_crud(self):
        store = FlowStore()
        spec = _basic_spec()
        v0 = spec.version
        store.create(spec)
        spec.disable_action("a2")
        assert spec.version == v0 + 1
        spec.update_action("a2", config={"x": "1"})
        assert spec.version == v0 + 2
        spec.add_action(Action("a4", "test-action-b"))
        assert spec.version == v0 + 3
        with pytest.raises(ValueError):
            spec.add_action(Action("a4", "dup"))
        assert store.get("t1", "wa") is spec
        store.delete("t1", "wa")
        with pytest.raises(KeyError):
            store.get("t1", "wa")

    def test_tenant_scoping_and_pagination(self):
        store = FlowStore()
        for i in range(30):
            store.create(FlowSpec(tenant_id="t1", workflow_id=f"w{i:02d}"))
        store.create(FlowSpec(tenant_id="t2", workflow_id="other"))
        page1 = store.list("t1")
        assert len(page1) == 20  # default page size
        assert page1[0].workflow_id == "w29"  # newest first
        page2 = store.list("t1", page=2)
        assert len(page2) == 10
        assert store.list("t2") != [] and len(store.list("t2")) == 1
        assert len(store.list("t1", page_size=1000)) == 30  # capped at 100

    def test_fixture_f4_parses(self):
        doc = {
            "tenant_id": "t1",
            "flow": {"id": "wa", "name": "basic", "trigger_type": "event",
                     "status": "active", "version": 1},
            "actions": [
                {"key": "a1", "action_id": "test-action-a", "config": {"test": "a"}},
                {"key": "a2", "action_id": "test-action-b",
                 "mapper": {"value": {"mode": "expression",
                                      "value": "a1.output.value + '_updatedx1'"}}},
            ],
            "peers": [{"parent_key": "a1", "meta_output": "triggered",
                       "child_key": "a2"}],
        }
        spec = FlowSpec.from_json(json.dumps(doc))
        assert spec.actions["a2"].mapper["value"].mode == "expression"
        assert spec.edge_map() == {("a1", "triggered"): ["a2"]}


class TestUpdateAndStatus:
    def test_store_update_bumps_version(self):
        store = FlowStore()
        spec = _basic_spec()
        v0 = spec.version
        store.create(spec)
        got = store.update("t1", "wa", name="renamed", status="draft")
        assert got is spec
        assert spec.name == "renamed" and spec.status == "draft"
        assert spec.version == v0 + 1
        store.update("t1", "wa", trigger_type="schedule")
        assert spec.version == v0 + 2
        with pytest.raises(ValueError):
            store.update("t1", "wa", status="bogus")
        with pytest.raises(ValueError):
            store.update("t1", "wa", trigger_type="bogus")
        with pytest.raises(KeyError):
            store.update("t1", "nope", name="x")

    @pytest.mark.usefixtures("ray_session")
    def test_draft_flow_refuses_to_run(self):
        from spider_ray.flow import FlowRuntime

        spec = _basic_spec()
        spec.status = "draft"
        rt = FlowRuntime(spec)
        with pytest.raises(ValueError, match="draft"):
            rt.run([{"key": "a1", "meta_output": "triggered",
                     "values": "{}"}])
        # activating via the store makes it runnable again
        store = FlowStore()
        store.create(spec)
        store.update("t1", "wa", status="active")
        res = rt.run([{"key": "a1", "meta_output": "triggered",
                       "values": "{}"}])
        assert res["leaves"] or res["outputs"]

    def test_run_scheduled_requires_schedule_trigger(self):
        from spider_ray.flow import FlowRuntime

        spec = _basic_spec()  # trigger_type defaults to "event"
        rt = FlowRuntime(spec)
        with pytest.raises(ValueError, match="trigger_type"):
            rt.run_scheduled("a1", n_ticks=2)


class TestBangMapperConvention:
    """'!'-prefix mapper parsing from the reference's expression demo
    (examples/expression/main.go ex()): '' -> fixed "", '!e' ->
    expression, else fixed literal."""

    def test_parse_and_execute(self):
        from spider_ray.flow import parse_bang_mapper

        m = parse_bang_mapper({
            "lit": "hello", "empty": "", "count": "!a + b"})
        assert (m["lit"].mode, m["lit"].value) == ("fixed", "hello")
        assert (m["empty"].mode, m["empty"].value) == ("fixed", "")
        assert (m["count"].mode, m["count"].value) == ("expression", "a + b")
        spec = FlowSpec(tenant_id="t1", workflow_id="w")
        spec.actions["x"] = Action("x", "test-action-a", mapper=m)
        compiled = spec.compiled_mappers()["x"]
        assert compiled["lit"] == ("fixed", "hello")
        assert compiled["empty"] == ("fixed", "")
        mode, prog = compiled["count"]
        assert mode == "expr" and prog({"a": 2, "b": 3}) == 5


@pytest.mark.usefixtures("ray_session")
class TestFlowStreaming:
    """Round-3 verdict item 4: the hop loop carries the frontier as a
    Dataset; run_streaming sinks settled rows to parquet without a
    driver collect."""

    def test_streaming_matches_collected(self, tmp_path):
        import pyarrow.parquet as pq

        from spider_ray.flow import FlowRuntime

        spec = _basic_spec()
        trig = [{"key": "a1", "meta_output": "triggered",
                 "values": json.dumps({"value": f"v-{i:04d}"})}
                for i in range(50)]
        collected = FlowRuntime(spec).run(trig)
        res = FlowRuntime(spec).run_streaming(trig, str(tmp_path / "sink"))
        assert res["counts"]["leaf"] == len(collected["leaves"]) == 50
        assert res["counts"]["output"] == len(collected["outputs"])
        t = pq.read_table(res["dir"]).to_pylist()
        got = sorted(
            ((r["session_id"], r["task_id"], r["values"]) for r in t
             if r["kind"] == "leaf"))
        exp = [(r["session_id"], r["task_id"], r["values"])
               for r in collected["leaves"]]
        assert got == exp

    def test_flat_driver_rss_at_scale(self, tmp_path):
        """1e5 triggers through the fan-out worker (→ 1e6 leaves): the
        driver must not accumulate the rows (round-2 held every hop's
        row set in a take_all)."""
        import resource

        from spider_ray.flow import FlowRuntime
        from spider_ray.flow.spec import Action, FlowSpec, Mapper, Peer

        spec = FlowSpec(tenant_id="t1", workflow_id="wf", name="fan")
        spec.actions["a1"] = Action("a1", "test-action-a", {})
        spec.actions["fan"] = Action("fan", "fd-order-action", {})
        spec.peers += [Peer("a1", "triggered", "fan")]
        n = 100_000
        trig = [{"key": "a1", "meta_output": "triggered", "values": "{}"}
                for _ in range(n)]
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        res = FlowRuntime(spec).run_streaming(trig, str(tmp_path / "sink"))
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert res["counts"]["leaf"] == n * 10
        # ru_maxrss is KiB on linux; the settled rows are ~1 GB of JSON —
        # a driver that held them would blow far past this bound
        assert rss1 - rss0 < 600_000, f"driver RSS grew {rss1 - rss0} KiB"
