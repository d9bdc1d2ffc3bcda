"""Continuous daemon mode (flow/daemon.py): the reference's long-lived
broker-consumer orchestrator (`pkg/spider/workflow.go:62-81`) + cron
trigger service (`cmd/cron-trigger/main.go:38-66`) as one process — a
webhook POST alone must make the flow run, schedule flows fire per
tick, config edits apply to the next message, and poison batches drop
(at-most-once) without wedging the queue."""

import json
import threading
import time
import urllib.request

import pytest

from spider_ray.flow import FlowDaemon

from test_http_api import BASIC_FLOW, _req


def _wait(pred, timeout=30.0, step=0.02):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(step)
    return False


@pytest.fixture()
def daemon():
    d = FlowDaemon(port=0, poll_interval=0.02,
                   reconcile_interval=9999).start()  # cron via tick_scheduled
    yield d
    d.stop()


def _base(d):
    return f"http://127.0.0.1:{d.address[1]}"


@pytest.mark.usefixtures("ray_session")
class TestDaemonConsumer:
    def test_webhook_post_alone_runs_the_flow(self, daemon):
        base = _base(daemon)
        code, _ = _req(base, "POST", "/tenants/t1/flows", BASIC_FLOW)
        assert code == 200
        for i in range(3):
            code, r = _req(base, "POST", "/trigger",
                           {"workflow_id": "wa", "key": "a1",
                            "value": f"ev-{i}"})
            assert code == 200 and r["status"] == "sent"
        assert _wait(lambda: len(daemon.results.get("wa", [])) == 3)
        leaves = list(daemon.results["wa"])
        got = sorted(json.loads(r["values"])["value"] for r in leaves)
        # a1 passes through, a2 appends _updatedx1, a3 appends _updatedx2
        assert got == [f"ev-{i}_updatedx1_updatedx2" for i in range(3)]
        assert daemon.counts["leaf"] == 3 and daemon.counts["error"] == 0
        with daemon.state.lock:  # queue fully acked
            assert not daemon.state.pending

    def test_config_reconcile_applies_to_next_message(self, daemon):
        """Disable a node over HTTP between messages: the NEXT dispatch
        must see it (per-message spec re-read, workflow.go:83-99)."""
        base = _base(daemon)
        _req(base, "POST", "/tenants/t1/flows", BASIC_FLOW)
        _req(base, "POST", "/trigger",
             {"workflow_id": "wa", "key": "a1", "value": "before"})
        assert _wait(lambda: len(daemon.results.get("wa", [])) == 1)
        code, _ = _req(base, "POST",
                       "/tenants/t1/workflows/wa/actions/a2/disable")
        assert code == 200
        _req(base, "POST", "/trigger",
             {"workflow_id": "wa", "key": "a1", "value": "after"})
        assert _wait(lambda: daemon.counts["dispatches"] == 2)
        # post-disable the event dies at a2's own input (workflow.go:
        # 222-224 drop semantics) -> the second dispatch settles NO leaf
        vals = [json.loads(r["values"])["value"]
                for r in daemon.results["wa"]]
        assert vals == ["before_updatedx1_updatedx2"]
        assert daemon.counts["leaf"] == 1

    def test_draft_flow_keeps_triggers_until_activated(self, daemon):
        base = _base(daemon)
        _req(base, "POST", "/tenants/t1/flows",
             {**BASIC_FLOW, "status": "draft"})
        _req(base, "POST", "/trigger",
             {"workflow_id": "wa", "key": "a1", "value": "queued"})
        time.sleep(0.3)  # several poll cycles
        with daemon.state.lock:  # not consumed, not dropped
            assert len(daemon.state.pending.get("wa", [])) == 1
        assert daemon.counts["dispatches"] == 0
        code, _ = _req(base, "PUT", "/tenants/t1/flows/wa",
                       {"name": "basic", "status": "active"})
        assert code == 200
        assert _wait(lambda: len(daemon.results.get("wa", [])) == 1)
        assert json.loads(daemon.results["wa"][0]["values"])["value"] \
            == "queued_updatedx1_updatedx2"

    def test_poison_batch_drops_without_wedging(self):
        """A cyclic flow exceeds max_hops and raises: the batch must be
        recorded under errors and DROPPED (ack-before-process,
        messenger_worker_nats.go:108) so later messages still flow."""
        daemon = FlowDaemon(port=0, poll_interval=0.02,
                            reconcile_interval=9999, max_hops=4).start()
        try:
            self._poison_body(daemon)
        finally:
            daemon.stop()

    def _poison_body(self, daemon):
        base = _base(daemon)
        cyclic = {
            "name": "cycle", "id": "wc", "trigger_type": "event",
            "actions": [{"key": "a1", "action_id": "test-action-a"}],
            "peers": [{"parent_key": "a1", "meta_output": "triggered",
                       "child_key": "a1"}],
        }
        _req(base, "POST", "/tenants/t1/flows", cyclic)
        _req(base, "POST", "/trigger",
             {"workflow_id": "wc", "key": "a1", "value": "poison"})
        assert _wait(lambda: daemon.errors)
        assert daemon.errors[0]["workflow_id"] == "wc"
        with daemon.state.lock:
            assert not daemon.state.pending.get("wc")
        # the daemon still serves healthy flows afterwards
        _req(base, "POST", "/tenants/t1/flows", BASIC_FLOW)
        _req(base, "POST", "/trigger",
             {"workflow_id": "wa", "key": "a1", "value": "alive"})
        assert _wait(lambda: daemon.results.get("wa"))


# a schedule flow with FIXED mappers: the cron tick fires the root with
# empty values "{}" (cron-trigger/main.go:60-65), so expression mappers
# over trigger fields would $error — the run_scheduled test's shape
SCHED_FLOW = {
    "name": "sched", "id": "ws", "trigger_type": "schedule",
    "actions": [
        {"key": "cron", "action_id": "test-action-a"},
        {"key": "b", "action_id": "test-action-b",
         "mapper": {"value": {"mode": "fixed", "value": "tick"}}},
    ],
    "peers": [{"parent_key": "cron", "meta_output": "triggered",
               "child_key": "b"}],
}


@pytest.mark.usefixtures("ray_session")
class TestDaemonCron:
    def test_tick_fires_schedule_flows_only(self, daemon):
        base = _base(daemon)
        _req(base, "POST", "/tenants/t1/flows", SCHED_FLOW)       # fires
        _req(base, "POST", "/tenants/t1/flows", BASIC_FLOW)       # event: no
        _req(base, "POST", "/tenants/t1/flows",
             {**SCHED_FLOW, "id": "wd", "status": "draft"})       # draft: no
        assert daemon.tick_scheduled() == 1
        assert daemon.counts["scheduled_runs"] == 1
        assert len(daemon.results.get("ws", [])) == 1
        assert json.loads(daemon.results["ws"][0]["values"]) \
            == {"value": "tick"}
        assert "wa" not in daemon.results and "wd" not in daemon.results
        # two ticks = two runs (the 10s ticker re-fires each reconcile)
        assert daemon.tick_scheduled() == 1
        assert len(daemon.results["ws"]) == 2

    def test_http_and_scheduled_coexist(self, daemon):
        """A schedule flow still accepts webhook triggers through the
        same consumer (the reference runs both trigger services against
        one orchestrator)."""
        base = _base(daemon)
        _req(base, "POST", "/tenants/t1/flows", SCHED_FLOW)
        daemon.tick_scheduled()
        _req(base, "POST", "/trigger",
             {"workflow_id": "ws", "key": "cron", "value": "web"})
        assert _wait(lambda: len(daemon.results.get("ws", [])) == 2)
        vals = sorted(json.loads(r["values"])["value"]
                      for r in daemon.results["ws"])
        assert vals == ["tick", "tick"]  # b's fixed mapper wins both paths


@pytest.mark.usefixtures("ray_session")
class TestDaemonDurability:
    """state_dir: flows snapshot + trigger journal + ack journal — the
    reference's Mongo-flows + JetStream-messages durability.  A daemon
    restart on the same dir keeps every flow and replays exactly the
    unconsumed messages (ack-at-take, so at-most-once holds across the
    restart boundary)."""

    def test_restart_keeps_flows_and_replays_unconsumed(self, tmp_path):
        sd = str(tmp_path / "flowd-state")
        # phase 1: queue triggers with the consumer effectively OFF
        # (huge poll interval), so nothing is acked before the "crash"
        d1 = FlowDaemon(port=0, poll_interval=9999,
                        reconcile_interval=9999, state_dir=sd).start()
        try:
            base = _base(d1)
            code, _ = _req(base, "POST", "/tenants/t1/flows", BASIC_FLOW)
            assert code == 200
            for i in range(3):
                _req(base, "POST", "/trigger",
                     {"workflow_id": "wa", "key": "a1", "value": f"r-{i}"})
        finally:
            d1.stop()  # hard stop with 3 unconsumed messages journaled

        # phase 2: a NEW daemon on the same dir — flow present, the 3
        # messages replay, and the flow runs to its leaves
        d2 = FlowDaemon(port=0, poll_interval=0.02,
                        reconcile_interval=9999, state_dir=sd).start()
        try:
            base = _base(d2)
            code, listing = _req(base, "GET", "/tenants/t1/flows")
            assert code == 200
            assert [f["id"] for f in listing["flows"]] == ["wa"]
            assert _wait(lambda: len(d2.results.get("wa", [])) == 3)
            got = sorted(json.loads(r["values"])["value"]
                         for r in d2.results["wa"])
            assert got == [f"r-{i}_updatedx1_updatedx2" for i in range(3)]
        finally:
            d2.stop()

        # phase 3: consumed messages were acked — a third daemon must
        # NOT replay them (at-most-once across restarts)
        d3 = FlowDaemon(port=0, poll_interval=0.02,
                        reconcile_interval=9999, state_dir=sd).start()
        try:
            time.sleep(0.3)
            with d3.state.lock:
                assert not d3.state.pending
            assert d3.counts["dispatches"] == 0
        finally:
            d3.stop()

    def test_mutations_survive_restart(self, tmp_path):
        sd = str(tmp_path / "flowd-state2")
        d1 = FlowDaemon(port=0, poll_interval=9999,
                        reconcile_interval=9999, state_dir=sd).start()
        try:
            base = _base(d1)
            _req(base, "POST", "/tenants/t1/flows", BASIC_FLOW)
            code, _ = _req(base, "POST",
                           "/tenants/t1/workflows/wa/actions/a2/disable")
            assert code == 200
        finally:
            d1.stop()
        d2 = FlowDaemon(port=0, poll_interval=0.02,
                        reconcile_interval=9999, state_dir=sd).start()
        try:
            base = _base(d2)
            code, flow = _req(base, "GET", "/tenants/t1/flows/wa")
            assert code == 200
            a2 = next(a for a in flow["actions"] if a["key"] == "a2")
            assert a2["disabled"] is True
            assert flow["version"] >= 2  # the bump persisted too
            # and the disabled node still drops events post-restart
            _req(base, "POST", "/trigger",
                 {"workflow_id": "wa", "key": "a1", "value": "x"})
            assert _wait(lambda: d2.counts["dispatches"] == 1)
            assert len(d2.results.get("wa", [])) == 0  # died at a2
        finally:
            d2.stop()

    def test_snapshot_survives_concurrent_mutations_and_stop(self, tmp_path):
        """Regression: the per-mutation snapshot hook fires on the HTTP
        handler thread AFTER the response is sent, so mutations racing
        each other — and stop()'s final snapshot racing the last
        mutation's hook — used to interleave writes into the same
        flows.json.tmp and could corrupt the snapshot a restart loads.
        Hammer concurrent mutations, stop mid-flight, and require the
        reloaded state to be valid and final."""
        sd = str(tmp_path / "flowd-state3")
        d1 = FlowDaemon(port=0, poll_interval=9999,
                        reconcile_interval=9999, state_dir=sd).start()
        base = _base(d1)
        _req(base, "POST", "/tenants/t1/flows", BASIC_FLOW)

        stop_err = []

        def flip(i):
            try:
                for k in range(8):
                    if (i + k) % 2 == 0:
                        code, _ = _req(
                            base, "POST",
                            "/tenants/t1/workflows/wa/actions/a2/disable")
                    else:  # re-enable = PUT {"disabled": false}
                        code, _ = _req(
                            base, "PUT",
                            "/tenants/t1/workflows/wa/actions/a2",
                            {"disabled": False})
                    assert code == 200, code
            except Exception as ex:  # server may be stopping under us
                stop_err.append(ex)

        threads = [threading.Thread(target=flip, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # ground truth = the live store right before stop (no-op
        # enable/enable mutations don't bump the version, so the final
        # count depends on interleaving — compare state, not arithmetic)
        code, truth = _req(base, "GET", "/tenants/t1/flows/wa")
        assert code == 200
        d1.stop()  # final snapshot races nothing now, but hooks may lag

        # the snapshot must ALWAYS be parseable and reflect the final
        # store exactly
        with open(f"{sd}/flows.json") as f:
            docs = json.load(f)
        assert [d["flow"]["id"] for d in docs] == ["wa"]
        d2 = FlowDaemon(port=0, poll_interval=0.02,
                        reconcile_interval=9999, state_dir=sd).start()
        try:
            code, flow = _req(_base(d2), "GET", "/tenants/t1/flows/wa")
            assert code == 200
            assert flow["version"] == truth["version"]
            assert ({a["key"]: a["disabled"] for a in flow["actions"]} ==
                    {a["key"]: a["disabled"] for a in truth["actions"]})
        finally:
            d2.stop()


@pytest.mark.usefixtures("ray_session")
class TestDaemonReviewRegressions:
    """Round-4 review fixes: at-most-once /run vs the drain thread,
    cross-tenant id resolution, discard-old queue retention."""

    def test_run_claims_at_take_when_consumer_attached(self):
        # slow poll: the consumer thread can't race this test's /run
        d = FlowDaemon(port=0, poll_interval=9999,
                       reconcile_interval=9999).start()
        try:
            base = _base(d)
            assert _req(base, "POST", "/tenants/t1/flows",
                        BASIC_FLOW)[0] == 200
            _req(base, "POST", "/trigger",
                 {"workflow_id": "wa", "key": "a1", "value": "x"})
            code, r = _req(base, "POST", "/tenants/t1/flows/wa/run", {})
            assert code == 200 and len(r["leaves"]) == 1
            with d.state.lock:  # claimed at take: nothing left for the
                assert not d.state.pending  # drain thread to run AGAIN
        finally:
            d.stop()

    def test_run_failed_claim_is_at_most_once_under_daemon(self):
        d = FlowDaemon(port=0, poll_interval=9999,
                       reconcile_interval=9999).start()
        try:
            base = _base(d)
            assert _req(base, "POST", "/tenants/t1/flows",
                        {**BASIC_FLOW, "status": "draft"})[0] == 200
            _req(base, "POST", "/trigger",
                 {"workflow_id": "wa", "key": "a1", "value": "x"})
            code, _ = _req(base, "POST", "/tenants/t1/flows/wa/run", {})
            assert code == 400  # draft flow refuses to run
            with d.state.lock:  # broker discipline: claimed = consumed
                assert not d.state.pending  # even though the run failed
        finally:
            d.stop()

    def test_find_never_resolves_across_tenants_ambiguously(self):
        from spider_ray.flow.spec import FlowSpec, FlowStore

        def _spec(tenant, status):
            return FlowSpec.from_json({
                "tenant_id": tenant,
                "flow": {"id": "wa", "status": status}})

        store = FlowStore()
        a = _spec("tA", "draft")
        store.create(a)
        b = _spec("tB", "active")
        store.create(b)
        # duplicate id across tenants: the unique ACTIVE one resolves
        # (insertion-order first-match would return tA's draft and
        # wedge tB's triggers forever)
        assert store.find("wa") is b
        a.status = "active"
        assert store.find("wa") is None  # two actives: unresolvable

    def test_run_never_claims_another_tenants_queue(self):
        d = FlowDaemon(port=0, poll_interval=9999,
                       reconcile_interval=9999).start()
        try:
            base = _base(d)
            assert _req(base, "POST", "/tenants/tA/flows",
                        {**BASIC_FLOW, "status": "draft"})[0] == 200
            assert _req(base, "POST", "/tenants/tB/flows",
                        BASIC_FLOW)[0] == 200  # active, same id "wa"
            _req(base, "POST", "/trigger",
                 {"workflow_id": "wa", "key": "a1", "value": "x"})
            # tA's draft is NOT the queue's resolvable consumer
            # (find routes "wa" to tB's active flow): its /run must not
            # claim-and-destroy tB's message
            code, _ = _req(base, "POST", "/tenants/tA/flows/wa/run", {})
            assert code == 400
            with d.state.lock:
                assert len(d.state.pending.get("wa", [])) == 1
            # the rightful consumer drains it
            code, r = _req(base, "POST", "/tenants/tB/flows/wa/run", {})
            assert code == 200 and len(r["leaves"]) == 1
            with d.state.lock:
                assert not d.state.pending
        finally:
            d.stop()

    def test_trigger_queue_discards_old_at_cap(self):
        d = FlowDaemon(port=0, poll_interval=9999,
                       reconcile_interval=9999).start()
        try:
            base = _base(d)
            d.state.pending_cap = 5
            for i in range(8):  # unknown flow: pure dead-letter queue
                _req(base, "POST", "/trigger",
                     {"workflow_id": "nope", "key": "k", "value": i})
            with d.state.lock:
                q = d.state.pending["nope"]
                assert len(q) == 5  # bounded (JetStream discard-old)
                kept = [m["values"]["value"] for m in q]
                assert kept == [3, 4, 5, 6, 7]  # oldest discarded
        finally:
            d.stop()
