"""Wire-level conformance for the HTTP control plane (flow/http_api.py):
the reference's REST routes (`cmd/workflow/main.go:56-66`,
`pkg/spider/apis/flow.go`, `apis/action.go`) and the webhook-trigger
service (`cmd/webhook-trigger/main.go:32-70`) driven through REAL HTTP
requests against a loopback server."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from spider_ray.flow.http_api import make_server


def _req(base, method, path, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(base + path, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            body = r.read()
            return r.status, json.loads(body) if body else None
    except urllib.error.HTTPError as ex:
        body = ex.read()
        return ex.code, json.loads(body) if body else None


BASIC_FLOW = {
    "name": "basic",
    "id": "wa",
    "trigger_type": "event",
    "actions": [
        {"key": "a1", "action_id": "test-action-a",
         "config": {"test": "a"}},
        {"key": "a2", "action_id": "test-action-b", "config": {"test": "b"},
         "mapper": {"value": {"mode": "expression",
                              "value": "a1.output.value + '_updatedx1'"}}},
        {"key": "a3", "action_id": "test-action-b", "config": {"test": "c"},
         "mapper": {"value": {"mode": "expression",
                              "value": "a2.output.value + '_updatedx2'"}}},
    ],
    "peers": [
        {"parent_key": "a1", "meta_output": "triggered", "child_key": "a2"},
        {"parent_key": "a2", "meta_output": "success", "child_key": "a3"},
    ],
}


@pytest.fixture()
def server():
    srv = make_server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


class TestCrudRoutes:
    def test_healthz(self, server):
        code, _ = _req(server, "GET", "/healthz")
        assert code == 200

    def test_create_get_update_delete(self, server):
        code, flow = _req(server, "POST", "/tenants/t1/flows", BASIC_FLOW)
        assert code == 200
        assert flow["id"] == "wa" and flow["version"] == 1
        assert {a["key"] for a in flow["actions"]} == {"a1", "a2", "a3"}

        code, got = _req(server, "GET", "/tenants/t1/flows/wa")
        assert code == 200 and got == flow

        # missing name -> 400 (apis/flow.go:203-207)
        code, err = _req(server, "PUT", "/tenants/t1/flows/wa",
                         {"status": "draft"})
        assert code == 400 and "name" in err["error"]

        code, upd = _req(server, "PUT", "/tenants/t1/flows/wa",
                         {"name": "basic2", "status": "draft"})
        assert code == 200
        assert upd["name"] == "basic2" and upd["status"] == "draft"
        assert upd["version"] == flow["version"] + 1

        code, _ = _req(server, "DELETE", "/tenants/t1/flows/wa")
        assert code == 204
        code, _ = _req(server, "GET", "/tenants/t1/flows/wa")
        assert code == 404

    def test_tenant_scoping_and_pagination(self, server):
        for i in range(25):
            _req(server, "POST", "/tenants/tA/flows",
                 {"name": f"f{i}", "id": f"w{i:02d}"})
        _req(server, "POST", "/tenants/tB/flows", {"name": "other"})

        code, page1 = _req(server, "GET", "/tenants/tA/flows")
        assert code == 200 and len(page1["flows"]) == 20
        code, page2 = _req(server, "GET",
                           "/tenants/tA/flows?page=2&page_size=20")
        assert len(page2["flows"]) == 5
        # newest-first ordering, tenant isolation
        assert page1["flows"][0]["id"] == "w24"
        assert all(f["tenant_id"] == "tA" for f in page1["flows"])
        # out-of-range page_size falls back to 20 (apis/flow.go:113-116)
        code, clamped = _req(server, "GET",
                             "/tenants/tA/flows?page_size=1000")
        assert len(clamped["flows"]) == 20

    def test_action_disable_and_update(self, server):
        _req(server, "POST", "/tenants/t1/flows", BASIC_FLOW)
        code, flow = _req(
            server, "POST", "/tenants/t1/workflows/wa/actions/a2/disable")
        assert code == 200
        a2 = next(a for a in flow["actions"] if a["key"] == "a2")
        assert a2["disabled"] is True
        assert flow["version"] == 2  # mutation bumps version

        code, flow = _req(
            server, "PUT", "/tenants/t1/workflows/wa/actions/a2",
            {"disabled": False, "config": {"test": "b", "extra": "1"}})
        assert code == 200
        a2 = next(a for a in flow["actions"] if a["key"] == "a2")
        assert a2["disabled"] is False and a2["config"]["extra"] == "1"
        assert flow["version"] == 3

        code, _ = _req(
            server, "PUT", "/tenants/t1/workflows/wa/actions/zz", {})
        assert code == 404

    def test_create_requires_name_and_rejects_dup(self, server):
        code, err = _req(server, "POST", "/tenants/t1/flows", {"id": "x"})
        assert code == 400 and "name" in err["error"]
        _req(server, "POST", "/tenants/t1/flows", BASIC_FLOW)
        code, _ = _req(server, "POST", "/tenants/t1/flows", BASIC_FLOW)
        assert code == 400  # duplicate workflow id


@pytest.mark.usefixtures("ray_session")
class TestWebhookAndRun:
    def test_webhook_trigger_then_run(self, server):
        """POST /trigger wraps the value as {"value": ...} with
        meta_output="triggered" (webhook-trigger/main.go:46-62); the run
        endpoint drains the queue through FlowRuntime and returns the
        same leaves as driving the runtime directly."""
        from spider_ray.flow import FlowRuntime, FlowSpec

        _req(server, "POST", "/tenants/t1/flows", BASIC_FLOW)
        code, r = _req(server, "POST", "/trigger",
                       {"workflow_id": "wa", "key": "a1", "value": "v-0001"})
        assert code == 200 and r["status"] == "sent"

        code, res = _req(server, "POST", "/tenants/t1/flows/wa/run")
        assert code == 200
        leaves = [json.loads(row["values"]) for row in res["leaves"]]
        assert leaves == [{"value": "v-0001_updatedx1_updatedx2"}]
        assert res["errors"] == []

        # queue drained: a second run with nothing pending -> 400
        code, _ = _req(server, "POST", "/tenants/t1/flows/wa/run")
        assert code == 400

    def test_run_with_inline_triggers_matches_runtime(self, server):
        from spider_ray.flow import FlowRuntime
        from spider_ray.flow.spec import FlowSpec

        _req(server, "POST", "/tenants/t2/flows", BASIC_FLOW)
        trig = {"key": "a1", "values": {"value": "hello"}}
        code, res = _req(server, "POST", "/tenants/t2/flows/wa/run",
                         {"triggers": [trig]})
        assert code == 200

        # direct runtime reference result
        srv_spec = FlowSpec.from_json({
            "tenant_id": "t2", "flow": {"id": "wa", "name": "basic"},
            "actions": BASIC_FLOW["actions"],
            "peers": BASIC_FLOW["peers"]})
        direct = FlowRuntime(srv_spec).run(
            [{"key": "a1", "meta_output": "triggered",
              "values": json.dumps({"value": "hello"})}])
        assert [json.loads(r["values"]) for r in res["leaves"]] == \
               [json.loads(r["values"]) for r in direct["leaves"]]
        assert res["counts"]["outputs"] == len(direct["outputs"])


class TestRunFailureKeepsTriggers:
    def test_draft_run_does_not_discard_queue(self, server):
        """A failed run must NOT drain the webhook queue (ack-after-
        process): run on a draft flow -> 400, triggers preserved; after
        activation the same triggers run to completion."""
        draft = dict(BASIC_FLOW, status="draft")
        _req(server, "POST", "/tenants/t3/flows", draft)
        code, _ = _req(server, "POST", "/trigger",
                       {"workflow_id": "wa", "key": "a1", "value": "kept"})
        assert code == 200
        code, err = _req(server, "POST", "/tenants/t3/flows/wa/run")
        assert code == 400 and "active" in err["error"]
        # triggers survived the failed run: activate, then run succeeds
        code, _ = _req(server, "PUT", "/tenants/t3/flows/wa",
                       {"name": "basic", "status": "active"})
        assert code == 200
        code, res = _req(server, "POST", "/tenants/t3/flows/wa/run")
        assert code == 200
        leaves = [json.loads(row["values"]) for row in res["leaves"]]
        assert leaves == [{"value": "kept_updatedx1_updatedx2"}]
        # and the successful run acked them
        code, _ = _req(server, "POST", "/tenants/t3/flows/wa/run")
        assert code == 400
