"""Wire-level HTTP control plane for the flow engine.

The reference exposes its flow CRUD + action mutations as REST routes
(`cmd/workflow/main.go:56-66`) and runs a separate webhook-trigger
service (`cmd/webhook-trigger/main.go:32-70`) that turns an HTTP POST
into a trigger message for the orchestrator.  This module is that wire
surface over the Python control plane (`FlowStore` / `FlowRuntime`),
built on the stdlib ``http.server`` only — no web framework, no
external network; it binds a local interface and is driven by tests
through real HTTP requests.

Routes (same paths, verbs and status codes as the reference):

  GET    /healthz
  GET    /tenants/{t}/flows?page=&page_size=
  GET    /tenants/{t}/flows/{id}
  POST   /tenants/{t}/flows
  PUT    /tenants/{t}/flows/{id}
  DELETE /tenants/{t}/flows/{id}
  POST   /tenants/{t}/workflows/{wf}/actions/{key}/disable
  PUT    /tenants/{t}/workflows/{wf}/actions/{key}
  POST   /trigger                      (webhook-trigger service surface)
  POST   /tenants/{t}/flows/{id}/run   (graft addition: drain queued
         triggers + run the flow via FlowRuntime; the reference runs
         its orchestrator as a broker consumer instead — this endpoint
         is the sandbox's synchronous stand-in for that consumer)

The control plane is message-shaped (JSON rows, one request per
mutation) — per-request Python is the right tool here; the data plane
stays in Ray Data.
"""

from __future__ import annotations

import json
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

from .spec import (Action, FlowSpec, FlowStore, Mapper, Peer,
                   triggers_from_messages)


def spec_to_json(spec: FlowSpec) -> dict:
    """Serialize a FlowSpec the way the reference returns flows
    (`pkg/spider/apis/model.go`): flow fields + actions + peers."""
    return {
        "id": spec.workflow_id,
        "tenant_id": spec.tenant_id,
        "name": spec.name,
        "trigger_type": spec.trigger_type,
        "status": spec.status,
        "version": spec.version,
        "actions": [
            {
                "key": a.key,
                "action_id": a.action_id,
                "config": dict(a.config),
                "mapper": {f: {"mode": m.mode, "value": m.value}
                           for f, m in a.mapper.items()},
                "disabled": a.disabled,
            }
            for a in spec.actions.values()
        ],
        "peers": [
            {"parent_key": p.parent_key, "meta_output": p.meta_output,
             "child_key": p.child_key}
            for p in spec.peers
        ],
    }


def _parse_actions(payload: list[dict]) -> list[Action]:
    out = []
    for a in payload or []:
        out.append(Action(
            key=a["key"],
            action_id=a["action_id"],
            config=dict(a.get("config") or {}),
            mapper={f: Mapper(m["mode"], m["value"])
                    for f, m in (a.get("mapper") or {}).items()},
            disabled=bool(a.get("disabled", False)),
        ))
    return out


class _ApiState:
    """Shared state behind the handler: the store, the webhook trigger
    queue (the graft's stand-in for the reference's broker topic) and a
    lock — ThreadingHTTPServer handles each request on its own thread."""

    def __init__(self, store: FlowStore):
        self.store = store
        self.lock = threading.RLock()
        # workflow_id -> pending trigger messages (reference: the
        # webhook publishes TriggerMessage{WorkflowID, Key, Values,
        # MetaOutput:"triggered"} to the broker)
        self.pending: dict[str, list[dict]] = {}
        # durability hooks (set by FlowDaemon when state_dir is on —
        # the reference persists flows in Mongo and messages in
        # JetStream; these are that surface):
        #   on_store_change()        after any flow/action mutation
        #   on_trigger(msg)          after a trigger message enqueues
        #   on_consume(msgs)         after a consumer takes messages
        self.on_store_change = None
        self.on_trigger = None
        self.on_consume = None
        self.msg_seq = 0  # stamped into messages as msg_id (ack identity)
        # True while a FlowDaemon consumer thread competes for the
        # queue: POST .../run must then TAKE messages at-most-once
        # (claim under the lock before running) or the same message
        # runs twice — once here, once in the daemon's drain
        self.consumer_attached = False
        # per-workflow queue bound, discard-OLD on overflow — the
        # reference's JetStream retention (memory storage, DiscardOld,
        # pkg/spider/nats.go:149-159); discarded messages are acked in
        # the journal so a restart never resurrects them
        self.pending_cap = 10_000


_ROUTES = [
    ("GET", re.compile(r"^/healthz$"), "healthz"),
    ("GET", re.compile(r"^/tenants/([^/]+)/flows$"), "list_flows"),
    ("POST", re.compile(r"^/tenants/([^/]+)/flows$"), "create_flow"),
    ("GET", re.compile(r"^/tenants/([^/]+)/flows/([^/]+)$"), "get_flow"),
    ("PUT", re.compile(r"^/tenants/([^/]+)/flows/([^/]+)$"), "update_flow"),
    ("DELETE", re.compile(r"^/tenants/([^/]+)/flows/([^/]+)$"), "delete_flow"),
    ("POST", re.compile(
        r"^/tenants/([^/]+)/workflows/([^/]+)/actions/([^/]+)/disable$"),
     "disable_action"),
    ("PUT", re.compile(
        r"^/tenants/([^/]+)/workflows/([^/]+)/actions/([^/]+)$"),
     "update_action"),
    ("POST", re.compile(r"^/trigger$"), "webhook_trigger"),
    ("POST", re.compile(r"^/tenants/([^/]+)/flows/([^/]+)/run$"), "run_flow"),
]


class _Handler(BaseHTTPRequestHandler):
    state: _ApiState  # injected by make_server

    # ---- plumbing --------------------------------------------------------
    def log_message(self, fmt, *args):  # silence per-request stderr noise
        pass

    def _json(self, code: int, obj) -> None:
        self._last_status = code
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _empty(self, code: int) -> None:
        self._last_status = code
        self.send_response(code)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if n == 0:
            return {}
        return json.loads(self.rfile.read(n).decode())

    def _dispatch(self, verb: str) -> None:
        split = urlsplit(self.path)
        for m_verb, pat, name in _ROUTES:
            if m_verb != verb:
                continue
            m = pat.match(split.path)
            if m:
                try:
                    getattr(self, name)(*m.groups(),
                                        query=parse_qs(split.query))
                except KeyError:
                    self._json(404, {"error": "not found"})
                except (ValueError, json.JSONDecodeError) as ex:
                    self._json(400, {"error": str(ex)})
                if (verb != "GET" and self.state.on_store_change
                        and name not in ("webhook_trigger", "run_flow")
                        and 200 <= getattr(self, "_last_status", 0) < 300):
                    # SUCCESSFUL flow/action mutation -> durable
                    # snapshot (tiny control-plane data; snapshot-per-
                    # change, atomic rename — the reference saves per
                    # mutation too).  A 4xx left the store unchanged:
                    # snapshotting it would only burn a write.  The
                    # snapshot runs after the response — a hard kill in
                    # that window loses only this snapshot, never the
                    # journals (which write under the lock BEFORE the
                    # response); stop() takes a final snapshot.
                    self.state.on_store_change()
                return
        self._json(404, {"error": "no route"})

    def do_GET(self):
        self._dispatch("GET")

    def do_POST(self):
        self._dispatch("POST")

    def do_PUT(self):
        self._dispatch("PUT")

    def do_DELETE(self):
        self._dispatch("DELETE")

    # ---- handlers (apis/flow.go + apis/action.go semantics) --------------
    def healthz(self, query=None):
        self._empty(200)

    def list_flows(self, tenant_id: str, query=None):
        # page >= 1, page_size clamped to [1, 100] default 20
        # (apis/flow.go:109-117)
        def qint(key, default):
            try:
                return int((query or {}).get(key, [default])[0])
            except ValueError:
                return default
        page = max(1, qint("page", 1))
        page_size = qint("page_size", 20)
        if page_size < 1 or page_size > 100:
            page_size = 20
        with self.state.lock:
            flows = self.state.store.list(tenant_id, page, page_size)
            self._json(200, {"flows": [spec_to_json(s) for s in flows],
                             "page": page, "page_size": page_size})

    def create_flow(self, tenant_id: str, query=None):
        p = self._body()
        if not p.get("name"):
            self._json(400, {"error": "name is required"})
            return
        spec = FlowSpec(
            tenant_id=tenant_id,
            workflow_id=p.get("id") or uuid.uuid4().hex,
            name=p["name"],
            trigger_type=p.get("trigger_type", "event"),
            status=p.get("status", "active"),
        )
        # bulk create does NOT bump the version per element (the
        # reference inserts the documents in one transaction)
        for a in _parse_actions(p.get("actions")):
            if a.key in spec.actions:
                self._json(400, {"error": f"duplicate action key {a.key!r}"})
                return
            spec.actions[a.key] = a
        for pe in p.get("peers") or []:
            spec.peers.append(Peer(pe["parent_key"], pe["meta_output"],
                                   pe["child_key"]))
        with self.state.lock:
            self.state.store.create(spec)
        self._json(200, spec_to_json(spec))

    def get_flow(self, tenant_id: str, flow_id: str, query=None):
        with self.state.lock:
            spec = self.state.store.get(tenant_id, flow_id)
            self._json(200, spec_to_json(spec))

    def update_flow(self, tenant_id: str, flow_id: str, query=None):
        p = self._body()
        if not p.get("name"):
            self._json(400, {"error": "name is required"})
            return
        with self.state.lock:
            spec = self.state.store.update(
                tenant_id, flow_id, name=p["name"],
                trigger_type=p.get("trigger_type"),
                status=p.get("status"))
            self._json(200, spec_to_json(spec))

    def delete_flow(self, tenant_id: str, flow_id: str, query=None):
        with self.state.lock:
            self.state.store.delete(tenant_id, flow_id)
        self._empty(204)

    def disable_action(self, tenant_id: str, workflow_id: str, key: str,
                       query=None):
        with self.state.lock:
            spec = self.state.store.get(tenant_id, workflow_id)
            spec.disable_action(key, True)
            self._json(200, spec_to_json(spec))

    def update_action(self, tenant_id: str, workflow_id: str, key: str,
                      query=None):
        p = self._body()
        changes = {}
        if "config" in p:
            changes["config"] = dict(p["config"] or {})
        if "mapper" in p:
            changes["mapper"] = {f: Mapper(m["mode"], m["value"])
                                 for f, m in (p["mapper"] or {}).items()}
        if "disabled" in p:
            changes["disabled"] = bool(p["disabled"])
        if "action_id" in p:
            changes["action_id"] = p["action_id"]
        with self.state.lock:
            spec = self.state.store.get(tenant_id, workflow_id)
            spec.update_action(key, **changes)
            self._json(200, spec_to_json(spec))

    def webhook_trigger(self, query=None):
        """`cmd/webhook-trigger/main.go:32-70`: wrap the posted value as
        {"value": ...}, enqueue a trigger message with
        meta_output="triggered" for the orchestrator."""
        p = self._body()
        msg = {
            "workflow_id": p.get("workflow_id", ""),
            "key": p.get("key", ""),
            "meta_output": "triggered",
            "values": {"value": p.get("value")},
        }
        with self.state.lock:
            self.state.msg_seq += 1
            msg["msg_id"] = self.state.msg_seq
            q = self.state.pending.setdefault(msg["workflow_id"], [])
            q.append(msg)
            if self.state.on_trigger:  # journal inside the lock: the
                self.state.on_trigger(msg)  # log order IS queue order
            if len(q) > self.state.pending_cap:
                # discard-old retention (JetStream DiscardOld,
                # nats.go:149-159): a dead-letter flood for a draft or
                # unknown flow must not grow the daemon without bound.
                # Discards are acked so a restart never replays them.
                dropped = q[:len(q) - self.state.pending_cap]
                del q[:len(q) - self.state.pending_cap]
                if self.state.on_consume:
                    self.state.on_consume(dropped)
        self._json(200, {"status": "sent"})

    def run_flow(self, tenant_id: str, flow_id: str, query=None):
        """Drain this flow's queued webhook triggers (plus any triggers
        in the request body) and run the flow through FlowRuntime — the
        synchronous stand-in for the reference's broker-consumer
        orchestrator loop."""
        from .runtime import FlowRuntime

        p = self._body()
        # Two take disciplines, matched to who else is consuming:
        #   * standalone server (no daemon): PEEK, run, ack-after-
        #     process — a failed run (draft flow, max-hops guard) keeps
        #     its queued triggers for an interactive retry;
        #   * daemon attached: CLAIM at take under the lock (remove +
        #     durable ack before running) — the broker's at-most-once
        #     discipline, because peeking while the drain thread also
        #     dispatches would run the same message TWICE (here and in
        #     the daemon), which is worse than a lost message under the
        #     reference's own delivery contract.
        with self.state.lock:
            spec = self.state.store.get(tenant_id, flow_id)
            claimed = self.state.consumer_attached
            if claimed:
                # claim ONLY if this spec is the queue's resolvable
                # consumer: with duplicate ids across tenants, popping
                # by flow_id alone would destroy (ack-without-running)
                # messages FlowStore.find routes to ANOTHER tenant's
                # flow — e.g. a draft claiming an active flow's queue
                if self.state.store.find(flow_id) is spec:
                    queued = self.state.pending.pop(flow_id, [])
                    if queued and self.state.on_consume:
                        self.state.on_consume(queued)  # ack at take
                else:
                    queued = []  # another consumer's messages: hands off
            else:
                queued = list(self.state.pending.get(flow_id, []))

        triggers = triggers_from_messages(queued)
        triggers += triggers_from_messages(p.get("triggers", []))
        if not triggers:
            self._json(400, {"error": "no triggers queued or provided"})
            return
        try:
            result = FlowRuntime(spec).run(triggers)
        except (ValueError, RuntimeError) as ex:
            # claimed messages are gone (at-most-once); peeked ones kept
            self._json(400, {"error": str(ex)})
            return
        if not claimed:
            with self.state.lock:
                # ack by IDENTITY: drop exactly the messages this run
                # consumed.  A positional pop (rest[len(queued):]) is
                # wrong if anything raced this run — a front-slice would
                # discard later messages that were never run.
                taken = {id(m) for m in queued}
                rest = [m for m in self.state.pending.get(flow_id, [])
                        if id(m) not in taken]
                if rest:
                    self.state.pending[flow_id] = rest
                else:
                    self.state.pending.pop(flow_id, None)
                if self.state.on_consume:  # durable ack (replay skip)
                    self.state.on_consume(queued)
        self._json(200, {"counts": {k: len(v) for k, v in result.items()},
                         "leaves": result["leaves"],
                         "errors": result["errors"]})


def make_server(store: FlowStore | None = None,
                host: str = "127.0.0.1", port: int = 0):
    """Build a ThreadingHTTPServer bound to (host, port); port 0 picks an
    ephemeral port (server.server_address[1]).  Caller owns the thread:

        srv = make_server()
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        ...
        srv.shutdown()
    """
    state = _ApiState(store or FlowStore())
    handler = type("Handler", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer((host, port), handler)
    srv.api_state = state  # type: ignore[attr-defined]
    return srv


def serve(store: FlowStore | None = None, host: str = "127.0.0.1",
          port: int = 8080):
    """Blocking entry point (the `cmd/workflow` analogue)."""
    srv = make_server(store, host, port)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
