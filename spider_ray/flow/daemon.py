"""Continuous daemon mode: the long-lived orchestrator loop.

The reference runs its orchestrator as long-lived NATS queue listeners
(`pkg/spider/workflow.go:62-81`: subscribe once, then every received
TriggerMessage drives one dispatch) beside a cron-trigger service that
scans schedule-type flows on a fixed ticker and fires their trigger
node (`cmd/cron-trigger/main.go:38-66`, 10 s reconcile re-read).  The
rebuild's control plane so far was request/response only: POST /trigger
queued a message and a later POST .../run drained it.  FlowDaemon is
the missing consumer: it owns the HTTP control plane (make_server) plus
one background consumer thread, so a webhook POST alone makes the flow
run — no explicit /run call — and schedule-type active flows fire once
per reconcile tick.

Semantics, matched to the reference:

- **Config reconcile per dispatch**: the spec is re-read from the store
  at every dispatch (the reference resolves the workflow document per
  message, workflow.go:83-99), so action disables / mapper edits /
  status flips apply to the NEXT message with no restart.
- **Draft gating keeps messages**: triggers for a draft (or missing)
  flow stay queued — the broker analogue of no consumer bound yet.
- **At-most-once on poison messages**: a trigger batch whose run raises
  is dropped and recorded under `errors` — the reference acks before
  processing (`pkg/spider/messenger_worker_nats.go:108`), so a failing
  message never wedges the queue.  (The synchronous /run endpoint keeps
  its stricter ack-after-process contract for interactive use.)
- **Cron ticks are counted, not wall-clock**: `tick_scheduled()` fires
  every schedule-type active flow's root node(s) once; the daemon's
  ticker calls it every `reconcile_interval` seconds, and tests call it
  directly for determinism (same rule as FlowRuntime.run_scheduled).

Scale note: this is control-plane code — message-shaped rows, one
consumer thread.  Each dispatch still executes as Ray Data hops, so a
single POST carrying 10^5 triggers parallelizes across the cluster;
the daemon thread only moves queue references and settled-row counts.
"""

from __future__ import annotations

import json
import os
import threading
from collections import deque

from .http_api import make_server
from .runtime import FlowRuntime
from .spec import FlowStore, triggers_from_messages


class FlowDaemon:
    """HTTP control plane + continuous trigger consumer + cron ticker.

    Usage::

        d = FlowDaemon(port=0)          # ephemeral port
        d.start()
        ... POST flows / POST /trigger against d.address ...
        d.stop()                        # graceful: drains in-flight run

    `results[workflow_id]` holds the most recent settled leaf rows
    (bounded deque), `counts` the cumulative kind totals, `errors` the
    dropped poison batches — the observable surface tests assert on.
    """

    def __init__(self, store: FlowStore | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 poll_interval: float = 0.05,
                 reconcile_interval: float = 10.0,
                 results_cap: int = 1000, max_hops: int = 32,
                 state_dir: str | None = None):
        self.srv = make_server(store, host, port)
        self.state = self.srv.api_state  # type: ignore[attr-defined]
        self.store: FlowStore = self.state.store
        self.poll_interval = poll_interval
        self.reconcile_interval = reconcile_interval
        self.results: dict[str, deque] = {}
        self.results_cap = results_cap
        self.max_hops = max_hops
        self.counts: dict[str, int] = {"output": 0, "leaf": 0, "error": 0,
                                       "dispatches": 0, "scheduled_runs": 0}
        # bounded like results: a continuous poison stream in a process
        # designed to run until SIGTERM must not leak memory
        self.errors: deque = deque(maxlen=results_cap)
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._dispatch_lock = threading.Lock()  # one run at a time
        # serializes snapshot writers: the per-mutation hook fires on
        # the HTTP handler thread AFTER the response is sent, so a
        # stop() (or a second mutation) can call _snapshot_flows
        # concurrently — both write the same flows.json.tmp and an
        # interleaved write corrupts the snapshot a restart then loads
        self._snap_lock = threading.Lock()
        # ---- durability (the reference persists flows in Mongo and
        # trigger messages in JetStream; state_dir is that surface) ----
        self.state_dir = state_dir
        self._trig_f = self._ack_f = None
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._load_state()
            self._trig_f = open(os.path.join(state_dir, "triggers.jsonl"),
                                "a", buffering=1)
            self._ack_f = open(os.path.join(state_dir, "acks.jsonl"),
                               "a", buffering=1)
            self.state.on_store_change = self._snapshot_flows
            self.state.on_trigger = self._journal_trigger
            self.state.on_consume = self._journal_ack

    # ------------------------------------------------------------- control
    @property
    def address(self) -> tuple[str, int]:
        return self.srv.server_address  # (host, port)

    def start(self) -> "FlowDaemon":
        # POST .../run must switch to claim-at-take while this consumer
        # competes for the queue (see run_flow) — else double execution
        self.state.consumer_attached = True
        t_http = threading.Thread(target=self.srv.serve_forever,
                                  name="flowd-http", daemon=True)
        t_consume = threading.Thread(target=self._consume_loop,
                                     name="flowd-consume", daemon=True)
        t_cron = threading.Thread(target=self._cron_loop,
                                  name="flowd-cron", daemon=True)
        self._threads = [t_http, t_consume, t_cron]
        for t in self._threads:
            t.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self.srv.shutdown()
        for t in self._threads[1:]:  # http thread exits with shutdown()
            t.join(timeout=30)
        self.srv.server_close()
        if self.state_dir:
            # final snapshot: the per-mutation snapshot hook runs AFTER
            # the HTTP response is sent, so a stop() racing the last
            # mutation's handler thread could otherwise persist a stale
            # store (journals don't race — they write under the lock
            # before the response)
            self._snapshot_flows()
        # journal writes happen under state.lock (before the response);
        # closing under the same lock means a late in-flight handler
        # can't hit a closed file
        with self.state.lock:
            for f in (self._trig_f, self._ack_f):
                if f is not None:
                    f.close()

    # ---------------------------------------------------------- durability
    def _snapshot_flows(self) -> None:
        """Atomic full snapshot of every flow (F4 doc format, the same
        shape FlowSpec.from_json parses).  Flows are tiny control-plane
        data — snapshot-per-mutation like the reference's Mongo save."""
        from .http_api import spec_to_json

        # _snap_lock covers read AND write: serializing only the file
        # write would let a writer holding a stale store read overwrite
        # a newer snapshot (lock order: _snap_lock -> state.lock; no
        # path takes them in the other order)
        with self._snap_lock:
            with self.state.lock:
                docs = []
                for spec in self.store.all():
                    j = spec_to_json(spec)
                    docs.append({"tenant_id": spec.tenant_id,
                                 "flow": {k: j[k] for k in
                                          ("id", "name", "trigger_type",
                                           "status", "version")},
                                 "actions": j["actions"], "peers": j["peers"]})
            path = os.path.join(self.state_dir, "flows.json")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(docs, f)
            os.replace(tmp, path)

    def _journal_trigger(self, msg: dict) -> None:
        # closed-file guard: shutdown() does not join in-flight handler
        # threads, so a request racing stop() may journal after close —
        # dropping its record is fine (the daemon is stopping; the
        # message won't be consumed either, so at-most-once holds)
        if self._trig_f is not None and not self._trig_f.closed:
            self._trig_f.write(json.dumps(msg) + "\n")

    def _journal_ack(self, msgs: list[dict]) -> None:
        ids = [m["msg_id"] for m in msgs if m.get("msg_id") is not None]
        if ids and self._ack_f is not None and not self._ack_f.closed:
            self._ack_f.write(json.dumps(ids) + "\n")

    def _load_state(self) -> None:
        """Rebuild flows + unconsumed trigger queue from state_dir: the
        broker-durability contract — a daemon restart keeps every flow
        and replays exactly the messages no consumer acked (ack records
        are written at take time, so at-most-once is preserved across
        the restart boundary too)."""
        from .spec import FlowSpec

        fpath = os.path.join(self.state_dir, "flows.json")
        if os.path.exists(fpath):
            with open(fpath) as f:
                for doc in json.load(f):
                    self.store.create(FlowSpec.from_json(doc))
        acked: set[int] = set()
        apath = os.path.join(self.state_dir, "acks.jsonl")
        if os.path.exists(apath):
            with open(apath) as f:
                for line in f:
                    if line.strip():
                        acked.update(json.loads(line))
        tpath = os.path.join(self.state_dir, "triggers.jsonl")
        hi = 0
        if os.path.exists(tpath):
            with open(tpath) as f:
                for line in f:
                    if not line.strip():
                        continue
                    msg = json.loads(line)
                    hi = max(hi, int(msg.get("msg_id") or 0))
                    if msg.get("msg_id") not in acked:
                        self.state.pending.setdefault(
                            msg["workflow_id"], []).append(msg)
        self.state.msg_seq = hi  # new messages keep globally unique ids

    # ------------------------------------------------------------ consumer
    def _consume_loop(self) -> None:
        while not self._stop.is_set():
            try:
                busy = self.drain_once()
            except Exception as ex:  # the consumer thread must survive
                self.errors.append({"workflow_id": None,
                                    "n_triggers": 0,
                                    "error": f"consumer: {ex}"})
                busy = 0
            if not busy:
                self._stop.wait(self.poll_interval)

    def drain_once(self) -> int:
        """Dispatch every workflow that has queued triggers; returns the
        number of dispatches (0 = queue empty / nothing runnable)."""
        with self.state.lock:
            # resolve specs AND snapshot queues under the same lock the
            # HTTP handlers mutate the store with — FlowStore.find
            # iterates _flows, and an unlocked iteration races a
            # concurrent flow POST ("dict changed size during
            # iteration" would kill this consumer thread).  Specs
            # resolve FIRST so draft/unknown dead-letter queues are
            # never copied: a stuck backlog must not cost O(backlog)
            # per 50 ms poll.
            specs = {wf: self.store.find(wf)
                     for wf, q in self.state.pending.items() if q}
            snapshot = {wf: list(self.state.pending[wf])
                        for wf, spec in specs.items()
                        if spec is not None and spec.status == "active"}
        dispatched = 0
        for wf_id, queued in snapshot.items():
            if self._stop.is_set():
                # stop() may have closed the ack journal after its join
                # timeout expired mid-dispatch: taking more work now
                # would remove messages whose ack can no longer be
                # journaled, and a restart would replay (re-run) them.
                # Untaken messages stay queued — at-most-once holds.
                break
            spec = specs[wf_id]  # reconcile: re-read per drain
            # ack BEFORE process (at-most-once, the reference's delivery
            # contract) — by message IDENTITY, and dispatch ONLY what is
            # still present at take time: a concurrent POST .../run may
            # have claimed part (or all) of this snapshot between the
            # two locks, and dispatching the stale snapshot would run
            # those messages TWICE
            snap_ids = {id(m) for m in queued}
            with self.state.lock:
                cur = self.state.pending.get(wf_id, [])
                claimed = [m for m in cur if id(m) in snap_ids]
                rest = [m for m in cur if id(m) not in snap_ids]
                if rest:
                    self.state.pending[wf_id] = rest
                else:
                    self.state.pending.pop(wf_id, None)
                if claimed and self.state.on_consume:  # durable ack
                    self.state.on_consume(claimed)     # at take time
            if not claimed:
                continue  # everything raced away: nothing to run
            self._dispatch(spec, wf_id, triggers_from_messages(claimed))
            dispatched += 1
        return dispatched

    def _dispatch(self, spec, wf_id: str, triggers: list[dict]) -> None:
        with self._dispatch_lock:  # one run at a time; guards bookkeeping
            try:
                result = FlowRuntime(spec, max_hops=self.max_hops).run(triggers)
            except Exception as ex:  # poison batch: record + drop
                self.errors.append({"workflow_id": wf_id,
                                    "n_triggers": len(triggers),
                                    "error": str(ex)})
                return
            sink = self.results.setdefault(wf_id,
                                           deque(maxlen=self.results_cap))
            sink.extend(result["leaves"])
            self.counts["dispatches"] += 1
            for kind, plural in (("output", "outputs"), ("leaf", "leaves"),
                                 ("error", "errors")):
                self.counts[kind] += len(result[plural])

    # ---------------------------------------------------------------- cron
    def _cron_loop(self) -> None:
        while not self._stop.is_set():
            if self._stop.wait(self.reconcile_interval):
                return
            self.tick_scheduled()

    def tick_scheduled(self) -> int:
        """One cron tick: fire every schedule-type ACTIVE flow's root
        node(s) once (cmd/cron-trigger/main.go:60-65 — TriggerMessage
        {MetaOutput:"triggered", Values:"{}"}).  Roots = action keys
        that are never a peer's child.  Returns flows fired."""
        with self.state.lock:
            specs = [s for s in self.store.all()
                     if s.trigger_type == "schedule" and s.status == "active"]
        fired = 0
        for spec in specs:
            children = {p.child_key for p in spec.peers}
            roots = [k for k in spec.actions if k not in children]
            triggers = [{"key": k, "meta_output": "triggered",
                         "values": "{}"} for k in roots]
            if not triggers:
                continue
            self._dispatch(spec, spec.workflow_id, triggers)
            self.counts["scheduled_runs"] += 1
            fired += 1
        return fired


def serve_daemon(store: FlowStore | None = None, host: str = "127.0.0.1",
                 port: int = 8080, **kw) -> None:
    """Blocking daemon entry point (the `cmd/workflow` + cron-trigger
    pair as one process).  Ray must already be initialised by the
    caller — this module never calls ray.init()."""
    d = FlowDaemon(store, host, port, **kw).start()
    try:
        d._stop.wait()
    except KeyboardInterrupt:
        pass
    finally:
        d.stop()
