"""Flow / action / edge data model + driver-side store.

Rebuilds the reference's control plane as a thin in-process API over tiny
driver-side tables (SURVEY.md §2 #15-17): flows
(`pkg/spider/flow.go:17-25`), actions with config + mapper + disabled flag
(`pkg/spider/action.go:3-13`), port-labeled dependency edges
(`pkg/spider/storage_workflow_mongodb.go:743-749`), version bump on every
action mutation (`storage_workflow_mongodb.go:701-715`), tenant scoping on
every query (`storage_workflow_mongodb.go:215-222`), and paginated listing
sorted newest-first (`storage_workflow_mongodb.go:408-460`,
`apis/flow.go:113-116` — default page size 20, max 100).

The flow graph is control-plane data: it is always broadcast into tasks
as a plain dict, never a Dataset-scale join (SURVEY.md §2 #4).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .expr import ExprError, compile_expr

MAPPER_MODES = ("fixed", "key", "expression")  # pkg/spider/storage.go:5-16


@dataclass
class Mapper:
    mode: str
    value: str

    def __post_init__(self):
        if self.mode not in MAPPER_MODES:
            raise ValueError(f"bad mapper mode {self.mode!r}")


def triggers_from_messages(msgs) -> list[dict]:
    """Queued TriggerMessage dicts -> FlowRuntime trigger rows.

    ONE home for the values-encoding rule (non-str payloads are JSON-
    encoded, empty -> "{}"), shared by the synchronous /run endpoint and
    the daemon's continuous consumer so the two delivery paths can never
    diverge on trigger shape (`pkg/spider/workflow.go:83-99` builds the
    same struct from the broker message)."""
    def _s(v):
        return v if isinstance(v, str) else json.dumps(v or {})

    return [{"key": m["key"],
             "meta_output": m.get("meta_output", "triggered"),
             "values": _s(m.get("values"))} for m in msgs]


def parse_bang_mapper(mapping: dict[str, str]) -> dict[str, "Mapper"]:
    """The '!'-prefix mapper convention from the reference's standalone
    expression demo (`examples/expression/main.go:102-119` ex()): empty
    value -> fixed "", '!expr' -> expression over the env, anything else
    -> fixed literal.  Returns mode-based Mappers so demo-style flows
    compile through the same compile-once path as API-built ones."""
    out: dict[str, Mapper] = {}
    for field_name, v in mapping.items():
        if v.startswith("!"):
            out[field_name] = Mapper("expression", v[1:])
        else:
            out[field_name] = Mapper("fixed", v)
    return out


@dataclass
class Action:
    key: str
    action_id: str
    config: dict[str, str] = field(default_factory=dict)
    mapper: dict[str, Mapper] = field(default_factory=dict)
    disabled: bool = False


@dataclass
class Peer:
    parent_key: str
    meta_output: str
    child_key: str


@dataclass
class FlowSpec:
    tenant_id: str
    workflow_id: str
    name: str = ""
    trigger_type: str = "event"    # event | schedule (pkg/spider/flow.go:3-9)
    status: str = "active"         # draft | active (pkg/spider/flow.go:11-15)
    version: int = 1
    actions: dict[str, Action] = field(default_factory=dict)
    peers: list[Peer] = field(default_factory=list)

    # ---- mutations (each bumps version, mirroring incrementFlowVersion) ----
    def add_action(self, action: Action) -> None:
        if action.key in self.actions:
            raise ValueError(f"duplicate action key {action.key!r}")  # unique index
        self.actions[action.key] = action
        self.version += 1

    def update_action(self, key: str, **changes) -> None:
        a = self.actions[key]
        for k, v in changes.items():
            setattr(a, k, v)
        self.version += 1

    def disable_action(self, key: str, disabled: bool = True) -> None:
        self.actions[key].disabled = disabled
        self.version += 1

    def add_peer(self, parent_key: str, meta_output: str, child_key: str) -> None:
        for p in self.peers:
            if (p.parent_key, p.meta_output, p.child_key) == (parent_key, meta_output, child_key):
                raise ValueError("duplicate peer")  # unique index :94-102
        self.peers.append(Peer(parent_key, meta_output, child_key))
        self.version += 1

    # ---- compiled artifacts (broadcast to tasks) ----
    def edge_map(self) -> dict[tuple[str, str], list[str]]:
        """{(parent_key, meta_output): [child_key]} — the dispatch join's
        broadcast side (replaces the reference's per-event N+1 Mongo
        lookups, `storage_workflow_mongodb.go:251-294`)."""
        out: dict[tuple[str, str], list[str]] = {}
        for p in self.peers:
            out.setdefault((p.parent_key, p.meta_output), []).append(p.child_key)
        return out

    def compiled_mappers(self) -> dict[str, dict[str, tuple[str, object]]]:
        """{action_key: {field: (mode, compiled-or-literal)}} — compiled
        ONCE per flow version (the reference recompiles per record)."""
        out: dict[str, dict[str, tuple[str, object]]] = {}
        for key, a in self.actions.items():
            fields = {}
            for fname, m in a.mapper.items():
                if len(m.value) == 0 or m.mode == "fixed":
                    fields[fname] = ("fixed", "" if len(m.value) == 0 else m.value)
                else:  # key | expression both compile (workflow.go:371-391)
                    try:
                        fields[fname] = ("expr", compile_expr(m.value))
                    except ExprError as ex:
                        # a bad expression on ONE edge must not take the
                        # whole flow down (reference: per-record compile
                        # error -> log & drop that dispatch)
                        fields[fname] = ("error", str(ex))
            out[key] = fields
        return out

    @staticmethod
    def from_json(doc: str | dict) -> "FlowSpec":
        """Parse the F4 fixture format (FIXTURES.md)."""
        if isinstance(doc, str):
            doc = json.loads(doc)
        spec = FlowSpec(
            tenant_id=doc["tenant_id"],
            workflow_id=doc["flow"]["id"],
            name=doc["flow"].get("name", ""),
            trigger_type=doc["flow"].get("trigger_type", "event"),
            status=doc["flow"].get("status", "active"),
            version=int(doc["flow"].get("version", 1)),
        )
        for a in doc.get("actions", []):
            spec.actions[a["key"]] = Action(
                key=a["key"],
                action_id=a["action_id"],
                config=dict(a.get("config", {})),
                mapper={k: Mapper(**m) for k, m in a.get("mapper", {}).items()},
                disabled=bool(a.get("disabled", False)),
            )
        for p in doc.get("peers", []):
            spec.peers.append(Peer(p["parent_key"], p["meta_output"], p["child_key"]))
        return spec


class FlowStore:
    """In-process CRUD over flows — the reference's REST control plane
    surface as a Python API (create/get/update/delete/list)."""

    def __init__(self):
        self._flows: dict[tuple[str, str], FlowSpec] = {}
        self._order: list[tuple[str, str]] = []  # creation order (for sort desc)

    def create(self, spec: FlowSpec) -> FlowSpec:
        k = (spec.tenant_id, spec.workflow_id)
        if k in self._flows:
            raise ValueError(f"flow {k} exists")
        self._flows[k] = spec
        self._order.append(k)
        return spec

    def get(self, tenant_id: str, workflow_id: str) -> FlowSpec:
        return self._flows[(tenant_id, workflow_id)]

    def update(self, tenant_id: str, workflow_id: str, *,
               name: str | None = None, trigger_type: str | None = None,
               status: str | None = None) -> FlowSpec:
        """Update flow-level fields + version bump — mirrors the
        reference's update-flow use case (`pkg/spider/usecase/flow.go:
        115-132`: fetch, apply changed fields, bump version, save).
        Action/peer mutations go through FlowSpec's own methods (which
        bump the version themselves)."""
        spec = self._flows[(tenant_id, workflow_id)]
        # validate EVERYTHING before mutating ANYTHING: a partial apply
        # followed by the raise would leave the in-memory store changed
        # behind a 400 response — which the daemon's snapshot-on-2xx
        # gate would then never persist (memory/disk divergence)
        if trigger_type is not None and trigger_type not in ("event",
                                                             "schedule"):
            raise ValueError(f"bad trigger_type {trigger_type!r}")
        if status is not None and status not in ("draft", "active"):
            raise ValueError(f"bad status {status!r}")
        if name is not None:
            spec.name = name
        if trigger_type is not None:
            spec.trigger_type = trigger_type
        if status is not None:
            spec.status = status
        spec.version += 1
        return spec

    def delete(self, tenant_id: str, workflow_id: str) -> None:
        """Cascading delete (flow + actions + peers travel together here,
        mirroring storage_workflow_mongodb.go:560-609)."""
        k = (tenant_id, workflow_id)
        del self._flows[k]
        self._order.remove(k)

    def find(self, workflow_id: str) -> FlowSpec | None:
        """Lookup by workflow id alone — the broker consumer's view: a
        TriggerMessage carries only {workflow_id, key, values}
        (`pkg/spider/workflow.go:83-99` resolves the flow from the
        message), so the daemon needs the id→spec resolution the
        reference does storage-side (GetWorkflowByID; its ids are
        globally-unique ObjectIDs).  This store keys by (tenant, id),
        so a client-chosen id CAN repeat across tenants: a unique match
        resolves; among duplicates only a unique ACTIVE one resolves
        (first-match by insertion order would dispatch one tenant's
        triggers against another tenant's spec — or wedge them behind a
        draft); otherwise the message stays queued as unresolvable."""
        matches = [spec for (_, wf), spec in self._flows.items()
                   if wf == workflow_id]
        if len(matches) == 1:
            return matches[0]
        active = [s for s in matches if s.status == "active"]
        return active[0] if len(active) == 1 else None

    def all(self) -> list[FlowSpec]:
        """Every flow across tenants, creation order — the cron
        trigger's scan surface (cmd/cron-trigger/main.go:38-47 lists
        schedule-type flows across the deployment)."""
        return [self._flows[k] for k in self._order]

    def list(self, tenant_id: str, page: int = 1, page_size: int = 20) -> list[FlowSpec]:
        page = max(1, page)                      # pages are 1-based
        page_size = min(max(1, page_size), 100)  # apis/flow.go:113-116
        keys = [k for k in reversed(self._order) if k[0] == tenant_id]
        lo = (page - 1) * page_size
        return [self._flows[k] for k in keys[lo : lo + page_size]]
