"""Flow runtime: the reference's trigger→dispatch→worker→output BFS loop
(`pkg/spider/workflow.go:83-328`) executed as Ray Data hops.

One "hop" = one map_batches pass that, per in-flight input row:
  1. runs the worker UDF for the row's action_id (registry below — the
     user-extension surface, rebuilding `pkg/spider/worker.go:39-67`),
  2. merges the worker outputs into the session context
     (`workflow.go:242-243` — carried IN-BAND as a JSON column instead of
     a Mongo round-trip per hop),
  3. dispatch-joins each output's (key, meta_output) against the
     broadcast edge map and projects the child's input with the
     compiled mappers (`workflow.go:129-191`), emitting next-hop rows;
     outputs with no outgoing edges become leaf rows.

Determinism: session ids are derived from the trigger index, task ids
from the (session, parent-task, child, output-index) lineage — pure
functions of data, replacing the reference's wall-clock UUIDv7s
(`workflow.go:113-119,143-149`) while preserving their
ordered-by-creation property (SURVEY.md §1.3).

Scale note: flow control traffic is message-shaped (small JSON rows);
the 100-TB data path lives in the crawl engine / pipelines modules.
Rows here still move as Arrow batches so a wide fan-out (N thousand
sessions) parallelizes across the cluster.
"""

from __future__ import annotations

import json
from typing import Any, Callable

import pyarrow as pa

from ..common.hashing import hash64
from .expr import ExprError
from .spec import FlowSpec

# ---------------------------------------------------------------------------
# worker UDF registry (action_id -> handler)
# handler(values: dict, config: dict[str,str]) -> list[(meta_output, values)]
# ---------------------------------------------------------------------------

WORKER_REGISTRY: dict[str, Callable[[dict, dict], list[tuple[str, dict]]]] = {}


def register_worker(action_id: str):
    def deco(fn):
        WORKER_REGISTRY[action_id] = fn
        return fn
    return deco


@register_worker("test-action-a")
def _worker_a(values, config):
    """Pass-through trigger-style worker (examples/basic worker-a)."""
    return [("triggered", values)]


@register_worker("test-action-b")
def _worker_b(values, config):
    """Echo worker — side-effect sink + pass-through on port "success"
    (`cmd/slack-worker/main.go:31-84`, examples/basic worker-b; the Slack
    POST is replaced by a no-op sink: no network in this environment)."""
    return [("success", values)]


@register_worker("condition-action")
def _worker_condition(values, config):
    """Port-labeled branch (`cmd/control-flow-worker/main.go:15-46`)."""
    cond = bool(values.get("condition", False))
    return [("yes" if cond else "no", {})]


@register_worker("fd-order-action")
def _worker_fd_order(values, config):
    """1 -> 10 ordered fan-out (`cmd/fd-order-worker/main.go:29-52`)."""
    return [("success", {"order_id": f"order@{i + 1}"}) for i in range(10)]


# ---------------------------------------------------------------------------


def _to_string(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"  # Go fmt.Sprint
    return str(v)


def _apply_mapper(compiled: dict[str, tuple[str, object]], env: dict) -> dict:
    """The reference's ex() (`workflow.go:347-398`): empty -> "", fixed ->
    literal, key/expression -> compiled program over the context env."""
    out = {}
    for field, (mode, prog) in compiled.items():
        if mode == "fixed":
            out[field] = prog
        elif mode == "error":  # compile failed for this field (spec.py)
            raise ExprError(prog)
        else:
            out[field] = prog(env)
    return out


_ROW_FIELDS = ["kind", "tenant_id", "workflow_id", "session_id", "task_id",
               "key", "action_id", "meta_output", "values", "context"]

_ROW_SCHEMA = pa.schema([(f, pa.string()) for f in _ROW_FIELDS])


class FlowRuntime:
    """Executes one FlowSpec over a batch of trigger events."""

    def __init__(self, spec: FlowSpec, max_hops: int = 32,
                 registry: dict | None = None):
        self.spec = spec
        self.max_hops = max_hops
        self.registry = dict(WORKER_REGISTRY if registry is None else registry)

    # -- driver-side trigger path (workflow.go:83-203) ---------------------
    def _seed_rows(self, triggers: list[dict]) -> list[dict]:
        spec = self.spec
        edges = self.spec.edge_map()
        mappers = self.spec.compiled_mappers()
        rows = []
        for idx, trig in enumerate(triggers):
            key = trig["key"]
            action = spec.actions.get(key)
            if action is None or action.disabled:   # disabled-node filter
                continue
            values = json.loads(trig.get("values", "{}") or "{}")
            session_id = f"s{idx:06d}"
            ctx = {key: {"output": values}, "$trigger": {"output": values}}
            meta_output = trig.get("meta_output", "triggered")
            rows += self._fan_out(edges, mappers, spec, session_id,
                                  parent_task="root", key=key,
                                  meta_output=meta_output, ctx=ctx)
        return rows

    def _fan_out(self, edges, mappers, spec, session_id, parent_task,
                 key, meta_output, ctx) -> list[dict]:
        """One output event -> N child input rows (workflow.go:136-191)."""
        children = edges.get((key, meta_output), [])
        out = []
        for child_key in children:
            child = spec.actions.get(child_key)
            # missing children are skipped (errors swallowed in the child
            # fetch loop, storage_workflow_mongodb.go:283-291); DISABLED
            # children still receive input — the disabled check applies when
            # the disabled node's own event is processed (workflow.go:100-102,
            # :222-224), handled in the hop below
            if child is None:
                continue
            env = dict(ctx)
            env["builtin"] = {"string": _to_string}
            env["len"] = len
            env["string"] = _to_string
            env["uuidv7"] = lambda s=session_id, p=parent_task, c=child_key: (
                f"uuid-{hash64(f'{s}/{p}/{c}'):016x}"
            )
            try:
                child_input = _apply_mapper(mappers[child_key], env)
            except Exception as ex:
                # any mapper failure — ExprError, TypeError on mixed
                # operands, ZeroDivisionError, … — is log-and-drop in the
                # reference (workflow.go:158-170); never the whole batch
                child_input = {"$error": f"{type(ex).__name__}: {ex}"}
            # path-style task ids: lexicographic order == creation order
            # (preserving the UUIDv7 ordered-by-creation property the ids
            # replace, SURVEY.md §1.3) while staying pure functions of
            # lineage — `edge` is the child's index on this output port
            edge = children.index(child_key)
            task_id = f"{parent_task}/{edge:02d}.{child_key}"
            out.append({
                "kind": "input",
                "tenant_id": spec.tenant_id,
                "workflow_id": spec.workflow_id,
                "session_id": session_id,
                "task_id": task_id,
                "key": child_key,
                "action_id": child.action_id,
                "meta_output": meta_output,
                "values": json.dumps(child_input, sort_keys=True),
                "context": json.dumps(ctx, sort_keys=True),
            })
        return out

    # -- worker + output path as one Ray hop (workflow.go:205-328) ---------
    def _hop_fn(self):
        spec = self.spec
        registry = self.registry
        edges = spec.edge_map()
        fan_out = self._fan_out

        def hop(batch: pa.Table) -> pa.Table:
            # compiled expression closures don't pickle -> compile inside
            # the task, once per batch (reference recompiles per RECORD)
            compiled = spec.compiled_mappers()
            # column-wise boundary: one to_pylist per COLUMN instead of a
            # per-row dict for the whole table; a row dict materializes
            # only for input rows that actually dispatch a worker (the
            # per-row UDF dispatch itself is the reference contract)
            names = batch.column_names
            col = {f: batch[f].to_pylist() for f in names}
            kinds = col["kind"]
            out_rows: list[dict] = []
            pass_through: list[int] = []
            for i in range(batch.num_rows):
                if kinds[i] != "input":
                    pass_through.append(i)
                    continue
                row = {f: col[f][i] for f in names}
                action = spec.actions.get(row["key"])
                # disabled-node filter: the node's worker may run in the
                # reference, but every event it emits is dropped by the
                # orchestrator (workflow.go:222-224) — observably equivalent
                # to dropping the input here
                if action is None or action.disabled:
                    continue
                handler = registry.get(row["action_id"])
                if handler is None:
                    continue  # no worker for this action (ref: msg dropped)
                values = json.loads(row["values"])
                ctx = json.loads(row["context"])
                try:
                    outputs = handler(values, dict(action.config))
                except Exception as ex:  # handler errors logged-and-lost
                    out_rows.append({**row, "kind": "error",
                                     "values": json.dumps({"error": str(ex)})})
                    continue
                for out_idx, (meta_output, out_values) in enumerate(outputs):
                    new_ctx = dict(ctx)
                    new_ctx[row["key"]] = {"output": out_values}
                    log_row = {
                        **row,
                        "kind": "output",
                        "task_id": f"{row['task_id']}.o{out_idx:03d}",
                        "meta_output": meta_output,
                        "values": json.dumps(out_values, sort_keys=True),
                        "context": json.dumps(new_ctx, sort_keys=True),
                    }
                    out_rows.append(log_row)
                    nxt = fan_out(edges, compiled, spec, row["session_id"],
                                  parent_task=f"{row['task_id']}.o{out_idx:03d}",
                                  key=row["key"], meta_output=meta_output,
                                  ctx=new_ctx)
                    if not nxt:
                        out_rows.append({**log_row, "kind": "leaf"})
                    out_rows += nxt
            if not out_rows and not pass_through:
                return pa.Table.from_pylist([], schema=_ROW_SCHEMA)
            # build output COLUMNS: pass-through rows copy straight from
            # the input column lists, worker outputs append from their
            # dicts — no per-row dict scan over the whole result
            out_cols = {f: [col[f][i] for i in pass_through]
                        if f in col else [None] * len(pass_through)
                        for f in _ROW_FIELDS}
            for r in out_rows:
                for f in _ROW_FIELDS:
                    out_cols[f].append(r.get(f))
            return pa.table({f: pa.array(out_cols[f], pa.string())
                             for f in _ROW_FIELDS})

        return hop

    def run_scheduled(self, key: str, n_ticks: int) -> dict[str, list[dict]]:
        """Schedule-triggered runs: each tick fires the node's port
        "triggered" with empty values — the reference's cron trigger
        (`cmd/cron-trigger/main.go:60-65`: TriggerMessage{MetaOutput:
        "triggered", Values:"{}"}).  The tick COUNT replaces wall-clock
        cron firing (deterministic; the reconcile loop that re-reads
        cron specs maps to the engine's per-epoch config re-read)."""
        if self.spec.trigger_type != "schedule":
            # the reference's cron trigger only fires schedule-type flows
            # (cmd/cron-trigger/main.go scans flows by trigger type)
            raise ValueError(
                f"flow {self.spec.workflow_id!r} has trigger_type="
                f"{self.spec.trigger_type!r}; run_scheduled needs 'schedule'")
        return self.run([
            {"key": key, "meta_output": "triggered", "values": "{}"}
            for _ in range(n_ticks)
        ])

    def _run_ds(self, seed_table: pa.Table):
        """BFS to fixpoint with the frontier CARRIED AS A DATASET: each
        hop materializes into the object store (spillable), the settled
        rows (output/leaf/error) stay there as Dataset parts, and only
        per-hop COUNTS reach the driver — the round-2 per-hop take_all()
        made the driver hold every in-flight row of every hop.  Returns
        the union Dataset of all settled rows (lazy over materialized
        blocks) — callers stream it to parquet or collect small results.
        """
        import ray.data as rd

        if self.spec.status != "active":
            raise ValueError(
                f"flow {self.spec.workflow_id!r} is {self.spec.status!r}, "
                "not active — drafts are not runnable")
        hop = self._hop_fn()

        def keep(kind_is_input: bool):
            def fn(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                m = pc.equal(t["kind"], "input")
                return t.filter(m if kind_is_input else pc.invert(m))
            return fn

        ds = rd.from_arrow(seed_table)
        done_parts = []
        hops = 0
        n_inputs = seed_table.num_rows
        while n_inputs:
            if hops >= self.max_hops:
                raise RuntimeError(
                    f"flow exceeded max_hops={self.max_hops} (cycle?)")
            mat = (ds.map_batches(hop, batch_format="pyarrow")
                   .materialize())
            done_parts.append(mat.map_batches(keep(False),
                                              batch_format="pyarrow"))
            ds = mat.map_batches(keep(True), batch_format="pyarrow")
            n_inputs = ds.count()
            hops += 1
        if not done_parts:
            return rd.from_arrow(pa.Table.from_pylist([], schema=_ROW_SCHEMA))
        out = done_parts[0]
        for p in done_parts[1:]:
            out = out.union(p)
        return out

    def run_streaming(self, triggers: list[dict], out_dir: str) -> dict:
        """Streaming leaf sink (round-3): settled rows go straight from
        the object store to parquet under out_dir — no row ever lands on
        the driver; returns {"dir", "counts", "rows"}.  This is the
        10⁵-trigger-scale surface (a leaf-table consumer reads the
        parquet); run() below keeps the small-result dict contract."""
        done = self._run_ds(pa.Table.from_pylist(
            self._seed_rows(triggers), schema=_ROW_SCHEMA))
        done.write_parquet(out_dir, mode="overwrite")
        counts: dict[str, int] = {"output": 0, "leaf": 0, "error": 0}
        cdf = done.groupby("kind").count().to_pandas()
        for k, n in zip(cdf["kind"], cdf["count()"]):
            counts[str(k)] = int(n)
        return {"dir": out_dir, "counts": counts,
                "rows": int(sum(counts.values()))}

    def run(self, triggers: list[dict]) -> dict[str, list[dict]]:
        """BFS to fixpoint; returns {"outputs": [...], "leaves": [...],
        "errors": [...]} sorted deterministically.  Draft flows refuse to
        run (`pkg/spider/flow.go:11-15` status model: only active flows
        are runnable).  Hops run via the Dataset-carried frontier
        (_run_ds); only the FINAL settled rows are collected — use
        run_streaming for results too large to collect."""
        import ray

        refs = self._run_ds(pa.Table.from_pylist(
            self._seed_rows(triggers), schema=_ROW_SCHEMA)).to_arrow_refs()
        tbls = [t.select(_ROW_FIELDS).cast(_ROW_SCHEMA)
                for t in ray.get(refs) if t.num_rows]
        done = (pa.concat_tables(tbls).to_pylist() if tbls else [])
        key_fn = lambda r: (r["session_id"], r["task_id"])
        return {
            "outputs": sorted((r for r in done if r["kind"] == "output"), key=key_fn),
            "leaves": sorted((r for r in done if r["kind"] == "leaf"), key=key_fn),
            "errors": sorted((r for r in done if r["kind"] == "error"), key=key_fn),
        }
