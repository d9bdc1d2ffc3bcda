"""Flow-runtime driver queries: the spider-go engine-conformance layer
(examples/basic DAG semantics) exercised over testdata rows, with a SQL
oracle — the mapper-expression chain a1→a2→a3 is string concatenation,
which DuckDB can replicate exactly.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _basic_spec():
    from ..flow import Action, FlowSpec, Mapper
    from ..flow.spec import Peer

    spec = FlowSpec(tenant_id="t1", workflow_id="wa", name="basic")
    spec.actions["a1"] = Action("a1", "test-action-a", {"test": "a"})
    spec.actions["a2"] = Action(
        "a2", "test-action-b", {"test": "b"},
        {"value": Mapper("expression", "a1.output.value + '_updatedx1'")})
    spec.actions["a3"] = Action(
        "a3", "test-action-b", {"test": "c"},
        {"value": Mapper("expression", "a2.output.value + '_updatedx2'")})
    spec.peers += [Peer("a1", "triggered", "a2"), Peer("a2", "success", "a3")]
    return spec


def flow_basic_leaves(sf_dir: str, limit: int = 200) -> pa.Table:
    """One trigger per of the first `limit` orders (by o_orderkey) through
    the 3-node examples/basic DAG; returns the leaf payload values.
    Matches oracle SQL: orderkey || '_updatedx1_updatedx2'."""
    import pyarrow.parquet as pq

    from ..flow import FlowRuntime

    keys = sorted(pq.read_table(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey"])["o_orderkey"].to_pylist())
    triggers = [
        {"key": "a1", "meta_output": "triggered",
         "values": json.dumps({"value": str(k)})}
        for k in keys[:limit]
    ]
    res = FlowRuntime(_basic_spec()).run(triggers)
    vals = [json.loads(r["values"])["value"] for r in res["leaves"]]
    return pa.table({"value": pa.array(vals, pa.string())})
