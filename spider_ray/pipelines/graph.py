"""Link-graph analytics: fixed-point PageRank and weak connected
components — generic cores over any distinct edge Dataset
(pagerank_edges / components_of_edges, used by the crawl href graph via
crawl_queries.crawl_pagerank and jobs/run_graph.py), plus the
events-derived interaction-graph driver queries with exact SQL oracles.

The crawl graft's frontier IS a link graph (pages -> href targets), and
the two canonical whole-graph operations a web-scale corpus needs are
centrality (PageRank, Page et al. 1999) and component clustering (host /
dup clusters).  The reference engine walks graph edges one message at a
time (dependency dispatch, reference pkg/spider/workflow.go:129 +
storage_workflow_mongodb.go:251-294); these operators are the bulk
equivalents: iterate (join contributions along edges -> grouped reduce)
until fixed-point / fixed iteration count.

Interaction-graph derivation (shared verbatim with the SQL oracles):
every event row contributes a (user "u<user_id>", item "k<props.k>")
edge; edges are DISTINCT and symmetrized (both directions present), so
in THAT graph no node dangles.  The cores themselves handle arbitrary
directed graphs — dangling nodes stay ranked via a zero
self-contribution (engine) / LEFT JOIN + COALESCE (generated SQL).

Determinism: PageRank runs in FIXED-POINT int64 arithmetic
(SCALE = 10^12; damping 0.85 applied as integer ops 15*SCALE//100 +
(85*sum)//100).  Integer sums commute exactly, so the distributed result
hash-matches the unrolled SQL oracle bit-for-bit at any parallelism — a
float PageRank would drift in the low bits under different accumulation
orders.  SCALE must satisfy N_nodes * SCALE < 2^63 (the total rank
mass bounds every partial sum; damping itself is overflow-safe via
_damp); at a 10^10-node web graph the same code runs with a smaller
SCALE (knob, not redesign).

Scale shape: both operators follow the repo's adaptive dispatch — the
driver path (numpy / union-find over the edge-count-sized DISTINCT edge
list) below _DRIVER_MAX_EDGES, the distributed path above it (or with
force_distributed=True).  The distributed PageRank iteration is the
classic message-passing form: ONE groupby over (rank rows ∪ edge rows)
keyed on node emits contributions along out-edges, ONE grouped sum
produces the next rank vector — two key-partitioned shuffles per
iteration, nothing corpus-sized ever on the driver.  Components reuse
the min-label propagation shape proven in
webtext.dedup_minhash_clusters (one groupby round per hop, monotone
convergence check), here over string node ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import read_table as _rp

SCALE = 1_000_000_000_000  # fixed-point: 1.0 of rank == 10^12
_BASE = 15 * SCALE // 100  # (1 - d) * SCALE with d = 0.85, integer-exact


def _damp(s):
    """(85*s)//100 without the 85× overflow: 85/100 == 17/20 and with
    s = 20q + r, floor(17s/20) == 17q + floor(17r/20) exactly — so the
    largest intermediate is 17*(s//20) < s.  Safe for any s < 2^63 (the
    rank-mass bound is N_nodes * SCALE, see module docstring); a plain
    85*s wraps int64 once a hub accumulates s >= 1.08e17, i.e. ~10^5
    nodes' worth of mass — far inside the tier limits.  Works for numpy
    arrays and Python ints; the SQL oracle keeps the literal
    (85*SUM)//100 form because DuckDB widens to HUGEINT (the two are
    equal by the identity above)."""
    q, r = s // 20, s % 20
    return 17 * q + (17 * r) // 20


_DRIVER_MAX_EDGES = 2_000_000
# shared with the SQL oracles verbatim (graph_components edge filter)
COMPONENT_FILTER = ("error", 150.0)


def _int_index_edges(edges, nodes_arr: np.ndarray):
    """Translate an edge Dataset's (src, dst) strings to int64 indices
    into the SORTED node array — done ONCE so iteration loops broadcast
    only int64 vectors (zero-copy shm views; an object-dtype string
    array would re-pickle into every task every round, measured 5-10x
    slower).  Shared by both broadcast tiers."""
    import ray

    nodes_ref = ray.put(nodes_arr)

    def to_idx(t: pa.Table, _nref=nodes_ref) -> pa.Table:
        nodes_b = ray.get(_nref)
        si = np.searchsorted(nodes_b,
                             t["src"].to_numpy(zero_copy_only=False))
        di = np.searchsorted(nodes_b,
                             t["dst"].to_numpy(zero_copy_only=False))
        return pa.table({"si": pa.array(si, pa.int64()),
                         "di": pa.array(di, pa.int64())})

    return edges.map_batches(to_idx, batch_format="pyarrow").materialize()


def _pair_batches(t: pa.Table, event_type: str | None,
                  min_value: float | None,
                  directed: bool = False) -> pa.Table:
    """events batch -> (src, dst) edge rows, symmetric by default or
    directed user->item (with in-batch duplicates; global DISTINCT
    happens in the groupby that follows)."""
    if event_type is not None:
        t = t.filter(pc.equal(t["event_type"], event_type))
    if min_value is not None:
        t = t.filter(pc.greater(t["value"], min_value))
    m = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?[0-9]+)')

    def _flat(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    a = _flat(pc.binary_join_element_wise(
        "u", pc.cast(t["user_id"], pa.string()), ""))
    b = _flat(pc.binary_join_element_wise("k", pc.struct_field(m, "k"), ""))
    if directed:
        out = pa.table({"src": a, "dst": b})
    else:
        out = pa.table({"src": pa.chunked_array([a, b]),
                        "dst": pa.chunked_array([b, a])})
    # in-batch pre-distinct: the grouped count that makes edges globally
    # DISTINCT then shuffles one row per (block, edge), not per event
    return pa.TableGroupBy(out, ["src", "dst"]).aggregate([]) \
        .select(["src", "dst"])


def _distinct_edges(sf_dir: str, event_type: str | None = None,
                    min_value: float | None = None,
                    directed: bool = False):
    """DISTINCT edge Dataset derived from events (symmetric by default,
    or directed user->item)."""
    ds = _rp(sf_dir, "events", ["user_id", "event_type", "value", "props"])
    per_block = ds.map_batches(
        lambda t: _pair_batches(t, event_type, min_value, directed),
        batch_format="pyarrow")
    out = per_block.groupby(["src", "dst"]).count()
    return out.drop_columns(["count()"])


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

_BCAST_MAX_NODES = 20_000_000  # rank vector comfortably fits one worker


def pagerank_edges(edges, iters: int = 5, force_distributed: bool = False,
                   tier: str | None = None):
    """Fixed-point PageRank (d=0.85, fixed iterations) over an
    arbitrary DIRECTED distinct-edge Dataset[(src,dst)].  Returns every
    node's final rank in SCALE fixed-point units, sorted by
    (rank desc, node).

    rank_0(n)   = SCALE
    rank_i+1(n) = 15*SCALE//100 + (85 * Σ_{(m,n)∈E} rank_i(m)//deg(m))//100

    Dangling nodes (no out-edges — a real web graph is full of them)
    receive contributions but send none: rank leaks, the standard
    simplified variant.  All arithmetic is int64 floor division/sums —
    exact and order-independent, hash-matching the unrolled SQL of
    pagerank_sql_for_edges at any parallelism and in every tier.

    THREE execution tiers (auto by size; `tier` forces one in tests):
      driver     edges fit the driver: numpy scatter-add loop.
      broadcast  edges arbitrarily large, NODES fit a worker (the 10^10
                 -edge / 10^8-host web regime): the (node, deg, rank)
                 vectors are ray.put once per iteration; each edge block
                 gathers ranks by searchsorted, pre-aggregates its
                 contributions by dst IN-BATCH, and one grouped sum —
                 node-cardinality-sized — finishes the iteration.  Fully
                 vectorized, one shuffle of node-sized partials per
                 iteration, edges never leave their blocks.
      msgpass    nodes too big to broadcast: classic message-passing —
                 ONE groupby over (rank rows ∪ edge rows) keyed on node
                 emits contributions along out-edges (zero
                 self-contribution keeps receive-only nodes alive), one
                 grouped sum reduces.  Per-node Python in the group fn
                 is the price of unbounded node counts."""
    import ray.data as rd

    assert tier in (None, "driver", "broadcast", "msgpass")
    edges = edges.materialize()  # consumed by count + every iteration
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank_fp": pa.array([], pa.int64())}))

    use_driver = (tier == "driver" or
                  (tier is None and n_edges <= _DRIVER_MAX_EDGES
                   and not force_distributed))
    if use_driver:
        df = edges.to_pandas()
        src = df["src"].to_numpy()
        dst = df["dst"].to_numpy()
        nodes = np.unique(np.concatenate([src, dst]))
        src_idx = np.searchsorted(nodes, src)
        dst_idx = np.searchsorted(nodes, dst)
        # every EDGE's src has deg >= 1 by construction, so the gather
        # below never divides by zero; dangling nodes just never appear
        # as src
        deg = np.bincount(src_idx, minlength=len(nodes)).astype(np.int64)
        rank = np.full(len(nodes), SCALE, np.int64)
        for _ in range(iters):
            contrib = rank[src_idx] // deg[src_idx]
            s = np.zeros(len(nodes), np.int64)
            np.add.at(s, dst_idx, contrib)  # int64-exact scatter-add
            rank = _BASE + _damp(s)
        order = np.lexsort((nodes, -rank))
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes[order]),
            "rank_fp": pa.array(rank[order], pa.int64()),
        }))

    from ray.data.aggregate import Sum

    # node universe + out-degrees in ONE aggregate pass (node-sized)
    def node_deg_partials(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        us, cs = np.unique(src, return_counts=True)
        ud = np.unique(dst)
        return pa.table({
            "node": pa.array(np.concatenate([us, ud])),
            "deg": pa.array(np.concatenate(
                [cs.astype(np.int64), np.zeros(len(ud), np.int64)]),
                pa.int64()),
        })

    node_deg = (edges.map_batches(node_deg_partials, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("deg", alias_name="deg"))
                .materialize())
    n_nodes = node_deg.count()

    if tier == "broadcast" or (tier is None and n_nodes <= _BCAST_MAX_NODES):
        import ray

        nd = node_deg.to_pandas().sort_values("node", ignore_index=True)
        nodes_arr = nd["node"].to_numpy()
        deg_arr = nd["deg"].to_numpy(np.int64)
        int_edges = _int_index_edges(edges, nodes_arr)

        rank_arr = np.full(n_nodes, SCALE, np.int64)
        for _ in range(iters):
            state_ref = ray.put((deg_arr, rank_arr))

            def contrib_partials(t: pa.Table,
                                 _ref=state_ref) -> pa.Table:
                deg_b, rank_b = ray.get(_ref)  # zero-copy shm views
                si = t["si"].to_numpy(zero_copy_only=False)
                di = t["di"].to_numpy(zero_copy_only=False)
                contrib = rank_b[si] // deg_b[si]
                ud, inv = np.unique(di, return_inverse=True)
                s = np.zeros(len(ud), np.int64)
                np.add.at(s, inv, contrib)  # in-batch pre-aggregation
                return pa.table({"idx": pa.array(ud, pa.int64()),
                                 "s": pa.array(s, pa.int64())})

            # pull the per-block partials and merge on the driver — NO
            # shuffle (Ray's hash-aggregate constant measured 12.8 s vs
            # 0.3 s for this merge at 3M edges / 200k nodes).  Pull
            # volume = Σ per-block distinct dst ≤ blocks × |nodes| rows;
            # the tier's premise (node vector fits the driver) already
            # grants node-sized driver traffic, and block sizing keeps
            # the sum within a few multiples of it.
            part = (int_edges.map_batches(contrib_partials,
                                          batch_format="pyarrow")
                    .to_pandas())
            s_full = np.zeros(n_nodes, np.int64)
            np.add.at(s_full, part["idx"].to_numpy(),
                      part["s"].to_numpy())
            rank_arr = _BASE + _damp(s_full)
        order = np.lexsort((nodes_arr, -rank_arr))
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes_arr[order]),
            "rank_fp": pa.array(rank_arr[order], pa.int64()),
        }))

    # msgpass tier: distributed message-passing rounds (see docstring)
    def to_edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["src"],
            "rank": pa.nulls(t.num_rows, pa.int64()),
            "dst": t["dst"],
        })

    edge_rows = edges.map_batches(
        to_edge_rows, batch_format="pyarrow").materialize()

    def seed(t: pa.Table) -> pa.Table:
        # node universe = src ∪ dst (dst-only nodes dangle but exist)
        both = pa.table({"node": pa.chunked_array([
            pc.cast(t["src"], pa.string()).combine_chunks()
            if isinstance(t["src"], pa.ChunkedArray) else t["src"],
            pc.cast(t["dst"], pa.string()).combine_chunks()
            if isinstance(t["dst"], pa.ChunkedArray) else t["dst"],
        ])})
        g = pa.TableGroupBy(both, ["node"]).aggregate([])  # block-distinct
        return pa.table({
            "node": g["node"],
            "rank": pa.array([SCALE] * g.num_rows, pa.int64()),
            "dst": pa.nulls(g.num_rows, pa.string()),
        })

    # per-block pre-distinct; the groupby slice makes it global
    ranks = edges.map_batches(seed, batch_format="pyarrow") \
        .groupby("node").map_groups(
            lambda g: g.slice(0, 1), batch_format="pyarrow")

    def send(g: pa.Table) -> pa.Table:
        rank = g["rank"].drop_null()
        r = rank[0].as_py()
        node = g["node"][0].as_py()
        dsts = g["dst"].drop_null()
        if isinstance(dsts, pa.ChunkedArray):
            dsts = dsts.combine_chunks()
        k = len(dsts)
        # the zero self-contribution keeps receive-only (dangling-in)
        # and isolated-this-round nodes in the rank vector
        out_nodes = pa.concat_arrays([pa.array([node], pa.string()), dsts])
        per_edge = [] if k == 0 else [r // k] * k  # k=0: dangling node
        return pa.table({
            "node": out_nodes,
            "contrib": pa.array([0] + per_edge, pa.int64()),
        })

    from ray.data.aggregate import Sum

    for _ in range(iters):
        msgs = (ranks.union(edge_rows)
                .groupby("node").map_groups(send, batch_format="pyarrow"))
        summed = msgs.groupby("node").aggregate(
            Sum("contrib", alias_name="s"))

        def finish(t: pa.Table) -> pa.Table:
            s = np.asarray(pc.cast(t["s"], pa.int64()), dtype=np.int64)
            r = _BASE + _damp(s)  # overflow-safe damping, see _damp
            return pa.table({
                "node": t["node"], "rank": pa.array(r, pa.int64()),
                "dst": pa.nulls(t.num_rows, pa.string()),
            })

        ranks = summed.map_batches(finish, batch_format="pyarrow") \
            .materialize()

    out = ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_fp": t["rank"]}),
        batch_format="pyarrow")
    return out.sort(["rank_fp", "node"], descending=[True, False])


def pagerank_user_item(sf_dir: str, iters: int = 5,
                       force_distributed: bool = False,
                       tier: str | None = None):
    """PageRank over the full user-item interaction graph (symmetric
    DISTINCT edges, so no node dangles) — pagerank_edges applied to the
    events derivation."""
    return pagerank_edges(_distinct_edges(sf_dir), iters=iters,
                          force_distributed=force_distributed, tier=tier)


_USER_ITEM_EDGES_CTE = """pairs AS (
          SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS a,
                 'k' || regexp_extract(props, '"k":\\s*(-?[0-9]+)', 1) AS b
          FROM events),
        edges AS (SELECT a AS src, b AS dst FROM pairs
                  UNION SELECT b, a FROM pairs)"""


def pagerank_sql_for_edges(edges_cte: str, iters: int = 5) -> str:
    """Unrolled fixed-iteration SQL replica of pagerank_edges for any
    edge derivation (`edges_cte` must define edges(src, dst), already
    DISTINCT) — identical integer fixed-point arithmetic (DuckDB's //
    is integer floor division; SUM widens to HUGEINT, so each step
    casts back to BIGINT after the exact integer ops).  Dangling nodes
    keep a rank via the LEFT JOIN + COALESCE(…, 0) — the same
    zero-self-contribution rule as the engine."""
    head = f"""
        WITH {edges_cte},
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
        r{i} AS (SELECT n.node,
                       CAST({_BASE}
                            + (85 * COALESCE(SUM(r.r // d.d), 0)) // 100
                            AS BIGINT) AS r
                FROM nodes n
                LEFT JOIN edges e ON e.dst = n.node
                LEFT JOIN r{i-1} r ON r.node = e.src
                LEFT JOIN deg d ON d.src = e.src
                GROUP BY n.node)""")
    return (head + "," + ",".join(steps)
            + f"\n        SELECT node, r AS rank_fp FROM r{iters} "
              "ORDER BY rank_fp DESC, node")


def pagerank_oracle_sql(iters: int = 5) -> str:
    """The driver oracle for pagerank_user_item."""
    return pagerank_sql_for_edges(_USER_ITEM_EDGES_CTE, iters=iters)


# ---------------------------------------------------------------------------
# Connected components
# ---------------------------------------------------------------------------

def graph_components(sf_dir: str, force_distributed: bool = False,
                     tier: str | None = None):
    """Connected components over the SPARSIFIED interaction graph
    (high-value error events only — the full graph is one dense
    component; the filter is part of the query contract, shared with the
    SQL oracle via COMPONENT_FILTER) — components_of_edges applied to
    the events derivation."""
    et, mv = COMPONENT_FILTER
    return components_of_edges(
        _distinct_edges(sf_dir, event_type=et, min_value=mv),
        force_distributed=force_distributed, tier=tier)


def components_of_edges(edges, force_distributed: bool = False,
                        tier: str | None = None):
    """WEAK connected components over an arbitrary DISTINCT edge
    Dataset[(src, dst)] — direction is ignored (the propagation
    symmetrizes internally).  Returns (cluster_id, node) for every
    node, cluster_id = lexicographic min node id of the component.

    THREE tiers like pagerank_edges (auto by size; `tier` forces one):
      driver     union-find over the edge-count-sized DISTINCT list.
      broadcast  edges arbitrarily large, nodes fit a worker: the label
                 vector is ray.put per round; each edge block computes
                 (node -> min incoming label) partials IN-BATCH, one
                 node-sized grouped min finishes the round, and
                 convergence is an exact array compare on the driver.
      msgpass    nodes too big to broadcast: join-free min-label
                 propagation, one groupby round per hop; convergence =
                 per-round 64-bit (node,label) fingerprint sum (labels
                 move monotonically downward; ~2^-64 collision risk;
                 loop caps at 64 rounds with a grouped-min fallback).
    All tiers forced in tests and must agree."""
    import ray.data as rd

    assert tier in (None, "driver", "broadcast", "msgpass")
    edges = edges.materialize()
    n_edges = edges.count()
    empty = pa.table({"cluster_id": pa.array([], pa.string()),
                      "node": pa.array([], pa.string())})
    if n_edges == 0:
        return rd.from_arrow(empty)

    use_driver = (tier == "driver" or
                  (tier is None and n_edges <= _DRIVER_MAX_EDGES
                   and not force_distributed))
    if use_driver:
        df = edges.to_pandas()
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(df["src"], df["dst"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        rows = sorted((find(n), n) for n in parent)
        return rd.from_arrow(pa.table({
            "cluster_id": pa.array([r[0] for r in rows]),
            "node": pa.array([r[1] for r in rows]),
        }))

    # node universe (node-sized aggregate; also sizes the tier choice)
    def node_partials(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(np.concatenate([s, d])))})

    node_ds = (edges.map_batches(node_partials, batch_format="pyarrow")
               .groupby("node").count().drop_columns(["count()"])
               .materialize())
    n_nodes = node_ds.count()

    if tier == "broadcast" or (tier is None and n_nodes <= _BCAST_MAX_NODES):
        import ray

        nodes_arr = np.sort(node_ds.to_pandas()["node"].to_numpy())
        # labels as indices into the sorted node array (int64 min is
        # cheaper and exactly mirrors lexicographic min on node ids)
        int_edges = _int_index_edges(edges, nodes_arr)
        labels = np.arange(len(nodes_arr), dtype=np.int64)
        while True:  # exact fixpoint: labels strictly decrease until
            #          converged (<= diameter rounds), compare is exact
            state_ref = ray.put(labels)

            def min_partials(t: pa.Table, _ref=state_ref) -> pa.Table:
                lbl_b = ray.get(_ref)
                si = t["si"].to_numpy(zero_copy_only=False)
                di = t["di"].to_numpy(zero_copy_only=False)
                # symmetrized: each edge proposes its other end's label
                tgt = np.concatenate([si, di])
                prop = np.concatenate([lbl_b[di], lbl_b[si]])
                order = np.argsort(tgt, kind="stable")
                tgt, prop = tgt[order], prop[order]
                cuts = np.flatnonzero(np.concatenate(
                    [[True], tgt[1:] != tgt[:-1]]))
                mins = np.minimum.reduceat(prop, cuts)
                return pa.table({"idx": pa.array(tgt[cuts], pa.int64()),
                                 "m": pa.array(mins, pa.int64())})

            # pull per-block minima, merge on the driver — no shuffle
            # (same trade as the PageRank broadcast tier)
            part = (int_edges.map_batches(min_partials,
                                          batch_format="pyarrow")
                    .to_pandas())
            new_labels = labels.copy()
            np.minimum.at(new_labels, part["idx"].to_numpy(),
                          part["m"].to_numpy())
            if np.array_equal(new_labels, labels):
                break
            labels = new_labels
        order = np.lexsort((nodes_arr, labels))
        return rd.from_arrow(pa.table({
            "cluster_id": pa.array(nodes_arr[labels][order]),
            "node": pa.array(nodes_arr[order]),
        }))

    def to_msgs(t: pa.Table) -> pa.Table:
        # symmetrize: weak components ignore direction (no-op duplicate
        # messages when the input was already symmetric)
        def _flat(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) \
                else x

        a, b = _flat(t["src"]), _flat(t["dst"])
        return pa.table({
            "node": pa.chunked_array([a, b]),
            "lbl": pa.nulls(2 * t.num_rows, pa.string()),
            "dst": pa.chunked_array([b, a]),
        })

    edge_rows = edges.map_batches(
        to_msgs, batch_format="pyarrow").materialize()

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "lbl": t["node"],
                         "dst": pa.nulls(t.num_rows, pa.string())})

    labels = edge_rows.map_batches(seed, batch_format="pyarrow")

    def propagate(g: pa.Table) -> pa.Table:
        node = g["node"][0].as_py()
        lbls = g["lbl"].drop_null()
        m = pc.min(lbls).as_py() if len(lbls) else None
        m = node if m is None else min(m, node)
        dsts = g["dst"].drop_null()
        if isinstance(dsts, pa.ChunkedArray):
            dsts = dsts.combine_chunks()
        out_nodes = pa.concat_arrays([pa.array([node], pa.string()), dsts])
        k = len(out_nodes)
        return pa.table({
            "node": out_nodes,
            "lbl": pa.array([m] * k, pa.string()),
            "dst": pa.nulls(k, pa.string()),
        })

    from ray.data.aggregate import Min, Sum

    def lbl_len_partials(t: pa.Table) -> pa.Table:
        # monotone convergence metric for STRING labels: per-node min
        # label can only move lexicographically downward, so the sum of
        # (len(lbl), per-node count of label==node fixpoints) is not
        # monotone — instead hash each (node, lbl) pair to int64 and sum
        # per-node MIN hashes; stable across rounds iff labels stable
        from spider_ray.common.tokens import hash_string_array

        h = hash_string_array(pc.binary_join_element_wise(
            t["node"], t["lbl"], "\x1f"))
        return pa.table({"node": t["node"],
                         "h": pa.array(h.view(np.int64), pa.int64())})

    prev_fp = None
    # labels hop one edge per round, so fixpoint arrives within the
    # largest component diameter; a generous cap turns a pathological
    # non-convergence into a loud error instead of a silently-partial
    # clustering (the pre-cap code aggregated the UNCONVERGED state)
    for _ in range(4096):
        labels = (labels.union(edge_rows).groupby("node")
                  .map_groups(propagate, batch_format="pyarrow")
                  ).materialize()
        mins = labels.groupby("node").aggregate(Min("lbl", alias_name="lbl"))
        fp = (mins.map_batches(lbl_len_partials, batch_format="pyarrow")
              .aggregate(Sum("h", alias_name="s")))["s"]
        if fp == prev_fp:
            labels = mins
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            "components_of_edges: min-label propagation did not converge "
            "within 4096 rounds (component diameter > 4096?)")
    return (labels.map_batches(
        lambda t: pa.table({"cluster_id": t["lbl"], "node": t["node"]}),
        batch_format="pyarrow").sort(["cluster_id", "node"]))


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999), normalization-free integer
# variant — pure int64 sums, exact at any accumulation order, so the
# distributed result hash-matches the unrolled SQL verbatim
# ---------------------------------------------------------------------------


def hits_edges(edges, iters: int = 2, force_distributed: bool = False,
               tier: str | None = None):
    """HITS over an arbitrary DIRECTED distinct-edge Dataset[(src,dst)]:

        hub_0(n)    = 1
        auth_t(n)   = Σ_{(m,n)∈E} hub_{t-1}(m)
        hub_t(n)    = Σ_{(n,m)∈E} auth_t(m)

    The classic algorithm L2-normalizes each step — an irrational op no
    integer SQL replica can reproduce — so this variant runs a FIXED
    small number of un-normalized rounds: the resulting integer scores
    induce the same ranking as one normalized power-iteration step
    sequence (normalization rescales, never reorders), values stay
    exact, and overflow is checked LOUDLY per half-step against the
    max-degree bound instead of wrapping (raise = lower `iters` or
    rescale; at iters=2 scores are <= D^4 for max degree D).  Returns
    (node, auth_score, hub_score) sorted by (auth desc, node).

    Three execution tiers (auto by size; `tier` forces one in tests),
    mirroring pagerank_edges: `driver` (numpy scatter-adds);
    `broadcast` (edges unbounded, nodes fit a worker — the score
    vectors ray.put per half-step, per-edge-block searchsorted gather +
    in-batch pre-aggregation, per-block partials merged on the driver —
    edges never leave their blocks, no shuffle after the one distinct
    pass); `msgpass` (nodes unbounded too — pagerank's message rounds,
    two per iteration: one groupby over (score rows ∪ edge rows) keyed
    on the sending side emits contributions along edges, one grouped
    sum + universe zero rows reduces; nothing node-sized ever touches
    the driver, the overflow bound checked from tiny Max aggregates)."""
    import ray
    import ray.data as rd

    assert tier in (None, "driver", "broadcast", "msgpass")
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "auth_score": pa.array([], pa.int64()),
            "hub_score": pa.array([], pa.int64())}))

    def _check_bound(vec_max: int, deg_max: int, what: str) -> None:
        if vec_max and deg_max and vec_max * deg_max >= 1 << 62:
            raise ValueError(
                f"hits_edges: {what} sum could exceed int64 "
                f"(max value {vec_max} x max degree {deg_max}); "
                "lower iters")

    use_driver = (tier == "driver" or
                  (tier is None and n_edges <= _DRIVER_MAX_EDGES
                   and not force_distributed))
    if use_driver:
        df = edges.to_pandas()
        src, dst = df["src"].to_numpy(), df["dst"].to_numpy()
        nodes = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        out_deg = int(np.bincount(si, minlength=len(nodes)).max())
        in_deg = int(np.bincount(di, minlength=len(nodes)).max())
        hub = np.ones(len(nodes), np.int64)
        auth = np.zeros(len(nodes), np.int64)
        for _ in range(iters):
            _check_bound(int(hub.max()), in_deg, "authority")
            auth = np.zeros(len(nodes), np.int64)
            np.add.at(auth, di, hub[si])
            _check_bound(int(auth.max()), out_deg, "hub")
            hub = np.zeros(len(nodes), np.int64)
            np.add.at(hub, si, auth[di])
        order = np.lexsort((nodes, -auth))
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes[order]),
            "auth_score": pa.array(auth[order], pa.int64()),
            "hub_score": pa.array(hub[order], pa.int64())}))

    # node universe + degrees in ONE aggregate pass (shared by the
    # broadcast and msgpass tiers; only tiny reductions of it ever
    # reach the driver on the msgpass path)
    from ray.data.aggregate import Max, Sum

    def node_deg_partials(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        us, cs = np.unique(src, return_counts=True)
        ud, cd = np.unique(dst, return_counts=True)
        return pa.table({
            "node": pa.array(np.concatenate([us, ud])),
            "od": pa.array(np.concatenate(
                [cs, np.zeros(len(ud))]).astype(np.int64), pa.int64()),
            "id_": pa.array(np.concatenate(
                [np.zeros(len(us)), cd]).astype(np.int64), pa.int64()),
        })

    node_deg = (edges.map_batches(node_deg_partials, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("od", alias_name="od"),
                                           Sum("id_", alias_name="id_"))
                .materialize())
    n_nodes = node_deg.count()
    degs = node_deg.aggregate(Max("od", alias_name="od"),
                              Max("id_", alias_name="id_"))
    out_deg, in_deg = int(degs["od"]), int(degs["id_"])

    if tier == "msgpass" or (tier is None and n_nodes > _BCAST_MAX_NODES):
        return _hits_msgpass(edges, node_deg, iters, out_deg, in_deg,
                             _check_bound)

    nd = node_deg.to_pandas().sort_values("node", ignore_index=True)
    nodes_arr = nd["node"].to_numpy()
    int_edges = _int_index_edges(edges, nodes_arr)

    def _half_step(vec: np.ndarray, gather_col: str,
                   scatter_col: str) -> np.ndarray:
        """new[scatter] += vec[gather] over every edge — per-block
        in-batch pre-aggregation, partials merged on the driver (the
        node vector fits the driver by this tier's premise; see the
        pagerank broadcast tier for the measured shuffle-vs-pull cost)."""
        vec_ref = ray.put(vec)

        def partials(t: pa.Table, _ref=vec_ref) -> pa.Table:
            v = ray.get(_ref)  # zero-copy shm view
            g = t[gather_col].to_numpy(zero_copy_only=False)
            s = t[scatter_col].to_numpy(zero_copy_only=False)
            uo, inv = np.unique(s, return_inverse=True)
            acc = np.zeros(len(uo), np.int64)
            np.add.at(acc, inv, v[g])
            return pa.table({"idx": pa.array(uo, pa.int64()),
                             "s": pa.array(acc, pa.int64())})

        part = (int_edges.map_batches(partials, batch_format="pyarrow")
                .to_pandas())
        out = np.zeros(n_nodes, np.int64)
        np.add.at(out, part["idx"].to_numpy(), part["s"].to_numpy())
        return out

    hub = np.ones(n_nodes, np.int64)
    auth = np.zeros(n_nodes, np.int64)
    for _ in range(iters):
        _check_bound(int(hub.max()), in_deg, "authority")
        auth = _half_step(hub, "si", "di")
        _check_bound(int(auth.max()), out_deg, "hub")
        hub = _half_step(auth, "di", "si")
    order = np.lexsort((nodes_arr, -auth))
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes_arr[order]),
        "auth_score": pa.array(auth[order], pa.int64()),
        "hub_score": pa.array(hub[order], pa.int64())}))


def hits_user_item(sf_dir: str, iters: int = 2,
                   force_distributed: bool = False,
                   tier: str | None = None):
    """HITS over the DIRECTED user->item interaction graph (the classic
    bipartite case: users are pure hubs, items pure authorities —
    which the oracle equality then certifies end-to-end)."""
    return hits_edges(_distinct_edges(sf_dir, directed=True), iters=iters,
                      force_distributed=force_distributed, tier=tier)


_USER_ITEM_DIRECTED_CTE = """edges AS (
          SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
                 'k' || regexp_extract(props, '"k":\\s*(-?[0-9]+)', 1) AS dst
          FROM events)"""


def hits_sql_for_edges(edges_cte: str, iters: int = 2) -> str:
    """Unrolled fixed-iteration SQL replica of hits_edges for any edge
    derivation (`edges_cte` must define edges(src, dst), DISTINCT) —
    identical integer sums (SUM widens to HUGEINT; each step casts back
    to BIGINT, exact because the engine checks the same bound)."""
    prev_hub = None  # None = hub_0 is the constant 1
    body = []
    for i in range(1, iters + 1):
        hub_val = "1" if prev_hub is None else "h.v"
        hub_join = "" if prev_hub is None else \
            f" JOIN {prev_hub} h ON h.node = e.src"
        body.append(
            f"a{i} AS (SELECT e.dst AS node,"
            f" CAST(SUM({hub_val}) AS BIGINT) AS v"
            f" FROM edges e{hub_join} GROUP BY e.dst)")
        body.append(
            f"h{i} AS (SELECT e.src AS node,"
            f" CAST(SUM(a.v) AS BIGINT) AS v"
            f" FROM edges e JOIN a{i} a ON a.node = e.dst"
            f" GROUP BY e.src)")
        prev_hub = f"h{i}"
    return f"""
        WITH {edges_cte},
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        {', '.join(body)}
        SELECT n.node,
               COALESCE(a{iters}.v, 0) AS auth_score,
               COALESCE(h{iters}.v, 0) AS hub_score
        FROM nodes n
        LEFT JOIN a{iters} ON a{iters}.node = n.node
        LEFT JOIN h{iters} ON h{iters}.node = n.node
        ORDER BY auth_score DESC, n.node
    """


def hits_oracle_sql(iters: int = 2) -> str:
    return hits_sql_for_edges(_USER_ITEM_DIRECTED_CTE, iters=iters)


def _hits_msgpass(edges, node_deg, iters: int, out_deg: int, in_deg: int,
                  check_bound) -> "object":
    """HITS message-passing tier (nodes unbounded): each half-step is
    ONE groupby over (score rows ∪ edge rows) keyed on the SENDING side
    that emits the sender's score along each of its edges, then ONE
    grouped sum over (messages ∪ universe zero rows) — the zero rows
    keep score-less nodes in the vector, the same aliveness rule as
    pagerank's zero self-contribution.  Two key-partitioned shuffles
    per half-step, nothing node-sized on the driver; the overflow
    bound uses the tiny degree/Max aggregates."""
    import ray.data as rd

    from ray.data.aggregate import Max, Sum

    def fwd(t: pa.Table) -> pa.Table:  # keyed on src, sends to dst
        return pa.table({"node": t["src"],
                         "val": pa.nulls(t.num_rows, pa.int64()),
                         "other": t["dst"]})

    def rev(t: pa.Table) -> pa.Table:  # keyed on dst, sends to src
        return pa.table({"node": t["dst"],
                         "val": pa.nulls(t.num_rows, pa.int64()),
                         "other": t["src"]})

    edge_fwd = edges.map_batches(fwd, batch_format="pyarrow").materialize()
    edge_rev = edges.map_batches(rev, batch_format="pyarrow").materialize()

    def universe_rows(v: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"],
                "val": pa.array([v] * t.num_rows, pa.int64()),
                "other": pa.nulls(t.num_rows, pa.string())})
        return node_deg.map_batches(fn, batch_format="pyarrow")

    zeros = universe_rows(0).materialize()

    def send(g: pa.Table) -> pa.Table:
        val = g["val"].drop_null()
        v = val[0].as_py() if len(val) else 0
        others = g["other"].drop_null()
        if isinstance(others, pa.ChunkedArray):
            others = others.combine_chunks()
        return pa.table({
            "node": others,
            "val": pa.array([v] * len(others), pa.int64())})

    def vec_max(ds) -> int:
        m = ds.aggregate(Max("val", alias_name="m"))["m"]
        return int(m) if m is not None else 0

    hub = universe_rows(1).materialize()
    auth = None
    for _ in range(iters):
        check_bound(vec_max(hub), in_deg, "authority")
        msgs = (hub.union(edge_fwd).groupby("node")
                .map_groups(send, batch_format="pyarrow"))
        auth = (msgs.union(zeros).groupby("node")
                .aggregate(Sum("val", alias_name="val"))
                .map_batches(lambda t: pa.table({
                    "node": t["node"],
                    "val": pc.cast(t["val"], pa.int64()),
                    "other": pa.nulls(t.num_rows, pa.string())}),
                    batch_format="pyarrow").materialize())
        check_bound(vec_max(auth), out_deg, "hub")
        msgs = (auth.union(edge_rev).groupby("node")
                .map_groups(send, batch_format="pyarrow"))
        hub = (msgs.union(zeros).groupby("node")
               .aggregate(Sum("val", alias_name="val"))
               .map_batches(lambda t: pa.table({
                   "node": t["node"],
                   "val": pc.cast(t["val"], pa.int64()),
                   "other": pa.nulls(t.num_rows, pa.string())}),
                   batch_format="pyarrow").materialize())

    a_rows = auth.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "a": pc.cast(t["val"], pa.int64()),
                            "h": pa.array(np.zeros(t.num_rows, np.int64),
                                          pa.int64())}),
        batch_format="pyarrow")
    h_rows = hub.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "a": pa.array(np.zeros(t.num_rows, np.int64),
                                          pa.int64()),
                            "h": pc.cast(t["val"], pa.int64())}),
        batch_format="pyarrow")
    out = (a_rows.union(h_rows).groupby("node")
           .aggregate(Sum("a", alias_name="auth_score"),
                      Sum("h", alias_name="hub_score")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "auth_score": pc.cast(t["auth_score"], pa.int64()),
            "hub_score": pc.cast(t["hub_score"], pa.int64())})

    return (out.map_batches(finish, batch_format="pyarrow")
            .sort(["auth_score", "node"], descending=[True, False]))


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance (crawl depth from the seed list)
# ---------------------------------------------------------------------------

_UNREACHED = np.iinfo(np.int64).max  # iteration-internal sentinel only


def bfs_depth_edges(edges, seeds: list[str] | None = None,
                    n_seeds: int = 3, max_depth: int = 6,
                    force_distributed: bool = False,
                    tier: str | None = None):
    """Multi-source BFS hop distance along a DIRECTED distinct-edge
    Dataset[(src, dst)] — the "crawl depth" of every node: the minimum
    number of hops from any seed, capped at `max_depth`.  Returns
    (node, depth) for every REACHED node, sorted by node; unreached
    nodes are absent (the SQL replica has the same contract).

    Seeds: an explicit url/node list, or (seeds=None) the `n_seeds`
    lexicographically smallest node ids — a rule the SQL oracle can
    replicate exactly.  Explicit seeds appear in the output at depth 0
    even when no edge touches them (a seed page with no links is still
    crawled); depths are pure int64 so every tier hash-matches the
    unrolled SQL at any parallelism.

    The reference engine walks its graph one dispatched message at a
    time (reference pkg/spider/workflow.go:129 dependency dispatch);
    this is the bulk, level-synchronous equivalent over the crawl's
    href graph.  THREE tiers like pagerank_edges (auto by size; `tier`
    forces one in tests):
      driver     edges fit the driver: per-level masked scatter-min
                 over int-indexed edge arrays (O(E) per level).
      broadcast  edges unbounded, NODES fit a worker (the 10^10-edge /
                 10^8-host web regime): the int64 distance vector is
                 ray.put once per level; each edge block relaxes ONLY
                 edges whose src sits on the current frontier
                 (dist[si] == level) and returns its block-distinct
                 newly-reached targets; the driver merges — frontier-
                 sized traffic, no shuffle, early-exit when a level
                 discovers nothing.
      msgpass    nodes unbounded: min-label propagation (the
                 components_of_edges shape) carrying depth+1 along
                 out-edges, exactly max_depth rounds (level k settles
                 every node at distance k — no convergence probe
                 needed), messages stop expanding past max_depth."""
    import ray.data as rd

    assert tier in (None, "driver", "broadcast", "msgpass")
    assert max_depth >= 0
    edges = edges.materialize()
    n_edges = edges.count()
    empty = pa.table({"node": pa.array([], pa.string()),
                      "depth": pa.array([], pa.int64())})

    def _seed_arr(local_nodes: np.ndarray | None = None) -> np.ndarray:
        """`local_nodes` = a sorted-unique node universe a tier already
        holds (driver pulls the edges, broadcast pulls the node set) —
        the default smallest-n rule reads it directly instead of paying
        a whole extra Ray execution for the distributed head."""
        if seeds is not None:
            return np.unique(np.asarray(list(seeds), dtype=object))
        if local_nodes is not None:
            return local_nodes[:n_seeds]
        # default rule (shared with the SQL): n smallest node ids —
        # a node-sized distinct + tiny head, never edge-sized driver pull
        def node_partials(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            u = np.unique(np.concatenate([s, d]))[:n_seeds]  # block top-n
            return pa.table({"node": pa.array(u)})

        small = (edges.map_batches(node_partials, batch_format="pyarrow")
                 .groupby("node").count().sort("node").limit(n_seeds)
                 .to_pandas())
        return small["node"].to_numpy()

    if n_edges == 0:
        if seeds is None:
            return rd.from_arrow(empty)
        sa = _seed_arr()
        return rd.from_arrow(pa.table({
            "node": pa.array(sa.tolist(), pa.string()),
            "depth": pa.array(np.zeros(len(sa), np.int64), pa.int64())}))

    use_driver = (tier == "driver" or
                  (tier is None and n_edges <= _DRIVER_MAX_EDGES
                   and not force_distributed))
    if use_driver:
        df = edges.to_pandas()
        src = df["src"].to_numpy()
        dst = df["dst"].to_numpy()
        seed_arr = _seed_arr(np.unique(np.concatenate([src, dst])))
        nodes = np.unique(np.concatenate([src, dst, seed_arr]))
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        dist = np.full(len(nodes), _UNREACHED, np.int64)
        dist[np.searchsorted(nodes, seed_arr)] = 0
        for level in range(max_depth):
            m = dist[si] == level  # level-synchronous frontier
            if not m.any():
                break
            np.minimum.at(dist, di[m], level + 1)
        keep = dist != _UNREACHED
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes[keep]),
            "depth": pa.array(dist[keep], pa.int64())}))

    # node universe (node-sized; also sizes the tier choice)
    def node_partials(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(np.concatenate([s, d])))})

    node_ds = (edges.map_batches(node_partials, batch_format="pyarrow")
               .groupby("node").count().drop_columns(["count()"])
               .materialize())
    n_nodes = node_ds.count()

    if tier == "broadcast" or (tier is None and n_nodes <= _BCAST_MAX_NODES):
        import ray

        edge_nodes = np.unique(node_ds.to_pandas()["node"].to_numpy())
        seed_arr = _seed_arr(edge_nodes)
        nodes_arr = np.unique(np.concatenate([edge_nodes, seed_arr]))
        int_edges = _int_index_edges(edges, nodes_arr)
        dist = np.full(len(nodes_arr), _UNREACHED, np.int64)
        dist[np.searchsorted(nodes_arr, seed_arr)] = 0
        for level in range(max_depth):
            state_ref = ray.put(dist)

            def frontier_partials(t: pa.Table, _ref=state_ref,
                                  _lv=level) -> pa.Table:
                dist_b = ray.get(_ref)  # zero-copy shm view
                si = t["si"].to_numpy(zero_copy_only=False)
                di = t["di"].to_numpy(zero_copy_only=False)
                tgt = di[dist_b[si] == _lv]
                # block-distinct, only targets this level IMPROVES —
                # the pull is newly-reached-frontier-sized, not edge-sized
                tgt = np.unique(tgt)
                tgt = tgt[dist_b[tgt] > _lv + 1]
                return pa.table({"idx": pa.array(tgt, pa.int64())})

            part = (int_edges.map_batches(frontier_partials,
                                          batch_format="pyarrow")
                    .to_pandas())
            # a zero-row Dataset loses its columns at to_pandas()
            idx = (part["idx"].to_numpy() if "idx" in part.columns
                   else np.array([], np.int64))
            if len(idx) == 0:
                break
            np.minimum.at(dist, idx, level + 1)
        keep = dist != _UNREACHED
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes_arr[keep]),
            "depth": pa.array(dist[keep], pa.int64())}))

    # msgpass tier: min-depth propagation, exactly max_depth rounds
    seed_arr = _seed_arr()  # nodes unbounded: the distributed head rule

    def to_edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["src"],
            "d": pa.nulls(t.num_rows, pa.int64()),
            "dst": t["dst"],
        })

    edge_rows = edges.map_batches(
        to_edge_rows, batch_format="pyarrow").materialize()
    labels = rd.from_arrow(pa.table({
        "node": pa.array(seed_arr.tolist(), pa.string()),
        "d": pa.array(np.zeros(len(seed_arr), np.int64), pa.int64()),
        "dst": pa.nulls(len(seed_arr), pa.string()),
    }))

    def propagate(g: pa.Table, _cap=max_depth) -> pa.Table:
        node = g["node"][0].as_py()
        ds_ = g["d"].drop_null()
        if len(ds_) == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.string())})
        m = pc.min(ds_).as_py()
        dsts = g["dst"].drop_null()
        if isinstance(dsts, pa.ChunkedArray):
            dsts = dsts.combine_chunks()
        if m + 1 > _cap:
            dsts = dsts.slice(0, 0)  # depth budget exhausted: keep, no send
        out_nodes = pa.concat_arrays([pa.array([node], pa.string()), dsts])
        k = len(dsts)
        return pa.table({
            "node": out_nodes,
            "d": pa.array([m] + [m + 1] * k, pa.int64()),
            "dst": pa.nulls(k + 1, pa.string()),
        })

    from ray.data.aggregate import Min

    for _ in range(max_depth):
        labels = (labels.union(edge_rows).groupby("node")
                  .map_groups(propagate, batch_format="pyarrow")
                  ).materialize()
    out = labels.groupby("node").aggregate(Min("d", alias_name="depth"))
    return (out.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "depth": pc.cast(t["depth"], pa.int64())}),
        batch_format="pyarrow").sort("node"))


def graph_bfs_depth(sf_dir: str, max_depth: int = 6,
                    force_distributed: bool = False,
                    tier: str | None = None):
    """BFS depth over the symmetric user-item interaction graph, seeds
    = the 3 lexicographically smallest node ids (rule shared verbatim
    with the SQL oracle)."""
    return bfs_depth_edges(_distinct_edges(sf_dir), n_seeds=3,
                           max_depth=max_depth,
                           force_distributed=force_distributed, tier=tier)


def bfs_sql_for_edges(edges_cte: str, seeds_sql: str | None = None,
                      n_seeds: int = 3, max_depth: int = 6) -> str:
    """Unrolled level-by-level SQL replica of bfs_depth_edges for any
    edge derivation (`edges_cte` defines edges(src, dst), DISTINCT).
    `seeds_sql` is a SELECT yielding seeds(node); default = the
    n_seeds smallest node ids.  Each level CTE is distinct-node-sized
    (no path explosion); depth = MIN over levels, the BFS identity."""
    seeds_sql = seeds_sql or (
        f"SELECT node FROM nodes ORDER BY node LIMIT {n_seeds}")
    head = f"""
        WITH {edges_cte},
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        seeds AS ({seeds_sql}),
        l0 AS (SELECT node, 0 AS depth FROM seeds)"""
    steps, unions = [], ["SELECT * FROM l0"]
    for i in range(1, max_depth + 1):
        steps.append(f"""
        l{i} AS (SELECT DISTINCT e.dst AS node, {i} AS depth
                FROM l{i-1} p JOIN edges e ON e.src = p.node)""")
        unions.append(f"SELECT * FROM l{i}")
    body = ",".join(steps + [
        "\n        lall AS (" + " UNION ALL ".join(unions) + ")"])
    return (head + "," + body
            + "\n        SELECT node, CAST(MIN(depth) AS BIGINT) AS depth"
              " FROM lall GROUP BY node ORDER BY node")


def bfs_oracle_sql(max_depth: int = 6) -> str:
    """The driver oracle for graph_bfs_depth."""
    return bfs_sql_for_edges(_USER_ITEM_EDGES_CTE, n_seeds=3,
                             max_depth=max_depth)


# ---------------------------------------------------------------------------
# Triangle counting (clustering structure of the co-occurrence graph)
# ---------------------------------------------------------------------------

TRIANGLE_FILTER = "error"  # shared with the SQL oracle


def graph_triangles(sf_dir: str, force_distributed: bool = False,
                    tier: str | None = None):
    """Triangle count of the USER CO-OCCURRENCE projection: users are
    adjacent when they touched the same item (event_type =
    TRIANGLE_FILTER), triangles = closed triples — the clustering
    signal community detection starts from.  Returns one row
    (n_edges, n_triangles) for the canonical (a < b) projection.

    Scale shape: the bipartite (user, item) DISTINCT edges come from
    the usual pre-aggregated groupby; the projection emits per-item
    user pairs inside map_groups (per-item work is C(deg,2) — the
    classic projection hazard; the event filter bounds item degree
    here, and a degree-ordered emit is the documented swap if a
    mega-item corpus needs it) and one grouped distinct makes pairs
    canonical.  Counting tiers (both forced in tests):
      driver     adjacency arrays + per-edge sorted intersection.
      join       wedge join e1(a,b)⋈e2(b,c) on b (a<b<c by edge
                 canonicalization) closed against the edge set with a
                 composite-key Dataset.join — the pure-relational
                 triangle count, every stage hash-partitioned."""
    import ray
    import ray.data as rd

    assert tier in (None, "driver", "join")
    bip = _distinct_edges(sf_dir, event_type=TRIANGLE_FILTER,
                          directed=True)

    def item_pairs(g: pd.DataFrame) -> pd.DataFrame:
        users = np.sort(g["src"].to_numpy())
        if len(users) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(users), k=1)
        return pd.DataFrame({"a": users[i], "b": users[j]})

    proj = (bip.groupby("dst").map_groups(item_pairs,
                                          batch_format="pandas")
            .groupby(["a", "b"]).count().drop_columns(["count()"])
            .materialize())
    n_edges = proj.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "n_edges": pa.array([0], pa.int64()),
            "n_triangles": pa.array([0], pa.int64())}))

    use_driver = (tier == "driver" or
                  (tier is None and n_edges <= _DRIVER_MAX_EDGES
                   and not force_distributed))
    if use_driver:
        df = proj.to_pandas()
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        nodes = np.unique(np.concatenate([a, b]))
        ai = np.searchsorted(nodes, a)
        bi = np.searchsorted(nodes, b)
        # forward adjacency (neighbors with larger id), CSR-style;
        # count = wedges (u->v->w) whose closing edge (u,w) exists —
        # fully vectorized: expand every edge by its head's out-degree,
        # then one sorted-membership test on composite int keys
        order = np.lexsort((bi, ai))
        ai_s, bi_s = ai[order], bi[order]
        n_nodes = len(nodes)
        starts = np.searchsorted(ai_s, np.arange(n_nodes + 1))
        out_deg = np.diff(starts)
        rep = out_deg[bi_s]  # wedges continuing through each edge's head
        edge_keys = ai_s * n_nodes + bi_s  # sorted by construction
        tri = 0
        # chunk the wedge expansion: a hot-item clique can hold 1e9+
        # wedges — bound the transient arrays instead of materializing
        # them all (the memory hazard of the naive vectorization)
        _WEDGE_CHUNK = 1 << 22
        cum = np.cumsum(rep)
        lo = 0
        while lo < len(ai_s):
            base_cum = cum[lo - 1] if lo else 0
            hi = int(np.searchsorted(cum, base_cum + _WEDGE_CHUNK,
                                     side="right"))
            hi = max(hi, lo + 1)  # a single mega-edge still advances
            hi = min(hi, len(ai_s))
            rep_c = rep[lo:hi]
            total = int(rep_c.sum())
            if total:
                u_rep = np.repeat(ai_s[lo:hi], rep_c)
                base = np.repeat(starts[bi_s[lo:hi]], rep_c)
                offs = (np.arange(total, dtype=np.int64)
                        - np.repeat(np.cumsum(rep_c) - rep_c, rep_c))
                w = bi_s[base + offs]
                wedge_keys = u_rep * n_nodes + w
                pos = np.searchsorted(edge_keys, wedge_keys)
                pos = np.minimum(pos, len(edge_keys) - 1)
                tri += int((edge_keys[pos] == wedge_keys).sum())
            lo = hi
        return rd.from_arrow(pa.table({
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([int(tri)], pa.int64())}))

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # a sparse side can deliver NOTHING to a hash partition and the
    # shuffle then builds a zero-column block (repo join gotcha):
    # bound partitions by the edge count and repartition the inputs
    nparts = max(2, min(cpus // 2, n_edges))
    proj_r = proj.repartition(nparts).materialize()
    e2 = proj_r.map_batches(
        lambda t: pa.table({"b2": t["a"], "c": t["b"]}),
        batch_format="pyarrow")
    wedges = (proj_r.join(e2, join_type="inner", num_partitions=nparts,
                          on=("b",), right_on=("b2",))
              .map_batches(lambda t: pa.table({"a": t["a"], "c": t["c"]}),
                           batch_format="pyarrow")
              .materialize())
    if wedges.count() == 0:
        # wedge-free projection (e.g. a perfect matching): the closing
        # join would see schema-less empty blocks — answer directly
        tri = 0
    else:
        closer = proj_r.map_batches(
            lambda t: pa.table({"a2": t["a"], "c2": t["b"]}),
            batch_format="pyarrow")
        closed = wedges.join(closer, join_type="inner",
                             num_partitions=nparts,
                             on=("a", "c"), right_on=("a2", "c2"))
        tri = closed.count()
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_triangles": pa.array([int(tri)], pa.int64())}))


def triangles_oracle_sql() -> str:
    return f"""
        WITH s AS (SELECT DISTINCT
                          'u' || CAST(user_id AS VARCHAR) AS u,
                          'k' || regexp_extract(props,
                                                '"k":\\s*(-?[0-9]+)',
                                                1) AS k
                   FROM events
                   WHERE event_type = '{TRIANGLE_FILTER}'),
        uu AS (SELECT DISTINCT s1.u AS a, s2.u AS b
               FROM s s1 JOIN s s2 ON s1.k = s2.k AND s1.u < s2.u)
        SELECT (SELECT count(*) FROM uu) AS n_edges,
               (SELECT count(*)
                FROM uu e1 JOIN uu e2 ON e2.a = e1.b
                           JOIN uu e3 ON e3.a = e1.a AND e3.b = e2.b)
                   AS n_triangles
    """


def graph_degree_histogram(sf_dir: str):
    """Out-degree distribution of the directed user→item graph
    (how many users touch exactly d distinct items) — the power-law
    sanity check every web-graph pipeline runs before sizing skew
    mitigations.  Two pre-aggregated shuffles, both tiny: DISTINCT
    edges -> per-user degree (user-sized) -> per-block (degree, count)
    partials -> one grouped sum (degree-DOMAIN-sized)."""
    from ray.data.aggregate import Sum

    edges = _distinct_edges(sf_dir, directed=True)
    deg = edges.groupby("src").count()

    def partials(t: pa.Table) -> pa.Table:
        d = np.asarray(t["count()"], dtype=np.int64)
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(ud, pa.int64()),
                         "n_users": pa.array(cnt.astype(np.int64),
                                             pa.int64())})

    return (deg.map_batches(partials, batch_format="pyarrow")
            .groupby("degree").aggregate(Sum("n_users",
                                             alias_name="n_users"))
            .sort("degree"))


# ---------------------------------------------------------------------------
# Personalized PageRank (topic-sensitive restart, Haveliwala 2002)
# ---------------------------------------------------------------------------

def ppr_edges(edges, seeds: list[str] | None = None, n_seeds: int = 3,
              iters: int = 5, force_distributed: bool = False,
              tier: str | None = None):
    """Personalized PageRank: the restart mass lands ONLY on the seed
    set (Haveliwala 2002's topic-sensitive variant) — the relevance
    propagation a crawl scheduler uses to bias the frontier toward a
    topic's neighborhood.

    rank_0(n)   = SCALE·[n ∈ seeds]
    rank_i+1(n) = BASE·[n ∈ seeds] + (85·Σ_{(m,n)∈E} rank_i(m)//deg(m))//100

    Same int64 fixed-point arithmetic as pagerank_edges (exact at any
    accumulation order → every tier hash-matches the generated SQL
    unroll).  Seeds: explicit list or the n_seeds smallest node ids
    (the BFS seed rule, SQL-replicable).  Two tiers, both forced in
    tests: driver (numpy scatter-add) and broadcast (rank/deg vectors
    ray.put per iteration, in-batch dst pre-aggregation, driver merge —
    the pagerank broadcast shape; a msgpass variant would mirror
    pagerank's and is omitted until a node-unbounded PPR caller
    exists).  Returns (node, rank_fp) for ALL nodes sorted by
    (rank desc, node); non-seed nodes unreachable from seeds rank 0."""
    import ray
    import ray.data as rd

    assert tier in (None, "driver", "broadcast")
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank_fp": pa.array([], pa.int64())}))

    def node_deg_partials(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        us, cs = np.unique(src, return_counts=True)
        ud = np.unique(dst)
        return pa.table({
            "node": pa.array(np.concatenate([us, ud])),
            "deg": pa.array(np.concatenate(
                [cs.astype(np.int64), np.zeros(len(ud), np.int64)]),
                pa.int64()),
        })

    from ray.data.aggregate import Sum

    node_deg = (edges.map_batches(node_deg_partials,
                                  batch_format="pyarrow")
                .groupby("node").aggregate(Sum("deg", alias_name="deg"))
                .materialize())
    nd = node_deg.to_pandas().sort_values("node", ignore_index=True)
    nodes_arr = nd["node"].to_numpy()
    deg_arr = nd["deg"].to_numpy(np.int64)
    if seeds is None:
        seed_arr = nodes_arr[:n_seeds]
    else:
        seed_arr = np.unique(np.asarray(
            [s for s in seeds if s in set(nodes_arr)], dtype=object))
    is_seed = np.zeros(len(nodes_arr), bool)
    is_seed[np.searchsorted(nodes_arr, seed_arr)] = True
    base_vec = np.where(is_seed, _BASE, 0).astype(np.int64)
    rank = np.where(is_seed, SCALE, 0).astype(np.int64)

    use_driver = (tier == "driver" or
                  (tier is None and n_edges <= _DRIVER_MAX_EDGES
                   and not force_distributed))
    if use_driver:
        df = edges.to_pandas()
        si = np.searchsorted(nodes_arr, df["src"].to_numpy())
        di = np.searchsorted(nodes_arr, df["dst"].to_numpy())
        for _ in range(iters):
            contrib = rank[si] // deg_arr[si]
            s = np.zeros(len(nodes_arr), np.int64)
            np.add.at(s, di, contrib)
            rank = base_vec + _damp(s)
    else:
        int_edges = _int_index_edges(edges, nodes_arr)
        for _ in range(iters):
            state_ref = ray.put((deg_arr, rank))

            def contrib_partials(t: pa.Table, _ref=state_ref) -> pa.Table:
                deg_b, rank_b = ray.get(_ref)
                si = t["si"].to_numpy(zero_copy_only=False)
                di = t["di"].to_numpy(zero_copy_only=False)
                contrib = rank_b[si] // deg_b[si]
                ud, inv = np.unique(di, return_inverse=True)
                s = np.zeros(len(ud), np.int64)
                np.add.at(s, inv, contrib)
                return pa.table({"idx": pa.array(ud, pa.int64()),
                                 "s": pa.array(s, pa.int64())})

            part = (int_edges.map_batches(contrib_partials,
                                          batch_format="pyarrow")
                    .to_pandas())
            s_full = np.zeros(len(nodes_arr), np.int64)
            if "idx" in part.columns:
                np.add.at(s_full, part["idx"].to_numpy(),
                          part["s"].to_numpy())
            rank = base_vec + _damp(s_full)
    order = np.lexsort((nodes_arr, -rank))
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "node": pa.array(nodes_arr[order]),
        "rank_fp": pa.array(rank[order], pa.int64()),
    }))


def ppr_user_item(sf_dir: str, iters: int = 5,
                  force_distributed: bool = False,
                  tier: str | None = None):
    """Personalized PageRank over the symmetric interaction graph,
    seeds = the 3 smallest node ids (rule shared with the SQL)."""
    return ppr_edges(_distinct_edges(sf_dir), n_seeds=3, iters=iters,
                     force_distributed=force_distributed, tier=tier)


def ppr_sql_for_edges(edges_cte: str, seeds_sql: str | None = None,
                      n_seeds: int = 3, iters: int = 5) -> str:
    """Generated SQL unroll of ppr_edges — pagerank_sql_for_edges with
    the restart mass restricted to the seed set."""
    seeds_sql = seeds_sql or (
        f"SELECT node FROM nodes ORDER BY node LIMIT {n_seeds}")
    head = f"""
        WITH {edges_cte},
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        seeds AS ({seeds_sql}),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        r0 AS (SELECT node,
                      CAST(CASE WHEN node IN (SELECT node FROM seeds)
                           THEN {SCALE} ELSE 0 END AS BIGINT) AS r
               FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
        r{i} AS (SELECT n.node,
                       CAST(CASE WHEN n.node IN (SELECT node FROM seeds)
                                 THEN {_BASE} ELSE 0 END
                            + (85 * COALESCE(SUM(r.r // d.d), 0)) // 100
                            AS BIGINT) AS r
                FROM nodes n
                LEFT JOIN edges e ON e.dst = n.node
                LEFT JOIN r{i-1} r ON r.node = e.src
                LEFT JOIN deg d ON d.src = e.src
                GROUP BY n.node)""")
    return (head + "," + ",".join(steps)
            + f"\n        SELECT node, r AS rank_fp FROM r{iters} "
              "ORDER BY rank_fp DESC, node")


def ppr_oracle_sql(iters: int = 5) -> str:
    """The driver oracle for ppr_user_item."""
    return ppr_sql_for_edges(_USER_ITEM_EDGES_CTE, n_seeds=3,
                             iters=iters)
