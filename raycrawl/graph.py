"""Graph analytics over the crawl's own output — the web-graph algorithm
lane (the reference stores a link graph in Neo4j but never ranks it; a
crawl engine at 100 TB feeds exactly this step downstream).

PageRank runs in INTEGER rank units so every sum is order-independent and
the DuckDB oracle hash-matches bit-for-bit: rank starts at ``BASE=10^12``
units per node, one iteration is

    R'(v) = K + sum over in-edges (u -> v) of (R(u) * 85) // (100 * outdeg(u))

with ``K = (15 * BASE) // 100`` (the (1-d)/N teleport term made per-node
constant) and floor division throughout. Dangling-node mass is dropped —
documented, and the SQL oracle drops it identically. This is standard
damped PageRank re-expressed in exact arithmetic, not an approximation of
a float spec.

Distributed shape (per iteration, two hash shuffles, no Acero join):
scatter — union(edge rows keyed by src, rank rows keyed by src) →
``groupby(src).map_groups``: the group IS the adjacency list, so outdeg is
the group's edge count; emit one (dst, contrib) row per edge; gather —
union(contribs, one zero row per node) → ``groupby(node).sum`` + K.
Each iteration is materialized so lineage stays one round deep. At the
10^10-node design point the rank table shards like any keyed Dataset and
the scatter/gather are the canonical Pregel-on-a-Dataset encoding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BASE = 10**12
DAMP_NUM = 85
DAMP_DEN = 100
TELEPORT = (15 * BASE) // 100


def crawl_pagerank(edges_ds, crawl_id: str, iters: int = 10,
                   distributed: bool | None = None,
                   driver_max_edges: int = 100_000) -> pa.Table:
    """Integer-unit PageRank over one crawl's link graph. Returns
    (node, rank_units:int64) ordered by node.

    Size-gated like the broadcast joins: while the graph fits a driver
    comfortably the iteration is a vectorized np.add.at loop over dense
    node indices — 20 shuffles of a 30-row table would be pure scheduler
    tax. The gate decides on a distributed COUNT of the filtered edges
    (nothing is materialized before the decision); above it, or with
    ``distributed=True``, it runs the sharded path: static inputs (edge
    stream, node carrier, initial ranks) derived with map_batches/groupby
    and an iteration that never funnels the rank table through the driver
    — at the 10^10-node design point the per-node state is exactly what
    must shard. Both paths are pytest-pinned equal (identical integer
    recurrence).

    ``driver_max_edges=1e5`` also bounds nodes N ≤ 2e5, which makes the
    driver path's int64 arithmetic provably safe: total rank mass never
    exceeds its initial N·BASE (damping only removes mass, teleport
    restores exactly the removed fraction at fixpoint), so any single
    r ≤ N·BASE ≤ 2e17 and r·85 ≤ 1.7e19 — within uint64, so the driver
    path multiplies in uint64 and casts back (values are non-negative).
    The distributed path multiplies in Python ints inside the group (no
    width limit); its per-row int64 columns bound a single node's rank at
    ~9.2e18, i.e. BASE must shrink with N beyond ~9e6-node graphs — at
    web scale you rescale the unit, not the algorithm."""
    from ray.data.aggregate import Sum

    filtered = edges_ds.map_batches(
        lambda t: t.filter(pc.equal(t["crawl_id"], crawl_id))
                   .select(["src", "dst"]),
        batch_format="pyarrow").materialize()
    if distributed is None:
        distributed = filtered.count() > driver_max_edges

    if not distributed:
        edges = pa.Table.from_pandas(filtered.to_pandas(),
                                     preserve_index=False)
        src = edges["src"].to_numpy(zero_copy_only=False)
        dst = edges["dst"].to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([src, dst]),
                               return_inverse=True)
        si, di = inv[: len(src)], inv[len(src):]
        outdeg = np.bincount(si, minlength=len(nodes)).astype(np.uint64)
        r = np.full(len(nodes), BASE, np.uint64)
        for _ in range(iters):
            contrib = ((r[si] * np.uint64(DAMP_NUM))
                       // (np.uint64(DAMP_DEN) * outdeg[si]))
            nxt = np.full(len(nodes), TELEPORT, np.uint64)
            np.add.at(nxt, di, contrib)
            r = nxt
        return pa.table({"node": pa.array(nodes),
                         "rank_units": pa.array(r.astype(np.int64))})

    # static per-iteration inputs, materialized once: the edge stream
    # (key=src carries dst), the node carrier (zero contribution, keeps
    # in-degree-0 nodes in the gather), and the BASE rank per node
    def as_edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["src"], "dst": t["dst"],
            "r": pa.array(np.full(t.num_rows, -1, np.int64)),
        })

    edge_rows = filtered.map_batches(
        as_edge_rows, batch_format="pyarrow").materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["key"].combine_chunks(), t["dst"].combine_chunks()])})

    nodes_ds = (
        edge_rows.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node").map_groups(lambda g: g.slice(0, 1),
                                    batch_format="pyarrow")
    )
    zero_rows = nodes_ds.map_batches(
        lambda t: t.append_column("c", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow").materialize()

    def as_rank_rows(t: pa.Table, r: pa.Array | None = None) -> pa.Table:
        return pa.table({
            "key": t["node"],
            "dst": pa.array([""] * t.num_rows, pa.string()),
            "r": r if r is not None
                 else pa.array(np.full(t.num_rows, BASE, np.int64)),
        })

    ranks = nodes_ds.map_batches(as_rank_rows,
                                 batch_format="pyarrow").materialize()

    def scatter(g: pa.Table) -> pa.Table:
        r_rows = g.filter(pc.equal(g["dst"], ""))
        if r_rows.num_rows == 0:          # src never ranked (can't happen:
            return pa.table({"node": pa.array([], pa.string()),   # every src
                             "c": pa.array([], pa.int64())})      # is a node)
        my_r = int(r_rows["r"][0].as_py())
        out = g.filter(pc.not_equal(g["dst"], ""))
        k = out.num_rows
        if k == 0:                        # dangling node: mass dropped
            return pa.table({"node": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        contrib = (my_r * DAMP_NUM) // (DAMP_DEN * k)
        return pa.table({
            "node": out["dst"],
            "c": pa.array(np.full(k, contrib, np.int64)),
        })

    def teleport_and_relabel(t: pa.Table) -> pa.Table:
        r_new = pa.array(t["r"].to_numpy().astype(np.int64) + TELEPORT)
        return pa.table({
            "key": t["node"],
            "dst": pa.array([""] * t.num_rows, pa.string()),
            "r": r_new,
        })

    for _ in range(iters):
        contribs = (
            edge_rows.union(ranks)
            .groupby("key").map_groups(scatter, batch_format="pyarrow")
        )
        ranks = (
            contribs.union(zero_rows)
            .groupby("node").aggregate(Sum("c", alias_name="r"))
            .map_batches(teleport_and_relabel, batch_format="pyarrow")
            .materialize()     # one round of lineage, never the driver
        )

    final = pa.Table.from_pandas(ranks.to_pandas(), preserve_index=False)
    order = np.argsort(final["key"].to_numpy(zero_copy_only=False))
    return pa.table({
        "node": pa.array(final["key"].to_numpy(zero_copy_only=False)[order]),
        "rank_units": pa.array(final["r"].to_numpy()[order]),
    })


def pagerank_reference(src, dst, iters: int = 10) -> dict:
    """Single-process exact twin (tests): same integer recurrence."""
    nodes = sorted(set(src) | set(dst))
    outdeg: dict = {}
    for s in src:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: BASE for n in nodes}
    for _ in range(iters):
        nxt = {n: TELEPORT for n in nodes}
        for s, d in zip(src, dst):
            nxt[d] += (r[s] * DAMP_NUM) // (DAMP_DEN * outdeg[s])
        r = nxt
    return r


def crawl_pagerank_sql(edges_expr: str, crawl_id: str, iters: int = 10) -> str:
    """Unrolled fixed-iteration CTE chain — every arithmetic op is BIGINT,
    so the oracle is bit-identical to the Ray result."""
    step_tpl = """
    r{i1} AS (
      SELECT n.node,
             CAST({tele} + COALESCE(SUM((p.r * {dn}) // ({dd} * od.outdeg)), 0)
                  AS BIGINT) AS r
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN r{i0} p ON p.node = e.src
      LEFT JOIN od ON od.node = e.src
      GROUP BY n.node
    )"""
    steps = ",".join(
        step_tpl.format(i1=i + 1, i0=i, tele=TELEPORT,
                        dn=DAMP_NUM, dd=DAMP_DEN)
        for i in range(iters)
    )
    return f"""
    WITH e AS (SELECT src, dst FROM {edges_expr} WHERE crawl_id = '{crawl_id}'),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    od AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
           FROM e GROUP BY src),
    r0 AS (SELECT node, CAST({BASE} AS BIGINT) AS r FROM nodes),
    {steps}
    SELECT node, r AS rank_units FROM r{iters} ORDER BY node
    """
