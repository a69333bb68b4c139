"""Round-expansion stages: fused fetch+expand, node merge, seen gate.

One BFS round is the Ray-Data restatement (SURVEY.md §3.4) of the
reference's per-job pipeline (feeder/src/job.rs:263-351):

    frontier ─ map_batches(fetch_expand)   # S1/J5 fetch + M1 extract + D1 +
                                           # J1 anti-join + M2 normalize +
                                           # ST2 DNS + M7 depth + parent status
             ─ groupby(node_id) winner     # J2 MERGE node dedup (min depth)
             ─ map_batches(node_seen_gate) # new-node check + seen add_pending
             → parquet deltas (nodes / edges / parent_updates / frontier_{r+1})

``fetch_expand`` is a stateless *task* stage: its heavy setup (corpus index,
DNS cache) is cached per worker process (see fetch.py), so repeated
per-round executions pay no actor-pool spin-up.  The only mutable
cross-task state is the SeenShard actor pool, reached via SeenRouter with
round-snapshot semantics (committed at the driver's round barrier).

Edge rows need no cross-batch dedup within a round: every (src, dst) pair
is emitted only by parent ``src``'s input row, which lives in exactly one
batch — the within-batch distinct is therefore globally distinct for the
round. Cross-round duplicates are impossible for nodes (seen gate) and
edges (a parent reaches a successful fetch exactly once); a final safety
dedup runs at compaction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raycrawl import dns_synth, sim
from raycrawl.fetch import STATUS_ROBOTS, fetch_one, get_corpus_index
from raycrawl.kernels import hash128, normalize_url
from raycrawl.seen import SeenRouter

ROUND_OUT_SCHEMA = pa.schema(
    [
        ("row_type", pa.string()),          # "parent" | "child"
        ("crawl_id", pa.string()),
        ("name", pa.string()),
        ("http_type", pa.string()),
        ("node_id", pa.string()),           # http_type + name (M4)
        ("depth", pa.int32()),
        ("requested_depth", pa.int32()),
        ("attempts", pa.int32()),
        ("status", pa.string()),            # parent: new status; child: ""
        ("ip", pa.string()),
        ("domain", pa.string()),
        ("request_time_ms", pa.float64()),
        ("parent_id", pa.string()),
        ("fetch_status", pa.int32()),
        ("round", pa.int32()),
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("crawl_id", pa.string()),
        ("name", pa.string()),
        ("http_type", pa.string()),
        ("node_id", pa.string()),
        ("node_type", pa.string()),         # "ROOT" | "URL"
        ("depth", pa.int32()),
        ("requested_depth", pa.int32()),
        ("status", pa.string()),
        ("attempts", pa.int32()),
        ("ip", pa.string()),
        ("domain", pa.string()),
        ("request_time_ms", pa.float64()),
        ("round", pa.int32()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("crawl_id", pa.string()),
        ("src", pa.string()),
        ("dst", pa.string()),
        ("depth", pa.int32()),              # child depth at discovery
        ("round", pa.int32()),
    ]
)

# per-worker DNS cache (pure function → safe to share across crawls)
_DNS_CACHE: dict[tuple[str, int], tuple[str, str] | None] = {}


def _dns(name: str, max_depth: int):
    k = (name, max_depth)
    v = _DNS_CACHE.get(k, "?")
    if v == "?":
        v = dns_synth.get_network_stats(name, max_depth)
        _DNS_CACHE[k] = v
    return v


def fetch_expand_batch(
    batch: pa.Table,
    *,
    corpus_ref,
    seen_handles,
    max_attempts: int = 3,
    max_dns_depth: int = 5,
    round_no: int = 0,
    politeness_delay_ms: float = 0.0,
    respect_robots: bool = False,
) -> pa.Table:
    """Frontier rows → ROUND_OUT rows (one fused stage).

    Per parent: fetch (S1/J5) + extract (M1) + D1; then J1 anti-join of the
    raw-uppercased candidate set against the seen snapshot (job.rs:138-165;
    key = raw-upper string vs normalized stored ids — a www-variant passes
    J1 and later MERGEs onto the existing node, edge-only); normalize (M2),
    within-job normalized dedup (job.rs:296-299), synthetic DNS (ST2,
    dropped on failure job.rs:325-329), child depth = parent+1 (M7); parent
    terminal status per job.rs:97-133 & 289-343 (4xx permanent FAILED, 5xx
    retry budget, no-new → COMPLETED, all-DNS-dropped → FAILED).
    """
    index, html_col = get_corpus_index(corpus_ref)
    router = SeenRouter(seen_handles)
    n = batch.num_rows
    names = batch["name"].to_pylist()
    protos = batch["http_type"].to_pylist()
    depths = batch["depth"].to_pylist()
    reqd = batch["requested_depth"].to_pylist()
    attempts = batch["attempts"].to_pylist()
    crawl_ids = batch["crawl_id"].to_pylist()

    order = list(range(n))
    if politeness_delay_ms > 0:
        # priority: (depth, name) — per-host queue order (north-star L1)
        order.sort(key=lambda i: (depths[i], names[i]))

    fetched = [None] * n
    for i in order:
        attempt = int(attempts[i] or 0) + 1
        fetched[i] = fetch_one(
            index, html_col, names[i], protos[i], attempt,
            politeness_delay_s=politeness_delay_ms / 1000.0,
            respect_robots=respect_robots,
        )

    # J1 for the whole batch in one vectorized membership query
    flat: list[str] = []
    for i in range(n):
        flat.extend(fetched[i][3])
    if flat:
        hi, lo = hash128(flat)
        seen_mask = router.contains(hi, lo)
    else:
        seen_mask = np.empty(0, dtype=bool)

    out: list[dict] = []
    pos = 0
    for i in range(n):
        name, proto = names[i], protos[i]
        pid = proto + name
        status, elapsed, _n_ext, cands = fetched[i]
        attempt = int(attempts[i] or 0) + 1
        base = dict(
            crawl_id=crawl_ids[i], name=name, http_type=proto, node_id=pid,
            depth=depths[i], requested_depth=reqd[i], ip="", domain="",
            request_time_ms=elapsed, parent_id="", fetch_status=status,
            round=round_no,
        )
        if status != sim.STATUS_OK:
            if status == STATUS_ROBOTS:
                pstat, att = "ROBOTS_BLOCKED", attempt - 1
            elif sim.is_permanent_failure(status):
                pstat, att = "FAILED", attempt          # job.rs:126-128
            elif attempt >= max_attempts:
                pstat, att = "FAILED", attempt          # job.rs:108-115
            else:
                pstat, att = "PENDING", attempt         # re-enqueue, job.rs:117-121
            out.append(dict(base, row_type="parent", status=pstat, attempts=att))
            continue

        k = len(cands)
        mask = seen_mask[pos : pos + k]
        pos += k
        new_urls = [c for c, s in zip(cands, mask) if not s]
        # success does NOT bump attempts (validate_job increments only on
        # error; COMPLETED stores the old counter — job.rs:104-121)
        att = attempt - 1
        if not new_urls:
            out.append(dict(base, row_type="parent", status="COMPLETED", attempts=att))
            continue
        normalized = {normalize_url(u) for u in new_urls}
        children = []
        for cname, cproto in sorted(normalized):
            st = _dns(cname, max_dns_depth)
            if st is None:
                continue
            children.append((cname, cproto, st[1], st[0]))
        if not children:
            out.append(dict(base, row_type="parent", status="FAILED", attempts=att))
            continue
        out.append(dict(base, row_type="parent", status="COMPLETED", attempts=att))
        for cname, cproto, ip, dom in children:
            out.append(
                dict(
                    row_type="child", crawl_id=crawl_ids[i], name=cname,
                    http_type=cproto, node_id=cproto + cname,
                    depth=depths[i] + 1, requested_depth=reqd[i], attempts=0,
                    status="", ip=ip, domain=dom, request_time_ms=elapsed,
                    parent_id=pid, fetch_status=0, round=round_no,
                )
            )
    if not out:
        return ROUND_OUT_SCHEMA.empty_table()
    return pa.Table.from_pylist(out, schema=ROUND_OUT_SCHEMA)


def merge_child_group(group):
    """groupby(node_id) winner: min (depth, parent_id) — the deterministic
    stand-in for MERGE's racy first-writer ON CREATE (job.rs:180-186;
    SURVEY §7.4 min-depth BFS property). pandas in/out."""
    idx = group[["depth", "parent_id"]].sort_values(["depth", "parent_id"]).index[0]
    return group.loc[[idx]]


def make_node_seen_gate(seen_handles):
    """Winner rows → keep only ids absent from the committed seen set (J2 ON
    CREATE), assign born status (leaf short-circuit M6: depth==requested →
    COMPLETED, job.rs:182), and buffer new ids into the shard actors
    (committed at the driver barrier)."""

    def gate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        router = SeenRouter(seen_handles)
        ids = batch["node_id"].to_pylist()
        hi, lo = hash128(ids)
        exists = router.contains(hi, lo)
        keep = ~exists
        new = batch.filter(pa.array(keep))
        if new.num_rows == 0:
            return new
        router.add_pending(hi[keep], lo[keep])
        status = pc.if_else(
            pc.equal(new["depth"], new["requested_depth"]),
            pa.scalar("COMPLETED"),
            pa.scalar("PENDING"),
        )
        return new.set_column(new.schema.get_field_index("status"), "status", status)

    return gate
