"""BFS crawl driver: depth loop, round barrier, checkpoint/resume, cancel.

The reference's control plane is the Neo4j job queue polled by 8 feeder
processes (feeder/src/main.rs:64-148). Here a whole BFS level is one lazy
Ray-Data pipeline per round (SURVEY §3.4); the only global synchronization
is the per-round driver barrier at which SeenShard deltas commit.

Checkpoint layout (resumable, per-partition lineage):

    ckpt/crawl.json                      # seed, depth, crawl_id, config
    ckpt/round=0000/{nodes,edges,frontier,seen_delta}/ + counters.json + _DONE
    ckpt/round=NNNN/{fetched,round_out,nodes,edges,parent_updates,
                     frontier,seen_delta}/ + counters.json + _DONE
    ckpt/cancel/                         # PENDING→CANCELLED update delta
    ckpt/final/{nodes,edges}/            # compacted outputs + _DONE

Round 0 is the root bootstrap (manager POST /crawls semantics,
routes/crawl.rs:31-139: no J1 anti-join at the root, duplicates collapsed
only by MERGE). Resume = skip rounds with _DONE, bulk_load seen deltas,
continue from the last frontier; mid-round crashes re-run the whole round
idempotently (each round dir is removed and rewritten atomically).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl import dns_synth, sim
from raycrawl.config import CrawlConfig
from raycrawl.fetch import build_fetch_corpus
from raycrawl.frontier import (
    EDGES_SCHEMA,
    NODES_SCHEMA,
    ROUND_OUT_SCHEMA,
    fetch_expand_batch,
    make_node_seen_gate,
    merge_child_group,
)
from raycrawl.kernels import decode_html, extract_urls, hash128, host_of, normalize_url
from raycrawl.seen import SeenShardImpl

FRONTIER_SCHEMA = pa.schema(
    [
        ("crawl_id", pa.string()),
        ("name", pa.string()),
        ("http_type", pa.string()),
        ("depth", pa.int32()),
        ("requested_depth", pa.int32()),
        ("attempts", pa.int32()),
    ]
)

SEEN_DELTA_SCHEMA = pa.schema([("hi", pa.uint64()), ("lo", pa.uint64())])


class CrawlFailed(Exception):
    pass


def _round_dir(ckpt: str, r: int) -> str:
    return os.path.join(ckpt, f"round={r:04d}")


def _write_table(table: pa.Table, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "part-driver.parquet"))


def cast_table(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project + cast a batch to exactly `schema` (pandas round-trips widen
    int32→int64 etc.; parquet dirs must have one uniform schema)."""
    cols = {}
    for f in schema:
        if f.name in t.schema.names:
            cols[f.name] = t[f.name].cast(f.type)
        else:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
    return pa.table(cols, schema=schema)


def _write_ds(ds, path: str, schema: pa.Schema) -> None:
    """Dataset → parquet dir with a uniform schema; guarantee ≥1 readable
    file even when empty."""
    ds.map_batches(lambda t: cast_table(t, schema), batch_format="pyarrow").write_parquet(path)
    os.makedirs(path, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(path)):
        pq.write_table(schema.empty_table(), os.path.join(path, "part-empty.parquet"))


def _read(path: str):
    import ray.data as rd

    return rd.read_parquet(path)


def _parquet_files(dirs: list[str]) -> list[str]:
    out = []
    for d in dirs:
        if os.path.isdir(d):
            out.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    return out


@dataclass
class CrawlResult:
    crawl_id: str
    ckpt_dir: str
    rounds_run: int
    cancelled: bool = False

    @property
    def nodes_path(self) -> str:
        return os.path.join(self.ckpt_dir, "final", "nodes")

    @property
    def edges_path(self) -> str:
        return os.path.join(self.ckpt_dir, "final", "edges")

    def nodes(self):
        return _read(self.nodes_path)

    def edges(self):
        return _read(self.edges_path)


def _bootstrap(ckpt: str, corpus_table: pa.Table, seed_url: str, depth: int,
               crawl_id: str, cfg: CrawlConfig) -> None:
    """Root expansion = reference POST /crawls (routes/crawl.rs:31-139 +
    crawl_service.rs:17-65): fetch root, extract, DNS fan-out, ROOT node +
    depth-1 children (NO J1; MERGE-only dedup, first occurrence wins)."""
    if not 1 <= depth <= cfg.max_crawl_depth:
        raise ValueError(f"depth must be between 1 and {cfg.max_crawl_depth}")
    rname, rproto = normalize_url(seed_url)
    names = corpus_table["name"].to_pylist()
    protos = corpus_table["http_type"].to_pylist()
    index = {(n, p): i for i, (n, p) in enumerate(zip(names, protos))}
    idx = index.get((rname, rproto))
    status = sim.fetch_status(rname, rproto, 1, idx is not None)
    if status != sim.STATUS_OK:
        raise CrawlFailed(f"root fetch failed: HTTP {status}")
    rstats = dns_synth.get_network_stats(rname, cfg.max_dns_depth)
    if rstats is None:
        raise CrawlFailed("root DNS resolution failed")
    relapsed = sim.fetch_elapsed_ms(rname, rproto)
    raw = extract_urls(decode_html(corpus_table["html"][idx].as_py()))

    root_row = dict(
        crawl_id=crawl_id, name=rname, http_type=rproto, node_id=rproto + rname,
        node_type="ROOT", depth=0, requested_depth=depth, status="root",
        attempts=0, ip=rstats[1], domain=rstats[0], request_time_ms=relapsed,
        round=0,
    )
    nodes: dict[str, dict] = {}
    edges: set[tuple[str, str]] = set()
    for raw_url in raw:  # duplicates kept; first occurrence wins ON CREATE
        cname, cproto = normalize_url(raw_url)
        st = dns_synth.get_network_stats(cname, cfg.max_dns_depth)
        if st is None:
            continue  # silently dropped (routes/crawl.rs:97)
        cid = cproto + cname
        if cid not in nodes:
            nodes[cid] = dict(
                crawl_id=crawl_id, name=cname, http_type=cproto, node_id=cid,
                node_type="URL", depth=1, requested_depth=depth,
                status="COMPLETED" if depth == 1 else "PENDING",
                attempts=0, ip=st[1], domain=st[0], request_time_ms=relapsed,
                round=0,
            )
        edges.add((rproto + rname, cid))

    rdir = _round_dir(ckpt, 0)
    shutil.rmtree(rdir, ignore_errors=True)
    node_rows = [root_row] + list(nodes.values())
    _write_table(pa.Table.from_pylist(node_rows, schema=NODES_SCHEMA),
                 os.path.join(rdir, "nodes"))
    edge_rows = [
        dict(crawl_id=crawl_id, src=s, dst=d, depth=1, round=0) for s, d in sorted(edges)
    ]
    _write_table(pa.Table.from_pylist(edge_rows, schema=EDGES_SCHEMA),
                 os.path.join(rdir, "edges"))
    frontier_rows = [
        dict(crawl_id=crawl_id, name=n["name"], http_type=n["http_type"],
             depth=1, requested_depth=depth, attempts=0)
        for n in nodes.values()
        if n["status"] == "PENDING"
    ]
    _write_table(pa.Table.from_pylist(frontier_rows, schema=FRONTIER_SCHEMA),
                 os.path.join(rdir, "frontier"))
    # seen delta = the URL-node ids born this round (NOT the ROOT id: the
    # reference's J1 matches only :URL nodes — job.rs:148)
    ids = sorted(nodes.keys())
    hi, lo = hash128(ids) if ids else (np.empty(0, np.uint64),) * 2
    _write_table(pa.table({"hi": hi, "lo": lo}, schema=SEEN_DELTA_SCHEMA),
                 os.path.join(rdir, "seen_delta"))
    with open(os.path.join(rdir, "counters.json"), "w") as f:
        json.dump(
            dict(round=0, frontier_size=1, fetched_ok=1, extracted=len(raw),
                 nodes_created=len(nodes), edges_created=len(edges)),
            f,
        )
    with open(os.path.join(rdir, "_DONE"), "w") as f:
        f.write("ok")


def _make_seen_actors(cfg: CrawlConfig, expected_keys: int):
    import ray

    backend = cfg.seen_backend
    if backend == "auto":
        backend = "sortedruns" if expected_keys > cfg.auto_backend_threshold else "set"
    Shard = ray.remote(SeenShardImpl)
    return [
        Shard.options(num_cpus=0.05).remote(
            i, backend=backend,
            expected_keys=max(1000, expected_keys // cfg.num_seen_shards),
            bits_per_key=cfg.bloom_bits_per_key,
        )
        for i in range(cfg.num_seen_shards)
    ]


def _run_round(ckpt: str, r: int, crawl_id: str, cfg: CrawlConfig,
               corpus_ref, seen_handles) -> dict:
    """Execute BFS round r from round r-1's frontier. Idempotent: the round
    dir is rebuilt from scratch."""
    import ray
    import ray.data as rd  # noqa: F401

    prev = os.path.join(_round_dir(ckpt, r - 1), "frontier")
    rdir = _round_dir(ckpt, r)
    shutil.rmtree(rdir, ignore_errors=True)
    os.makedirs(rdir, exist_ok=True)

    import functools

    frontier = _read(prev)
    if cfg.politeness_delay_ms > 0:
        # host-partition the frontier so one host lands in one fetch worker
        # (global per-host budget); priority order inside fetch_expand.
        frontier = frontier.add_column(
            "host", lambda df: df["name"].map(host_of), batch_format="pandas"
        ).sort("host").map_batches(
            lambda t: t.select(FRONTIER_SCHEMA.names), batch_format="pyarrow"
        )

    # P1: fused fetch+extract+J1+normalize+DNS+lifecycle → round_out delta
    round_out = frontier.map_batches(
        functools.partial(
            fetch_expand_batch,
            corpus_ref=corpus_ref,
            seen_handles=seen_handles,
            max_attempts=cfg.max_attempts,
            max_dns_depth=cfg.max_dns_depth,
            round_no=r,
            politeness_delay_ms=cfg.politeness_delay_ms,
            respect_robots=cfg.respect_robots,
        ),
        batch_format="pyarrow",
        batch_size=cfg.fetch_batch_size,
    )
    ro_path = os.path.join(rdir, "round_out")
    _write_ds(round_out, ro_path, ROUND_OUT_SCHEMA)

    # P2: child rows → J2 MERGE (min-depth winner) → new-node gate → nodes
    # delta. The groupby is the round's one shuffle, keyed on node_id
    # (SURVEY §7.3) — it IS the dedup-correctness mechanism.
    children = _read(ro_path).map_batches(
        lambda t: t.filter(pa.compute.equal(t["row_type"], "child")),
        batch_format="pyarrow",
    )
    new_nodes = (
        children.groupby("node_id")
        .map_groups(merge_child_group, batch_format="pandas")
        .map_batches(make_node_seen_gate(seen_handles), batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "node_type", pa.array(["URL"] * t.num_rows, pa.string())
            ),
            batch_format="pyarrow",
        )
    )
    _write_ds(new_nodes, os.path.join(rdir, "nodes"), NODES_SCHEMA)

    # P3: Lead edges — one per distinct (parent, child) this round
    # (MERGE (p)-[:Lead]->(c), job.rs:185; created even when the child node
    # already existed — the www-variant edge-only case). Within-batch
    # distinct is globally distinct: a parent's children live in one batch.
    edges = _read(ro_path).map_batches(
        lambda t: t.filter(pa.compute.equal(t["row_type"], "child")),
        batch_format="pyarrow",
    ).map_batches(
        lambda df: df.rename(columns={"parent_id": "src", "node_id": "dst"})[
            ["crawl_id", "src", "dst", "depth", "round"]
        ].drop_duplicates(subset=["src", "dst"]),
        batch_format="pandas",
    )
    _write_ds(edges, os.path.join(rdir, "edges"), EDGES_SCHEMA)

    # P4: parent status updates
    parents = _read(ro_path).map_batches(
        lambda t: t.filter(pa.compute.equal(t["row_type"], "parent")),
        batch_format="pyarrow",
    )
    _write_ds(parents, os.path.join(rdir, "parent_updates"), ROUND_OUT_SCHEMA)

    # P5: next frontier = new PENDING nodes ∪ retry parents (M11 re-enqueue)
    f_new = _read(os.path.join(rdir, "nodes")).map_batches(
        lambda t: t.filter(pa.compute.equal(t["status"], "PENDING")),
        batch_format="pyarrow",
    ).map_batches(lambda t: t.select(FRONTIER_SCHEMA.names), batch_format="pyarrow")
    f_retry = _read(os.path.join(rdir, "parent_updates")).map_batches(
        lambda t: t.filter(pa.compute.equal(t["status"], "PENDING")),
        batch_format="pyarrow",
    ).map_batches(lambda t: t.select(FRONTIER_SCHEMA.names), batch_format="pyarrow")
    _write_ds(f_new.union(f_retry), os.path.join(rdir, "frontier"), FRONTIER_SCHEMA)

    # round barrier: commit seen deltas + checkpoint them
    deltas = ray.get([h.commit.remote() for h in seen_handles])
    hi = np.concatenate([d[0] for d in deltas]) if deltas else np.empty(0, np.uint64)
    lo = np.concatenate([d[1] for d in deltas]) if deltas else np.empty(0, np.uint64)
    _write_table(pa.table({"hi": hi, "lo": lo}, schema=SEEN_DELTA_SCHEMA),
                 os.path.join(rdir, "seen_delta"))

    # counters from parquet footers/columns (driver-side, column-pruned)
    import pyarrow.dataset as pads

    pstat = pads.dataset(os.path.join(rdir, "parent_updates")).to_table(
        columns=["status"]
    )["status"].to_pylist()
    counters = dict(
        round=r,
        frontier_size=pads.dataset(prev).count_rows(),
        parents_completed=sum(s == "COMPLETED" for s in pstat),
        parents_failed=sum(s == "FAILED" for s in pstat),
        retries_requeued=sum(s == "PENDING" for s in pstat),
        nodes_created=pads.dataset(os.path.join(rdir, "nodes")).count_rows(),
        edges_created=pads.dataset(os.path.join(rdir, "edges")).count_rows(),
    )
    with open(os.path.join(rdir, "counters.json"), "w") as f:
        json.dump(counters, f)
    with open(os.path.join(rdir, "_DONE"), "w") as f:
        f.write("ok")
    return counters


def _finalize(ckpt: str, rounds: int, cancelled: bool) -> None:
    """Compact: creation deltas + status updates → final/nodes, final/edges."""
    import ray.data as rd

    resolve_schema = pa.schema(list(NODES_SCHEMA) + [pa.field("kind", pa.string())])

    node_dirs = [os.path.join(_round_dir(ckpt, r), "nodes") for r in range(rounds + 1)]
    # group key = node_type + node_id: a seed that links to itself exists as
    # BOTH a ROOT node and a URL node (distinct labels in the reference —
    # MERGE (c:URL ...) never matches the :ROOT node, crawl_service.rs:45)
    creates = rd.read_parquet(_parquet_files(node_dirs)).map_batches(
        lambda t: cast_table(
            t.append_column("kind", pa.array(["create"] * t.num_rows, pa.string())),
            resolve_schema,
        ).append_column(
            "gkey",
            pa.compute.binary_join_element_wise(t["node_type"], t["node_id"], "|"),
        ),
        batch_format="pyarrow",
    )
    upd_dirs = [
        os.path.join(_round_dir(ckpt, r), "parent_updates")
        for r in range(1, rounds + 1)
    ]
    cancel_dir = os.path.join(ckpt, "cancel")
    if os.path.isdir(cancel_dir):
        upd_dirs.append(cancel_dir)
    if upd_dirs:
        updates = rd.read_parquet(_parquet_files(upd_dirs)).map_batches(
            lambda t: cast_table(
                t.select(["node_id", "status", "attempts", "round"]).append_column(
                    "kind", pa.array(["update"] * t.num_rows, pa.string())
                ),
                resolve_schema,
            ).append_column(
                # status updates only ever target URL nodes (job lifecycle)
                "gkey",
                pa.compute.binary_join_element_wise(
                    pa.array(["URL"] * t.num_rows, pa.string()), t["node_id"], "|"
                ),
            ),
            batch_format="pyarrow",
        )
        both = creates.union(updates)
    else:
        both = creates

    def resolve(g):
        import pandas as pd

        c = g[g["kind"] == "create"]
        if len(c) == 0:
            return pd.DataFrame()  # update for a node created elsewhere (shouldn't happen)
        base = c.sort_values("round").iloc[0].copy()
        ups = g[g["kind"] == "update"]
        if len(ups) and base["node_type"] == "URL":
            last = ups.sort_values("round").iloc[-1]
            base["status"] = last["status"]
            base["attempts"] = last["attempts"]
        return base.drop(labels=["kind", "gkey"]).to_frame().T

    final_nodes = both.groupby("gkey").map_groups(resolve, batch_format="pandas")
    fdir = os.path.join(ckpt, "final")
    shutil.rmtree(fdir, ignore_errors=True)
    final_nodes = final_nodes.map_batches(
        lambda t: pa.table(
            {f.name: t[f.name].cast(f.type) for f in NODES_SCHEMA}, schema=NODES_SCHEMA
        ),
        batch_format="pyarrow",
    )
    _write_ds(final_nodes, os.path.join(fdir, "nodes"), NODES_SCHEMA)

    edge_dirs = [os.path.join(_round_dir(ckpt, r), "edges") for r in range(rounds + 1)]
    edges = rd.read_parquet(_parquet_files(edge_dirs)).groupby(["src", "dst"]).map_groups(
        lambda g: g.sort_values("round").head(1), batch_format="pandas"
    )
    _write_ds(edges, os.path.join(fdir, "edges"), EDGES_SCHEMA)
    with open(os.path.join(fdir, "_DONE"), "w") as f:
        f.write("ok")


def _cancel(ckpt: str, r: int, crawl_id: str) -> int:
    """PENDING frontier → CANCELLED update delta (crawl_service.rs:219-235)."""
    import pyarrow.dataset as pads

    frontier = pads.dataset(os.path.join(_round_dir(ckpt, r), "frontier")).to_table()
    rows = [
        dict(row_type="parent", crawl_id=crawl_id, name=n, http_type=p,
             node_id=p + n, depth=int(d), requested_depth=int(rq),
             attempts=int(a or 0), status="CANCELLED", ip="", domain="",
             request_time_ms=0.0, parent_id="", fetch_status=0, round=10_000)
        for n, p, d, rq, a in zip(
            frontier["name"].to_pylist(), frontier["http_type"].to_pylist(),
            frontier["depth"].to_pylist(), frontier["requested_depth"].to_pylist(),
            frontier["attempts"].to_pylist(),
        )
    ]
    _write_table(pa.Table.from_pylist(rows, schema=ROUND_OUT_SCHEMA),
                 os.path.join(ckpt, "cancel"))
    return len(rows)


def crawl(
    corpus_dir: str,
    seed_url: str,
    depth: int,
    ckpt_dir: str,
    cfg: CrawlConfig | None = None,
    crawl_id: str | None = None,
    resume: bool = True,
    cancel_after_round: int | None = None,
    max_rounds: int = 64,
) -> CrawlResult:
    """Run (or resume) one crawl end-to-end. Requires an initialized Ray."""
    import ray

    cfg = cfg or CrawlConfig()
    meta_path = os.path.join(ckpt_dir, "crawl.json")
    corpus_table = build_fetch_corpus(corpus_dir)

    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        crawl_id = meta["crawl_id"]
        seed_url, depth = meta["seed_url"], meta["depth"]
    else:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        os.makedirs(ckpt_dir, exist_ok=True)
        crawl_id = crawl_id or str(uuid.uuid4())
        with open(meta_path, "w") as f:
            json.dump(dict(crawl_id=crawl_id, seed_url=seed_url, depth=depth,
                           corpus_dir=corpus_dir), f)

    if not os.path.exists(os.path.join(_round_dir(ckpt_dir, 0), "_DONE")):
        _bootstrap(ckpt_dir, corpus_table, seed_url, depth, crawl_id, cfg)

    corpus_ref = ray.put(corpus_table)
    seen = _make_seen_actors(cfg, expected_keys=corpus_table.num_rows * 4)

    # restore seen state from all completed rounds
    last_done = 0
    r = 1
    while os.path.exists(os.path.join(_round_dir(ckpt_dir, r), "_DONE")):
        last_done = r
        r += 1
    import pyarrow.dataset as pads

    for rr in range(0, last_done + 1):
        t = pads.dataset(os.path.join(_round_dir(ckpt_dir, rr), "seen_delta")).to_table()
        if t.num_rows:
            hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
            lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
            shard = (hi % np.uint64(len(seen))).astype(np.int64)
            ray.get([
                seen[int(s)].bulk_load.remote(hi[shard == s], lo[shard == s])
                for s in np.unique(shard)
            ])

    cancelled = os.path.isdir(os.path.join(ckpt_dir, "cancel"))
    r = last_done
    while not cancelled:
        fdir = os.path.join(_round_dir(ckpt_dir, r), "frontier")
        fsize = pads.dataset(fdir).to_table().num_rows if os.path.isdir(fdir) else 0
        if fsize == 0 or r >= max_rounds:
            break
        _run_round(ckpt_dir, r + 1, crawl_id, cfg, corpus_ref, seen)
        r += 1
        if cancel_after_round is not None and r >= cancel_after_round:
            _cancel(ckpt_dir, r, crawl_id)
            cancelled = True

    _finalize(ckpt_dir, r, cancelled)
    return CrawlResult(crawl_id=crawl_id, ckpt_dir=ckpt_dir, rounds_run=r,
                       cancelled=cancelled)
