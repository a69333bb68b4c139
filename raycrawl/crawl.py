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

from raycrawl.errors import FetchFailed, InvalidDepth, fetch_error  # noqa: E402

# Deprecated alias: root-bootstrap fetch failures now raise the typed
# errors from raycrawl.errors (M10 HTTP surface); FetchFailed keeps the
# historical catch-all behavior for callers that caught CrawlFailed.
CrawlFailed = FetchFailed


def _round_dir(ckpt: str, r: int) -> str:
    return os.path.join(ckpt, f"round={r:04d}")


def _write_table(table: pa.Table, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "part-driver.parquet"))


def _write_table_chunked(table: pa.Table, path: str, rows_per_file: int = 4096,
                         max_files: int = 64) -> None:
    """Driver-side write split into several files so the NEXT round's
    read_parquet gets enough blocks to parallelize (one file = one task)."""
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    if n == 0:
        pq.write_table(table, os.path.join(path, "part-000.parquet"))
        return
    per = max(rows_per_file, (n + max_files - 1) // max_files)
    for i, off in enumerate(range(0, n, per)):
        pq.write_table(table.slice(off, per),
                       os.path.join(path, f"part-{i:03d}.parquet"))


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
        return read_nodes(self.ckpt_dir)

    def edges(self):
        return read_edges(self.ckpt_dir)


def _bootstrap(ckpt: str, corpus_table: pa.Table, seed_url: str, depth: int,
               crawl_id: str, cfg: CrawlConfig) -> None:
    """Root expansion = reference POST /crawls (routes/crawl.rs:31-139 +
    crawl_service.rs:17-65): fetch root, extract, DNS fan-out, ROOT node +
    depth-1 children (NO J1; MERGE-only dedup, first occurrence wins)."""
    if not 1 <= depth <= cfg.max_crawl_depth:
        # 400 BAD_REQUEST (routes/crawl.rs:28-42; M9) — also a ValueError
        raise InvalidDepth(f"depth must be between 1 and {cfg.max_crawl_depth}")
    rname, rproto = normalize_url(seed_url)
    # locate the root row with a vectorized Arrow compare — never a Python
    # dict over the whole corpus (serial O(N) on the driver)
    mask = pa.compute.and_(
        pa.compute.equal(corpus_table["name"], rname),
        pa.compute.equal(corpus_table["http_type"], rproto),
    )
    hit = pa.compute.indices_nonzero(mask)
    idx = int(hit[0].as_py()) if len(hit) else None
    status = sim.fetch_status(rname, rproto, 1, idx is not None)
    if status != sim.STATUS_OK:
        # typed per crawler_error_to_status: 404 → 404, else → 502 (M10)
        raise fetch_error(status, rproto + rname)
    rstats = dns_synth.get_network_stats(rname, cfg.max_dns_depth)
    if rstats is None:
        raise FetchFailed(f"root DNS resolution failed: {rname}")
    relapsed = sim.fetch_elapsed_ms(rname, rproto)
    raw = extract_urls(decode_html(corpus_table["html"][idx].as_py()))

    import datetime

    root_row = dict(
        crawl_id=crawl_id, name=rname, http_type=rproto, node_id=rproto + rname,
        node_type="ROOT", depth=0, requested_depth=depth, status="root",
        attempts=0, ip=rstats[1], domain=rstats[0], request_time_ms=relapsed,
        round=0,
        # created_at: ROOT-only, like the reference's crawl submission
        # timestamp (neo4j-graph-model.md:22; crawl_service.rs sets now())
        created_at=datetime.datetime.now(datetime.timezone.utc).isoformat(),
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


_BCAST_CACHE: dict = {}


def _bcast_get(ref):
    """ray.get with per-worker-process memoization (dict objects deserialize
    on every ray.get; cache so each worker pays once)."""
    import ray

    k = ref.hex() if hasattr(ref, "hex") else id(ref)
    v = _BCAST_CACHE.get(k)
    if v is None:
        _BCAST_CACHE.clear()
        v = ray.get(ref)
        _BCAST_CACHE[k] = v
    return v


def _warm_workers(corpus_ref) -> None:
    """Warm every Ray worker process ONCE per crawl: heavy imports + the
    per-worker corpus index build happen here instead of inside the first
    big round (worker processes persist across Dataset executions)."""
    import ray
    import ray.data as rd

    ncpu = int(ray.cluster_resources().get("CPU", 8))

    def warm(batch):
        from raycrawl.fetch import PartitionedCorpus, get_corpus_index

        if isinstance(corpus_ref, PartitionedCorpus):
            corpus_ref.slot(0)  # imports + one partition into the LRU
        else:
            get_corpus_index(corpus_ref)
        return batch

    rd.range(ncpu * 8, override_num_blocks=ncpu * 8).map_batches(
        warm, batch_size=1, num_cpus=1
    ).materialize()




def _status_counts(col) -> dict[str, int]:
    """Vectorized status histogram of an Arrow string column."""
    vc = pa.compute.value_counts(col)
    return {
        str(v): int(c)
        for v, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
    }


def _begin_round(rdir: str, r: int, seen_handles, seed_id: str):
    """Open per-shard edge partitions + reset round state on every shard.

    Also stamps ``_CLAIMED`` in the round dir — the batch analogue of the
    feeder's per-URL PENDING→IN-PROGRESS claim (feeder/src/job.rs:41-51):
    while ``_CLAIMED`` exists without ``_DONE``, every PENDING node in the
    committed snapshot (== exactly the frontier being fetched) is
    IN-PROGRESS to live readers (raycrawl.live)."""
    import ray

    nodes_path = os.path.join(rdir, "nodes")
    edges_path = os.path.join(rdir, "edges")
    os.makedirs(nodes_path, exist_ok=True)
    os.makedirs(edges_path, exist_ok=True)
    with open(os.path.join(rdir, "_CLAIMED"), "w") as f:
        f.write("ok")
    ray.get([
        h.begin_round.remote(nodes_path, edges_path, r, seed_id)
        for h in seen_handles
    ])
    return nodes_path, edges_path


def _finish_barrier(rdir: str, seen_handles, nodes_path: str, edges_path: str):
    """Round barrier: shards close their edge partitions, resolve winners,
    write nodes deltas; seed-src edge rows persist as a tiny sidecar."""
    import ray

    stats = ray.get([h.commit_round.remote() for h in seen_handles])
    for path, schema in ((nodes_path, NODES_SCHEMA), (edges_path, EDGES_SCHEMA)):
        if not any(f.endswith(".parquet") for f in os.listdir(path)):
            pq.write_table(schema.empty_table(),
                           os.path.join(path, "part-empty.parquet"))
    seed_rows = [row for s in stats for row in s["seed_rows"]]
    if seed_rows:
        _write_table(pa.Table.from_pylist(seed_rows, schema=EDGES_SCHEMA),
                     os.path.join(rdir, "seed_edges"))
    return stats


def _run_round_driver_side(ckpt, r, crawl_id, cfg, corpus_ref, seen_handles,
                           prev, rdir, seed_id: str,
                           frontier_table: pa.Table | None = None):
    """Small-round fast path: identical semantics (same stage function, same
    shard actors, same artifacts) executed in the driver process — a round
    with a few hundred frontier rows costs more in executor startup than in
    work. Bounded: children ≤ frontier × page fan-out."""
    import functools
    import time as _time

    import pyarrow.dataset as pads
    import ray

    t_enter = _time.perf_counter()
    frontier = (frontier_table if frontier_table is not None
                else pads.dataset(_parquet_files([prev])).to_table())
    from raycrawl.fetch import PartitionedCorpus, host_partition_ids

    if isinstance(corpus_ref, PartitionedCorpus) and frontier.num_rows:
        # partition-major order → each batch touches ~1 corpus partition
        parts = host_partition_ids(frontier["name"], corpus_ref.n_parts)
        frontier = frontier.take(pa.array(np.argsort(parts, kind="stable")))
    nodes_path, edges_path = _begin_round(rdir, r, seen_handles, seed_id)
    fn = functools.partial(
        fetch_expand_batch, corpus_ref=corpus_ref, seen_handles=seen_handles,
        max_attempts=cfg.max_attempts, max_dns_depth=cfg.max_dns_depth,
        round_no=r, politeness_delay_ms=0.0,
        respect_robots=cfg.respect_robots, enrich=cfg.enrich,
    )
    t0 = _time.perf_counter()
    outs = []
    for off in range(0, frontier.num_rows, cfg.fetch_batch_size):
        outs.append(fn(frontier.slice(off, cfg.fetch_batch_size)))
    ro = (
        pa.concat_tables([cast_table(t, ROUND_OUT_SCHEMA) for t in outs])
        if outs
        else ROUND_OUT_SCHEMA.empty_table()
    )
    ro_path = os.path.join(rdir, "round_out")
    _write_table(ro, ro_path)
    t_neardup = 0.0
    if cfg.neardup_threshold is not None:
        from raycrawl.ingest_dedup import probe_and_index_round

        t_nd0 = _time.perf_counter()
        pm = pa.compute.and_(
            pa.compute.equal(ro["row_type"], "parent"),
            pa.compute.equal(ro["status"], "COMPLETED"))
        probe_and_index_round(
            ckpt, r, ro.filter(pm).select(["node_id", "name", "http_type"]),
            corpus_ref, cfg.neardup_threshold)
        t_neardup = _time.perf_counter() - t_nd0
    t_fetch = _time.perf_counter() - t0 - t_neardup

    stats = _finish_barrier(rdir, seen_handles, nodes_path, edges_path)
    t_barrier = _time.perf_counter() - t0 - t_fetch - t_neardup

    nodes = pads.dataset(_parquet_files([nodes_path])).to_table(
        columns=FRONTIER_SCHEMA.names + ["status"]
    )
    f_new = nodes.filter(pa.compute.equal(nodes["status"], "PENDING")).select(
        FRONTIER_SCHEMA.names
    )
    pmask = pa.compute.and_(
        pa.compute.equal(ro["row_type"], "parent"),
        pa.compute.equal(ro["status"], "PENDING"),
    )
    f_retry = ro.filter(pmask).select(FRONTIER_SCHEMA.names)
    next_frontier = cast_table(
        pa.concat_tables([cast_table(f_new, FRONTIER_SCHEMA),
                          cast_table(f_retry, FRONTIER_SCHEMA)]),
        FRONTIER_SCHEMA,
    )
    _write_table_chunked(next_frontier, os.path.join(rdir, "frontier"))

    pstat = _status_counts(
        ro.filter(pa.compute.equal(ro["row_type"], "parent"))["status"]
    )
    counters = dict(
        round=r,
        frontier_size=frontier.num_rows,
        parents_completed=pstat.get("COMPLETED", 0),
        parents_failed=pstat.get("FAILED", 0),
        retries_requeued=pstat.get("PENDING", 0),
        nodes_created=int(sum(s["new_nodes"] for s in stats)),
        edges_created=int(sum(s["edges_written"] for s in stats)
                          + sum(len(s["seed_rows"]) for s in stats)),
        seen_size=int(sum(s["seen_size"] for s in stats)),
        t_setup_s=round(t0 - t_enter, 3),
        t_fetch_s=round(t_fetch, 3),
        t_neardup_s=round(t_neardup, 3),
        t_barrier_s=round(t_barrier, 3),
        t_frontier_s=round(_time.perf_counter() - t0 - t_fetch - t_neardup
                           - t_barrier, 3),
    )
    with open(os.path.join(rdir, "counters.json"), "w") as f:
        json.dump(counters, f)
    with open(os.path.join(rdir, "_DONE"), "w") as f:
        f.write("ok")
    return counters, next_frontier


def _run_round(ckpt: str, r: int, crawl_id: str, cfg: CrawlConfig,
               corpus_ref, seen_handles, seed_id: str,
               frontier_table: pa.Table | None = None):
    """Execute BFS round r from round r-1's frontier. Idempotent: the round
    dir is rebuilt from scratch.

    One Dataset execution per round:
      P1 frontier → fetch_expand → round_out parquet (parent lifecycle rows
         only); child candidates ship to the SeenShard actors (the RPC is
         the shuffle);
      barrier (async with the driver's retry-set computation): shards
         resolve J2 winners and write BOTH the nodes-delta and the
         Lead-edge parquet partitions themselves (distributed write, no
         driver funnel); seed-src edge rows come back as a tiny sidecar;
      frontier_{r+1} = new PENDING nodes ∪ retry parents — assembled on
         the driver (chunk-written for downstream parallelism) while the
         delta is modest, else as a Dataset execution.
    Parent status updates ARE round_out; edges live in the shard-written
    per-round partitions (manifest-composed at finalize)."""
    import functools
    import time as _time

    import ray

    t_enter = _time.perf_counter()
    prev = os.path.join(_round_dir(ckpt, r - 1), "frontier")
    rdir = _round_dir(ckpt, r)
    shutil.rmtree(rdir, ignore_errors=True)
    os.makedirs(rdir, exist_ok=True)

    import pyarrow.dataset as pads0

    n_front = (frontier_table.num_rows if frontier_table is not None
               else pads0.dataset(_parquet_files([prev])).count_rows())
    if n_front <= cfg.small_round_threshold and cfg.politeness_delay_ms == 0:
        return _run_round_driver_side(ckpt, r, crawl_id, cfg, corpus_ref,
                                      seen_handles, prev, rdir, seed_id,
                                      frontier_table=frontier_table)

    if frontier_table is not None and cfg.politeness_delay_ms == 0:
        # in-memory handoff from the previous round: skip the checkpoint
        # read entirely (the parquet copy exists for durability/resume only)
        import ray
        import ray.data as rd

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_blocks = max(1, min(4 * ncpu,
                              (n_front + cfg.fetch_batch_size - 1)
                              // cfg.fetch_batch_size))
        per = (n_front + n_blocks - 1) // n_blocks
        frontier = rd.from_arrow(
            [frontier_table.slice(off, per)
             for off in range(0, n_front, per)]
        )
    else:
        frontier = _read(prev)

    from raycrawl.fetch import PartitionedCorpus

    if isinstance(corpus_ref, PartitionedCorpus) and cfg.politeness_delay_ms == 0:
        # partitioned corpus: co-locate frontier rows by corpus partition so
        # a fetch task pages in ~1 partition instead of thrashing the LRU.
        # A range exchange (sort on the partition id) gives the same
        # co-location as a hash exchange without requiring the global
        # HASH_SHUFFLE strategy, and partition-major row order inside each
        # block means the fetch loop's LRU sees each partition exactly once.
        n_parts = corpus_ref.n_parts

        def add_cpart(t: pa.Table) -> pa.Table:
            from raycrawl.fetch import host_partition_ids

            return t.append_column(
                "cpart", pa.array(host_partition_ids(t["name"], n_parts), pa.int64())
            )

        frontier = (
            frontier.map_batches(add_cpart, batch_format="pyarrow")
            .sort("cpart")
            .map_batches(lambda t: t.select(FRONTIER_SCHEMA.names),
                         batch_format="pyarrow")
        )
    if cfg.politeness_delay_ms > 0:
        # host-partition the frontier so one host lands in exactly ONE fetch
        # task (global per-host budget; priority order inside fetch_expand):
        # vectorized Arrow host projection + a range exchange on host — no
        # pandas conversion, no per-row Python .map(); sort's range
        # partitioning co-locates equal hosts just like a hash exchange.
        import pyarrow.compute as pc_

        def add_host(t: pa.Table) -> pa.Table:
            host = pc_.list_element(
                pc_.split_pattern(t["name"], ":", max_splits=1), 0
            )
            return t.append_column("host", host)

        frontier = (
            frontier.map_batches(add_host, batch_format="pyarrow")
            .sort("host")
            .map_batches(lambda t: t.select(FRONTIER_SCHEMA.names),
                         batch_format="pyarrow")
        )

    nodes_path, edges_path = _begin_round(rdir, r, seen_handles, seed_id)

    # P1: fused fetch+extract+J1+normalize+DNS+lifecycle → round_out delta.
    # offer() RPCs are side-effecting, so Ray-level task retries are OFF for
    # this stage (a silently replayed task would double its edge rows); on
    # any task failure the WHOLE round re-runs once — begin_round resets all
    # per-round shard state, so the rebuild is exact.
    def _execute_fetch_stage():
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
                enrich=cfg.enrich,
            ),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
            max_retries=0,
        )
        _write_ds(round_out, ro_path, ROUND_OUT_SCHEMA)

    t0 = _time.perf_counter()
    t_setup = t0 - t_enter  # frontier prep + begin_round RPCs (untimed before)
    ro_path = os.path.join(rdir, "round_out")
    try:
        _execute_fetch_stage()
    except Exception:
        shutil.rmtree(ro_path, ignore_errors=True)
        _begin_round(rdir, r, seen_handles, seed_id)  # reset shard round state
        _execute_fetch_stage()
    t_neardup = 0.0
    if cfg.neardup_threshold is not None:
        from raycrawl.ingest_dedup import probe_and_index_round

        import pyarrow.dataset as _pads

        t_nd0 = _time.perf_counter()
        ro_nd = _pads.dataset(_parquet_files([ro_path])).to_table(
            columns=["row_type", "status", "node_id", "name", "http_type"])
        pm = pa.compute.and_(
            pa.compute.equal(ro_nd["row_type"], "parent"),
            pa.compute.equal(ro_nd["status"], "COMPLETED"))
        probe_and_index_round(
            ckpt, r,
            ro_nd.filter(pm).select(["node_id", "name", "http_type"]),
            corpus_ref, cfg.neardup_threshold)
        t_neardup = _time.perf_counter() - t_nd0
    t_fetch = _time.perf_counter() - t0 - t_neardup

    # barrier (async): shards close edge partitions + resolve winners while
    # the driver computes the retry set from the parents just written
    import ray

    commit_refs = [h.commit_round.remote() for h in seen_handles]

    import pyarrow.dataset as pads

    ro_t = pads.dataset(_parquet_files([ro_path])).to_table(
        columns=FRONTIER_SCHEMA.names + ["status"]
    )
    pstat = _status_counts(ro_t["status"])
    f_retry_t = cast_table(
        ro_t.filter(pa.compute.equal(ro_t["status"], "PENDING")).select(
            FRONTIER_SCHEMA.names
        ),
        FRONTIER_SCHEMA,
    )

    stats = ray.get(commit_refs)
    t_barrier = _time.perf_counter() - t0 - t_fetch - t_neardup
    for path, schema in ((nodes_path, NODES_SCHEMA), (edges_path, EDGES_SCHEMA)):
        if not any(f.endswith(".parquet") for f in os.listdir(path)):
            pq.write_table(schema.empty_table(),
                           os.path.join(path, "part-empty.parquet"))
    seed_rows = [row for s in stats for row in s["seed_rows"]]
    if seed_rows:
        _write_table(pa.Table.from_pylist(seed_rows, schema=EDGES_SCHEMA),
                     os.path.join(rdir, "seed_edges"))

    # next frontier = new PENDING nodes ∪ retry parents (M11 re-enqueue);
    # assembled on the driver (chunk-written) while the delta is modest,
    # else as a Dataset execution
    n_new = int(sum(s["new_nodes"] for s in stats))
    next_frontier = None
    if n_new <= FRONTIER_DRIVER_GATE:
        nt = pads.dataset(_parquet_files([nodes_path])).to_table(
            columns=FRONTIER_SCHEMA.names + ["status"]
        )
        f_new_t = cast_table(
            nt.filter(pa.compute.equal(nt["status"], "PENDING")).select(
                FRONTIER_SCHEMA.names
            ),
            FRONTIER_SCHEMA,
        )
        next_frontier = pa.concat_tables([f_new_t, f_retry_t])
        _write_table_chunked(next_frontier, os.path.join(rdir, "frontier"))
    else:
        import ray.data as rd

        fcols = FRONTIER_SCHEMA.names
        f_new = rd.read_parquet(
            _parquet_files([nodes_path]), columns=fcols + ["status"]
        ).map_batches(
            lambda t: t.filter(pa.compute.equal(t["status"], "PENDING")).select(fcols),
            batch_format="pyarrow",
        )
        f_retry = rd.read_parquet(
            _parquet_files([ro_path]), columns=fcols + ["row_type", "status"]
        ).map_batches(
            lambda t: t.filter(
                pa.compute.and_(
                    pa.compute.equal(t["row_type"], "parent"),
                    pa.compute.equal(t["status"], "PENDING"),
                )
            ).select(fcols),
            batch_format="pyarrow",
        )
        _write_ds(f_new.union(f_retry), os.path.join(rdir, "frontier"),
                  FRONTIER_SCHEMA)

    # counters (pstat/stats computed above)
    counters = dict(
        round=r,
        frontier_size=n_front,
        parents_completed=pstat.get("COMPLETED", 0),
        parents_failed=pstat.get("FAILED", 0),
        retries_requeued=pstat.get("PENDING", 0),
        nodes_created=int(sum(s["new_nodes"] for s in stats)),
        edges_created=int(sum(s["edges_written"] for s in stats)
                          + sum(len(s["seed_rows"]) for s in stats)),
        seen_size=int(sum(s["seen_size"] for s in stats)),
        t_setup_s=round(t_setup, 3),
        t_fetch_s=round(t_fetch, 3),
        t_neardup_s=round(t_neardup, 3),
        t_barrier_s=round(t_barrier, 3),
        t_frontier_s=round(_time.perf_counter() - t0 - t_fetch - t_neardup
                           - t_barrier, 3),
    )
    with open(os.path.join(rdir, "counters.json"), "w") as f:
        json.dump(counters, f)
    with open(os.path.join(rdir, "_DONE"), "w") as f:
        f.write("ok")
    return counters, next_frontier


STATUS_CODE = {"PENDING": 0, "ROBOTS_BLOCKED": 1, "FAILED": 2, "COMPLETED": 3,
               "CANCELLED": 4}
CODE_STATUS = {v: k for k, v in STATUS_CODE.items()}

# status-update volume above which compacted_nodes switches from the
# driver-side numpy keep-last to the distributed encoded-Max groupby
# (tests force 0 to exercise the distributed path on small crawls)
UPDATE_DRIVER_GATE = 5_000_000

# node/edge volume above which _finalize stops rewriting the wide tables:
# final/ gets only the manifest over the immutable per-round partitions
# (plus the ~25 B/node status-update sidecar for nodes), and readers
# compose lazily (read_nodes / read_edges). At 100 TB the terminal
# compaction must never re-shuffle or re-write the whole corpus.
NODES_REWRITE_GATE = 1_000_000
EDGES_REWRITE_GATE = 1_000_000

# new-node volume above which the next-round frontier is assembled as a
# streaming Dataset execution instead of a driver-side Arrow concat
FRONTIER_DRIVER_GATE = 6_000_000



def read_edges(ckpt_dir: str):
    """Final edge Dataset for a crawl — compacted parquet when small, or the
    final parts (seed subset) + a manifest over the immutable per-round edge
    partitions at scale (see _finalize)."""
    import ray.data as rd

    edir = os.path.join(ckpt_dir, "final", "edges")
    manifest = os.path.join(edir, "edges_manifest.json")
    parts = rd.read_parquet(_parquet_files([edir]))
    if not os.path.exists(manifest):
        return parts
    with open(manifest) as f:
        m = json.load(f)
    if not m["round_edge_files"]:
        return parts
    return parts.union(rd.read_parquet(m["round_edge_files"]))


def _upd_partial_file(f: str):
    """One round_out file → (hi, lo, round, status_code, attempts) numpy
    arrays for its parent rows. Runs as a Ray task so the node_id hashing
    parallelizes across files at finalize."""
    pc_ = pa.compute

    t = pq.read_table(f, columns=["row_type", "node_id", "status",
                                  "attempts", "round"])
    t = t.filter(pc_.equal(t["row_type"], "parent"))
    hi, lo = hash128(t["node_id"].combine_chunks())
    rno = t["round"].to_numpy(zero_copy_only=False).astype(np.int64)
    codes = pc_.index_in(
        t["status"], value_set=pa.array(list(STATUS_CODE.keys()))
    ).to_numpy(zero_copy_only=False).astype(np.int8)
    atts = t["attempts"].to_numpy(zero_copy_only=False).astype(np.int32)
    return hi, lo, rno, codes, atts


def _node_status_updates(ckpt: str, rounds: int):
    """Compact status-update broadcast payload after ``rounds`` committed
    rounds: the LAST update per node as a SORTED structured (hi,lo) key
    array + int8 status codes + int32 attempts (~25 B/updated node, no
    strings). ``None`` when no round has written updates yet.

    Fully vectorized: the last update per node is found either by a
    driver-side numpy keep-last on 128-bit node hashes (below a 5M-row
    gate) or a native ``Max`` over an integer encoding of (round, status,
    attempts) — no per-group Python."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Max

    pc_ = pa.compute

    upd_dirs = [
        os.path.join(_round_dir(ckpt, r), "round_out") for r in range(1, rounds + 1)
    ]
    cancel_dir = os.path.join(ckpt, "cancel")
    if os.path.isdir(cancel_dir):
        upd_dirs.append(cancel_dir)
    upd_files = _parquet_files(upd_dirs)
    if not upd_files:
        return None

    key_dt = np.dtype([("hi", "u8"), ("lo", "u8")])

    # Last status update per node. Updates ≈ fetched parents (≤ Σ
    # frontier sizes) — orders of magnitude fewer than creates.
    import ray

    upd_ds = pads.dataset(upd_files)
    if upd_ds.count_rows() <= UPDATE_DRIVER_GATE:
        # parse + hash each file in a parallel task (the string hashing is
        # the dominant cost); the driver only concatenates numeric arrays
        # and lexsorts — finalize stays off the serial critical path
        part = ray.remote(num_cpus=1)(_upd_partial_file)
        parts = ray.get([part.remote(f) for f in upd_files])
        hi = np.concatenate([p[0] for p in parts])
        lo = np.concatenate([p[1] for p in parts])
        rno = np.concatenate([p[2] for p in parts])
        codes_all = np.concatenate([p[3] for p in parts])
        atts_all = np.concatenate([p[4] for p in parts])
        order = np.lexsort((rno, lo, hi))  # key asc, round asc within key
        shi, slo = hi[order], lo[order]
        is_last = np.ones(len(order), dtype=bool)
        if len(order):
            is_last[:-1] = (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])
        keys = np.empty(int(is_last.sum()), dtype=key_dt)
        keys["hi"], keys["lo"] = shi[is_last], slo[is_last]
        codes = codes_all[order][is_last]
        atts = atts_all[order][is_last]
    else:
        def encode(t: pa.Table) -> pa.Table:
            t = t.filter(pc_.equal(t["row_type"], "parent"))
            code = pc_.index_in(
                t["status"], value_set=pa.array(list(STATUS_CODE.keys()))
            ).cast(pa.int64())
            enc = pc_.add(
                pc_.add(
                    pc_.multiply(t["round"].cast(pa.int64()), pa.scalar(1 << 14)),
                    pc_.multiply(code, pa.scalar(1 << 10)),
                ),
                t["attempts"].cast(pa.int64()),
            )
            return pa.table({"node_id": t["node_id"], "enc": enc})

        last = (
            rd.read_parquet(upd_files, columns=["row_type", "node_id", "status",
                                                "attempts", "round"])
            .map_batches(encode, batch_format="pyarrow")
            .groupby("node_id")
            .aggregate(Max("enc", alias_name="enc"))
            .to_arrow_refs()
        )
        # Ray's groupby can emit zero-row blocks with an EMPTY schema
        # (observed on ray 2.49.2 when an input block has no "parent"
        # rows) — rebuild every block against the expected schema so
        # concat never sees a schema mismatch.
        enc_schema = pa.schema([("node_id", pa.string()),
                                ("enc", pa.int64())])
        last = pa.concat_tables([
            pa.Table.from_batches(ray.get(ref).to_batches() or [],
                                  schema=enc_schema)
            for ref in last
        ])
        enc = last["enc"].to_numpy(zero_copy_only=False)
        hi, lo = hash128(last["node_id"].combine_chunks())
        order = np.lexsort((lo, hi))
        keys = np.empty(len(order), dtype=key_dt)
        keys["hi"], keys["lo"] = hi[order], lo[order]
        codes = ((enc >> 10) & 0xF).astype(np.int8)[order]
        atts = (enc & 0x3FF).astype(np.int32)[order]

    return keys, codes, atts


def _apply_updates_fn(upd_ref):
    """Batch fn applying a broadcast ``_node_status_updates`` payload to
    creation-delta node rows: one ``np.searchsorted`` per batch, strings
    never shuffled. Shared by the terminal compaction (``compacted_nodes``)
    and the lazy at-read path (``read_nodes``)."""
    pc_ = pa.compute
    status_names = np.array(list(STATUS_CODE.keys()))

    def apply_bcast(t: pa.Table) -> pa.Table:
        keys, codes, atts = _bcast_get(upd_ref)
        qhi, qlo = hash128(t["node_id"].combine_chunks())
        q = np.empty(len(qhi), dtype=keys.dtype)
        q["hi"], q["lo"] = qhi, qlo
        if len(keys):
            pos = np.minimum(np.searchsorted(keys, q), len(keys) - 1)
            found = keys[pos] == q
        else:
            pos = np.zeros(len(q), dtype=np.int64)
            found = np.zeros(len(q), dtype=bool)
        is_url = pc_.equal(t["node_type"], "URL").to_numpy(zero_copy_only=False)
        m = found & is_url
        has = pa.array(m)
        st = pc_.if_else(has, pa.array(status_names[codes[pos]]), t["status"])
        att = pc_.if_else(has, pa.array(atts[pos], pa.int32()), t["attempts"])
        t = t.set_column(t.schema.get_field_index("status"), "status", st)
        return t.set_column(
            t.schema.get_field_index("attempts"), "attempts", att
        )

    return apply_bcast


def compacted_nodes(ckpt: str, rounds: int):
    """Current node rows after ``rounds`` committed rounds: creation deltas
    + keep-last status updates, as a (lazy) Dataset. Shared by ``_finalize``
    (the terminal compaction) and ``raycrawl.live`` (mid-crawl snapshots —
    the reference's live Bolt reads, crawl_service.rs:68-134)."""
    import ray
    import ray.data as rd

    node_files = _parquet_files(
        [os.path.join(_round_dir(ckpt, r), "nodes") for r in range(rounds + 1)]
    )
    creates = rd.read_parquet(node_files)
    upd = _node_status_updates(ckpt, rounds)
    if upd is None:
        return creates
    return creates.map_batches(_apply_updates_fn(ray.put(upd)),
                               batch_format="pyarrow")


def read_nodes(ckpt_dir: str):
    """Final node Dataset for a crawl — compacted parquet when small, or
    (above ``NODES_REWRITE_GATE``) the immutable per-round creation deltas
    with the keep-last status-update payload applied lazily per batch. At
    the 100 TB design point the terminal compaction never rewrites the wide
    node table; the ~25 B/node update sidecar is the only finalize artifact
    and every reader pays one searchsorted per batch."""
    import ray
    import ray.data as rd

    ndir = os.path.join(ckpt_dir, "final", "nodes")
    manifest = os.path.join(ndir, "nodes_manifest.json")
    if not os.path.exists(manifest):
        return rd.read_parquet(_parquet_files([ndir]))
    with open(manifest) as f:
        m = json.load(f)
    ds = rd.read_parquet(m["node_files"])
    upath = os.path.join(ndir, "status_updates", "updates.parquet")
    if not os.path.exists(upath):
        return ds
    ut = pq.read_table(upath)
    keys = np.empty(ut.num_rows, dtype=np.dtype([("hi", "u8"), ("lo", "u8")]))
    keys["hi"] = ut["hi"].to_numpy(zero_copy_only=False)
    keys["lo"] = ut["lo"].to_numpy(zero_copy_only=False)
    codes = ut["code"].to_numpy(zero_copy_only=False).astype(np.int8)
    atts = ut["atts"].to_numpy(zero_copy_only=False).astype(np.int32)
    return ds.map_batches(_apply_updates_fn(ray.put((keys, codes, atts))),
                          batch_format="pyarrow")


def _finalize(ckpt: str, rounds: int, cancelled: bool) -> None:
    """Compact: creation deltas + status updates → final/nodes, final/edges."""
    import pyarrow.dataset as pads
    import ray.data as rd

    fdir = os.path.join(ckpt, "final")
    shutil.rmtree(fdir, ignore_errors=True)

    node_files = _parquet_files(
        [os.path.join(_round_dir(ckpt, r), "nodes") for r in range(rounds + 1)]
    )
    n_nodes = 0
    for r in range(0, rounds + 1):
        cpath = os.path.join(_round_dir(ckpt, r), "counters.json")
        if os.path.exists(cpath):
            with open(cpath) as f:
                n_nodes += json.load(f).get("nodes_created", 0)
    ndir = os.path.join(fdir, "nodes")
    if n_nodes <= NODES_REWRITE_GATE:
        _write_ds(compacted_nodes(ckpt, rounds), ndir, NODES_SCHEMA)
    else:
        # Scale path: per-round creation deltas are immutable and already in
        # NODES_SCHEMA; persist only the keep-last status-update payload and
        # a manifest. read_nodes() applies the updates lazily per batch.
        os.makedirs(ndir, exist_ok=True)
        upd = _node_status_updates(ckpt, rounds)
        if upd is not None:
            keys, codes, atts = upd
            os.makedirs(os.path.join(ndir, "status_updates"), exist_ok=True)
            pq.write_table(
                pa.table({"hi": pa.array(keys["hi"], pa.uint64()),
                          "lo": pa.array(keys["lo"], pa.uint64()),
                          "code": pa.array(codes, pa.int8()),
                          "atts": pa.array(atts, pa.int32())}),
                os.path.join(ndir, "status_updates", "updates.parquet"),
            )
        with open(os.path.join(ndir, "nodes_manifest.json"), "w") as f:
            json.dump(dict(node_files=node_files), f)

    # Edges: bootstrap delta (round 0, all src == seed/ROOT id) + per-round
    # edge partitions written by the seen shards at each barrier. Edges are
    # already globally distinct EXCEPT rows with src == seed id (the
    # ROOT/URL label split, crawl_service.rs:45): those were diverted into
    # tiny per-round seed_edges sidecars and are exact-deduped here on the
    # driver (min round wins). Below the rewrite gate everything compacts
    # into final/edges; above it final/edges holds the seed subset + a
    # manifest over the immutable per-round partitions (read_edges()).
    with open(os.path.join(ckpt, "crawl.json")) as f:
        meta = json.load(f)
    rname, rproto = normalize_url(meta["seed_url"])
    seed_id = rproto + rname

    e0_files = _parquet_files([os.path.join(_round_dir(ckpt, 0), "edges")])
    round_edge_files = _parquet_files(
        [os.path.join(_round_dir(ckpt, r), "edges") for r in range(1, rounds + 1)]
    )
    seed_files = _parquet_files(
        [os.path.join(_round_dir(ckpt, r), "seed_edges") for r in range(1, rounds + 1)]
    )

    n_edges = 0
    for r in range(1, rounds + 1):
        cpath = os.path.join(_round_dir(ckpt, r), "counters.json")
        if os.path.exists(cpath):
            with open(cpath) as f:
                n_edges += json.load(f).get("edges_created", 0)

    edir = os.path.join(fdir, "edges")
    os.makedirs(edir, exist_ok=True)

    # seed-src dedup (bootstrap edges are all seed-src; sidecars are tiny)
    seed_tbls = [pads.dataset(e0_files).to_table()] if e0_files else []
    if seed_files:
        seed_tbls.append(pads.dataset(seed_files).to_table())
    best: dict[str, dict] = {}
    for t in seed_tbls:
        for row in cast_table(t, EDGES_SCHEMA).to_pylist():
            if row["src"] != seed_id:
                continue
            cur = best.get(row["dst"])
            if cur is None or row["round"] < cur["round"]:
                best[row["dst"]] = row
    if best:
        pq.write_table(
            pa.Table.from_pylist(
                sorted(best.values(), key=lambda r: r["dst"]), schema=EDGES_SCHEMA
            ),
            os.path.join(edir, "part-seed.parquet"),
        )

    if n_edges <= EDGES_REWRITE_GATE:
        if round_edge_files:
            _write_ds(rd.read_parquet(round_edge_files), edir, EDGES_SCHEMA)
    else:
        with open(os.path.join(edir, "edges_manifest.json"), "w") as f:
            json.dump(dict(round_edge_files=round_edge_files), f)
    if not any(f.endswith(".parquet") for f in os.listdir(edir)):
        pq.write_table(EDGES_SCHEMA.empty_table(),
                       os.path.join(edir, "part-empty.parquet"))
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
    corpus_table: pa.Table | None = None,
    corpus_ref=None,
) -> CrawlResult:
    """Run (or resume) one crawl end-to-end. Requires an initialized Ray.
    Pass a pre-built ``corpus_table`` (build_fetch_corpus) to skip the
    driver-side corpus load (bench separates corpus load from crawl time)."""
    import ray

    cfg = cfg or CrawlConfig()
    meta_path = os.path.join(ckpt_dir, "crawl.json")

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

    rn, rp = normalize_url(seed_url)
    seed_id = rp + rn

    import time as _time

    _ph = {}  # coarse phase timers, dumped to ckpt/phases.json for tuning
    _t = _time.perf_counter()
    if cfg.corpus_partitioned:
        # 100 TB corpus layout: nothing ever broadcasts; the bootstrap loads
        # only the root's host partition, fetch tasks page partitions in
        # through a per-worker LRU (fetch.py PartitionedCorpus).
        from raycrawl.fetch import (PartitionedCorpus, ensure_partitioned_corpus,
                                    host_partition_ids)

        part_dir = ensure_partitioned_corpus(corpus_dir, cfg.corpus_partitions)
        pcorpus = PartitionedCorpus.open(part_dir, cfg.corpus_cache_parts)
        boot_table = pcorpus.partition_table(
            int(host_partition_ids([rn], pcorpus.n_parts)[0])
        )
        if not os.path.exists(os.path.join(_round_dir(ckpt_dir, 0), "_DONE")):
            _bootstrap(ckpt_dir, boot_table, seed_url, depth, crawl_id, cfg)
        corpus_ref = pcorpus
        expected_rows = pcorpus.num_rows
    else:
        from raycrawl.fetch import broadcast_corpus, resolve_corpus_table

        if corpus_table is None and corpus_ref is not None:
            corpus_table = resolve_corpus_table(ray.get(corpus_ref))
        if corpus_table is None:
            corpus_table = build_fetch_corpus(corpus_dir)
        if not os.path.exists(os.path.join(_round_dir(ckpt_dir, 0), "_DONE")):
            _bootstrap(ckpt_dir, corpus_table, seed_url, depth, crawl_id, cfg)
        if corpus_ref is None:
            # broadcast table + driver-precomputed sorted index: workers
            # warm zero-copy instead of each re-indexing the corpus
            corpus_ref = broadcast_corpus(corpus_table)
        expected_rows = corpus_table.num_rows

    _ph["corpus_boot_s"] = round(_time.perf_counter() - _t, 2)
    _t = _time.perf_counter()
    seen = _make_seen_actors(cfg, expected_keys=expected_rows * 4)
    _ph["actors_s"] = round(_time.perf_counter() - _t, 2)
    _t = _time.perf_counter()
    if expected_rows > 50_000:
        # big-corpus crawls: pre-pay heavy imports + per-worker corpus index
        # in every worker before round 1 (workers persist across rounds)
        _warm_workers(corpus_ref)
    _ph["warm_s"] = round(_time.perf_counter() - _t, 2)
    _t = _time.perf_counter()

    # restore seen state from all completed rounds
    last_done = 0
    r = 1
    while os.path.exists(os.path.join(_round_dir(ckpt_dir, r), "_DONE")):
        last_done = r
        r += 1
    if cfg.neardup_threshold is not None:
        # the ingestion-dedup index is built round-by-round; a crawl that
        # ran earlier rounds WITHOUT it has no index shards to probe, so a
        # late enable would silently miss every cross-round duplicate
        for rr in range(1, last_done + 1):
            if not os.path.isdir(os.path.join(_round_dir(ckpt_dir, rr),
                                              "ndx")):
                raise ValueError(
                    f"neardup_threshold requires the crawl to have run "
                    f"with ingestion dedup from its first round; "
                    f"round {rr} of {ckpt_dir} has no ndx/ index shard")
    import pyarrow.dataset as pads

    # Restore the committed set incrementally: per round, per parquet file,
    # vectorized Arrow filter + hash — never a whole-history Python list on
    # the driver. bulk_load calls for round r overlap with reading r+1
    # (refs awaited lazily in a sliding window).
    pending_refs: list = []
    for rr in range(0, last_done + 1):
        for f in _parquet_files([os.path.join(_round_dir(ckpt_dir, rr), "nodes")]):
            t = pq.read_table(f, columns=["node_id", "node_type"])
            # J1 matches only :URL nodes (job.rs:148)
            t = t.filter(pa.compute.equal(t["node_type"], "URL"))
            if t.num_rows == 0:
                continue
            hi, lo = hash128(t["node_id"].combine_chunks())
            shard = (hi % np.uint64(len(seen))).astype(np.int64)
            for s in np.unique(shard):
                m = shard == s
                pending_refs.append(seen[int(s)].bulk_load.remote(hi[m], lo[m]))
            if len(pending_refs) > 4 * len(seen):
                ready, pending_refs = pending_refs[: 2 * len(seen)], pending_refs[2 * len(seen):]
                ray.get(ready)
    if pending_refs:
        ray.get(pending_refs)
    _ph["restore_s"] = round(_time.perf_counter() - _t, 2)

    cancelled = os.path.isdir(os.path.join(ckpt_dir, "cancel"))
    r = last_done
    fr_table: pa.Table | None = None  # in-memory handoff round→round
    while not cancelled:
        if fr_table is not None:
            fsize = fr_table.num_rows
        else:
            fdir = os.path.join(_round_dir(ckpt_dir, r), "frontier")
            fsize = (pads.dataset(fdir).count_rows()
                     if os.path.isdir(fdir) else 0)
        if fsize == 0 or r >= max_rounds:
            break
        _, fr_table = _run_round(ckpt_dir, r + 1, crawl_id, cfg, corpus_ref,
                                 seen, seed_id=seed_id,
                                 frontier_table=fr_table)
        r += 1
        if cancel_after_round is not None and r >= cancel_after_round:
            _cancel(ckpt_dir, r, crawl_id)
            cancelled = True

    _t = _time.perf_counter()
    _finalize(ckpt_dir, r, cancelled)
    _ph["finalize_s"] = round(_time.perf_counter() - _t, 2)
    with open(os.path.join(ckpt_dir, "phases.json"), "w") as f:
        json.dump(_ph, f)
    # seen state is fully checkpointed (per-round deltas); the shard actors
    # are per-crawl scratch — release their heap instead of leaking one
    # actor set per crawl() call in long-lived drivers
    for h in seen:
        ray.kill(h, no_restart=True)
    return CrawlResult(crawl_id=crawl_id, ckpt_dir=ckpt_dir, rounds_run=r,
                       cancelled=cancelled)
