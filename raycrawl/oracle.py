"""Single-process reference-semantics BFS oracle (FIXTURES.md F5).

Computes the exact final crawl graph the reference would produce on a frozen
corpus, under the **round-synchronous, round-start-snapshot** determinization
of the reference's racy 8-worker traversal (SURVEY.md §7.4):

- node set   = all URLs reachable ≤ depth d whose discovery passed DNS;
- node depth = min discovery depth (MERGE first-writer, BFS property);
- edges      = one per distinct (parent, child) pair whose raw-uppercased
  candidate passed the J1 anti-join against the node set as of round start
  (feeder/src/job.rs:138-165) — including the www-variant quirk where a
  candidate passes J1 but MERGEs onto an existing node, creating an edge
  only (job.rs:180-186);
- statuses   = the reference job lifecycle: 4xx → FAILED immediately
  (job.rs:126-128); 5xx → attempts+1, FAILED at max_attempts else re-PENDING
  (job.rs:108-121); no new URLs → COMPLETED (job.rs:289-293); all children
  DNS-dropped → FAILED (job.rs:340-343); leaf children born COMPLETED
  (job.rs:182); root bootstrap without J1 (routes/crawl.rs:58-108,
  crawl_service.rs:17-65).

This file is the *test* ground truth — deliberately simple, row-at-a-time,
no Ray, no vectorization.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from raycrawl import dns_synth, sim
from raycrawl.kernels import normalize_url


class CrawlFailed(Exception):
    """Root fetch or root DNS failed → the reference returns an HTTP error
    and creates nothing (routes/crawl.rs:48-83)."""


@dataclass
class OracleNode:
    name: str
    http_type: str
    depth: int
    status: str
    ip: str
    domain: str
    request_time_ms: float
    attempts: int = 0


@dataclass
class OracleResult:
    crawl_id: str
    root: OracleNode
    nodes: dict = field(default_factory=dict)   # (name, http_type) -> OracleNode
    edges: set = field(default_factory=set)     # (src_id, dst_id), id = proto+name
    rounds_run: int = 0

    def status_counts(self) -> dict:
        counts = {"PENDING": 0, "IN-PROGRESS": 0, "COMPLETED": 0, "FAILED": 0, "CANCELLED": 0}
        for n in self.nodes.values():
            counts[n.status] += 1
        return counts


def load_corpus_index(corpus_dir: str):
    """corpus → {(name, http_type): captures list} keyed by normalized page URL."""
    caps = pq.read_table(os.path.join(corpus_dir, "captures.parquet"))
    index = {}
    for url, cap in zip(caps["src_url"].to_pylist(), caps["captures"].to_pylist()):
        index[normalize_url(url)] = cap
    return index


def oracle_crawl(
    corpus_dir: str,
    seed_url: str,
    depth: int,
    crawl_id: str = "oracle",
    max_attempts: int = 3,
    max_dns_depth: int = 5,
    cancel_after_round: int | None = None,
) -> OracleResult:
    if not 1 <= depth <= 5:
        raise ValueError("depth must be between 1 and 5")  # routes/crawl.rs:36-42
    index = load_corpus_index(corpus_dir)

    # --- root bootstrap (routes/crawl.rs:45-108, crawl_service.rs:17-65) ---
    rname, rproto = normalize_url(seed_url)
    rkey = (rname, rproto)
    status = sim.fetch_status(rname, rproto, 1, rkey in index)
    if status != sim.STATUS_OK:
        raise CrawlFailed(f"root fetch {status}")
    rstats = dns_synth.get_network_stats(rname, max_dns_depth)
    if rstats is None:
        raise CrawlFailed("root DNS failed")
    relapsed = sim.fetch_elapsed_ms(rname, rproto)
    root = OracleNode(rname, rproto, 0, "root", rstats[1], rstats[0], relapsed)
    res = OracleResult(crawl_id=crawl_id, root=root)

    # Depth-1 children: raw capture list, duplicates kept, NO J1 anti-join
    # (SURVEY §3.1) — MERGE alone dedups; first occurrence's props win.
    for raw in index[rkey]:
        cname, cproto = normalize_url(raw)
        st = dns_synth.get_network_stats(cname, max_dns_depth)
        if st is None:
            continue  # silently dropped (routes/crawl.rs:97)
        ckey = (cname, cproto)
        if ckey not in res.nodes:
            cstatus = "COMPLETED" if depth == 1 else "PENDING"
            res.nodes[ckey] = OracleNode(cname, cproto, 1, cstatus, st[1], st[0], relapsed)
        res.edges.add((rproto + rname, cproto + cname))

    # --- BFS rounds (feeder loop; round-synchronous determinization) ---
    r = 0
    while True:
        jobs = sorted(
            (k for k, n in res.nodes.items() if n.status == "PENDING" and n.depth < depth),
        )
        if not jobs:
            break
        r += 1
        snapshot_ids = {p + n for (n, p) in res.nodes}  # all URL nodes at round start
        round_children: dict = {}   # ckey -> list of creator dicts
        round_edges: set = set()

        for key in jobs:
            job = res.nodes[key]
            attempt = job.attempts + 1
            fstatus = sim.fetch_status(job.name, job.http_type, attempt, key in index)
            if fstatus != sim.STATUS_OK:
                if sim.is_permanent_failure(fstatus):
                    job.status, job.attempts = "FAILED", attempt
                else:
                    job.attempts = attempt
                    if attempt >= max_attempts:
                        job.status = "FAILED"
                    # else: stays PENDING → re-enters next round (job.rs:117-121)
                continue
            caps = index[key]
            upper_set = {c.upper() for c in caps}                       # D1, job.rs:286
            new_urls = {u for u in upper_set if u not in snapshot_ids}  # J1, job.rs:138-165
            if not new_urls:
                job.status = "COMPLETED"                                # job.rs:289-293
                continue
            normalized = {normalize_url(u) for u in new_urls}           # job.rs:296-299
            elapsed = sim.fetch_elapsed_ms(job.name, job.http_type)
            children = []
            for cname, cproto in sorted(normalized):
                st = dns_synth.get_network_stats(cname, max_dns_depth)
                if st is None:
                    continue                                            # job.rs:325-329
                children.append((cname, cproto, st[1], st[0]))
            if not children:
                job.status = "FAILED"                                   # job.rs:340-343
                continue
            pid = job.http_type + job.name
            for cname, cproto, ip, dom in children:
                round_children.setdefault((cname, cproto), []).append(
                    dict(parent_id=pid, depth=job.depth + 1, ip=ip, domain=dom, rt=elapsed)
                )
                round_edges.add((pid, cproto + cname))
            job.status = "COMPLETED"

        # Barrier: MERGE children. Winner among same-round creators = min
        # (depth, hash64(parent_id)) — deterministic stand-in for "first
        # writer" (same rule as SeenShardImpl.commit_round; the choice only
        # affects which parent's request_time the child inherits).
        from raycrawl.kernels import hash128 as _h128

        for ckey, creators in round_children.items():
            cid = ckey[1] + ckey[0]
            if cid in snapshot_ids:
                continue  # ON CREATE skipped; edges still added below
            w = min(creators,
                    key=lambda c: (c["depth"], int(_h128([c["parent_id"]])[0][0])))
            cstatus = "COMPLETED" if w["depth"] == depth else "PENDING"
            res.nodes[ckey] = OracleNode(
                ckey[0], ckey[1], w["depth"], cstatus, w["ip"], w["domain"], w["rt"]
            )
        res.edges |= round_edges

        if cancel_after_round is not None and r >= cancel_after_round:
            for n in res.nodes.values():
                if n.status in ("PENDING", "IN-PROGRESS"):
                    n.status = "CANCELLED"       # crawl_service.rs:219-235
            break

    res.rounds_run = r
    return res
