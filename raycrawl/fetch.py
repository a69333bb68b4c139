"""Fetch helpers: the corpus-join analogue of the reference's HTTP GET.

The reference fetches the live web with a pooled ``reqwest`` client, one URL
per worker iteration (shared/src/crawler.rs:18-51; client
feeder/src/main.rs:33-36; 8 workers, web-crawler/values.yaml:45).  Here
"fetching" ``http_type + name`` is a hash lookup of the frontier row against
the frozen page corpus — an explicit broadcast hash join:

- the driver ``ray.put``s the pages table ONCE (zero-copy Arrow in the
  object store); each *worker process* maps it on first use and builds a
  key→row-index dict, cached at module level — Ray worker processes persist
  across tasks and rounds, so the index is built once per worker, not per
  batch and not per round (the reason the hot stage can be stateless tasks
  instead of an actor pool);
- at the 100 TB design point the broadcast side is replaced by a
  host-hash-partitioned corpus (each fetch partition loads only
  ``hash(host) % P == its`` Parquet partitions); the per-row logic is
  unchanged.

Politeness / per-host budget (north-star feature; the reference has none —
SURVEY §2.6 L1) lives here too: per-worker host clocks spacing fetches by
the configured minimum interval. Global (not just per-worker) enforcement
requires the frontier to be host-partitioned, which the crawl driver does
when politeness is on.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl import sim
from raycrawl.kernels import decode_html, extract_urls, host_of, normalize_urls_arrow

STATUS_ROBOTS = 999

# per-worker-process caches (persist across tasks/rounds)
_CORPUS_CACHE: dict = {}
_ROBOTS_CACHE: dict[str, bool] = {}
_HOST_CLOCK: dict[str, float] = {}


def build_fetch_corpus(corpus_dir: str) -> pa.Table:
    """Driver-side: pages.parquet → (name, http_type, html) keyed by the
    normalized page URL. Broadcast via ``ray.put`` (done by the caller)."""
    pages = pq.read_table(f"{corpus_dir}/pages.parquet", columns=["url", "html"])
    names, protos = normalize_urls_arrow(pages["url"].combine_chunks())
    return pa.table({"name": names, "http_type": protos, "html": pages["html"]})


def corpus_key_strings(names, protos) -> "pa.Array":
    """Join (name, http_type) into the corpus lookup key string,
    vectorized ("\x00" cannot occur in either part)."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(names, protos, "\x00")


def get_corpus_index(corpus_ref):
    """(hash128-key→row dict, html column) for a broadcast corpus ref;
    cached per worker process (zero-copy ray.get from plasma on first call).

    Keys are the 128-bit hashes of "name\x00http_type" — built with one
    vectorized hash pass + dict(zip(...)), ~100× cheaper per worker than
    materializing per-row Python strings for the whole corpus. 128 bits →
    collision-free for any realistic corpus (birthday bound ~2^64 rows).
    """
    key = corpus_ref.hex() if hasattr(corpus_ref, "hex") else id(corpus_ref)
    hit = _CORPUS_CACHE.get(key)
    if hit is not None:
        return hit
    if isinstance(corpus_ref, pa.Table):
        table = corpus_ref
    else:
        import ray

        table = ray.get(corpus_ref)
    from raycrawl.kernels import hash128

    keys = corpus_key_strings(
        table["name"].combine_chunks(), table["http_type"].combine_chunks()
    )
    hi, lo = hash128(keys)
    index = dict(zip(zip(hi.tolist(), lo.tolist()), range(len(hi))))
    _CORPUS_CACHE.clear()  # one corpus live at a time per worker
    _CORPUS_CACHE[key] = (index, table["html"])
    return _CORPUS_CACHE[key]


def robots_blocked(host: str) -> bool:
    v = _ROBOTS_CACHE.get(host)
    if v is None:
        v = sim.robots_disallowed(host.lower())
        _ROBOTS_CACHE[host] = v
    return v


def politeness_wait(host: str, delay_s: float) -> None:
    """Per-worker per-host minimum fetch interval."""
    now = time.monotonic()
    wait = _HOST_CLOCK.get(host, -1e18) + delay_s - now
    if wait > 0:
        time.sleep(wait)
    _HOST_CLOCK[host] = time.monotonic()


def fetch_one(index, html_col, name: str, proto: str, key128, attempt: int,
              politeness_delay_s: float = 0.0, respect_robots: bool = False,
              want_html: bool = False):
    """One simulated fetch+extract → (status, elapsed_ms, n_extracted,
    sorted D1-deduped uppercased candidates, html|None). Reference
    lifecycle: fetch shared/src/crawler.rs:18-51, extract :55-60, D1
    feeder/src/job.rs:286."""
    host = host_of(name)
    if respect_robots and robots_blocked(host):
        return STATUS_ROBOTS, 0.0, 0, [], None
    if politeness_delay_s > 0:
        politeness_wait(host, politeness_delay_s)
    idx = index.get(key128)
    status = sim.fetch_status(name, proto, attempt, idx is not None)
    elapsed = sim.fetch_elapsed_ms(name, proto)
    if status != sim.STATUS_OK:
        return status, elapsed, 0, [], None
    html = decode_html(html_col[idx].as_py())
    raw = extract_urls(html)
    # D1: per-page HashSet of uppercased URLs (job.rs:286); sorted for
    # determinism — downstream is set-semantics.
    return status, elapsed, len(raw), sorted({u.upper() for u in raw}), (
        html if want_html else None
    )
