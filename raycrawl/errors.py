"""Typed error taxonomy + HTTP status surface (M10/L3).

Mirrors the reference manager's error mapping
(manager/src/routes/crawl.rs:14-26 ``crawler_error_to_status``):

    HttpTimeout                        → 504 GATEWAY_TIMEOUT
    HttpStatus{404}                    → 404 NOT_FOUND
    HttpStatus{*}/HttpRequest/BodyRead → 502 BAD_GATEWAY
    DnsResolution                      → 502 BAD_GATEWAY
    Neo4jConnection/Neo4jQuery         → 500 INTERNAL_SERVER_ERROR

plus the route-level cases: depth outside [1, 5] → 400 BAD_REQUEST
(crawl.rs:28-42) and unknown crawl_id → 404 NOT_FOUND
(graph_service.rs:15-21 returns None; routes/graph.rs answers 404).

Delta vs the reference, by construction: the frozen-corpus fetch
simulation (raycrawl.sim) cannot hang, so ``FetchTimeout`` is never raised
by the sim itself — it exists so the surface is complete for a real
fetcher plugged into the same engine.
"""

from __future__ import annotations


class CrawlerError(Exception):
    """Base of the engine's typed errors; ``http_status`` is what the
    reference manager would answer for this failure."""

    http_status = 500


class InvalidDepth(CrawlerError, ValueError):
    """Depth outside [1, max] (crawl.rs:28-42; M9)."""

    http_status = 400


class CrawlNotFound(CrawlerError, KeyError):
    """Existence probe miss: no ROOT for the crawl_id
    (graph_service.rs:15-21; L3)."""

    http_status = 404


class FetchTimeout(CrawlerError):
    """HttpTimeout → GATEWAY_TIMEOUT (never produced by the frozen-corpus
    sim — see module docstring)."""

    http_status = 504


class FetchNotFound(CrawlerError):
    """HttpStatus{404} → NOT_FOUND."""

    http_status = 404


class FetchFailed(CrawlerError):
    """Any other HTTP/DNS failure → BAD_GATEWAY."""

    http_status = 502


class StateError(CrawlerError):
    """Graph/state-store failure → INTERNAL_SERVER_ERROR."""

    http_status = 500


def http_status_for(err: BaseException) -> int:
    """The HTTP status the reference manager surfaces for ``err``."""
    if isinstance(err, CrawlerError):
        return err.http_status
    return 500


def fetch_error(status: int, url: str) -> CrawlerError:
    """Typed error for a failed fetch status (the CrawlerError branch of
    shared/src/crawler.rs:18-51 as seen by create_crawl)."""
    if status == 404:
        return FetchNotFound(f"fetch {url}: HTTP 404")
    if status == 408:
        return FetchTimeout(f"fetch {url}: timed out")
    return FetchFailed(f"fetch {url}: HTTP {status}")
