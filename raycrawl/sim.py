"""Deterministic fetch simulation — the sandbox analogue of HTTP GET.

The reference fetches the live web (shared/src/crawler.rs:18-51: 10s
timeout, non-2xx → typed error).  Here "the web" is a frozen Parquet page
corpus, and the per-URL outcome is a pure function of the normalized URL and
the attempt number, so the FetchActor pool and the single-process test
oracle agree by construction:

- page missing from the corpus        → 404 (a 4xx ⇒ immediate FAILED,
                                        feeder/src/job.rs:126-128)
- outcome class "down"  (h%32 == 2)   → 503 on every attempt ⇒ FAILED after
                                        max_attempts (job.rs:108-115)
- outcome class "flaky" (h%32 == 3)   → 503 on the first attempt, 200 after
                                        ⇒ exercises the retry/re-enqueue path
- otherwise                           → 200

``elapsed`` (the reference's ``PageData.elapsed``, propagated to children as
``request_time`` — job.rs:301,311) is likewise a deterministic per-URL value
in milliseconds.
"""

from __future__ import annotations

from raycrawl.kernels import hash64_int

STATUS_OK = 200
STATUS_NOT_FOUND = 404
STATUS_UNAVAILABLE = 503


def outcome_class(name: str, http_type: str) -> int:
    return hash64_int("fetch:" + http_type + name) % 32


def fetch_status(name: str, http_type: str, attempt: int, has_page: bool) -> int:
    """HTTP status for fetching ``http_type + name`` on attempt N (1-based)."""
    if not has_page:
        return STATUS_NOT_FOUND
    c = outcome_class(name, http_type)
    if c == 2:
        return STATUS_UNAVAILABLE
    if c == 3 and attempt <= 1:
        return STATUS_UNAVAILABLE
    return STATUS_OK


def fetch_elapsed_ms(name: str, http_type: str) -> float:
    """Deterministic per-URL fetch latency in ms (50–499)."""
    return float(50 + hash64_int("lat:" + http_type + name) % 450)


# the single source of truth for "permanent failure" (4xx): vectorized
# callers (frontier.py) use the range constants; a test pins the mask
# algebra to is_permanent_failure over the whole status domain
PERMANENT_FAILURE_LO = 400
PERMANENT_FAILURE_HI = 500


def is_permanent_failure(status: int) -> bool:
    """4xx ⇒ permanent FAILED regardless of attempts (job.rs:126-128)."""
    return PERMANENT_FAILURE_LO <= status < PERMANENT_FAILURE_HI


def robots_disallowed(host_lower: str) -> bool:
    """Synthetic robots.txt: a deterministic ~1/64 of hosts disallow all.

    The reference has NO robots handling; this backs the opt-in
    ``CrawlConfig.respect_robots`` politeness feature only.
    """
    return hash64_int("robots:" + host_lower) % 64 == 5
