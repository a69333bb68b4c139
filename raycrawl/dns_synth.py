"""Synthetic deterministic DNS — sandbox analogue of shared/src/dns.rs.

The reference resolves a normalized host via **iterative domain
shortening**: split on ``.``; for ``suffix_len`` in ``2..=min(max_depth,
parts)`` try the last ``suffix_len`` labels (shortest first:
``A.B.C.COM`` → ``C.COM``, ``B.C.COM``, ``A.B.C.COM``); queries are
lowercased; the first suffix with an **IPv4** answer wins; ``domain`` is the
first label of the winning suffix and ``ip`` the first A record; all
candidates failing → error, and the child URL is dropped
(shared/src/dns.rs:15-48; drop at feeder/src/job.rs:325-329).

In the sandbox there is no network, so resolution is a pure deterministic
function of the lowercase hostname (hash-derived), preserving the
suffix-iteration, lowercase-query and IPv4-only semantics exactly.  The
corpus generator and the test oracle use the same function, so ground truth
matches by construction.
"""

from __future__ import annotations

from raycrawl.kernels import hash64_int

# Per-host outcome classes, derived from hash64_int("dns:" + host) % 16:
_NXDOMAIN = {0}       # no record at all
_IPV6_ONLY = {1}      # resolves, but no A record → reference keeps iterating


def resolve_ipv4(hostname_lower: str) -> str | None:
    """First A record for a lowercase hostname, or None.

    Deterministic synthetic analogue of ``resolver.lookup_ip`` +
    IPv4-first-match (shared/src/dns.rs:28-35). Hostnames containing ``:``
    (ports leaking into the name) or empty labels never resolve, matching a
    real resolver rejecting invalid names.
    """
    if not hostname_lower or ":" in hostname_lower:
        return None
    if hostname_lower != hostname_lower.lower():
        # Reference always lowercases before querying (dns.rs:28); calling
        # with anything else is a bug upstream.
        hostname_lower = hostname_lower.lower()
    h = hash64_int("dns:" + hostname_lower)
    m = h % 16
    if m in _NXDOMAIN or m in _IPV6_ONLY:
        return None
    return f"10.{(h >> 8) % 256}.{(h >> 16) % 256}.{(h >> 24) % 256}"


def candidate_domains(name_upper: str, max_depth: int = 5) -> list[str]:
    """Ordered candidate suffixes (shortest first).

    Conformance target: shared/src/dns.rs:56-66 (test helper
    ``build_candidate_domains``) — e.g. ``A.B.C.COM`` →
    ``["C.COM", "B.C.COM", "A.B.C.COM"]``; single-label names yield [].
    """
    parts = name_upper.split(".")
    out = []
    for suffix_len in range(2, min(max_depth, len(parts)) + 1):
        out.append(".".join(parts[len(parts) - suffix_len:]))
    return out


def get_network_stats(name_upper: str, max_depth: int = 5) -> tuple[str, str] | None:
    """→ ``(domain, ip)`` or None when every candidate fails.

    Exact port of the control flow of shared/src/dns.rs:15-48 over the
    synthetic resolver: first candidate (shortest suffix) with an IPv4
    answer wins; ``domain`` = first label of the winning suffix.
    """
    parts = name_upper.split(".")
    for suffix_len in range(2, min(max_depth, len(parts)) + 1):
        domain_parts = parts[len(parts) - suffix_len:]
        ip = resolve_ipv4(".".join(domain_parts).lower())
        if ip is not None:
            return domain_parts[0], ip
    return None
