"""Pure per-record kernels: URL extraction, normalization, hashing.

Semantics are byte-identical to the reference:

- ``extract_urls`` — regex ``https?://[\\w\\-.]+(?::\\d+)?`` over the raw
  HTML, all matches in document order, duplicates kept, case-sensitive
  lowercase scheme, host charset ``[\\w\\-.]``, optional ``:port``, paths
  never captured (shared/src/crawler.rs:8-9,55-60; tests :62-114).
- ``normalize_url`` — uppercase, strip one leading ``HTTPS://``/``HTTP://``
  (default proto ``HTTP://`` when schemeless), then strip one leading
  ``WWW.`` (shared/src/url_normalize.rs:8-22; tests :24-69).

Both have a scalar form (conformance vectors) and a vectorized Arrow form
used in the hot ``map_batches`` path; a hypothesis test asserts they agree.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Same pattern as the Rust `regex` crate literal (shared/src/crawler.rs:9).
# Python `re` and Rust `regex` agree on this pattern: `\w` is Unicode-aware
# in both, `(?::\d+)?` is an optional non-capturing port group.
URL_RE = re.compile(r"https?://[\w\-.]+(?::\d+)?")


def extract_urls(html: str) -> list[str]:
    """All regex matches in document order, duplicates kept.

    Reference: shared/src/crawler.rs:55-60.
    """
    return URL_RE.findall(html)


def decode_html(html: bytes | str) -> str:
    """Bytes → str for the extractor.

    The reference's ``response.text()`` does charset-aware decoding
    (shared/src/crawler.rs:42); our corpus is UTF-8, decoded with
    replacement so malformed bytes can never kill a batch.
    """
    if isinstance(html, str):
        return html
    return html.decode("utf-8", errors="replace")


def normalize_url(url: str) -> tuple[str, str]:
    """→ ``(name, http_type)``. Reference: shared/src/url_normalize.rs:8-22."""
    upper = url.upper()
    if upper.startswith("HTTPS://"):
        rest, proto = upper[8:], "HTTPS://"
    elif upper.startswith("HTTP://"):
        rest, proto = upper[7:], "HTTP://"
    else:
        rest, proto = upper, "HTTP://"
    name = rest[4:] if rest.startswith("WWW.") else rest
    return name, proto


def normalize_urls_arrow(urls: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Vectorized ``normalize_url`` over an Arrow string array.

    Returns ``(names, protos)``.

    Non-ASCII rows take the scalar path: Arrow's ``utf8_upper`` uses simple
    case mapping (ß→ẞ) while Rust's ``to_uppercase`` — which the reference
    uses (url_normalize.rs:9) — and Python's ``str.upper`` use full case
    mapping (ß→SS). ASCII rows (the overwhelming majority of hosts) stay on
    the vectorized path.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ascii_mask = pc.string_is_ascii(urls)
    if not pc.all(ascii_mask).as_py() if len(urls) else False:
        # mixed: vectorize ASCII rows, scalar-fix the rest
        names, protos = _normalize_ascii_arrow(urls)
        fix_idx = np.flatnonzero(~ascii_mask.to_numpy(zero_copy_only=False))
        names_py = names.to_pylist()
        protos_py = protos.to_pylist()
        raw = urls.to_pylist()
        for i in fix_idx:
            n, p = normalize_url(raw[i])
            names_py[i], protos_py[i] = n, p
        return pa.array(names_py, pa.string()), pa.array(protos_py, pa.string())
    return _normalize_ascii_arrow(urls)


def _normalize_ascii_arrow(urls: pa.Array) -> tuple[pa.Array, pa.Array]:
    upper = pc.utf8_upper(urls)
    is_https = pc.starts_with(upper, "HTTPS://")
    is_http = pc.starts_with(upper, "HTTP://")
    stripped = pc.if_else(
        is_https,
        pc.utf8_slice_codeunits(upper, 8),
        pc.if_else(is_http, pc.utf8_slice_codeunits(upper, 7), upper),
    )
    protos = pc.if_else(is_https, pa.scalar("HTTPS://"), pa.scalar("HTTP://"))
    has_www = pc.starts_with(stripped, "WWW.")
    names = pc.if_else(has_www, pc.utf8_slice_codeunits(stripped, 4), stripped)
    return names, protos


def full_url(name, http_type):
    """``http_type + name`` — node id / refetch URL (feeder/src/job.rs:103,
    manager graph export graph_service.rs:31,60)."""
    return http_type + name


def host_of(name: str) -> str:
    """Host part of a normalized name (strip ``:port``).

    The reference extractor only ever captures host(:port) — there are no
    paths — so this is exact, not heuristic.
    """
    i = name.find(":")
    return name if i < 0 else name[:i]


# ---------------------------------------------------------------------------
# Hashing. 128-bit keys for the URL-seen filter (64-bit birthday-collides at
# the 10^10-URL design point), via two independently-seeded xxhash64 lanes
# (polars' vectorized hash) with a deterministic scalar fallback.
# ---------------------------------------------------------------------------

_H1_SEED = 0x9E3779B97F4A7C15
_H2_SEED = 0xC2B2AE3D27D4EB4F

try:
    import os as _os

    # polars spins a thread pool of os.cpu_count() threads PER PROCESS; with
    # ~32 Ray workers each hashing small batches that's ~1000 threads of
    # pure contention. One thread per worker is the right shape here.
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False


def hash128(strings) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (hi, lo) uint64 pair per string. Deterministic per process
    set (fixed polars version); tests recompute with the same function."""
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        col = strings
    else:
        col = pa.array(list(strings), type=pa.string())
    if _HAVE_POLARS:
        s = pl.from_arrow(col)
        if isinstance(s, pl.DataFrame):  # pragma: no cover
            s = s.to_series()
        hi = s.hash(seed=_H1_SEED % (1 << 64)).to_numpy().astype(np.uint64)
        lo = s.hash(seed=_H2_SEED % (1 << 64)).to_numpy().astype(np.uint64)
        return hi, lo
    # Fallback: blake2b 16 bytes per string (slow, exact).
    vals = col.to_pylist() if isinstance(col, (pa.Array, pa.ChunkedArray)) else list(col)
    hi = np.empty(len(vals), dtype=np.uint64)
    lo = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        d = hashlib.blake2b((v or "").encode("utf-8"), digest_size=16).digest()
        hi[i] = int.from_bytes(d[:8], "little")
        lo[i] = int.from_bytes(d[8:], "little")
    return hi, lo


def hash64_int(s: str) -> int:
    """Stable scalar 64-bit hash (blake2b) — used only for deterministic
    synthetic derivations (DNS, fetch outcomes, corpus topology), never for
    dedup identity."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def md5_u64(s: str) -> int:
    """Lower 64 bits of md5, bit-identical to DuckDB ``md5_number_lower()``
    (bytes 8..16 of the digest, little-endian). Used wherever a derived
    value must be recomputable by the SQL oracle."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def md5_u64_np(strings) -> np.ndarray:
    """Vectorized-ish ``md5_u64`` over an iterable → uint64 array."""
    vals = strings.to_pylist() if isinstance(strings, (pa.Array, pa.ChunkedArray)) else list(strings)
    out = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        out[i] = int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[8:16], "little")
    return out
