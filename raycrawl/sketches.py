"""Mergeable approximate-distinct sketches (HyperLogLog) — the 100 TB
answer to ``count(DISTINCT key)``.

``relational.events_user_distinct`` is the EXACT plan (one hash shuffle of
the deduped pair space). At the design point even that shuffle moves
billions of pairs; an HLL register array is a few KB per group, merges
with an elementwise max, and never shuffles row data at all:

    map_batches(partial registers per group)   # zero row shuffle
      → driver (or tiny groupby) max-merge     # bytes ∝ groups × 2^p

Determinism: registers derive from hash128 of the key bytes (the repo's
single splitmix-based vectorized hash, kernels.py) — the same input gives
the same estimate on every run, any partitioning, any cluster size. The
estimate is approximate (±~1.04/sqrt(2^p)), so there is deliberately NO
DuckDB value oracle; tests pin the error envelope against the exact count
and the merge associativity instead (rows-only driver check, documented).

Reference scope note: the reference engine has no sketch family; this is
the beyond-reference LLM-data lane (task brief) built on public HLL
(Flajolet et al. 2007), like the MinHash/SimHash lanes in dedup.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raycrawl.relational import _t

P = 12                      # 2^12 = 4096 registers → ~1.6% std error
M = 1 << P
_ALPHA = 0.7213 / (1.0 + 1.079 / M)  # bias constant for m ≥ 128


def hll_partial(keys: np.ndarray) -> np.ndarray:
    """int64/str keys → uint8[M] register array (one batch's sketch)."""
    from raycrawl.kernels import hash128

    if len(keys) == 0:
        return np.zeros(M, dtype=np.uint8)
    hi, _ = hash128(pa.array(keys.astype(str), pa.string()))
    idx = (hi >> np.uint64(64 - P)).astype(np.int64)
    rest = hi << np.uint64(P)  # top P bits consumed by the index
    # rank = leading zeros of the remaining 64-P bits, +1 (cap at 64-P+1)
    nz = rest != 0
    lz = np.full(len(hi), 64 - P, dtype=np.int64)
    # bit_length via log2 is unsafe for 64-bit; use a vectorized shift scan
    r = rest[nz]
    bl = np.zeros(len(r), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = r >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        r = np.where(m, r >> np.uint64(s), r)
    lz[nz] = 64 - 1 - bl
    rank = np.minimum(lz + 1, 64 - P + 1).astype(np.uint8)
    regs = np.zeros(M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007 §4)."""
    regs = regs.astype(np.float64)
    e = _ALPHA * M * M / np.sum(np.exp2(-regs))
    if e <= 2.5 * M:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return M * np.log(M / zeros)
    return float(e)


def events_user_hll(sf_dir: str) -> pa.Table:
    """Approximate distinct users per event_type via per-batch HLL
    partials max-merged on the driver — zero shuffle, sketch bytes only.

    No SQL oracle (approximate by design; rows-only driver check) — the
    exact twin ``events_user_distinct`` is the oracled counterpart, and
    pytest pins |hll − exact| / exact ≤ 5% plus merge associativity."""

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy()
        types, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "regs": pa.array(
                [hll_partial(uid[inv == i]).tobytes() for i in range(len(types))],
                pa.binary()),
            "n_events": pa.array(
                np.bincount(inv, minlength=len(types)).astype(np.int64)),
        })

    parts = (
        _t(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for et, g in parts.groupby("event_type"):
        regs = np.zeros(M, dtype=np.uint8)
        for buf in g["regs"]:
            regs = hll_merge(regs, np.frombuffer(buf, dtype=np.uint8))
        rows.append({
            "event_type": et,
            "approx_users": int(round(hll_estimate(regs))),
            "n_events": int(g["n_events"].sum()),
        })
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
