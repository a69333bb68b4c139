"""Windowed / temporal operators over the ``events`` table — the two
custom operators a training-data pipeline needs that Ray Data has no
built-in for (sessionization, as-of join), expressed as the composition
the guide prescribes: hash-shuffle on the entity key
(``groupby(user_id)``) + a fully VECTORIZED numpy kernel per group
(sort, diff, cumsum, searchsorted — no Python row loops).

Scale notes:
- The shuffle key is ``hash(user_id) % P`` (P follows cluster CPUs) — the
  same key every operator here uses, so a pipeline running several
  shuffles once. Each partition task handles ALL its users at once with
  segmented numpy kernels over sort(user_id, ts, event_id) order (user
  boundaries are just extra session breaks / reduceat offsets) — never
  one Python ``map_groups`` call per user, which is the per-tiny-group
  cliff the anchor-index lane measured at 511 s vs 22 s for 5M groups.
- Per-partition work is O(n log n) numpy on that partition's events;
  skew is bounded by the most active user (one user still lands in one
  partition).
- All outputs are exact integers (µs epochs, value cents) so the DuckDB
  oracle hash-matches bit-for-bit (no float-summation-order hazard).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from raycrawl.kernels import table_from_pandas

GAP_MINUTES = 30


def _events(sf_dir: str, columns):
    from raycrawl.kernels import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=columns)


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] column → int64 epoch microseconds."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def by_user_parts(ds):
    """Hash-partition an events Dataset on ``user_id`` — ONE exchange that
    co-locates every user's rows; the returned GroupedData's map_groups
    runs once per PARTITION (≈ cluster CPUs), never once per user."""
    import ray

    n_parts = (max(8, int(ray.cluster_resources().get("CPU", 8)))
               if ray.is_initialized() else 8)

    def add_part(t: pa.Table) -> pa.Table:
        u = (t["user_id"].to_numpy(zero_copy_only=False)
             .astype(np.int64).view(np.uint64))
        with np.errstate(over="ignore"):
            h = u * np.uint64(0x9E3779B97F4A7C15)
        part = (h % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("part")


def _user_session_segments(u: np.ndarray, ts: np.ndarray, gap_us: int):
    """Segment sorted-(user, ts) rows into sessions: returns (starts,
    ends, user-relative 1-based session ordinal per start). A new user is
    just another session break, so the whole partition vectorizes."""
    n = len(u)
    new_u = np.ones(n, dtype=bool)
    new_u[1:] = u[1:] != u[:-1]
    brk = new_u.copy()
    brk[1:] |= ts[1:] - ts[:-1] > gap_us
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], n]
    # session ordinal within user = global session number minus the
    # user's first session number + 1
    cum = np.cumsum(brk)
    ustart_rows = np.flatnonzero(new_u)
    k = np.searchsorted(ustart_rows, starts, side="right") - 1
    sid = cum[starts] - cum[ustart_rows[k]] + 1
    return starts, ends, sid


def user_sessions(sf_dir: str, gap_minutes: int = GAP_MINUTES) -> pa.Table:
    """Gap-based sessionization: a user's events sorted by (ts, event_id);
    a new session starts when the gap from the previous event exceeds
    ``gap_minutes``. One row per session: counts, span, exact value cents.
    """
    gap_us = int(gap_minutes) * 60_000_000

    def per_part(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_us(g["ts"])
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            g["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, cents = u[order], ts[order], cents[order]
        starts, ends, sid = _user_session_segments(u, ts, gap_us)
        csum = np.r_[0, np.cumsum(cents)]
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends - 1], pa.int64()),
                "duration_us": pa.array(ts[ends - 1] - ts[starts], pa.int64()),
                "total_value_cents": pa.array(
                    csum[ends] - csum[starts], pa.int64()
                ),
            }
        )

    out = (
        by_user_parts(_events(sf_dir, ["event_id", "ts", "user_id", "value"]))
        .map_groups(per_part, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values(["user_id", "session_id"])
    return table_from_pandas(out)


def user_sessions_sql(gap_minutes: int = GAP_MINUTES) -> str:
    return f"""
    WITH o AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {gap_minutes} * 60000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS session_id
      FROM o
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(ts_us) AS BIGINT) AS start_us,
           CAST(max(ts_us) AS BIGINT) AS end_us,
           CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
           CAST(sum(cents) AS BIGINT) AS total_value_cents
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """


def purchase_asof_click(sf_dir: str) -> pa.Table:
    """As-of join WITHIN the events stream: for every 'purchase', the most
    recent 'click' of the same user at-or-before it (NULL when none).
    Whole-partition kernel: in sort(user, ts, event_id) order the
    last-click-so-far is one ``np.maximum.accumulate`` over click row
    indices; a carried value from the PREVIOUS user is detectable (its
    index precedes this user's first row) and nulled — the canonical
    as-of forward-fill, all users at once. ((user_id, ts) is unique in
    the generator, so at-or-before never ties; the SQL oracle's rank
    totalizes the tie case regardless.)"""

    def per_part(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_us(g["ts"])
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid, et = u[order], ts[order], eid[order], et[order]
        n = len(u)
        idx = np.arange(n)
        last_click = np.maximum.accumulate(np.where(et == "click", idx, -1))
        new_u = np.ones(n, dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        ustart_rows = np.flatnonzero(new_u)
        ustart_of = ustart_rows[
            np.searchsorted(ustart_rows, idx, side="right") - 1]
        valid = last_click >= ustart_of      # a prior-user click is stale
        is_p = et == "purchase"
        lc, ok = last_click[is_p], valid[is_p]
        safe = np.maximum(lc, 0)
        return pa.table(
            {
                "purchase_event_id": pa.array(eid[is_p], pa.int64()),
                "user_id": pa.array(u[is_p], pa.int64()),
                "purchase_us": pa.array(ts[is_p], pa.int64()),
                "click_event_id": pa.array(
                    np.where(ok, eid[safe], 0), pa.int64(),
                    mask=~ok),
                "click_us": pa.array(
                    np.where(ok, ts[safe], 0), pa.int64(),
                    mask=~ok),
            }
        )

    out = (
        by_user_parts(
            _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]))
        .map_groups(per_part, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values("purchase_event_id")
    return table_from_pandas(out)


def purchase_asof_click_sql() -> str:
    # ties are impossible ((user_id, ts) is unique in the generator) but the
    # rank still orders (ts, event_id) so the oracle is total regardless
    return """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         j AS (SELECT p.event_id AS purchase_event_id, p.user_id,
                      epoch_us(p.ts) AS purchase_us,
                      c.event_id AS click_event_id, epoch_us(c.ts) AS click_us,
                      row_number() OVER (PARTITION BY p.event_id
                                         ORDER BY c.ts DESC, c.event_id DESC)
                      AS rn
               FROM p LEFT JOIN c
                 ON p.user_id = c.user_id AND c.ts <= p.ts)
    SELECT purchase_event_id, user_id,
           CAST(purchase_us AS BIGINT) AS purchase_us,
           CAST(click_event_id AS BIGINT) AS click_event_id,
           CAST(click_us AS BIGINT) AS click_us
    FROM j WHERE rn = 1
    ORDER BY purchase_event_id
    """


def session_funnel(sf_dir: str, gap_minutes: int = GAP_MINUTES) -> pa.Table:
    """Within-session conversion funnel: of all sessions (same gap rule as
    ``user_sessions``), how many contain a click, and how many convert —
    a purchase strictly AFTER the session's first click in (ts, event_id)
    order. Output is one global row, so the distributed shape is ideal:
    one user hash shuffle, a whole-partition segmented kernel (first
    click / last purchase per session via ``np.minimum/maximum.reduceat``
    over the session boundaries — no per-session Python) emitting three
    partial counts, and a driver sum. The conversion rate is one double
    division mirrored verbatim in the oracle."""
    gap_us = int(gap_minutes) * 60_000_000

    def per_part(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_us(g["ts"])
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        n = len(u)
        starts, _ends, _sid = _user_session_segments(u, ts, gap_us)
        idx = np.arange(n)
        first_click = np.minimum.reduceat(
            np.where(et == "click", idx, n), starts)
        last_purch = np.maximum.reduceat(
            np.where(et == "purchase", idx, -1), starts)
        has_click = first_click < n
        n_click = int(has_click.sum())
        n_conv = int((has_click & (last_purch > first_click)).sum())
        return pa.table({
            "n_sessions": pa.array([len(starts)], pa.int64()),
            "n_with_click": pa.array([n_click], pa.int64()),
            "n_converted": pa.array([n_conv], pa.int64()),
        })

    parts = (
        by_user_parts(
            _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]))
        .map_groups(per_part, batch_format="pyarrow")
        .to_pandas()
    )
    ns = int(parts["n_sessions"].sum())
    nc = int(parts["n_with_click"].sum())
    nv = int(parts["n_converted"].sum())
    import pandas as pd

    out = pd.DataFrame({
        "n_sessions": [ns], "n_with_click": [nc], "n_converted": [nv],
        "conversion_rate": [float(nv) / nc if nc else 0.0],
    })
    return table_from_pandas(out)


def session_funnel_sql(gap_minutes: int = GAP_MINUTES) -> str:
    return f"""
    WITH o AS (
      SELECT user_id, event_type,
             row_number() OVER w AS rn,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {gap_minutes} * 60000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY rn
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o),
    per AS (
      SELECT user_id, session_id,
             min(CASE WHEN event_type = 'click' THEN rn END) AS first_click,
             max(CASE WHEN event_type = 'purchase' THEN rn END) AS last_purchase
      FROM s GROUP BY user_id, session_id)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(first_click) AS BIGINT) AS n_with_click,
           CAST(count(CASE WHEN last_purchase > first_click THEN 1 END)
                AS BIGINT) AS n_converted,
           CAST(count(CASE WHEN last_purchase > first_click THEN 1 END)
                AS DOUBLE)
             / count(first_click) AS conversion_rate
    FROM per
    """
