"""Windowed / temporal operators over the ``events`` table — the two
custom operators a training-data pipeline needs that Ray Data has no
built-in for (sessionization, as-of join), expressed as the composition
the guide prescribes: hash-shuffle on the entity key
(``groupby(user_id)``) + a fully VECTORIZED numpy kernel per group
(sort, diff, cumsum, searchsorted — no Python row loops).

Scale notes:
- The shuffle key is ``user_id`` — the same key both operators need, so a
  pipeline running both shuffles once.
- Per-group work is O(n log n) numpy on that user's events only; group
  payloads stay small (a user's history), so skew is bounded by the most
  active user. For a corpus where per-group dispatch overhead dominates
  (≫10M tiny groups) the same kernels run segmented over
  sort(user_id, ts) blocks with boundary fix-up; at the tested scales the
  groupby form measures faster and is simpler.
- All outputs are exact integers (µs epochs, value cents) so the DuckDB
  oracle hash-matches bit-for-bit (no float-summation-order hazard).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from raycrawl.kernels import table_from_pandas
import pyarrow.compute as pc

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


def user_sessions(sf_dir: str, gap_minutes: int = GAP_MINUTES) -> pa.Table:
    """Gap-based sessionization: a user's events sorted by (ts, event_id);
    a new session starts when the gap from the previous event exceeds
    ``gap_minutes``. One row per session: counts, span, exact value cents.
    """
    gap_us = int(gap_minutes) * 60_000_000

    def per_user(g: pa.Table) -> pa.Table:
        uid = int(g["user_id"][0].as_py())
        ts = _ts_us(g["ts"])
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            g["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.lexsort((eid, ts))
        ts, cents = ts[order], cents[order]
        brk = np.ones(len(ts), dtype=np.int64)
        brk[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(brk)  # 1-based session ordinal
        # per-session reduce via the break boundaries (sessions are runs)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(ts)]
        csum = np.r_[0, np.cumsum(cents)]
        return pa.table(
            {
                "user_id": pa.array([uid] * len(starts), pa.int64()),
                "session_id": pa.array(sid[starts], pa.int64()),
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
        _events(sf_dir, ["event_id", "ts", "user_id", "value"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
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
    Per user: one ``np.searchsorted`` of purchase times into the sorted
    click times — the canonical vectorized as-of kernel."""

    def per_user(g: pa.Table) -> pa.Table:
        uid = int(g["user_id"][0].as_py())
        ts = _ts_us(g["ts"])
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        typ = g["event_type"]
        is_p = pc.equal(typ, "purchase").to_numpy(zero_copy_only=False)
        is_c = pc.equal(typ, "click").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"purchase_event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "purchase_us": pa.array([], pa.int64()),
             "click_event_id": pa.array([], pa.int64()),
             "click_us": pa.array([], pa.int64())}
        )
        if not is_p.any():
            return empty
        pts, peid = ts[is_p], eid[is_p]
        porder = np.argsort(pts, kind="stable")
        pts, peid = pts[porder], peid[porder]
        if not is_c.any():
            cl_eid = np.full(len(pts), -1, dtype=np.int64)
            cl_ts = np.full(len(pts), -1, dtype=np.int64)
        else:
            cts, ceid = ts[is_c], eid[is_c]
            corder = np.argsort(cts, kind="stable")
            cts, ceid = cts[corder], ceid[corder]
            pos = np.searchsorted(cts, pts, side="right") - 1
            hit = pos >= 0
            cl_eid = np.where(hit, ceid[np.maximum(pos, 0)], -1)
            cl_ts = np.where(hit, cts[np.maximum(pos, 0)], -1)
        return pa.table(
            {
                "purchase_event_id": pa.array(peid, pa.int64()),
                "user_id": pa.array([uid] * len(peid), pa.int64()),
                "purchase_us": pa.array(pts, pa.int64()),
                "click_event_id": pa.array(
                    [None if v < 0 else int(v) for v in cl_eid], pa.int64()
                ),
                "click_us": pa.array(
                    [None if v < 0 else int(v) for v in cl_ts], pa.int64()
                ),
            }
        )

    out = (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
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
    one user_id hash shuffle, a vectorized per-user kernel emitting three
    partial counts, and a driver sum. The conversion rate is one double
    division mirrored verbatim in the oracle."""
    gap_us = int(gap_minutes) * 60_000_000

    def per_user(g: pa.Table) -> pa.Table:
        ts = _ts_us(g["ts"])
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, et = ts[order], et[order]
        brk = np.ones(len(ts), dtype=bool)
        brk[1:] = ts[1:] - ts[:-1] > gap_us
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(ts)]
        is_click = et == "click"
        is_purch = et == "purchase"
        n_click = 0
        n_conv = 0
        for s, e in zip(starts, ends):
            c = np.flatnonzero(is_click[s:e])
            if len(c) == 0:
                continue
            n_click += 1
            if np.any(is_purch[s:e][c[0] + 1:]):
                n_conv += 1
        return pa.table({
            "n_sessions": pa.array([len(starts)], pa.int64()),
            "n_with_click": pa.array([n_click], pa.int64()),
            "n_converted": pa.array([n_conv], pa.int64()),
        })

    parts = (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
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
