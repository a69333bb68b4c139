"""Relational pipelines over the TPC-H-ish test tables.

These are the crawl engine's aggregation/join/sort operators (SURVEY §2.4
J4, §2.5 A1–A4, §2.6 L2) exercised against the driver's pre-registered
relational views, where DuckDB gives a fully independent oracle.

Physical patterns (ray_guide):
- prune at the read (``columns=[...]``);
- groups with tiny cardinality (Q1 flags, hourly buckets): partial
  aggregation inside ``map_batches`` + driver combine — no shuffle at all;
- groups with real cardinality (users, customers): Ray ``groupby`` shuffle;
- small dimension side (nation, customer segment): broadcast via
  ``ray.put`` + per-batch numpy/dict lookup — no shuffle join;
- both-sides-large: ``Dataset.join`` (hash-partitioned).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _t(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def q1_pricing_summary(sf_dir: str, cutoff: str = "1998-09-01") -> pa.Table:
    """TPC-H Q1-style pricing summary: tiny group space (flag × status) →
    per-batch pyarrow partial aggregation, driver combine. Zero shuffle."""
    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff_ts))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t2 = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"],
                "base": t["l_extendedprice"],
                "disc_price": disc_price,
                "disc": t["l_discount"],
                "cnt": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        return t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc_price", "sum"),
             ("disc", "sum"), ("cnt", "sum")]
        )

    parts = (
        _t(sf_dir, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = parts.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
    out = pd.DataFrame(
        {
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["qty_sum"],
            "sum_base_price": g["base_sum"],
            "sum_disc_price": g["disc_price_sum"],
            "avg_qty": g["qty_sum"] / g["cnt_sum"],
            "avg_price": g["base_sum"] / g["cnt_sum"],
            "avg_disc": g["disc_sum"] / g["cnt_sum"],
            "count_order": g["cnt_sum"].astype("int64"),
        }
    ).sort_values(["l_returnflag", "l_linestatus"])
    return pa.Table.from_pandas(out, preserve_index=False)


def q1_oracle_sql() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                   AS sum_qty,
           sum(l_extendedprice)                              AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))           AS sum_disc_price,
           avg(l_quantity)                                   AS avg_qty,
           avg(l_extendedprice)                              AS avg_price,
           avg(l_discount)                                   AS avg_disc,
           CAST(count(*) AS BIGINT)                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """orders ⋈ customer ⋈ nation → revenue per nation.

    nation (25 rows) and customer (sf-bounded) are the broadcast sides
    (ray.put once, numpy searchsorted per batch); orders streams.
    """
    import ray

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust_sorted = cust.sort_values("c_custkey")
    ref = ray.put(
        (
            cust_sorted["c_custkey"].to_numpy(),
            cust_sorted["c_nationkey"].map(n_name).to_numpy(),
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        keys, names = ray.get(ref)
        ck = t["o_custkey"].to_numpy()
        price = t["o_totalprice"].to_numpy()
        pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
        valid = keys[pos] == ck
        t2 = pa.table(
            {
                "n_name": pa.array(names[pos][valid]),
                "revenue": pa.array(price[valid]),
                "n_orders": pa.array(np.ones(int(valid.sum()), dtype=np.int64)),
            }
        )
        return t2.group_by("n_name").aggregate(
            [("revenue", "sum"), ("n_orders", "sum")]
        )

    parts = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = parts.groupby("n_name", as_index=False).sum()
    out = pd.DataFrame(
        {
            "n_name": g["n_name"],
            "revenue": g["revenue_sum"],
            "n_orders": g["n_orders_sum"].astype("int64"),
        }
    ).sort_values("n_name")
    return pa.Table.from_pandas(out, preserve_index=False)


def revenue_by_nation_sql() -> str:
    return """
    SELECT n_name, sum(o_totalprice) AS revenue, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """


def top_customers_by_spend(sf_dir: str, k: int = 10) -> pa.Table:
    """Real-cardinality groupby (Ray shuffle) + sort + top-k (L2 analogue)."""
    from ray.data.aggregate import Count, Sum

    agg = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="total_spend"),
                   Count(alias_name="n_orders"))
        .sort(["total_spend", "o_custkey"], descending=[True, False])
        .limit(k)
    )
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return t.set_column(
        t.schema.get_field_index("n_orders"), "n_orders", t["n_orders"].cast(pa.int64())
    )


def top_customers_sql(k: int = 10) -> str:
    return f"""
    SELECT o_custkey, sum(o_totalprice) AS total_spend,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey LIMIT {k}
    """


def order_lineitem_join_stats(sf_dir: str) -> pa.Table:
    """Both-sides-large join: lineitem ⋈ orders via Dataset.join
    (hash-partitioned), then order-priority rollup of line revenue."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders, join_type="inner", num_partitions=16,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t2 = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "revenue": rev,
                "n_lines": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        return t2.group_by("o_orderpriority").aggregate(
            [("revenue", "sum"), ("n_lines", "sum")]
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("o_orderpriority", as_index=False).sum()
    out = pd.DataFrame(
        {
            "o_orderpriority": g["o_orderpriority"],
            "revenue": g["revenue_sum"],
            "n_lines": g["n_lines_sum"].astype("int64"),
        }
    ).sort_values("o_orderpriority")
    return pa.Table.from_pandas(out, preserve_index=False)


def order_lineitem_join_sql() -> str:
    return """
    SELECT o_orderpriority,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """


def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour window per event_type over the events stream table
    (streaming-shaped workload → event-time bucket groupby; ray_guide
    'Streaming-shaped workloads'). Bounded group space → partial + combine."""

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        t2 = pa.table(
            {
                "event_type": t["event_type"],
                "hour": hour,
                "n_events": pa.array([1] * t.num_rows, pa.int64()),
                "sum_value": t["value"],
            }
        )
        return t2.group_by(["event_type", "hour"]).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")]
        )

    parts = (
        _t(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = parts.groupby(["event_type", "hour"], as_index=False).sum()
    out = pd.DataFrame(
        {
            "event_type": g["event_type"],
            "hour": g["hour"],
            "n_events": g["n_events_sum"].astype("int64"),
            "sum_value": g["sum_value_sum"],
        }
    ).sort_values(["event_type", "hour"])
    return pa.Table.from_pandas(out, preserve_index=False)


def events_hourly_sql() -> str:
    return """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_events, sum(value) AS sum_value
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    ORDER BY event_type, hour
    """


def top_users_by_value(sf_dir: str, k: int = 25) -> pa.Table:
    """Per-user rollup (real-cardinality Ray groupby shuffle) + top-k."""
    from ray.data.aggregate import Count, Sum

    agg = (
        _t(sf_dir, "events", ["user_id", "value"])
        .groupby("user_id")
        .aggregate(Sum("value", alias_name="total_value"),
                   Count(alias_name="n_events"))
        .sort(["total_value", "user_id"], descending=[True, False])
        .limit(k)
    )
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return t.set_column(
        t.schema.get_field_index("n_events"), "n_events", t["n_events"].cast(pa.int64())
    )


def top_users_sql(k: int = 25) -> str:
    return f"""
    SELECT user_id, sum(value) AS total_value, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    ORDER BY total_value DESC, user_id LIMIT {k}
    """


def parts_by_brand(sf_dir: str) -> pa.Table:
    """Simple dimension rollup (groupby + avg)."""
    from ray.data.aggregate import Count, Mean

    agg = (
        _t(sf_dir, "part", ["p_brand", "p_retailprice"])
        .groupby("p_brand")
        .aggregate(Count(alias_name="n_parts"),
                   Mean("p_retailprice", alias_name="avg_price"))
        .sort("p_brand")
    )
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return t.set_column(
        t.schema.get_field_index("n_parts"), "n_parts", t["n_parts"].cast(pa.int64())
    )


def parts_by_brand_sql() -> str:
    return """
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
           avg(p_retailprice) AS avg_price
    FROM part GROUP BY p_brand ORDER BY p_brand
    """
