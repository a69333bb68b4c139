"""Dataset profiling — the per-column statistics pass a data engine runs
before curation decisions (skew checks, vocabulary sizing, null audits).

One streaming scan of the table; per batch, per column: row count, null
count, min, max (as strings for a uniform schema) and the batch's
distinct-value set. Partials merge on the driver: counts sum, min/max
fold, distinct sets union. Exact — and therefore only offered for
columns whose distinct cardinality is bounded (categorical/metadata
columns); the unbounded-cardinality path at 100 TB is the HLL sketch in
sketches.py, which this module deliberately does not mix into the
oracled output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raycrawl.kernels import table_from_pandas

from raycrawl.relational import _t

PROFILE_COLUMNS = ("lang", "source", "n_chars")


def documents_profile(sf_dir: str, columns=PROFILE_COLUMNS) -> pa.Table:
    """Column profile of ``documents``: one output row per profiled
    column — n, n_null, n_distinct (exact), min/max rendered as strings.
    Zero shuffle: per-batch partials are (col, count, nulls, min, max,
    uniques) tuples whose size is bounded by column cardinality."""

    cols = list(columns)

    def partial(t: pa.Table) -> pa.Table:
        rows = {"col": [], "n": [], "n_null": [], "vmin": [], "vmax": [],
                "uniq": []}
        for c in cols:
            arr = t[c]
            vals = arr.drop_null().to_numpy(zero_copy_only=False)
            u = np.unique(vals)
            rows["col"].append(c)
            rows["n"].append(t.num_rows)
            rows["n_null"].append(arr.null_count)
            rows["vmin"].append(str(u[0]) if len(u) else None)
            rows["vmax"].append(str(u[-1]) if len(u) else None)
            rows["uniq"].append([str(x) for x in u])
        return pa.table({
            "col": pa.array(rows["col"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "vmin": pa.array(rows["vmin"], pa.string()),
            "vmax": pa.array(rows["vmax"], pa.string()),
            "uniq": pa.array(rows["uniq"], pa.list_(pa.string())),
        })

    parts = (
        _t(sf_dir, "documents", cols)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    out_rows = []
    for c in cols:
        g = parts[parts["col"] == c]
        uniq: set = set()
        for lst in g["uniq"]:
            uniq.update(lst)
        nn = g["vmin"].dropna()
        xx = g["vmax"].dropna()
        # numeric columns order numerically, not lexically — fold via the
        # original dtype (mirrored by the SQL's native MIN/MAX then CAST)
        if c == "n_chars":
            vmin = str(min(int(v) for v in nn)) if len(nn) else None
            vmax = str(max(int(v) for v in xx)) if len(xx) else None
        else:
            vmin = min(nn) if len(nn) else None
            vmax = max(xx) if len(xx) else None
        out_rows.append({
            "col": c,
            "n": int(g["n"].sum()),
            "n_null": int(g["n_null"].sum()),
            "n_distinct": len(uniq),
            "vmin": vmin,
            "vmax": vmax,
        })
    out = pd.DataFrame(out_rows).sort_values("col").reset_index(drop=True)
    return table_from_pandas(out)


def documents_profile_sql(columns=PROFILE_COLUMNS) -> str:
    selects = []
    for c in columns:
        selects.append(f"""
      SELECT '{c}' AS col,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) - count({c}) AS BIGINT) AS n_null,
             CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
             CAST(min({c}) AS VARCHAR) AS vmin,
             CAST(max({c}) AS VARCHAR) AS vmax
      FROM documents""")
    u = "\n      UNION ALL".join(selects)
    return f"SELECT * FROM ({u}) ORDER BY col"
