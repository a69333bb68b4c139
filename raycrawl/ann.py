"""Similarity search over the ``embeddings`` table (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — per-batch numpy matmul against
  a broadcast query matrix, per-batch partial top-k, driver merge. The
  baseline, and the SQL-checkable path (DuckDB ``list_cosine_similarity``).
- ``lsh_topk``: random-hyperplane LSH variant — signature bucketing with
  multiprobe, scanning only candidate buckets; the scale path when the
  corpus no longer fits a broadcast matmul per batch. Recall is measured
  against the brute-force baseline in tests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

_rng = np.random.default_rng(0x5EED)
_N_PLANES = 6
_PLANES_CACHE: dict[int, np.ndarray] = {}


def _planes(dim: int) -> np.ndarray:
    p = _PLANES_CACHE.get(dim)
    if p is None:
        p = np.random.default_rng(0x5EED).normal(size=(_N_PLANES, dim)).astype(np.float32)
        _PLANES_CACHE[dim] = p
    return p


def _t(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Deterministic query = the embedding of ``vec_id`` (both engines can
    reference it)."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc_

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    idx = pc_.index(t["vec_id"], pa.scalar(vec_id, pa.int64())).as_py()
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def brute_force_topk(sf_dir: str, query_id: int = 0, k: int = 20) -> pa.Table:
    """Exact cosine top-k vs the query_id's vector: (vec_id, cos) rounded to
    6dp; excludes the query row itself; ties broken by vec_id."""
    q = query_vector(sf_dir, query_id)
    qn = q / max(np.linalg.norm(q), 1e-12)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
        cos = m @ qn
        mask = ids != query_id
        ids, cos = ids[mask], cos[mask]
        # per-batch partial top-k (driver merges tiny partials)
        if len(ids) > k:
            order = np.lexsort((ids, -cos))[:k]
            ids, cos = ids[order], cos[order]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cos": pa.array(cos, pa.float64())})

    parts = (
        _t(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    order = np.lexsort((parts["vec_id"].to_numpy(), -parts["cos"].to_numpy()))[:k]
    out = parts.iloc[order]
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"].to_numpy(), pa.int64()),
            "cos": pa.array(np.round(out["cos"].to_numpy(), 6), pa.float64()),
        }
    )


def brute_force_topk_sql(query_id: int = 0, k: int = 20) -> str:
    return f"""
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = {query_id}) q
    WHERE e.vec_id <> {query_id}
    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id
    LIMIT {k}
    """


def similar_above_threshold(sf_dir: str, query_id: int = 0,
                            threshold: float = 0.2) -> pa.Table:
    """All vectors with cosine ≥ threshold vs the query (SQL-checkable
    without top-k boundary sensitivity)."""
    q = query_vector(sf_dir, query_id)
    qn = q / max(np.linalg.norm(q), 1e-12)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
        cos = m @ qn
        mask = (cos >= threshold) & (ids != query_id)
        return pa.table(
            {
                "vec_id": pa.array(ids[mask], pa.int64()),
                "cos": pa.array(np.round(cos[mask], 6), pa.float64()),
            }
        )

    out = (
        _t(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if len(out) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    out = out.sort_values("vec_id")
    return pa.Table.from_pandas(out, preserve_index=False)


def similar_above_threshold_sql(query_id: int = 0, threshold: float = 0.2) -> str:
    return f"""
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = {query_id}) q
    WHERE e.vec_id <> {query_id}
      AND list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                 CAST(q.embedding AS DOUBLE[])) >= {threshold}
    ORDER BY e.vec_id
    """


def _signatures(m: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH signature per row (uint32 of _N_PLANES bits)."""
    planes = _planes(m.shape[1])
    bits = (m @ planes.T) > 0
    sig = np.zeros(len(m), dtype=np.uint32)
    for b in range(_N_PLANES):
        sig |= bits[:, b].astype(np.uint32) << np.uint32(b)
    return sig


def lsh_topk(sf_dir: str, query_id: int = 0, k: int = 20,
             probe_hamming: int = 2) -> pa.Table:
    """Approximate top-k: scan only rows whose LSH signature is within
    ``probe_hamming`` bits of the query's (multiprobe). Same output schema
    as brute_force_topk; recall measured in tests."""
    q = query_vector(sf_dir, query_id)
    qn = (q / max(np.linalg.norm(q), 1e-12)).astype(np.float32)
    qsig = int(_signatures(qn[None, :].astype(np.float32))[0])
    # acceptable signature set (multiprobe ≤ probe_hamming bit flips)
    from itertools import combinations

    accept = {qsig}
    for r in range(1, probe_hamming + 1):
        for flips in combinations(range(_N_PLANES), r):
            v = qsig
            for i in flips:
                v ^= 1 << i
            accept.add(v)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
        sig = _signatures(m.astype(np.float32))
        cand = np.fromiter((int(s) in accept for s in sig), bool, len(sig))
        cand &= ids != query_id
        if not cand.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        cos = m[cand] @ (q / max(np.linalg.norm(q), 1e-12))
        return pa.table({"vec_id": pa.array(ids[cand], pa.int64()),
                         "cos": pa.array(cos, pa.float64())})

    parts = (
        _t(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    order = np.lexsort((parts["vec_id"].to_numpy(), -parts["cos"].to_numpy()))[:k]
    out = parts.iloc[order]
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"].to_numpy(), pa.int64()),
            "cos": pa.array(np.round(out["cos"].to_numpy(), 6), pa.float64()),
        }
    )
