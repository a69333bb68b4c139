"""Measured quality/cost point for the approximate ANN lane (VERDICT r3
next-round 7): recall@k of lsh_topk / ivf_topk vs the oracled brute-force
baseline, plus how much of the corpus each probe actually read, at bench
scale. Prints one JSON line; the result is recorded in BASELINE.md.

    python tools/ann_recall.py [sf_dir] [n_queries] [k]
    python tools/ann_recall.py --planted [n_queries] [k]

``--planted`` swaps the near-isotropic sf embeddings for a deterministic
PLANTED-CLUSTER fixture (the regime ANN is actually used for: true
neighbors share a cluster) — 2,000 vectors, 64 dims, 20 Gaussian
clusters, unit-normalized — written once under /tmp and fed through the
IDENTICAL sweep, so the two BASELINE.md tables differ only in data
structure (VERDICT r4 §Next 6).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _ensure_planted(out_dir: str = "/tmp/raycrawl_planted_emb",
                    n: int = 2000, dim: int = 64,
                    n_clusters: int = 20, sigma: float = 0.35) -> str:
    """Deterministic planted-cluster embeddings table (same schema as the
    sf tables: vec_id int64, embedding list<float>, label int32 = the
    planted cluster id). sigma=0.35 around unit-norm centers keeps ~all
    true top-10 neighbors inside the query's own cluster without making
    buckets trivially pure."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260820)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, n_clusters, size=n).astype(np.int32)
    x = centers[label] + sigma * rng.standard_normal((n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    flat = x.astype(np.float32).reshape(-1)
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
        pa.array(flat, pa.float32()))
    tmp = path + ".tmp"
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": emb,
        "label": pa.array(label, pa.int32())}), tmp)
    os.replace(tmp, path)
    return out_dir


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--planted"]
    planted = "--planted" in sys.argv[1:]
    if planted:
        sf_dir = _ensure_planted()
        n_queries = int(args[0]) if args else 16
        k = int(args[1]) if len(args) > 1 else 10
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.1"
        n_queries = int(args[1]) if len(args) > 1 else 16
        k = int(args[2]) if len(args) > 2 else 10

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(
            __import__("os").environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False, logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import duckdb

    from raycrawl.ann import brute_force_topk, ivf_topk, lsh_topk

    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    # deterministic spread of query ids across the table
    qids = [int(i * n_vecs / n_queries) for i in range(n_queries)]

    out: dict = {"sf_dir": sf_dir, "n_vecs": int(n_vecs), "k": k,
                 "n_queries": n_queries, "methods": {}}

    truth: dict[int, set] = {}
    t0 = time.perf_counter()
    for q in qids:
        truth[q] = set(brute_force_topk(sf_dir, q, k)["vec_id"].to_pylist())
    out["methods"]["brute_force"] = {
        "recall_at_k": 1.0, "rows_scanned_frac": 1.0,
        "sec_per_query": round((time.perf_counter() - t0) / n_queries, 3)}

    # buckets_read/buckets_total is the structural pruning bound: with
    # uniform hashing it equals the expected fraction of rows scanned
    for name, fn, kwargs, buckets in [
        ("lsh_h0", lsh_topk, dict(probe_hamming=0), (1, 64)),
        ("lsh_h1", lsh_topk, dict(probe_hamming=1), (7, 64)),
        ("lsh_h2", lsh_topk, dict(probe_hamming=2), (22, 64)),
        ("ivf_p2", ivf_topk, dict(nprobe=2), (2, 16)),
        ("ivf_p4", ivf_topk, dict(nprobe=4), (4, 16)),
        ("ivf_p8", ivf_topk, dict(nprobe=8), (8, 16)),
    ]:
        hits = total = 0
        t0 = time.perf_counter()
        for q in qids:
            got = set(fn(sf_dir, q, k, **kwargs)["vec_id"].to_pylist())
            hits += len(got & truth[q])
            total += len(truth[q])
        frac = buckets[0] / buckets[1]
        out["methods"][name] = {
            "recall_at_k": round(hits / total, 3),
            "buckets_read": buckets[0],
            "buckets_total": buckets[1],
            "rows_scanned_frac_expected": round(frac, 3),
            # recall a random same-size scan would get is ~frac; the index's
            # value is how far above that line it lands
            "lift_over_random_scan": round(hits / total / frac, 2),
            "sec_per_query": round((time.perf_counter() - t0) / n_queries, 3),
            **kwargs,
        }

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
