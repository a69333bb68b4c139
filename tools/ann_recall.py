"""Measured quality/cost point for the approximate ANN lane (VERDICT r3
next-round 7): recall@k of lsh_topk / ivf_topk vs the oracled brute-force
baseline, plus how much of the corpus each probe actually read, at bench
scale. Prints one JSON line; the result is recorded in BASELINE.md.

    python tools/ann_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

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
