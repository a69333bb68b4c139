"""``python -m raycrawl`` — the ``ray job submit`` entry point.

On a real cluster the crawl ships as a Ray job:

    ray job submit --working-dir . -- \\
        python -m raycrawl --corpus s3://pages/ --seed https://example.com \\
            --depth 5 --ckpt s3://ckpts/run1 [--politeness-ms 25] [--resume]

This is the ONE place in the package that owns a Ray session (``ray job
submit`` starts the driver inside the cluster; ``ray.init(address="auto")``
attaches to it — locally it falls back to a local session). Prints one JSON
summary line on completion; the checkpoint tree under ``--ckpt`` carries
the per-round lineage, counters and resumability.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m raycrawl")
    p.add_argument("--corpus", required=True,
                   help="directory with pages.parquet (the frozen web)")
    p.add_argument("--seed", required=True, help="seed URL")
    p.add_argument("--depth", type=int, required=True, help="crawl depth 1-5")
    p.add_argument("--ckpt", required=True, help="checkpoint directory")
    p.add_argument("--crawl-id", default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from existing checkpoints (default: fresh)")
    p.add_argument("--politeness-ms", type=float, default=0.0)
    p.add_argument("--robots", action="store_true",
                   help="respect the synthetic robots.txt")
    p.add_argument("--seen-shards", type=int, default=None,
                   help="URL-seen shard count (default: cluster CPUs / 2)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", include_dashboard=False)
        except ConnectionError:
            ray.init(address="local", include_dashboard=False)

    from raycrawl.config import CrawlConfig
    from raycrawl.crawl import crawl

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    cfg = CrawlConfig(
        num_seen_shards=args.seen_shards or max(8, ncpu // 2),
        politeness_delay_ms=args.politeness_ms,
        respect_robots=args.robots,
    )
    t0 = time.perf_counter()
    res = crawl(args.corpus, args.seed, args.depth, args.ckpt, cfg=cfg,
                crawl_id=args.crawl_id, resume=args.resume)
    wall = time.perf_counter() - t0
    nodes = res.nodes().count()
    edges = res.edges().count()
    print(json.dumps({
        "crawl_id": res.crawl_id,
        "rounds": res.rounds_run,
        "nodes": nodes,
        "edges": edges,
        "wall_sec": round(wall, 3),
        "ckpt": args.ckpt,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
