"""Crawl configuration.

Mirrors the reference's env-var knobs (feeder/src/config.rs:26-39,
manager/src/config.rs:23-34) as a dataclass, plus the Ray-side knobs the
reference has no analogue for (shard counts, actor pool sizes, batch sizes).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    # Reference semantics knobs (feeder/src/config.rs:26-39)
    max_attempts: int = 3          # MAX_ATTEMPTS; feeder/src/job.rs:108-131
    max_dns_depth: int = 5         # MAX_DNS_DEPTH; shared/src/dns.rs:15-48
    max_crawl_depth: int = 5       # MAX_CRAWL_DEPTH; manager/src/routes/crawl.rs:28

    # Ray-side physical knobs (no reference analogue; SURVEY.md §4)
    num_seen_shards: int = 8       # URL-seen filter shards (hash(url) % S)
    fetch_concurrency: int = 8     # FetchActor pool size (reference: 8 feeders,
                                   # web-crawler/values.yaml:45)
    fetch_batch_size: int = 4096
    candidate_batch_size: int = 8192

    # Politeness / robots — NOT present in the reference (SURVEY.md §2.6 L1:
    # "no priority, no politeness ordering, no rate limit per host exists in
    # the reference").  Off by default so crawl output matches reference
    # semantics exactly; turned on for the north-star politeness tests.
    politeness_delay_ms: float = 0.0   # min per-host interval between fetches
    respect_robots: bool = False       # synthetic robots.txt (deterministic)

    # Per-page featurization at fetch time (token counts, quality, SimHash,
    # fingerprint, lang guess) — the realistic training-data parse workload;
    # attached to parent rows in round_out. Off for reference-exact tests.
    enrich: bool = False

    # Ingestion-time near-dup detection (raycrawl.ingest_dedup): when set,
    # each round probes its COMPLETED parents against the persisted MinHash
    # band index of all previously fetched pages and records
    # (node_id, near_dup_of, jaccard) assignments under the round dir.
    # Off by default (reference-exact crawls, bench). Must be set from the
    # crawl's FIRST run — resuming a neardup crawl that started without it
    # is refused (the prior rounds' index shards don't exist).
    neardup_threshold: float | None = None

    # Seen-filter backend: "set" (exact python set of 16-byte keys; test
    # scale), "sortedruns" (numpy sorted runs + Bloom front; the 10^10
    # design point) or "cuckoo" (same runs behind a cuckoo-filter front:
    # ~2^-13 FP at ~20 bits/key, deletion-capable, safe-degrade on
    # overflow).  "auto" picks sortedruns above auto_backend_threshold.
    # Rounds with ≤ this many frontier rows run the same stage function
    # driver-side (no Dataset execution): tiny BFS rounds and retry tails
    # are pure fixed overhead as distributed jobs.
    small_round_threshold: int = 2048

    seen_backend: str = "auto"
    auto_backend_threshold: int = 2_000_000
    bloom_bits_per_key: int = 12

    # Corpus layout: broadcast (default; small corpora) vs host-hash-
    # partitioned Parquet (the 100 TB shape — fetch tasks load only the
    # partitions their rows touch through a per-worker LRU; the frontier is
    # hash-repartitioned on the same key for locality). Oracle-equal to
    # broadcast by pytest.
    corpus_partitioned: bool = False
    corpus_partitions: int = 32
    corpus_cache_parts: int = 8

    extra: dict = field(default_factory=dict)
