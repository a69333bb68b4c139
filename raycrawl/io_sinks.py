"""Output sinks for the training-data lane: partitioned JSONL export.

A 100 TB pipeline's terminal stage is usually "write the cleaned corpus as
JSONL shards partitioned by a key" (lang, source, date) so downstream
tokenizer jobs can claim whole partitions. Shape rules:

- one directory per partition key value (resumable: a re-run skips
  partitions whose ``_SUCCESS`` marker exists — same discipline as the
  crawl's round checkpoints and the ANN index builds);
- each partition's rows are written by the tasks that hold them (Ray's
  ``write_json`` sink, one file per block) — nothing funnels through the
  driver;
- deterministic row content (plain column dict per line), so a read-back
  equals the source rows exactly.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc


def export_jsonl_partitioned(ds, out_dir: str, partition_col: str) -> dict:
    """Write ``ds`` as JSONL shards under ``out_dir/<col>=<value>/``.

    Partition values are discovered with one distinct pass (bounded
    cardinality — a partition column IS a bounded-cardinality column);
    each partition filters + writes independently and commits a
    ``_SUCCESS`` marker last, so a crashed export resumes by skipping
    committed partitions. Returns {value: n_rows_written}."""
    from ray.data.aggregate import Count

    counts = ds.groupby(partition_col).aggregate(Count(alias_name="n")).to_pandas()
    if len(counts) > 1000:
        # one filtered pass per partition value: right for the bounded
        # partition keys this sink is for (lang, source, date), wrong for
        # high-cardinality keys — there, sort by the key once and write
        # per-block instead of scanning P times. Fail loudly, not slowly.
        raise ValueError(
            f"export_jsonl_partitioned: {len(counts)} distinct values of "
            f"'{partition_col}' — use a bounded partition key (or a "
            f"sort-once layout) instead of {len(counts)} filtered scans")
    written: dict = {}
    for value, n in zip(counts[partition_col], counts["n"]):
        pdir = os.path.join(out_dir, f"{partition_col}={value}")
        marker = os.path.join(pdir, "_SUCCESS")
        if os.path.exists(marker):
            written[value] = int(n)
            continue
        part = ds.map_batches(
            lambda t, v=value: t.filter(pc.equal(t[partition_col], v)),
            batch_format="pyarrow",
        )
        part.write_json(pdir)
        with open(marker, "w") as f:
            json.dump({"rows": int(n)}, f)
        written[value] = int(n)
    return written


def read_back_jsonl(out_dir: str) -> pa.Table:
    """Read an exported tree back (tests/verification): every .json line
    of every partition, as one Arrow table."""
    rows = []
    for root, _dirs, files in os.walk(out_dir):
        for fn in sorted(files):
            if fn.endswith(".json") or fn.endswith(".jsonl"):
                with open(os.path.join(root, fn)) as f:
                    rows.extend(json.loads(line) for line in f if line.strip())
    return pa.Table.from_pylist(rows)
