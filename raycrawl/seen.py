"""Sharded URL-seen filter — the dedup role Neo4j's MERGE/anti-join plays in
the reference (feeder/src/job.rs:138-165 anti-join J1; :180 MERGE J2;
SURVEY.md §2.3 ST3, §7.3).

Design (the 10^10-URL design point, tested at small scale):

- S shards, each a Ray actor; a URL key routes to ``hash_hi % S``. Both the
  J1 anti-join key (the *raw-uppercased* candidate string) and the
  authoritative node key (the *normalized* ``http_type + name`` id) are
  checked against the same committed set — string equality under one hash
  function makes the two-stage dedup of the reference exact (SURVEY §7.4).
- Keys are 128-bit (two independently-seeded xxh64 lanes): 64-bit would
  birthday-collide with certainty at 10^10 keys.
- **Round-snapshot semantics**: ``contains`` reads only the committed set;
  ``add_pending`` buffers; the driver calls ``commit`` at the round barrier.
  This is what makes the round-synchronous BFS deterministic (oracle.py).
- Backends: ``set`` — exact Python set of 16-byte keys (test scale);
  ``sortedruns`` — Bloom front + sorted numpy runs with vectorized
  searchsorted membership and periodic compaction (scale path; ~16 B/key
  flat arrays instead of ~100 B/key Python set entries).
- Checkpointing: per-round deltas are returned by ``commit`` and written to
  Parquet by the driver; ``bulk_load`` restores (resume = union of deltas).
"""

from __future__ import annotations

import numpy as np


def pack_keys(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) uint64 pairs → structured array (sortable, hashable rows)."""
    out = np.empty(len(hi), dtype=[("hi", "<u8"), ("lo", "<u8")])
    out["hi"] = hi
    out["lo"] = lo
    return out


class _SetBackend:
    """Exact membership via a Python set of 16-byte keys."""

    def __init__(self):
        self._set: set[bytes] = set()

    def contains(self, hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        buf = pack_keys(hi, lo).tobytes()
        s = self._set
        return np.fromiter(
            (buf[i : i + 16] in s for i in range(0, len(buf), 16)),
            dtype=bool,
            count=len(hi),
        )

    def add(self, hi: np.ndarray, lo: np.ndarray) -> None:
        buf = pack_keys(hi, lo).tobytes()
        self._set.update(buf[i : i + 16] for i in range(0, len(buf), 16))

    def __len__(self):
        return len(self._set)


class _Bloom:
    """Vectorized Bloom filter over (hi, lo) uint64 key pairs."""

    def __init__(self, n_bits: int, n_hashes: int = 4):
        self.m = np.uint64(max(64, n_bits))
        self.k = n_hashes
        self.bits = np.zeros(int(self.m) // 8 + 1, dtype=np.uint8)

    def _indices(self, hi, lo):
        # double hashing: idx_j = (hi + j*lo) mod m
        js = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (hi[None, :] + js * lo[None, :]) % self.m  # (k, n)

    def add(self, hi, lo):
        idx = self._indices(hi, lo).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                         (1 << (idx & np.uint64(7))).astype(np.uint8))

    def maybe_contains(self, hi, lo) -> np.ndarray:
        idx = self._indices(hi, lo)
        byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=0).astype(bool)


class _SortedRunsBackend:
    """Bloom front + sorted (hi, lo) runs; vectorized binary search."""

    def __init__(self, expected_keys: int = 10_000_000, bits_per_key: int = 12,
                 compact_above: int = 8):
        self._runs: list[tuple[np.ndarray, np.ndarray]] = []  # (hi sorted, lo)
        self._bloom = _Bloom(expected_keys * bits_per_key)
        self._compact_above = compact_above
        self._n = 0

    @staticmethod
    def _sort(hi, lo):
        order = np.lexsort((lo, hi))
        return hi[order], lo[order]

    @staticmethod
    def _run_contains(run_hi, run_lo, hi, lo) -> np.ndarray:
        left = np.searchsorted(run_hi, hi, "left")
        right = np.searchsorted(run_hi, hi, "right")
        out = np.zeros(len(hi), dtype=bool)
        width = right - left
        one = width == 1
        out[one] = run_lo[left[one]] == lo[one]
        for i in np.flatnonzero(width > 1):
            out[i] = lo[i] in run_lo[left[i] : right[i]]
        return out

    def contains(self, hi, lo) -> np.ndarray:
        if self._n == 0 or len(hi) == 0:
            return np.zeros(len(hi), dtype=bool)
        cand = self._bloom.maybe_contains(hi, lo)
        out = np.zeros(len(hi), dtype=bool)
        if not cand.any():
            return out
        ci = np.flatnonzero(cand)
        chi, clo = hi[ci], lo[ci]
        hit = np.zeros(len(ci), dtype=bool)
        for run_hi, run_lo in self._runs:
            miss = ~hit
            if not miss.any():
                break
            hit[miss] |= self._run_contains(run_hi, run_lo, chi[miss], clo[miss])
        out[ci] = hit
        return out

    def add(self, hi, lo) -> None:
        if len(hi) == 0:
            return
        self._runs.append(self._sort(np.asarray(hi), np.asarray(lo)))
        self._bloom.add(hi, lo)
        self._n += len(hi)
        if len(self._runs) > self._compact_above:
            all_hi = np.concatenate([r[0] for r in self._runs])
            all_lo = np.concatenate([r[1] for r in self._runs])
            self._runs = [self._sort(all_hi, all_lo)]

    def __len__(self):
        return self._n


def make_backend(kind: str, expected_keys: int = 1_000_000, bits_per_key: int = 12):
    if kind == "set":
        return _SetBackend()
    if kind == "sortedruns":
        return _SortedRunsBackend(expected_keys=expected_keys, bits_per_key=bits_per_key)
    raise ValueError(f"unknown seen backend {kind!r}")


class SeenShardImpl:
    """One shard of the crawl-scoped URL-seen set + the J2 MERGE role (plain
    class; wrapped in a Ray actor by the driver via
    ``ray.remote(SeenShardImpl)``).

    Besides membership, the shard is the **node-dedup authority** for its
    key range: during a round, fetch tasks ``offer`` candidate child rows
    (routed by ``hash(node_id) % S``); the shard keeps, per node_id, the
    min-(depth, parent_id) winner — the deterministic stand-in for MERGE's
    racy first-writer ON CREATE (feeder/src/job.rs:180-186; SURVEY §7.4
    min-depth BFS property). At the round barrier ``commit_round`` drops
    winners whose id is already committed (ON CREATE skipped), assigns the
    born status (leaf short-circuit M6, job.rs:182), folds the new ids into
    the committed set, and writes its own nodes-delta Parquet shard — the
    actor RPC *is* the shuffle, and the write is distributed (no driver
    funnel)."""

    def __init__(self, shard_id: int, backend: str = "set",
                 expected_keys: int = 1_000_000, bits_per_key: int = 12):
        self.shard_id = shard_id
        self._committed = make_backend(backend, expected_keys, bits_per_key)
        # offered child-candidate Arrow tables, buffered for the barrier
        # (offer is O(1) append so the RPC hot path never does per-row work)
        self._offer_tables: list = []

    def contains(self, hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        """Membership against the committed (round-start) snapshot only."""
        return self._committed.contains(np.asarray(hi, np.uint64), np.asarray(lo, np.uint64))

    def offer(self, table) -> int:
        """Buffer a candidate-child Arrow table slice (columns: node_id,
        name, http_type, depth, parent_id, ip, domain, request_time_ms,
        requested_depth, crawl_id). Winner resolution happens vectorized at
        commit_round."""
        self._offer_tables.append(table)
        return len(self._offer_tables)

    def commit_round(self, nodes_path: str | None, edges_path: str | None,
                     round_no: int, seed_id: str = "") -> dict:
        """Round barrier. This shard owns its hash range of child ids, so it:

        1. writes its Lead-edge partition — every offered (parent, child)
           row IS an edge (MERGE (p)-[:Lead]->(c), job.rs:185, created even
           when the child already exists); rows with src == seed_id are
           returned to the driver instead (the only cross-round-duplicable
           subset — ROOT/URL label split, see crawl._finalize);
        2. resolves node winners (min (depth, parent_id) per node_id — J2
           MERGE first-writer, vectorized), drops ids already committed
           (ON CREATE skipped), folds new ids into the committed set, and
           writes its nodes-delta parquet.
        """
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from raycrawl.kernels import hash128

        new_count = 0
        edge_count = 0
        seed_rows: list[dict] = []
        if self._offer_tables:
            allt = pa.concat_tables(self._offer_tables)
            self._offer_tables = []

            # --- edges partition (all offered rows, pre-winner-dedup) ---
            from raycrawl.frontier import EDGES_SCHEMA

            edges = pa.table(
                {
                    "crawl_id": allt["crawl_id"],
                    "src": allt["parent_id"],
                    "dst": allt["node_id"],
                    "depth": allt["depth"].cast(pa.int32()),
                    "round": pa.array([round_no] * allt.num_rows, pa.int32()),
                },
                schema=EDGES_SCHEMA,
            )
            is_seed = pc.equal(edges["src"], seed_id)
            seed_tbl = edges.filter(is_seed)
            if seed_tbl.num_rows:
                seed_rows = seed_tbl.to_pylist()
            edges = edges.filter(pc.invert(is_seed))
            edge_count = edges.num_rows
            if edges_path is not None and edge_count:
                pq.write_table(
                    edges, f"{edges_path}/shard-{self.shard_id:03d}.parquet"
                )

            # --- node winners: all-integer np.lexsort on (node key, depth,
            # parent hash); only the winner rows are gathered (no full-table
            # reorder). Winner = min (depth, hash64(parent_id)) per node —
            # the deterministic stand-in for MERGE's racy first writer
            # (mirrored exactly by oracle.py). ---
            khi_a = allt["khi"].to_numpy(zero_copy_only=False)
            klo_a = allt["klo"].to_numpy(zero_copy_only=False)
            depth_a = allt["depth"].to_numpy(zero_copy_only=False)
            ph_a = allt["phash"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ph_a, depth_a, klo_a, khi_a))
            khi_s, klo_s = khi_a[order], klo_a[order]
            first = np.ones(len(order), dtype=bool)
            if len(order) > 1:
                first[1:] = (khi_s[1:] != khi_s[:-1]) | (klo_s[1:] != klo_s[:-1])
            win_idx = order[first]
            winners = allt.take(pa.array(win_idx))
            hi = khi_a[win_idx].astype(np.uint64)
            lo = klo_a[win_idx].astype(np.uint64)
            exists = self._committed.contains(hi, lo)
            keep = ~exists
            winners = winners.filter(pa.array(keep))
            new_count = winners.num_rows
            if new_count:
                self._committed.add(hi[keep], lo[keep])
                status = pc.if_else(
                    pc.equal(winners["depth"], winners["requested_depth"]),
                    pa.scalar("COMPLETED"),
                    pa.scalar("PENDING"),
                )
                from raycrawl.frontier import NODES_SCHEMA

                cols = {}
                for f in NODES_SCHEMA:
                    if f.name == "node_type":
                        cols[f.name] = pa.array(["URL"] * new_count, f.type)
                    elif f.name == "status":
                        cols[f.name] = status
                    elif f.name == "attempts":
                        cols[f.name] = pa.nulls(new_count, f.type).fill_null(0)
                    elif f.name == "round":
                        cols[f.name] = pa.array([round_no] * new_count, f.type)
                    else:
                        cols[f.name] = winners[f.name].cast(f.type)
                if nodes_path is not None:
                    pq.write_table(
                        pa.table(cols, schema=NODES_SCHEMA),
                        f"{nodes_path}/shard-{self.shard_id:03d}.parquet",
                    )
        return {"new_nodes": int(new_count), "seen_size": len(self._committed),
                "edges_written": int(edge_count), "seed_rows": seed_rows}

    def bulk_load(self, hi: np.ndarray, lo: np.ndarray) -> int:
        """Checkpoint restore: load directly into the committed set."""
        self._committed.add(np.asarray(hi, np.uint64), np.asarray(lo, np.uint64))
        return len(self._committed)

    def size(self) -> int:
        return len(self._committed)


class SeenRouter:
    """Client-side router used inside map_batches stages: splits a key batch
    by shard and fans calls out to the shard actors (SURVEY §7.3: shuffle key
    = hash % S — here the 'shuffle' is the actor RPC, not a Dataset
    exchange)."""

    def __init__(self, handles):
        self.handles = handles
        self.n = len(handles)

    def _route(self, hi):
        return (hi % np.uint64(self.n)).astype(np.int64)

    def contains(self, hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        import ray

        shard = self._route(hi)
        out = np.zeros(len(hi), dtype=bool)
        masks, refs = [], []
        for s in np.unique(shard):
            m = shard == s
            masks.append(m)
            refs.append(self.handles[int(s)].contains.remote(hi[m], lo[m]))
        for m, r in zip(masks, ray.get(refs)):
            out[m] = r
        return out

    def offer(self, hi: np.ndarray, lo: np.ndarray, table) -> list:
        """Route candidate child rows (Arrow table + parallel hash arrays)
        to their shards; the 128-bit key ships as two uint64 columns so the
        shard's winner sort leads with integer keys. Returns the call refs
        WITHOUT waiting — the caller overlaps actor processing with its
        remaining batch work and ray.get()s the refs before returning (so
        the driver's round barrier can only start after every offer
        landed)."""
        import pyarrow as pa

        table = table.append_column("khi", pa.array(hi, pa.uint64()))
        table = table.append_column("klo", pa.array(lo, pa.uint64()))
        shard = self._route(hi)
        refs = []
        for s in np.unique(shard):
            idx = np.flatnonzero(shard == s)
            refs.append(self.handles[int(s)].offer.remote(table.take(pa.array(idx))))
        return refs
