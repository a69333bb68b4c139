"""Ingestion-time near-duplicate detection for the crawl loop.

Composes the engine's two halves — the BFS crawler and the curation lane's
persisted MinHash index (VERDICT r4 §Next 4): when
``CrawlConfig.neardup_threshold`` is set, every round probes the pages it
successfully fetched against the band index of ALL previously fetched
pages and assigns each near-duplicate page its earliest-ingested match.

Semantics (mirrors the reference-corpus documents lane,
``dedup.minhash_neardup_incremental``):

- probe set per round r ≥ 1: the round's COMPLETED parents (COMPLETED ⇔
  fetched 200 and expanded; leaves born COMPLETED are never fetched so
  never probed; the ROOT bootstrap fetch is crawl submission, not corpus
  ingestion, and is excluded);
- page text = tag-stripped fetch body (``<[^>]+>`` → "", exactly the
  corpus generator's ``text`` column), 3-gram md5 shingles
  (``dedup.shingle_list_batch``), MinHash bands
  (``dedup.minhash_bands_batch``);
- ingestion order = (probe round, node_id). A page's ``near_dup_of`` is
  the earliest page in that order whose exact shingle Jaccard is ≥ the
  threshold among its LSH band candidates (the same candidate
  completeness envelope as the whole MinHash family — a candidate can
  only be missed, never mis-scored);
- the per-round index lives INSIDE the round checkpoint dir
  (``round=NNNN/ndx/{bands/bp=K, sh/sp=K, map/sp=K}``), so the crawl's
  existing round idempotency (round dir removed and rebuilt atomically)
  covers the index and resume needs no extra machinery. Probes read ONLY
  the band partitions the new batch lands in and ONLY the candidate old
  pages' shingles — per-round cost scales with the round, never with the
  crawl history (the 100 TB ingestion shape).

Scale notes: the per-round driver pass is bounded by the round's fetched
count (the same posture as the driver-side frontier assembly, gated by
FRONTIER_DRIVER_GATE); for giant rounds the identical per-batch kernels
run under ``map_batches`` with the ``_count_by_key_partitioned`` exchange
— see ``dedup.minhash_neardup_incremental`` for that shape. Page identity
is carried as the high 64 bits of the 128-bit node-id hash; at
10^10-frontier scale carry the full (hi, lo) pair like fetch.CorpusIndex.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raycrawl.dedup import (
    _IDX_BP_PARTS,
    _IDX_SP_PARTS,
    _hive_files,
    minhash_bands_batch,
    segmented_jaccard,
    shingle_list_batch,
)

NEARDUP_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),
        ("near_dup_of", pa.string()),
        ("jaccard", pa.float64()),
    ]
)

_TAG_PAT = r"<[^>]+>"
def _band_key(bid: np.ndarray, bh: np.ndarray) -> np.ndarray:
    """(band_id, band_hash) → one mixed uint64 sort/join key: numpy's
    structured-dtype searchsorted falls off the vectorized fast path
    (measured 73 s for 14M probes vs <2 s on uint64). Aliasing across
    distinct (id, hash) pairs is ~2^-64 — the same class as band-hash
    collisions themselves, and aliases can only ADD candidates, which the
    exact verify then rejects."""
    with np.errstate(over="ignore"):
        return (bh.view(np.uint64)
                ^ ((bid.astype(np.uint64) + np.uint64(1))
                   * np.uint64(0x9E3779B97F4A7C15)))


def _round_ndx(ckpt: str, r: int) -> str:
    return os.path.join(ckpt, f"round={r:04d}", "ndx")


def _pids(node_ids) -> np.ndarray:
    from raycrawl.kernels import hash128

    hi, _lo = hash128(node_ids)
    return hi.view(np.int64)


def _page_texts(parents: pa.Table, corpus_ref) -> pa.Array:
    """Tag-stripped body text per COMPLETED parent, via the same corpus
    lookup layout the fetch stage uses (broadcast index or partitioned
    LRU) — vectorized hash lookup + Arrow take + one regex kernel."""
    from raycrawl.fetch import corpus_key_strings, get_fetcher
    from raycrawl.kernels import hash128

    fetcher = get_fetcher(corpus_ref)
    names = parents["name"].combine_chunks()
    protos = parents["http_type"].combine_chunks()
    n = parents.num_rows
    qhi, qlo = hash128(corpus_key_strings(names, protos))
    parts = fetcher.batch_parts(names)
    if parts is None:
        index, html_col = fetcher.slot(0)
        rows = index.lookup(qhi, qlo)
        html = _take_large(html_col, rows)
    else:
        order = np.argsort(parts, kind="stable")
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        pieces = []
        for p in np.unique(parts):
            m = np.flatnonzero(parts == p)
            index, html_p = fetcher.slot(int(p))
            rows = index.lookup(qhi[m], qlo[m])
            taken = _take_large(html_p, rows)
            pieces.extend(taken.chunks if isinstance(taken, pa.ChunkedArray)
                          else [taken])
        html = pa.chunked_array(pieces).take(pa.array(inv))
    return pc.replace_substring_regex(
        pc.cast(html, pa.large_string()), pattern=_TAG_PAT, replacement="")


def _take_large(col, rows: np.ndarray):
    """``col.take(rows)`` that is O(result), not O(source): Arrow's
    ChunkedArray.take CONCATENATES the source chunks first — both an
    int32-offset overflow on a >2 GiB corpus column and a whole-corpus
    memcpy per batch. Instead, map each global index to (chunk, local),
    take per chunk (Array.take is a straight gather), and reorder the
    small result."""
    idx = np.asarray(rows, np.int64)
    if isinstance(col, pa.Array):
        return pc.cast(col.take(pa.array(idx)), pa.large_binary())
    if col.num_chunks == 1:
        return pc.cast(col.chunk(0).take(pa.array(idx)), pa.large_binary())
    bounds = np.cumsum([0] + [len(ch) for ch in col.chunks])
    cid = np.searchsorted(bounds, idx, side="right") - 1
    order = np.argsort(cid, kind="stable")
    inv = np.empty(len(idx), np.int64)
    inv[order] = np.arange(len(idx))
    pieces = []
    for ci in np.unique(cid):
        local = idx[cid == ci] - bounds[ci]
        pieces.append(pc.cast(col.chunk(int(ci)).take(pa.array(local)),
                              pa.large_binary()))
    return pa.chunked_array(pieces).take(pa.array(inv))


def _gather_segments(flat: np.ndarray, offs: np.ndarray,
                     idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Segments ``flat[offs[i]:offs[i+1]]`` for each i in idx, packed."""
    lens = (offs[idx + 1] - offs[idx]).astype(np.int64)
    out_offs = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    total = int(out_offs[-1])
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(out_offs[:-1], lens)
           + np.repeat(offs[idx].astype(np.int64), lens))
    return flat[pos], out_offs


def _list_arrays(col) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy().astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.uint64,
                                                            copy=False)
    base = offs[0]
    return flat[base:offs[-1]], offs - base


def _write_partitioned(table: pa.Table, root: str, key: str,
                       part: np.ndarray) -> None:
    for v in np.unique(part):
        d = os.path.join(root, f"{key}={int(v)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(table.filter(pa.array(part == v)),
                       os.path.join(d, "part-0.parquet"))


# above this many pages the round's shingle/band computation fans out as
# a Ray map_batches stage (text lookup + gram hashing are embarrassingly
# parallel); below it the driver does the same per-slice kernels inline
# (tiny rounds cost more in executor startup than in work — the same
# posture as crawl.small_round_threshold). Tests force 0 to pin path
# equality.
SHINGLE_RAY_GATE = 50_000

# minimum rows per Ray-path shingle block; tests shrink it to force many
# out-of-order blocks through the pid-keyed reorder
_SHINGLE_BLOCK_MIN = 2048

# candidate prefilter: drop band-collision pairs whose 64-perm signature
# agreement estimates BELOW threshold - this margin. 0.2 ≈ 3.3σ of the
# binomial estimator at j=0.6 → <0.1% miss probability for a true pair AT
# the threshold, vanishing above it; everything it drops never reaches
# the shingle gather (measured: 7.7M false candidates → ~10^4 on a
# 155k-page bench round).
PREFILTER_MARGIN = 0.2

# pairs per prefilter/verify slice — bounds the signature-compare and
# shingle-gather scratch regardless of candidate volume (a slice's
# stage-1 scratch is ~3 × chunk × 16 bytes ≈ 100 MB at 2M; stage 2 runs
# only on stage-1 survivors)
_PAIR_CHUNK = 2_000_000

# above this many candidate pairs the prefilter+verify slices fan out as
# Ray tasks over plasma-shared (zero-copy, read-only) signature/shingle
# arrays — a bench round carries 10^8-10^9 candidates and the slices are
# embarrassingly parallel. Below it the same slices run inline.
_VERIFY_RAY_GATE = 8_000_000

# the stage-1 prefilter estimates jaccard from only the FIRST 16 of the
# 64 signature bytes (a separate 16-byte-row array, so a cache line
# carries 4 pairs instead of 1) with an extra 0.15 margin; a TRUE pair
# at exactly j=threshold=0.6 fails it with P[Binom(16, 0.6) < 16·0.25]
# ≈ 1e-5 — an order below the documented 64-perm envelope. Everything
# it keeps still passes the full-64 estimate, then the exact jaccard.
_STAGE1_PERMS = 16
_STAGE1_MARGIN = 0.15


# grams gathered per exact-verify sub-slice (~256 MB of uint64 per side):
# a 2M-pair slice whose pairs ALL survive the prefilter — the shape a
# template-heavy corpus produces, where near-dup clusters make pair
# volume quadratic — would otherwise gather pairs × grams/page × 8 B in
# one shot (measured multi-GB per slice at bench round 4)
_GRAM_BUDGET = 32_000_000


def _fused_verify_chunk(sigA16, sigA, sigB16, sigB, flatA, offsA, rowA_of,
                        iordA, flatB, offsB, ea, lb, est_cut, threshold):
    """One candidate slice, fused end-to-end in the worker: two-stage
    signature prefilter → gram-budget-bounded shingle gather + exact
    segmented jaccard → per-later-row reduce to the earliest-ingestion
    surviving match. Side A is the earlier/indexed side (`ea` indexes
    its sig rows; ``rowA_of`` maps them to shingle rows, None =
    identity; ``iordA`` is its ingestion order), side B is always the
    current round. Returns (later_row, earlier_idx, jaccard) with at
    most one row per later page, so result volume is bounded by the
    slice's distinct duplicate pages even when a giant near-dup cluster
    makes the candidate pair volume quadratic."""
    k = ((sigA16[ea] == sigB16[lb]).mean(axis=1)
         >= max(0.0, est_cut - _STAGE1_MARGIN))
    ea, lb = ea[k], lb[k]
    if len(ea):
        k = (sigA[ea] == sigB[lb]).mean(axis=1) >= est_cut
        ea, lb = ea[k], lb[k]
    if not len(ea):
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.float64)
    # exact size screen, free of any probability envelope: jaccard is at
    # most min(|A|,|B|)/max(|A|,|B|), so pairs whose shingle-set sizes
    # are off by more than the threshold ratio can never pass and are
    # dropped before any gather
    ra = ea if rowA_of is None else rowA_of[ea]
    la_ = (offsA[ra + 1] - offsA[ra]).astype(np.float64)
    lb_ = (offsB[lb + 1] - offsB[lb]).astype(np.float64)
    k = np.minimum(la_, lb_) >= threshold * np.maximum(la_, lb_)
    ea, lb = ea[k], lb[k]
    if not len(ea):
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.float64)
    # verify in (later row, earlier ingestion order) with EARLY STOP: the
    # winner semantics need only each later row's earliest exact match,
    # so once a row succeeds, its remaining (later-ranked) candidates are
    # never gathered. On a degenerate template corpus where whole
    # clusters sit near the threshold this turns the exact-verify volume
    # from O(pairs) = O(cluster²) into ~O(rows in the slice); on sparse
    # corpora the order costs one lexsort.
    o = np.lexsort((iordA[ea], lb))
    ea, lb = ea[o], lb[o]
    ra = ea if rowA_of is None else rowA_of[ea]
    lens = ((offsA[ra + 1] - offsA[ra]) + (offsB[lb + 1] - offsB[lb]))
    alive = np.ones(len(ea), bool)
    keep_e, keep_l, keep_j = [], [], []
    pos = 0
    while pos < len(ea):
        idxs = np.flatnonzero(alive[pos:])
        if not len(idxs):
            break
        idxs = idxs + pos
        cl = np.cumsum(lens[idxs])
        take = min(int(np.searchsorted(cl, _GRAM_BUDGET)) + 1, len(idxs))
        sel = idxs[:take]
        va, offa = _gather_segments(flatA, offsA, ra[sel])
        vb, offb = _gather_segments(flatB, offsB, lb[sel])
        j = segmented_jaccard(va, offa, vb, offb)
        kk = j >= threshold
        if kk.any():
            keep_e.append(ea[sel][kk])
            keep_l.append(lb[sel][kk])
            keep_j.append(j[kk])
            tail = idxs[take:]
            if len(tail):
                alive[tail] = alive[tail] & ~np.isin(lb[tail], lb[sel][kk])
        pos = int(sel[-1]) + 1
    if not keep_e:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.float64)
    ea = np.concatenate(keep_e)
    lb = np.concatenate(keep_l)
    j = np.concatenate(keep_j)
    # already in (lb, iord) order; the first occurrence per row is its
    # earliest surviving match
    first = np.concatenate([[True], lb[1:] != lb[:-1]])
    return lb[first], ea[first], j[first]


def _iter_intra_slices(rows_flat, bstarts, blens, rank, n):
    """Stream (earlier_row, later_row) candidate index slices of ≤
    ``_PAIR_CHUNK`` pairs from the equal-(band_id, band_hash) buckets
    without ever materializing the full pair set (a dense bucket of g
    members contributes g(g-1)/2 pairs; a bench round's buckets sum to
    10^8-10^9). Buckets are grouped by size and paired vectorized per
    consecutive a-column range; a single column whose pairs exceed the
    budget is split over buckets. Members are ordered by in-round
    ingestion rank so column a < b ⇔ earlier/later; in-slice duplicate
    pairs (same pair via several bands landing in one slice) are
    collapsed before the yield."""
    for g in np.unique(blens):
        g = int(g)
        sel = bstarts[blens == g]
        mem = rows_flat[sel[:, None] + np.arange(g)]        # (m, g)
        order = np.argsort(rank[mem], axis=1, kind="stable")
        mem = np.take_along_axis(mem, order, axis=1)
        m = len(sel)
        a = 0
        while a < g - 1:
            acc, a2 = 0, a
            while a2 < g - 1 and (acc + g - 1 - a2) * m <= _PAIR_CHUNK:
                acc += g - 1 - a2
                a2 += 1
            if a2 == a:
                bcap = max(1, _PAIR_CHUNK // (g - 1 - a))
                for mb in range(0, m, bcap):
                    sub = mem[mb:mb + bcap]
                    ce = np.repeat(sub[:, a], g - 1 - a)
                    cl = sub[:, a + 1:].ravel()
                    u = np.unique(ce * np.int64(n) + cl)
                    yield u // n, u % n
                a += 1
                continue
            cols_a = np.concatenate(
                [np.full(g - 1 - x, x, np.int64) for x in range(a, a2)])
            cols_b = np.concatenate(
                [np.arange(x + 1, g, dtype=np.int64) for x in range(a, a2)])
            ce = mem[:, cols_a].ravel()
            cl = mem[:, cols_b].ravel()
            u = np.unique(ce * np.int64(n) + cl)
            yield u // n, u % n
            a = a2


def _iter_inter_slices(op, lo, csum, nz, new_rows_q, mp, total):
    """Stream (old map row index, new round row) slices of ≤
    ``_PAIR_CHUNK`` pairs from the per-band-row match intervals
    [lo, hi) over the okey-sorted old band rows. Each slice maps its
    global pair indices back to (interval, offset) arithmetically, so a
    giant interval (one band hash matching millions of old rows) splits
    naturally and nothing pair-shaped outlives its slice."""
    for p0 in range(0, total, _PAIR_CHUNK):
        idx = np.arange(p0, min(p0 + _PAIR_CHUNK, total), dtype=np.int64)
        itv = np.searchsorted(csum, idx, side="right") - 1
        pos = idx - csum[itv] + lo[nz[itv]]
        yield np.searchsorted(mp, op[pos]), new_rows_q[nz[itv]]


def _run_sliced(fn, slices, refs: tuple, use_ray: bool, consume) -> None:
    """Run ``fn(*refs, *args)`` for each arg tuple yielded by ``slices``
    — as wave-limited parallel Ray tasks when ``use_ray``, inline
    otherwise — and hand each result to ``consume`` as it lands (the
    per-row-min merge is commutative, so arrival order is fine). Slices
    are GENERATED lazily (a slice is materialized only while a task
    slot is free for it) and results are never collected into a list,
    so peak driver memory is in-flight waves × slice size, never the
    candidate or result total."""
    if use_ray:
        import ray

        refs_p = tuple(ray.put(x) for x in refs)
        rfn = ray.remote(fn)
        # wave-limited submission: each in-flight task holds slice
        # scratch, so unbounded fan-out OOMs the box — cap in-flight at
        # a fraction of the CPU count and drain as they finish
        max_inflight = max(4, int(ray.cluster_resources().get("CPU", 8))
                           // 3)
        pending: set = set()
        for args in slices:
            if len(pending) >= max_inflight:
                done, _ = ray.wait(list(pending), num_returns=1)
                pending.discard(done[0])
                consume(ray.get(done[0]))
            pending.add(rfn.remote(*refs_p, *args))
        while pending:
            done, _ = ray.wait(list(pending), num_returns=1)
            pending.discard(done[0])
            consume(ray.get(done[0]))
    else:
        for args in slices:
            consume(fn(*refs, *args))


def _shingle_band_batch(t: pa.Table, corpus_ref, k: int) -> pa.Table:
    """One parents batch → its shingle rows with the band columns packed
    alongside (band_hash list per doc), so ONE parallel pass computes
    both; the driver splits them back apart."""
    from raycrawl.dedup import N_BANDS

    pid = _pids(t["node_id"].combine_chunks())
    from raycrawl.dedup import N_PERM

    texts = _page_texts(t, corpus_ref)
    sh = shingle_list_batch(pa.array(pid, pa.int64()), texts, k=k)
    if len(sh) == 0:
        return (sh.append_column(
            "band_hashes", pa.array([], pa.list_(pa.int64(), N_BANDS)))
            .append_column("sig", pa.array([], pa.list_(pa.uint8(),
                                                        N_PERM))))
    b, sig8 = minhash_bands_batch(sh, return_sig=True)
    return (sh.append_column(
        "band_hashes",
        pa.FixedSizeListArray.from_arrays(b["band_hash"].combine_chunks(),
                                          N_BANDS))
        .append_column("sig", pa.FixedSizeListArray.from_arrays(
            pa.array(sig8.reshape(-1), pa.uint8()), N_PERM)))


def _shingles_and_bands(parents: pa.Table, pid: np.ndarray, corpus_ref,
                        k: int) -> tuple[pa.Table, pa.Table, np.ndarray]:
    """(shingle table, band table, sig8 matrix) for the round's parents —
    Ray-parallel above SHINGLE_RAY_GATE, inline per-slice below. Row
    order follows ``parents`` in both paths (map_batches without a
    shuffle preserves block order). ``sig8`` is the (n, N_PERM) uint8
    folded MinHash signature used by the candidate prefilter."""
    from raycrawl.dedup import N_PERM

    n = parents.num_rows
    chunk = 1 << 16
    if n > SHINGLE_RAY_GATE:
        import functools

        import ray
        import ray.data as rd

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        per = max(_SHINGLE_BLOCK_MIN, (n + 2 * ncpu - 1) // (2 * ncpu))
        ds = rd.from_arrow([parents.slice(off, per)
                            for off in range(0, n, per)])
        # batch_size=None = one batch per input block: a larger batch_size
        # makes Ray COALESCE blocks into few giant tasks, serializing the
        # stage (measured 3 tasks for 64 blocks at batch_size=65536)
        out = ds.map_batches(
            functools.partial(_shingle_band_batch, corpus_ref=corpus_ref,
                              k=k),
            batch_format="pyarrow", batch_size=None).materialize()
        merged = pa.concat_tables(ray.get(out.to_arrow_refs()))
        # to_arrow_refs does NOT reliably return blocks in input order —
        # reorder by doc_id (pid) back to ``parents`` row order, or every
        # downstream row index (shingle offsets, sig rows, stored pid
        # pairing) silently points at the wrong page (observed at bench
        # scale: 92% of planted mirrors missed because stored shingles
        # belonged to other pages)
        mpid = merged["doc_id"].to_numpy()
        mo = np.argsort(mpid, kind="stable")
        perm = mo[np.searchsorted(mpid[mo], pid)]
        merged = merged.take(pa.array(perm))
        bh_col = merged["band_hashes"].combine_chunks()
        nb = int(bh_col.type.list_size)
        m = len(merged)
        bands = pa.table({
            "band_id": pa.array(np.tile(np.arange(nb, dtype=np.int32), m)),
            "band_hash": pa.array(
                bh_col.values.to_numpy(zero_copy_only=False), pa.int64()),
            "doc_id": pa.array(np.repeat(merged["doc_id"].to_numpy(), nb),
                               pa.int64()),
        })
        sig8 = (merged["sig"].combine_chunks().values
                .to_numpy(zero_copy_only=False).reshape(m, N_PERM))
        return merged.drop_columns(["band_hashes", "sig"]), bands, sig8
    texts = _page_texts(parents, corpus_ref)
    sh_parts, band_parts, sig_parts = [], [], []
    for off in range(0, n, chunk):
        shp = shingle_list_batch(
            pa.array(pid[off:off + chunk], pa.int64()),
            texts.slice(off, chunk), k=k)
        sh_parts.append(shp)
        b, s8 = minhash_bands_batch(shp, return_sig=True)
        band_parts.append(b)
        sig_parts.append(s8)
    return (pa.concat_tables(sh_parts), pa.concat_tables(band_parts),
            np.concatenate(sig_parts) if sig_parts
            else np.empty((0, N_PERM), np.uint8))


def probe_and_index_round(ckpt: str, r: int, parents: pa.Table, corpus_ref,
                          threshold: float, k: int = 3) -> pa.Table:
    """Probe round r's COMPLETED parents against the prior rounds' band
    index, write this round's index shard + ``neardup/`` assignments under
    the round dir, and return the assignments table (node_id,
    near_dup_of, jaccard) sorted by node_id."""
    import pyarrow.dataset as pads

    rdir = os.path.join(ckpt, f"round={r:04d}")
    ndx = os.path.join(rdir, "ndx")
    os.makedirs(ndx, exist_ok=True)
    nd_dir = os.path.join(rdir, "neardup")
    os.makedirs(nd_dir, exist_ok=True)

    n = parents.num_rows
    empty = NEARDUP_SCHEMA.empty_table()
    if n == 0:
        pq.write_table(empty, os.path.join(nd_dir, "part-0.parquet"))
        return empty

    node_ids = np.asarray(parents["node_id"].to_pylist(), dtype="U")
    pid = _pids(parents["node_id"].combine_chunks())
    sh, bands, sig8 = _shingles_and_bands(parents, pid, corpus_ref, k)
    new_flat, new_offs = _list_arrays(sh["shingles"])
    bid = bands["band_id"].to_numpy()
    bh = bands["band_hash"].to_numpy()
    bpid = bands["doc_id"].to_numpy()
    _porder = np.argsort(pid, kind="stable")
    _psorted = pid[_porder]

    def rows_of(pids: np.ndarray) -> np.ndarray:
        return _porder[np.searchsorted(_psorted, pids)]

    # --- intra-round candidates: equal (band_id, band_hash) buckets ---
    # STREAMED: a dense bucket of g members implies g(g-1)/2 pairs and a
    # bench round carries 10^8-10^9 of them, so the pair set is never
    # materialized (the earlier concatenate+unique form held ~80 GB of
    # pair/scratch arrays at a 900k-page round and OOM'd the driver).
    # Buckets are grouped by size (each bucket fixes a band_id, so a
    # page appears at most once per bucket); _iter_intra_slices emits
    # ≤_PAIR_CHUNK pair slices that exist only while in flight. True
    # pairs colliding in several bands are re-verified once per band —
    # bounded by dup volume × N_BANDS, vs O(total pairs) memory.
    okey = np.lexsort((bh, bid))
    sb, sh_ = bid[okey], bh[okey]
    runs = np.flatnonzero(np.concatenate(
        [[True], (sb[1:] != sb[:-1]) | (sh_[1:] != sh_[:-1]), [True]]))
    rows_flat = rows_of(bpid[okey])
    run_starts, run_lens = runs[:-1], np.diff(runs)
    big_mask = run_lens > 1
    bstarts, blens = run_starts[big_mask], run_lens[big_mask]
    # ingestion order within a round = node_id; precomputed integer rank
    # so bucket-member ordering never gathers the string array
    rank = np.empty(n, np.int64)
    rank[np.argsort(node_ids, kind="stable")] = np.arange(n)
    total_intra = int(np.sum(blens * (blens - 1) // 2))

    # --- prefilter envelope ------------------------------------------------
    # Both candidate paths estimate jaccard from the stored signatures and
    # drop pairs estimating below threshold - PREFILTER_MARGIN before any
    # shingle gather. The LSH band shape (16×4) admits 10^8-10^9 j≈0.03
    # false candidates per bench round; stage 1 (16 contiguous signature
    # bytes — 4 pairs per cache line) kills ~99.8% of them, stage 2 runs
    # the full-64 estimate on the survivors. Envelope: a TRUE pair at
    # exactly j=threshold is missed with P[Binom(64, j) < 64·(j-0.2)]
    # < 0.1% (stage 2) plus P[Binom(16, j) < 16·(j-0.35)] ≈ 1e-5
    # (stage 1), both vanishing a few points above threshold;
    # byte-folding can only ADD keeps (1/256 per-perm collision).
    est_cut = max(0.0, threshold - PREFILTER_MARGIN)
    sig16 = np.ascontiguousarray(sig8[:, :_STAGE1_PERMS])
    # per later row, the single best (probe_round, earlier node_id,
    # jaccard) seen so far — a scalar slot, never a pair list, so a
    # giant near-dup cluster costs O(cluster) driver memory, not
    # O(cluster²)
    matches: dict[int, tuple[int, str, float]] = {}

    def _merge(row: int, cand: tuple[int, str, float]) -> None:
        cur = matches.get(row)
        if cur is None or (cand[0], cand[1]) < (cur[0], cur[1]):
            matches[row] = cand

    if total_intra:
        def _consume_intra(res) -> None:
            lbs, eas, js = res
            for i in range(len(lbs)):
                _merge(int(lbs[i]),
                       (r, str(node_ids[eas[i]]), float(js[i])))

        _run_sliced(
            _fused_verify_chunk,
            ((se, sl, est_cut, threshold)
             for se, sl in _iter_intra_slices(rows_flat, bstarts, blens,
                                              rank, n)),
            (sig16, sig8, sig16, sig8, new_flat, new_offs, None, rank,
             new_flat, new_offs),
            total_intra > _VERIFY_RAY_GATE, _consume_intra)

    # --- inter-round candidates: pruned read of prior rounds' bands ---
    bps = np.unique(bh.view(np.uint64) % np.uint64(_IDX_BP_PARTS))
    old_files: list[str] = []
    for rr in range(1, r):
        old_files += _hive_files(_round_ndx(ckpt, rr), "bands", "bp", bps)
    total_inter = 0
    if old_files:
        old = pads.dataset(old_files).to_table(
            columns=["band_id", "band_hash", "pid"])
        okeys = _band_key(old["band_id"].to_numpy(),
                          old["band_hash"].to_numpy())
        op = old["pid"].to_numpy()
        oorder = np.argsort(okeys, kind="stable")
        okeys = okeys[oorder]
        op = op[oorder]
        q = _band_key(bid, bh)
        lo = np.searchsorted(okeys, q, side="left")
        hi = np.searchsorted(okeys, q, side="right")
        cnt = (hi - lo).astype(np.int64)
        nz = np.flatnonzero(cnt)
        total_inter = int(cnt[nz].sum())
    if total_inter:
        # candidate old-doc set WITHOUT materializing pairs: the union of
        # the matched [lo, hi) intervals over the okey-sorted old band
        # rows (interval-diff + prefix sum), then the usual sp pruning —
        # ingestion metadata (stored sig8) AND shingles are read only for
        # partitions holding a candidate, and shingle rows only for the
        # candidate docs themselves; per-round read cost scales with the
        # batch's collisions, never the crawl history.
        d = np.zeros(len(op) + 1, np.int64)
        np.add.at(d, lo[nz], 1)
        np.add.at(d, hi[nz], -1)
        covered = np.cumsum(d[:-1]) > 0
        cand_pids = np.unique(op[covered])
        sps = np.unique(cand_pids % np.int64(_IDX_SP_PARTS))
        map_files: list[str] = []
        sh_files: list[str] = []
        for rr in range(1, r):
            map_files += _hive_files(_round_ndx(ckpt, rr), "map", "sp", sps)
            sh_files += _hive_files(_round_ndx(ckpt, rr), "sh", "sp", sps)
        omap = pads.dataset(map_files).to_table(
            columns=["pid", "node_id", "probe_round", "sig"])
        mp = omap["pid"].to_numpy()
        mord = np.argsort(mp, kind="stable")
        m_ids = np.asarray(omap["node_id"].to_pylist(), dtype="U")[mord]
        m_rounds = omap["probe_round"].to_numpy()[mord]
        from raycrawl.dedup import N_PERM as _NP

        m_sig = (omap["sig"].combine_chunks().values
                 .to_numpy(zero_copy_only=False)
                 .reshape(len(omap), _NP))[mord]
        mp = mp[mord]
        m_sig16 = np.ascontiguousarray(m_sig[:, :_STAGE1_PERMS])
        # old ingestion order for the per-row winner reduce
        m_iord = np.empty(len(mp), np.int64)
        m_iord[np.lexsort((m_ids, m_rounds))] = np.arange(len(mp))
        # candidate old shingles, keyed map row → shingle row
        osh = pads.dataset(sh_files).to_table(columns=["pid", "shingles"])
        opid = osh["pid"].to_numpy()
        keepm = np.isin(opid, cand_pids)
        osh = osh.filter(pa.array(keepm))
        opid = opid[keepm]
        oflat, ooffs = _list_arrays(osh["shingles"])
        oord = np.argsort(opid, kind="stable")
        m_shrow = oord[np.minimum(
            np.searchsorted(opid[oord], mp), max(len(opid) - 1, 0))]
        # stream (old map row, new round row) slices through the fused
        # prefilter+verify+reduce — the expansion exists only while a
        # slice is in flight; band-duplicate pairs re-verify and the
        # per-row min merge absorbs them
        new_rows_q = rows_of(bpid)
        csum = np.zeros(len(nz) + 1, np.int64)
        np.cumsum(cnt[nz], out=csum[1:])

        def _consume_inter(res) -> None:
            lbs, eas, js = res
            for i in range(len(lbs)):
                _merge(int(lbs[i]),
                       (int(m_rounds[eas[i]]), str(m_ids[eas[i]]),
                        float(js[i])))

        _run_sliced(
            _fused_verify_chunk,
            ((ia, ib, est_cut, threshold) for ia, ib in _iter_inter_slices(
                op, lo, csum, nz, new_rows_q, mp, total_inter)),
            (m_sig16, m_sig, sig16, sig8, oflat, ooffs, m_shrow, m_iord,
             new_flat, new_offs),
            total_inter > _VERIFY_RAY_GATE, _consume_inter)

    # --- winner per later page: min (probe_round, node_id), already
    # reduced per slice in the workers and merged scalar per row ---
    out_ids, out_of, out_j = [], [], []
    for row in sorted(matches):
        best = matches[row]
        out_ids.append(str(node_ids[row]))
        out_of.append(best[1])
        out_j.append(best[2])
    assigned = pa.table(
        {"node_id": pa.array(out_ids, pa.string()),
         "near_dup_of": pa.array(out_of, pa.string()),
         "jaccard": pa.array(out_j, pa.float64())})
    pq.write_table(assigned, os.path.join(nd_dir, "part-0.parquet"))

    # --- append this round to the index (inside the round dir) ---
    _write_partitioned(
        pa.table({"band_id": bands["band_id"], "band_hash": bands["band_hash"],
                  "pid": bands["doc_id"]}),
        os.path.join(ndx, "bands"), "bp",
        bh.view(np.uint64) % np.uint64(_IDX_BP_PARTS))
    sp = (pid % np.int64(_IDX_SP_PARTS)).astype(np.int64)
    _write_partitioned(
        pa.table({"pid": pa.array(pid, pa.int64()),
                  "shingles": sh["shingles"]}),
        os.path.join(ndx, "sh"), "sp", sp)
    from raycrawl.dedup import N_PERM as _NP

    _write_partitioned(
        pa.table({"pid": pa.array(pid, pa.int64()),
                  "node_id": parents["node_id"],
                  "probe_round": pa.array(np.full(n, r, np.int32)),
                  "sig": pa.FixedSizeListArray.from_arrays(
                      pa.array(sig8.reshape(-1), pa.uint8()), _NP)}),
        os.path.join(ndx, "map"), "sp", sp)
    return assigned


def crawl_neardup(ckpt: str) -> pa.Table:
    """All near-dup assignments of a (completed or cancelled) crawl run
    with ``neardup_threshold`` set: (node_id, near_dup_of, jaccard),
    sorted by node_id."""
    import glob

    import pyarrow.dataset as pads

    files = sorted(glob.glob(os.path.join(ckpt, "round=*", "neardup",
                                          "*.parquet")))
    if not files:
        return NEARDUP_SCHEMA.empty_table()
    t = pads.dataset(files).to_table()
    return t.take(pa.array(np.argsort(
        np.asarray(t["node_id"].to_pylist(), dtype="U"), kind="stable")))


def nodes_with_neardup(ckpt: str):
    """Final nodes Dataset with ``near_dup_of``/``dup_jaccard`` columns
    attached — the assignments are bounded by dup volume, so they ride a
    ``ray.put`` broadcast into a zero-shuffle ``map_batches`` merge
    (never a join shuffle of the full nodes table)."""
    import ray

    from raycrawl.crawl import read_nodes

    nd = crawl_neardup(ckpt)
    ids = np.asarray(nd["node_id"].to_pylist(), dtype="U")
    order = np.argsort(ids, kind="stable")
    ref = ray.put((ids[order],
                   np.asarray(nd["near_dup_of"].to_pylist(),
                              dtype=object)[order],
                   nd["jaccard"].to_numpy()[order]))

    def attach(t: pa.Table) -> pa.Table:
        ids_s, of_s, j_s = ray.get(ref)
        q = np.asarray(t["node_id"].to_pylist(), dtype="U")
        if len(ids_s):
            p = np.minimum(np.searchsorted(ids_s, q), len(ids_s) - 1)
            hit = ids_s[p] == q
        else:
            p = np.zeros(len(q), np.int64)
            hit = np.zeros(len(q), bool)
        of = np.where(hit, of_s[p] if len(of_s) else None, None)
        jj = np.where(hit, j_s[p] if len(j_s) else np.nan, np.nan)
        return t.append_column(
            "near_dup_of", pa.array(of.tolist(), pa.string())
        ).append_column(
            "dup_jaccard",
            pa.array(np.where(hit, jj, np.nan), pa.float64()))

    return read_nodes(ckpt).map_batches(attach, batch_format="pyarrow")


def crawl_neardup_sql(nodes_glob: str, pages_parquet: str, crawl_id: str,
                      threshold: float = 0.6, k: int = 3) -> str:
    """DuckDB oracle for ``crawl_neardup``: recompute the exact 3-gram
    Jaccard pair set over the crawl's fetched pages (COMPLETED non-leaf
    URL nodes; probe round = discovery round + attempts) joined to the
    corpus text, and pick each page's earliest qualifying match. Exact
    where the engine is LSH-bounded — the same completeness envelope as
    every green MinHash oracle row."""
    return f"""
    WITH nodes AS (SELECT * FROM read_parquet('{nodes_glob}')
                   WHERE crawl_id = '{crawl_id}'),
    fetched AS (
      SELECT node_id, name, http_type,
             CAST(round + attempts AS INTEGER) AS probe_round
      FROM nodes
      WHERE node_type = 'URL' AND status = 'COMPLETED'
        AND depth < requested_depth
    ),
    pages AS (SELECT upper(split_part(url, '://', 2)) AS name,
                     upper(split_part(url, '://', 1)) || '://' AS http_type,
                     text
              FROM read_parquet('{pages_parquet}')),
    docs AS (SELECT f.node_id, f.probe_round, p.text
             FROM fetched f
             JOIN pages p ON f.name = p.name AND f.http_type = p.http_type),
    toks AS (SELECT node_id, probe_round,
                    -- regex trim BOTH ends (plain trim() strips only
                    -- spaces; stripped HTML ends with a newline, and
                    -- Python str.split() drops all edge whitespace)
                    string_split_regex(
                        regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                        '\\s+') AS t
             FROM docs),
    g0 AS (SELECT node_id,
                  unnest(CASE WHEN len(t) < {k} THEN [array_to_string(t, ' ')]
                         ELSE list_transform(range(1, len(t) - {k} + 2),
                                             i -> array_to_string(t[i:i+{k - 1}], ' '))
                         END) AS gram
           FROM toks),
    g AS (SELECT DISTINCT node_id, gram FROM g0),
    sz AS (SELECT node_id, count(*) AS n FROM g GROUP BY node_id),
    pr AS (SELECT node_id, probe_round FROM toks),
    inter AS (SELECT x.node_id AS e_id, px.probe_round AS e_r,
                     y.node_id AS l_id, count(*) AS i
              FROM g x JOIN g y ON x.gram = y.gram
              JOIN pr px ON px.node_id = x.node_id
              JOIN pr py ON py.node_id = y.node_id
              WHERE px.probe_round < py.probe_round
                 OR (px.probe_round = py.probe_round
                     AND x.node_id < y.node_id)
              GROUP BY 1, 2, 3),
    pairs AS (SELECT e_id, e_r, l_id,
                     CAST(i AS DOUBLE) / (se.n + sl.n - i) AS jaccard
              FROM inter
              JOIN sz se ON se.node_id = e_id
              JOIN sz sl ON sl.node_id = l_id
              WHERE CAST(i AS DOUBLE) / (se.n + sl.n - i) >= {threshold}),
    ranked AS (SELECT l_id AS node_id, e_id AS near_dup_of, jaccard,
                      row_number() OVER (PARTITION BY l_id
                                         ORDER BY e_r, e_id) AS rn
               FROM pairs)
    SELECT node_id, near_dup_of, jaccard FROM ranked WHERE rn = 1
    ORDER BY node_id
    """
