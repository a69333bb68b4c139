"""Round-expansion stage: fused fetch+extract+dedup+DNS with actor-side
node merge.

One BFS round is the Ray-Data restatement (SURVEY.md §3.4) of the
reference's per-job pipeline (feeder/src/job.rs:263-351):

    frontier ─ map_batches(fetch_expand)   # S1/J5 fetch + M1 extract + D1 +
                                           # J1 anti-join + M2 normalize +
                                           # ST2 DNS + M7 depth + parent status
                                           # + offer(children) → seen shards
             → round_out parquet           # parent lifecycle rows + child/edge rows
    barrier: SeenShard.commit_round()      # J2 MERGE winners → nodes delta
                                           # parquet (written BY the shards)

``fetch_expand`` is a stateless *task* stage: its heavy setup (corpus
index, DNS cache) is cached per worker process (see fetch.py), so repeated
per-round executions pay no actor-pool spin-up. Node dedup lives in the
SeenShard actors (hash(node_id)-routed offers; min-depth winner; committed
at the driver's round barrier) — the actor RPC is the round's only
shuffle.

Edge rows need no cross-batch dedup within a round: a parent's children
are a set (within-job normalized dedup), and every (src, dst) pair is
emitted only by parent ``src``'s input row, which lives in exactly one
batch. Cross-round duplicates are impossible (a parent reaches a
successful fetch exactly once); a final safety dedup runs at compaction.

Optional per-page enrichment (``CrawlConfig.extra['enrich']`` / bench):
tag-strip text, token counts, quality score, SimHash, MinHash band hash,
winnowing fingerprint, language guess — the per-page featurization a
training-data crawl runs at fetch time, attached to the parent row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raycrawl import sim
from raycrawl.fetch import STATUS_ROBOTS, fetch_one, get_fetcher
from raycrawl.kernels import hash128, normalize_url
from raycrawl.seen import SeenRouter

ROUND_OUT_SCHEMA = pa.schema(
    [
        ("row_type", pa.string()),          # "parent" | "child"
        ("crawl_id", pa.string()),
        ("name", pa.string()),
        ("http_type", pa.string()),
        ("node_id", pa.string()),           # http_type + name (M4)
        ("depth", pa.int32()),
        ("requested_depth", pa.int32()),
        ("attempts", pa.int32()),
        ("status", pa.string()),            # parent: new status; child: ""
        ("ip", pa.string()),
        ("domain", pa.string()),
        ("request_time_ms", pa.float64()),
        ("parent_id", pa.string()),
        ("fetch_status", pa.int32()),
        ("round", pa.int32()),
        # enrichment (null unless enrich is on; parent rows only)
        ("n_tokens", pa.int32()),
        ("quality", pa.float64()),
        ("simhash", pa.uint64()),
        ("fingerprint", pa.uint64()),
        ("minhash0", pa.uint64()),
        ("lang_pred", pa.string()),
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("crawl_id", pa.string()),
        ("name", pa.string()),
        ("http_type", pa.string()),
        ("node_id", pa.string()),
        ("node_type", pa.string()),         # "ROOT" | "URL"
        ("depth", pa.int32()),
        ("requested_depth", pa.int32()),
        ("status", pa.string()),
        ("attempts", pa.int32()),
        ("ip", pa.string()),
        ("domain", pa.string()),
        ("request_time_ms", pa.float64()),
        ("round", pa.int32()),
        # ROOT-only (docs/neo4j-graph-model.md:13-23): crawl submission
        # time, ISO-8601 UTC; null on URL rows exactly as the reference
        # puts created_at only on ROOT
        ("created_at", pa.string()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("crawl_id", pa.string()),
        ("src", pa.string()),
        ("dst", pa.string()),
        ("depth", pa.int32()),              # child depth at discovery
        ("round", pa.int32()),
    ]
)

# per-worker DNS cache (pure function → safe to share across crawls)
_DNS_CACHE: dict[tuple[str, int], tuple[str, str] | None] = {}


def _dns(name: str, max_depth: int):
    k = (name, max_depth)
    v = _DNS_CACHE.get(k, "?")
    if v == "?":
        from raycrawl import dns_synth

        v = dns_synth.get_network_stats(name, max_depth)
        _DNS_CACHE[k] = v
    return v


# ---------------------------------------------------------------------------
# per-page enrichment (vectorized; the realistic parse workload)
# ---------------------------------------------------------------------------

import re as _re

_TAG_RE = _re.compile(r"<[^>]+>")
_FP_K = 8
_FP_MULT = np.uint64(0x100000001B3)
_MAX_TOKENS = 256       # featurization window (tokens)
_LANGID_CHARS = 1024    # language-ID window (chars)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    from raycrawl.kernels import token_hash64

    return token_hash64(tokens)


def enrich_page(html_text: str) -> dict:
    """Featurize one fetched page: token count, quality, simhash,
    winnowing fingerprint, MinHash lane, language guess.

    Analysis windows: quality/simhash/fingerprint/minhash over the first
    _MAX_TOKENS tokens, language ID over the first _LANGID_CHARS chars —
    standard practice for per-page featurization, and it bounds the memory
    traffic per page (full-text rescans were the throughput ceiling)."""
    from raycrawl.textops import _LANG_HINTS, STOPWORDS, WORD_RE

    text = _TAG_RE.sub("", html_text)
    tokens = text.split()
    n_tok = len(tokens)
    window = tokens[:_MAX_TOKENS]
    wtext = " ".join(window)
    words = WORD_RE.findall(wtext.lower())
    nw = len(words)
    stop_ratio = sum(w in STOPWORDS for w in words) / nw if nw else 0.0
    mean_wl = sum(map(len, words)) / nw if nw else 0.0
    quality = 0.5 * min(stop_ratio / 0.4, 1.0) + 0.5 * min(mean_wl / 8.0, 1.0)

    if window:
        th = _token_hashes(window)
        bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        acc = (2 * bits.astype(np.int32) - 1).sum(axis=0)
        sim_bits = np.packbits((acc > 0).astype(np.uint8), bitorder="little")
        simhash = int(np.frombuffer(sim_bits.tobytes(), dtype=np.uint64)[0])
        k = min(_FP_K, len(th))
        if len(th) >= _FP_K:
            with np.errstate(over="ignore"):
                roll = th[: len(th) - _FP_K + 1].copy()
                for j in range(1, _FP_K):
                    roll = roll * _FP_MULT ^ th[j : len(th) - _FP_K + 1 + j]
            fingerprint = int(roll.min())
        else:
            fingerprint = int(th.min())
        # MinHash lane over word 3-gram shingles of the window
        if len(th) >= 3:
            with np.errstate(over="ignore"):
                sh = th[:-2] * _FP_MULT ^ th[1:-1] * np.uint64(1099511628211) ^ th[2:]
            sh = np.unique(sh)
            from raycrawl.dedup import minhash_signature

            minhash0 = int(minhash_signature(sh)[0])
        else:
            minhash0 = int(th.min())
    else:
        simhash, fingerprint, minhash0 = 0, 0, 0

    low = text[:_LANGID_CHARS].lower()
    best, best_score = "en", -1.0
    for lang, grams in _LANG_HINTS.items():
        if not grams:
            continue
        score = sum(low.count(g) for g in grams) / (len(low) + 1)
        if score > best_score:
            best, best_score = lang, score
    return dict(n_tokens=n_tok, quality=quality, simhash=simhash,
                fingerprint=fingerprint, minhash0=minhash0, lang_pred=best)


_NO_ENRICH = dict(n_tokens=None, quality=None, simhash=None,
                  fingerprint=None, minhash0=None, lang_pred=None)


_FEAT_NAMES = ("n_tokens", "quality", "simhash", "fingerprint",
               "minhash0", "lang_pred")


def enrich_pages(htmls: list) -> dict:
    """Batched ``enrich_page``: value-identical per page (asserted by
    pytest), returned as COLUMNS — ``{feature: object ndarray aligned with
    htmls}`` with ``None`` where ``htmls[i] is None`` — so the round
    assembly feeds Arrow directly instead of re-pivoting 10^6 dicts.

    Fully vectorized: tag-strip / tokenize / window / quality / langid run
    as polars column ops (``\\S+`` runs coincide with ``str.split()`` on
    this corpus — same caveat as the SQL oracles), ALL pages' token
    windows hash in ONE ``token_hash64`` call, simhash bits pack across
    the whole batch, and the only per-page Python left is two C-level
    slice minima (fingerprint/minhash windows overlap page boundaries in
    the global roll array, so a segmented reduce can't express them)."""
    import polars as pl

    from raycrawl.dedup import _MERSENNE, _PERM_A, _PERM_B
    from raycrawl.textops import _LANG_HINTS, STOPWORDS

    n = len(htmls)
    out = {k: np.full(n, None, dtype=object) for k in _FEAT_NAMES}
    idxs = np.array([i for i in range(n) if htmls[i] is not None],
                    dtype=np.int64)
    m = len(idxs)
    if m == 0:
        return out

    s = pl.Series([htmls[int(i)] for i in idxs], dtype=pl.String)
    text = s.str.replace_all(_TAG_RE.pattern, "")
    toks = text.str.extract_all(r"\S+")
    n_tok = toks.list.len().to_numpy().astype(np.int64)
    window = toks.list.head(_MAX_TOKENS)
    lens = np.minimum(n_tok, _MAX_TOKENS)
    starts = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])

    # quality over the joined window — the exact string " ".join(window)
    wlow = window.list.join(" ").str.to_lowercase()
    words = wlow.str.extract_all(r"\w+")
    nw = words.list.len().fill_null(0).to_numpy().astype(np.float64)
    nstop = (words.list.eval(pl.element().is_in(sorted(STOPWORDS))
                             .cast(pl.UInt32))
             .list.sum().fill_null(0).to_numpy().astype(np.float64))
    wchars = (words.list.eval(pl.element().str.len_chars())
              .list.sum().fill_null(0).to_numpy().astype(np.float64))
    with np.errstate(invalid="ignore"):
        stop_ratio = np.where(nw > 0, nstop / nw, 0.0)
        mean_wl = np.where(nw > 0, wchars / nw, 0.0)
    quality = (0.5 * np.minimum(stop_ratio / 0.4, 1.0)
               + 0.5 * np.minimum(mean_wl / 8.0, 1.0))

    # langid over the first _LANGID_CHARS chars (slice THEN lowercase,
    # like the scalar), np.argmax first-max == dict-order tie-break
    low = text.str.slice(0, _LANGID_CHARS).str.to_lowercase()
    denom = low.str.len_chars().to_numpy().astype(np.float64) + 1.0
    hint_langs = [lang for lang, grams in _LANG_HINTS.items() if grams]
    scores = np.empty((m, len(hint_langs)), dtype=np.float64)
    for j, lang in enumerate(hint_langs):
        cnt = np.zeros(m, dtype=np.int64)
        for g in _LANG_HINTS[lang]:
            cnt += low.str.count_matches(g, literal=True).to_numpy().astype(np.int64)
        scores[:, j] = cnt / denom
    lang_pred = np.array(hint_langs, dtype=object)[np.argmax(scores, axis=1)]

    flat = window.explode(empty_as_null=False).drop_nulls()
    if len(flat):
        from raycrawl.kernels import token_hash64

        th_all = token_hash64(flat.to_arrow())
    else:
        th_all = np.empty(0, dtype=np.uint64)
    T = len(th_all)

    # simhash: per-token bit matrix → segmented per-page bit counts via
    # ONE contiguous cumsum + gather-diff. NOT np.add.reduceat: reduceat's
    # axis-0 inner loop is strided per segment and was measured collapsing
    # to >70 s on a 1M×64 matrix under fragmented-memory conditions where
    # the sequential cumsum stays at ~100 ms. acc = 2*ones_count - len,
    # computed per page below.
    nz = np.flatnonzero(lens)
    if T:
        bits = np.unpackbits(
            th_all.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        n_nz = len(nz)
        ones_cnt = np.empty((n_nz, 64), dtype=np.int32)
        s_nz = starts[nz]
        e_nz = s_nz + lens[nz]
        for j in range(n_nz):
            # contiguous ≤window×64 block sum; loop count is pages, not
            # tokens — the hot bytes stream exactly once
            bits[s_nz[j]:e_nz[j]].sum(axis=0, dtype=np.int32, out=ones_cnt[j])
    # rolling k-gram fingerprint array (global; a slice [start, start+len-K]
    # stays inside its page by construction)
    K = _FP_K
    if T >= K:
        with np.errstate(over="ignore"):
            roll = th_all[: T - K + 1].copy()
            for j in range(1, K):
                roll = roll * _FP_MULT ^ th_all[j : T - K + 1 + j]
    else:
        roll = np.empty(0, dtype=np.uint64)
    # minhash lane: 3-gram shingles → perm-0 values (min unaffected by the
    # de-dup the signature path does)
    if T >= 3:
        with np.errstate(over="ignore"):
            sh3 = (th_all[:-2] * _FP_MULT
                   ^ th_all[1:-1] * np.uint64(1099511628211) ^ th_all[2:])
            p0 = (sh3 * _PERM_A[0] + _PERM_B[0]) % _MERSENNE
    else:
        p0 = np.empty(0, dtype=np.uint64)

    sim = np.zeros(m, dtype=np.uint64)
    fp = np.zeros(m, dtype=np.uint64)
    mh = np.zeros(m, dtype=np.uint64)
    if T:
        # simhash packs across the whole batch at once: (n_nz, 64) sign
        # bits → (n_nz, 8) bytes → one uint64 per page
        acc = 2 * ones_cnt - lens[nz][:, None].astype(np.int32)
        sim[nz] = np.ascontiguousarray(
            np.packbits((acc > 0).astype(np.uint8), axis=1,
                        bitorder="little")).view(np.uint64).ravel()
        for j in nz:
            ln = int(lens[j])
            s0 = int(starts[j])
            seg_min = th_all[s0:s0 + ln].min()
            fp[j] = roll[s0:s0 + ln - K + 1].min() if ln >= K else seg_min
            mh[j] = p0[s0:s0 + ln - 2].min() if ln >= 3 else seg_min

    out["n_tokens"][idxs] = n_tok.tolist()
    out["quality"][idxs] = quality.tolist()
    out["simhash"][idxs] = sim.tolist()
    out["fingerprint"][idxs] = fp.tolist()
    out["minhash0"][idxs] = mh.tolist()
    out["lang_pred"][idxs] = lang_pred
    return out


_TRACE: dict = {}


def offer_salt(khi: np.ndarray) -> int:
    """Task-identity salt over a task's frontier-row key hashes: a fold
    that is identical on a Ray task retry (same rows) and distinct across
    tasks (disjoint row sets). khi[0] is mixed in ROTATED so it cannot
    cancel the XOR-reduce's own khi[0] term — with a plain XOR a
    single-row batch degenerated to the constant salt 1 for every task
    (ADVICE r3), losing the distinct-across-tasks property exactly in the
    smallest-batch case."""
    n = len(khi)
    k0 = np.uint64(khi[0]) if n else np.uint64(0)
    rot = np.uint64((k0 << np.uint64(17)) | (k0 >> np.uint64(47)))
    acc = np.bitwise_xor.reduce(khi.astype(np.uint64)) if n else np.uint64(0)
    return int(np.uint64(acc) ^ np.uint64(n) ^ rot)


def _trace_mark(stage: str, t0: float) -> float:
    """Opt-in per-stage wall accounting (RAYCRAWL_TRACE_DIR set by the
    driver/bench): accumulates per worker process, appended as one JSON
    line per batch so a `cat | jq` can attribute big-round cost to
    fetch/enrich/J1/assembly/offer-wait without guessing. Zero work when
    the env var is unset."""
    import time as _time

    t1 = _time.perf_counter()
    _TRACE[stage] = _TRACE.get(stage, 0.0) + (t1 - t0)
    return t1


def _trace_flush(n_rows: int) -> None:
    import json as _json
    import os as _os

    d = _os.environ.get("RAYCRAWL_TRACE_DIR")
    if not d or not _TRACE:
        return
    _os.makedirs(d, exist_ok=True)
    rec = dict(pid=_os.getpid(), rows=n_rows,
               **{k: round(v, 4) for k, v in _TRACE.items()})
    with open(_os.path.join(d, f"trace-{_os.getpid()}.jsonl"), "a") as f:
        f.write(_json.dumps(rec) + "\n")
    _TRACE.clear()


def fetch_expand_batch(
    batch: pa.Table,
    *,
    corpus_ref,
    seen_handles,
    max_attempts: int = 3,
    max_dns_depth: int = 5,
    round_no: int = 0,
    politeness_delay_ms: float = 0.0,
    respect_robots: bool = False,
    enrich: bool = False,
) -> pa.Table:
    """Frontier rows → ROUND_OUT rows + child offers to the seen shards.

    Per parent: fetch (S1/J5) + extract (M1) + D1; then J1 anti-join of the
    raw-uppercased candidate set against the seen snapshot (job.rs:138-165;
    key = raw-upper string vs normalized stored ids — a www-variant passes
    J1 and later MERGEs onto the existing node, edge-only); normalize (M2),
    within-job normalized dedup (job.rs:296-299), synthetic DNS (ST2,
    dropped on failure job.rs:325-329), child depth = parent+1 (M7); parent
    terminal status per job.rs:97-133 & 289-343 (4xx permanent FAILED, 5xx
    retry budget, no-new → COMPLETED, all-DNS-dropped → FAILED). Children
    are offered to their hash(node_id) shard for the J2 MERGE at the round
    barrier.
    """
    fetcher = get_fetcher(corpus_ref)
    parts_arr = fetcher.batch_parts(batch["name"])  # None for broadcast
    router = SeenRouter(seen_handles)
    n = batch.num_rows
    names = batch["name"].to_pylist()
    protos = batch["http_type"].to_pylist()
    depths = batch["depth"].to_pylist()
    reqd = batch["requested_depth"].to_pylist()
    attempts = batch["attempts"].to_pylist()
    crawl_ids = batch["crawl_id"].to_pylist()

    order = list(range(n))
    if politeness_delay_ms > 0:
        # priority: (depth, name) — per-host queue order (north-star L1)
        order.sort(key=lambda i: (depths[i], names[i]))
    if parts_arr is not None:
        # partitioned corpus: visit rows partition-major (stable, so the
        # politeness priority survives within a partition) — one LRU slot
        # load per touched partition instead of thrash
        order.sort(key=lambda i: parts_arr[i])

    from raycrawl.fetch import corpus_key_strings

    import os as _os
    import time as _time

    _tr = bool(_os.environ.get("RAYCRAWL_TRACE_DIR"))
    _t = _time.perf_counter()
    khi, klo = hash128(corpus_key_strings(batch["name"], batch["http_type"]))
    # corpus-row lookup for the whole batch, vectorized one partition-run
    # at a time (order is partition-major, so each slot loads exactly once)
    row_idx = np.full(n, -1, dtype=np.int64)
    order_arr = np.asarray(order, dtype=np.int64)
    if len(order_arr):
        pvals = (parts_arr[order_arr] if parts_arr is not None
                 else np.zeros(len(order_arr), dtype=np.int64))
        bounds = np.append(np.flatnonzero(np.diff(pvals)) + 1, len(pvals))
        start = 0
        for end in bounds:
            rows = order_arr[start:end]
            index, _ = fetcher.slot(int(pvals[start]))
            row_idx[rows] = index.lookup(khi[rows], klo[rows])
            start = int(end)
    fetched = [None] * n
    pages = None                 # set by enrich_pages when enrich is on
    cur_part, html_col = None, None
    for i in order:
        p = int(parts_arr[i]) if parts_arr is not None else 0
        if p != cur_part:
            _, html_col = fetcher.slot(p)
            cur_part = p
        attempt = int(attempts[i] or 0) + 1
        fetched[i] = fetch_one(
            int(row_idx[i]), html_col, names[i], protos[i], attempt,
            politeness_delay_s=politeness_delay_ms / 1000.0,
            respect_robots=respect_robots,
            want_html=enrich,
        )
    if _tr:
        _t = _trace_mark("fetch_loop", _t)
    if enrich:
        pages = enrich_pages([f[4] for f in fetched])
    if _tr:
        _t = _trace_mark("enrich", _t)

    # J1 for the whole batch in one vectorized membership query
    flat: list[str] = []
    for i in range(n):
        flat.extend(fetched[i][3])
    if flat:
        hi, lo = hash128(flat)
        seen_mask = router.contains(hi, lo)
    else:
        seen_mask = np.empty(0, dtype=bool)
    if _tr:
        _t = _trace_mark("j1_contains", _t)

    # ---- children, fully vectorized (the per-CHILD volume is branching ×
    # the per-PARENT volume, so no Python work may scale with it) ----
    # normalize + per-parent dedup + DNS-drop of the unseen candidates;
    # parent statuses then need only the per-parent counts.
    import pyarrow.compute as pc_

    counts = np.array([len(f[3]) for f in fetched], dtype=np.int64)
    parent_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    unseen_idx = (np.flatnonzero(~seen_mask) if len(seen_mask)
                  else np.empty(0, dtype=np.int64))
    n_new = (np.bincount(parent_of[unseen_idx], minlength=n)
             if len(unseen_idx) else np.zeros(n, dtype=np.int64))

    child_tbl = None
    n_children = np.zeros(n, dtype=np.int64)
    if len(unseen_idx):
        from raycrawl.kernels import normalize_urls_arrow

        flat_arr = pa.array(flat, pa.string())
        cand_arr = flat_arr.take(pa.array(unseen_idx))
        parent_sub = parent_of[unseen_idx]
        cnames, cprotos = normalize_urls_arrow(cand_arr)
        node_ids_c = pc_.binary_join_element_wise(cprotos, cnames, "")
        chi, clo = hash128(node_ids_c)
        # per-parent normalized dedup (set semantics): group-first over
        # (parent, key128)
        gorder = np.lexsort((clo, chi, parent_sub))
        spar, shi2, slo2 = parent_sub[gorder], chi[gorder], clo[gorder]
        gfirst = np.ones(len(gorder), dtype=bool)
        gfirst[1:] = ((spar[1:] != spar[:-1]) | (shi2[1:] != shi2[:-1])
                      | (slo2[1:] != slo2[:-1]))
        didx = gorder[gfirst]
        dpar = parent_sub[didx]
        # DNS per deduped candidate (per-worker cache; dropped on failure,
        # job.rs:325-329)
        dnames = cnames.take(pa.array(didx)).to_pylist()
        ip_list: list = []
        dom_list: list = []
        keep = np.ones(len(didx), dtype=bool)
        for j, nm in enumerate(dnames):
            st = _dns(nm, max_dns_depth)
            if st is None:
                keep[j] = False
            else:
                dom_list.append(st[0])
                ip_list.append(st[1])
        kmask = keep
        kidx = didx[kmask]
        kpar = dpar[kmask]
        n_children = np.bincount(kpar, minlength=n)
        if len(kidx):
            sel = pa.array(kidx)
            cpidx = pa.array(kpar)
            pids_arr = pc_.binary_join_element_wise(
                batch["http_type"].combine_chunks(),
                batch["name"].combine_chunks(), ""
            )
            elapsed_np = np.array([f[1] for f in fetched], dtype=np.float64)
            child_tbl = pa.table(
                {
                    "crawl_id": batch["crawl_id"].combine_chunks().take(cpidx),
                    "name": cnames.take(sel),
                    "http_type": cprotos.take(sel),
                    "node_id": node_ids_c.take(sel),
                    "depth": pc_.add(
                        batch["depth"].combine_chunks().take(cpidx),
                        pa.scalar(1, pa.int32()),
                    ).cast(pa.int32()),
                    "requested_depth":
                        batch["requested_depth"].combine_chunks().take(cpidx),
                    "ip": pa.array(ip_list, pa.string()),
                    "domain": pa.array(dom_list, pa.string()),
                    "request_time_ms": pa.array(elapsed_np[kpar], pa.float64()),
                    "parent_id": pids_arr.take(cpidx),
                }
            )

    # ---- parent lifecycle rows, fully vectorized (one per frontier
    # row; the per-row Python loop here measured ~27% of total task time
    # at 2.1M parents — status resolution is mask algebra, every column
    # is either reused zero-copy from the input batch or built in one
    # pa.array call) ----
    status_np = np.array([f[0] for f in fetched], dtype=np.int64)
    elapsed_all = np.array([f[1] for f in fetched], dtype=np.float64)
    att_in = np.array([int(a or 0) for a in attempts], dtype=np.int64)
    attempt_np = att_in + 1

    ok = status_np == sim.STATUS_OK
    robots = status_np == STATUS_ROBOTS
    permanent = ((status_np >= sim.PERMANENT_FAILURE_LO)
                 & (status_np < sim.PERMANENT_FAILURE_HI))
    exhausted = attempt_np >= max_attempts
    # every new link DNS-dropped -> FAILED (job.rs:325-343)
    dns_failed = ok & (n_new > 0) & (n_children == 0)

    pstat = np.where(
        ok, np.where(dns_failed, "FAILED", "COMPLETED"),
        np.where(robots, "ROBOTS_BLOCKED",
                 np.where(permanent | exhausted, "FAILED", "PENDING")))
    # success/robots do NOT bump attempts (validate_job increments only on
    # error; COMPLETED stores the old counter -- job.rs:104-121)
    att_np = np.where(ok | robots, attempt_np - 1, attempt_np)

    if enrich:
        feat_cols = pages                      # columns already (object ndarrays)
    else:
        feat_cols = {k: [None] * n for k in _FEAT_NAMES}

    pid_col = pc_.binary_join_element_wise(
        batch["http_type"].combine_chunks(),
        batch["name"].combine_chunks(), "")
    empty_str = pa.array([""] * n, pa.string())
    parents_tbl = pa.table(
        {
            "row_type": pa.array(["parent"] * n, pa.string()),
            "crawl_id": batch["crawl_id"].combine_chunks(),
            "name": batch["name"].combine_chunks(),
            "http_type": batch["http_type"].combine_chunks(),
            "node_id": pid_col,
            "depth": batch["depth"].combine_chunks().cast(pa.int32()),
            "requested_depth":
                batch["requested_depth"].combine_chunks().cast(pa.int32()),
            "attempts": pa.array(att_np, pa.int32()),
            "status": pa.array(pstat.tolist(), pa.string()),
            "ip": empty_str,
            "domain": empty_str,
            "request_time_ms": pa.array(elapsed_all, pa.float64()),
            "parent_id": empty_str,
            "fetch_status": pa.array(status_np, pa.int32()),
            "round": pa.array(np.full(n, round_no, np.int32()), pa.int32()),
            "n_tokens": pa.array(feat_cols["n_tokens"], pa.int32()),
            "quality": pa.array(feat_cols["quality"], pa.float64()),
            "simhash": pa.array(feat_cols["simhash"], pa.uint64()),
            "fingerprint": pa.array(feat_cols["fingerprint"], pa.uint64()),
            "minhash0": pa.array(feat_cols["minhash0"], pa.uint64()),
            "lang_pred": pa.array(feat_cols["lang_pred"], pa.string()),
        },
        schema=ROUND_OUT_SCHEMA,
    ) if n else None

    offer_refs = []
    if child_tbl is not None:
        ohi, olo = hash128(child_tbl["node_id"])
        phash, _ = hash128(child_tbl["parent_id"])
        child_tbl = child_tbl.append_column("phash", pa.array(phash, pa.uint64()))
        # task-identity salt for the shard replay guard (ADVICE r2):
        # identical on a Ray task retry, distinct across tasks (frontier
        # rows are round-unique winners, so two tasks' row sets differ)
        salt = offer_salt(khi)
        # every child row ships to its shard: the shard both resolves node
        # winners AND writes the round's edge partition (each row is a Lead
        # edge). Fired now, awaited at the end — overlaps actor processing
        # with output assembly; the round barrier stays correct because the
        # task doesn't finish until the refs resolve.
        offer_refs = router.offer(ohi, olo, child_tbl, salt)

    if _tr:
        _t = _trace_mark("assemble", _t)
    tables = []
    if parents_tbl is not None:
        tables.append(parents_tbl)
    # child rows do NOT go into round_out: they travel to the shards, which
    # write the nodes delta AND the round's edge partitions at the barrier.
    # round_out = parent lifecycle rows only (frontier-sized).

    if offer_refs:
        import ray

        ray.get(offer_refs)
    if _tr:
        _trace_mark("offer_wait", _t)
        _trace_flush(n)

    if not tables:
        return ROUND_OUT_SCHEMA.empty_table()
    return pa.concat_tables(tables)
