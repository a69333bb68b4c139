"""Deduplication family over the ``documents`` table: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Physical shapes (ray_guide 'Aggregation at scale'):
- exact: vectorized content-hash column → ``groupby(hash)`` keep-first;
- MinHash: per-batch signature computation (numpy, one matmul-free pass) →
  explode to (band_id, band_hash, doc_id) rows → ``groupby(band)`` buckets →
  candidate pairs → exact-Jaccard verify (only on candidates);
- SimHash: 64-bit signature, bucket by 4×16-bit sub-bands (any hamming≤3
  pair shares ≥1 band) → verify hamming;
- embedding near-dup: normalized vectors, per-bucket brute-force cosine.

All candidate generation is shuffle-by-bucket; the quadratic work only ever
happens inside a bucket.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raycrawl.kernels import hash64_int

_MERSENNE = np.uint64((1 << 61) - 1)
N_PERM = 64
N_BANDS = 16          # 4 rows per band
ROWS_PER_BAND = N_PERM // N_BANDS

_rng = np.random.default_rng(0xC0FFEE)
_PERM_A = _rng.integers(1, (1 << 61) - 1, size=N_PERM, dtype=np.uint64)
_PERM_B = _rng.integers(0, (1 << 61) - 1, size=N_PERM, dtype=np.uint64)


def _t(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# exact dedup (SQL-checkable: md5 both sides)
# ---------------------------------------------------------------------------

def add_md5_batch(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    h = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
    return pa.table({"doc_id": t["doc_id"], "text_md5": pa.array(h, pa.string())})


def exact_dedup_groups(sf_dir: str) -> pa.Table:
    """One row per distinct text: (text_md5, keeper_doc_id=min, n_copies).
    Hash-partitioned groupby = the distributed 'keep first' dedup."""
    from ray.data.aggregate import Count, Min

    agg = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(add_md5_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="keeper_doc_id"),
                   Count(alias_name="n_copies"))
    )
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return t.set_column(
        t.schema.get_field_index("n_copies"), "n_copies", t["n_copies"].cast(pa.int64())
    )


def exact_dedup_sql() -> str:
    return """
    SELECT md5(text) AS text_md5, min(doc_id) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64, deduped)."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.unique(
        np.fromiter((hash64_int(g) for g in grams), np.uint64, len(grams))
    )


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """(N_PERM,) uint64 signature: min over (a*h+b mod 2^61-1) per perm."""
    if len(shingles) == 0:
        return np.full(N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    with np.errstate(over="ignore"):
        v = (shingles[None, :] * _PERM_A[:, None] + _PERM_B[:, None]) % _MERSENNE
    return v.min(axis=1)


def minhash_bands_batch(t: pa.Table) -> pa.Table:
    """documents → exploded (band_id, band_hash, doc_id) rows for the LSH
    bucket groupby."""
    texts = t["text"].to_pylist()
    ids = t["doc_id"].to_pylist()
    out_doc, out_band, out_hash = [], [], []
    for doc_id, s in zip(ids, texts):
        sig = minhash_signature(shingle_set(s))
        for b in range(N_BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            out_doc.append(doc_id)
            out_band.append(b)
            out_hash.append(hash64_int(chunk.tobytes().hex()))
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(np.array(out_hash, dtype=np.uint64)),
            "doc_id": pa.array(out_doc, pa.int64()),
        }
    )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Within one (band_id, band_hash) bucket: all candidate doc pairs."""
    ids = sorted(set(g["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"a": a, "b": b})


def jaccard(s1: np.ndarray, s2: np.ndarray) -> float:
    if len(s1) == 0 and len(s2) == 0:
        return 1.0
    inter = len(np.intersect1d(s1, s2, assume_unique=True))
    return inter / (len(s1) + len(s2) - inter)


def minhash_neardup_pairs(sf_dir: str, threshold: float = 0.6) -> pa.Table:
    """MinHash-LSH candidate pairs verified with exact Jaccard ≥ threshold.
    Returns (a, b, jaccard) sorted; a < b. Candidates only ever compare
    within an LSH bucket; verification re-reads only candidate docs' texts
    (broadcast of the candidate id set)."""
    import ray

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    bands = docs.map_batches(minhash_bands_batch, batch_format="pyarrow")
    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if len(cand) == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    need = set(cand["a"]) | set(cand["b"])
    need_ref = ray.put(need)

    def texts_of(t: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        mask = pa.array([i in want for i in t["doc_id"].to_pylist()])
        return t.filter(mask)

    texts = docs.map_batches(texts_of, batch_format="pyarrow").to_pandas()
    sh = {r.doc_id: shingle_set(r.text) for r in texts.itertuples()}
    jac = np.array([jaccard(sh[a], sh[b]) for a, b in zip(cand["a"], cand["b"])])
    keep = jac >= threshold
    out = pd.DataFrame(
        {"a": cand["a"][keep], "b": cand["b"][keep], "jaccard": jac[keep]}
    ).sort_values(["a", "b"])
    return pa.Table.from_pandas(out, preserve_index=False)


def ngram_jaccard_pairs_exact(sf_dir: str, threshold: float = 0.6,
                              limit_docs: int | None = None) -> pa.Table:
    """Brute-force exact n-gram Jaccard pairs (the oracle for MinHash; only
    for small inputs — quadratic by construction)."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    if limit_docs:
        docs = docs.iloc[:limit_docs]
    sh = {r.doc_id: shingle_set(r.text) for r in docs.itertuples()}
    ids = sorted(sh)
    a, b, j = [], [], []
    for i in range(len(ids)):
        for k in range(i + 1, len(ids)):
            v = jaccard(sh[ids[i]], sh[ids[k]])
            if v >= threshold:
                a.append(ids[i])
                b.append(ids[k])
                j.append(v)
    return pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
         "jaccard": pa.array(j, pa.float64())}
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over word-token hashes."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = hash64_int(tok)
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def simhash_batch(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    hs = np.fromiter((simhash64(s) for s in texts), np.uint64, len(texts))
    return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(hs)})


def simhashes(sf_dir: str):
    return _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


def simhash_neardup_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via 4×16-bit band
    bucketing (pigeonhole: ≤3 differing bits leave ≥1 of 4 bands equal)."""
    sigs = simhashes(sf_dir)

    def bands(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy()
        ids = t["doc_id"].to_numpy()
        rows_doc, rows_band, rows_val, rows_sig = [], [], [], []
        for b in range(4):
            part = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            rows_doc.extend(ids)
            rows_band.extend([b] * len(ids))
            rows_val.extend(part)
            rows_sig.extend(h)
        return pa.table(
            {
                "band_id": pa.array(rows_band, pa.int32()),
                "band_val": pa.array(np.array(rows_val, dtype=np.uint64)),
                "doc_id": pa.array(rows_doc, pa.int64()),
                "simhash": pa.array(np.array(rows_sig, dtype=np.uint64)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["doc_id"], g["simhash"])))
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pd.DataFrame({"a": a, "b": b, "hamming": d})

    pairs = (
        sigs.map_batches(bands, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(subset=["a", "b"])
        .sort_values(["a", "b"])
    )
    return pa.Table.from_pandas(pairs, preserve_index=False)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """Pairs with cosine ≥ threshold. Small side (the full normalized
    matrix) broadcast once; per-batch matmul against it; i<j dedup."""
    import ray

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    ids = emb["vec_id"].to_numpy()
    m = np.stack(emb["embedding"].to_numpy())
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, m.astype(np.float32)))

    def pairs_batch(t: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        bids = t["vec_id"].to_numpy()
        bm = np.stack(t["embedding"].to_pylist()).astype(np.float32)
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ all_m.T
        bi, aj = np.nonzero(sims >= threshold)
        a = bids[bi]
        b = all_ids[aj]
        keep = a < b  # dedup + drop self
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(np.round(sims[bi, aj][keep].astype(np.float64), 6)),
            }
        )

    out = (
        _t(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(pairs_batch, batch_format="pyarrow")
        .to_pandas()
    )
    if len(out) == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = out.sort_values(["a", "b"])
    return pa.Table.from_pandas(out, preserve_index=False)
