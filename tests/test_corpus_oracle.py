"""Corpus ground-truth validation + oracle BFS sanity.

The corpus generator records what the reference regex *should* capture,
derived analytically from its rendering rules; here we check our kernel
agrees on every page (byte-identical, in order) — the per-row invariant from
BASELINE.json.input_hint.
"""

import os

import pyarrow.parquet as pq
import pytest

from raycrawl import sim
from raycrawl.kernels import decode_html, extract_urls, normalize_url
from raycrawl.oracle import CrawlFailed, oracle_crawl


def test_extraction_matches_analytic_captures(tiny_corpus):
    pages = pq.read_table(os.path.join(tiny_corpus, "pages.parquet"))
    caps = pq.read_table(os.path.join(tiny_corpus, "captures.parquet"))
    expected = dict(zip(caps["src_url"].to_pylist(), caps["captures"].to_pylist()))
    for url, html in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        assert extract_urls(decode_html(html)) == expected[url], url


def test_text_column_matches_tag_strip(tiny_corpus):
    import re

    tag = re.compile(r"<[^>]+>")
    pages = pq.read_table(os.path.join(tiny_corpus, "pages.parquet"))
    for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert tag.sub("", decode_html(html)) == text


def test_seeds_are_crawlable(tiny_corpus):
    seeds = pq.read_table(os.path.join(tiny_corpus, "seeds.parquet"))
    assert seeds.num_rows >= 2
    for url, depth in zip(seeds["url"].to_pylist(), seeds["depth"].to_pylist()):
        res = oracle_crawl(tiny_corpus, url, int(depth))
        assert len(res.nodes) > 0
        assert res.root.status == "root"


def test_oracle_depth1_all_completed(tiny_corpus):
    seeds = pq.read_table(os.path.join(tiny_corpus, "seeds.parquet"))
    url = seeds["url"][0].as_py()
    res = oracle_crawl(tiny_corpus, url, 1)
    assert res.rounds_run == 0
    counts = res.status_counts()
    # depth-1 children are born COMPLETED (job leaf rule, crawl_service.rs:47)
    assert counts["PENDING"] == 0 and counts["COMPLETED"] == len(res.nodes)


def test_oracle_terminal_statuses(tiny_corpus):
    seeds = pq.read_table(os.path.join(tiny_corpus, "seeds.parquet"))
    url = seeds["url"][0].as_py()
    res = oracle_crawl(tiny_corpus, url, 3)
    counts = res.status_counts()
    assert counts["PENDING"] == 0 and counts["IN-PROGRESS"] == 0
    assert counts["COMPLETED"] > 0
    # edges reference existing node ids or the root id
    ids = {p + n for (n, p) in res.nodes} | {res.root.http_type + res.root.name}
    for src, dst in res.edges:
        assert src in ids and dst in ids
    # depths within bounds; min-depth property: every node at depth k>1 has
    # an in-edge from some node at depth k-1 (BFS reachability)
    depth_of = {p + n: node.depth for (n, p), node in res.nodes.items()}
    depth_of[res.root.http_type + res.root.name] = 0
    for (n, p), node in res.nodes.items():
        assert 1 <= node.depth <= 3
        parents = [depth_of[s] for (s, d) in res.edges if d == p + n and s in depth_of]
        assert parents and min(parents) == node.depth - 1


def test_oracle_cancellation(tiny_corpus):
    seeds = pq.read_table(os.path.join(tiny_corpus, "seeds.parquet"))
    for url, depth in zip(seeds["url"].to_pylist(), seeds["depth"].to_pylist()):
        res = oracle_crawl(tiny_corpus, url, int(depth), cancel_after_round=1)
        counts = res.status_counts()
        assert counts["PENDING"] == 0
        if res.rounds_run >= 1 and counts["CANCELLED"] == 0:
            continue  # crawl may have finished in one round
        assert counts["CANCELLED"] >= 0


def test_oracle_depth_validation(tiny_corpus):
    with pytest.raises(ValueError):
        oracle_crawl(tiny_corpus, "https://site1.com", 0)
    with pytest.raises(ValueError):
        oracle_crawl(tiny_corpus, "https://site1.com", 6)


def test_root_fetch_failure_raises(tiny_corpus):
    # A URL not in the corpus → 404 at the root → the crawl is rejected
    # (routes/crawl.rs:48-55).
    with pytest.raises(CrawlFailed):
        oracle_crawl(tiny_corpus, "https://no-such-host-anywhere.zz", 2)


def test_fetch_sim_flaky_then_ok():
    # find a flaky class name deterministically
    name, proto = normalize_url("https://site3.com")
    s1 = sim.fetch_status(name, proto, 1, True)
    s2 = sim.fetch_status(name, proto, 2, True)
    assert s1 in (200, 503) and s2 in (200, 503)
    if s1 == 503 and sim.outcome_class(name, proto) == 3:
        assert s2 == 200


def test_fast_corpus_high_entropy_mirrors(tmp_path):
    """generate_corpus_fast(filler_vocab=..., mirror_frac=...): planted
    adjacent-page mirrors are exact 3-gram near-dups (j >> 0.6) while
    non-mirror neighbors stay far apart (the realistic-entropy regime
    for the ingestion-dedup stage), and the planted truth is
    recomputable from (seed, i) alone."""
    import numpy as np

    from raycrawl.corpus import fast_mirror_flags, generate_corpus_fast

    out = generate_corpus_fast(str(tmp_path / "hv"), n_hosts=6_000, seed=11,
                               filler_vocab=4_096, mirror_frac=0.01,
                               chunk_pages=2_000)
    tx = pq.read_table(os.path.join(out, "pages.parquet"),
                       columns=["text"])["text"].to_pylist()
    flags = fast_mirror_flags(11, 0, 6_000, 0.01, 2_000)
    planted = np.flatnonzero(flags)
    assert len(planted) > 10
    assert not flags[0]
    assert not (flags[:-1] & flags[1:]).any(), "two mirrors in a row"
    assert not flags[::2_000].any(), "chunk-first page flagged"

    def grams(s, k=3):
        t = s.split()
        return {" ".join(t[i:i + k]) for i in range(max(1, len(t) - k + 1))}

    js = []
    for i in planted[:30]:
        a, b = grams(tx[i]), grams(tx[i - 1])
        js.append(len(a & b) / len(a | b))
    assert min(js) > 0.8, min(js)
    ctrl = [
        len(grams(tx[i]) & grams(tx[i + 1]))
        / max(1, len(grams(tx[i]) | grams(tx[i + 1])))
        for i in range(200, 240) if not flags[i] and not flags[i + 1]
    ]
    assert max(ctrl) < 0.3, max(ctrl)
    # window-independence of the planted truth
    w = fast_mirror_flags(11, 2_500, 3_500, 0.01, 2_000)
    assert (w == flags[2_500:3_500]).all()
