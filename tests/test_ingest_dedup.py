"""Ingestion-time near-dup detection wired into the crawl loop
(raycrawl.ingest_dedup + CrawlConfig.neardup_threshold): oracle equality
on a planted-mirror corpus, both candidate paths (same-round bucket +
cross-round persisted index), forced Dataset-round path, resume guard,
idempotent resume, and the nodes-table column merge."""

import os
import shutil

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

CORPUS = "/tmp/raycrawl_test_mirror_corpus"
CK = "/tmp/raycrawl_test_nd_ck"


def _corpus():
    from raycrawl.corpus import generate_corpus

    return generate_corpus(CORPUS, n_hosts=120, seed=77, mirror_frac=0.15,
                           n_seeds=1)


def _seed(c):
    return pq.read_table(os.path.join(c, "seeds.parquet")).to_pylist()[0]


def _run(ck, threshold=0.6, **cfg_kw):
    from raycrawl.config import CrawlConfig
    from raycrawl.crawl import crawl

    c = _corpus()
    s = _seed(c)
    return crawl(c, s["url"], 3, ck,
                 cfg=CrawlConfig(num_seen_shards=2, fetch_concurrency=2,
                                 neardup_threshold=threshold, **cfg_kw),
                 crawl_id="ndtest", resume=True)


@pytest.fixture(scope="module")
def nd_crawl(ray_session):
    shutil.rmtree(CK, ignore_errors=True)
    _run(CK)
    return CK


def _oracle_df(ck):
    from raycrawl.ingest_dedup import crawl_neardup_sql

    sql = crawl_neardup_sql(os.path.join(ck, "final", "nodes", "*.parquet"),
                            os.path.join(CORPUS, "pages.parquet"),
                            "ndtest", 0.6)
    return duckdb.connect().execute(sql).df()


def test_ingest_dedup_matches_oracle(nd_crawl):
    from raycrawl.ingest_dedup import crawl_neardup

    got = crawl_neardup(nd_crawl).to_pandas()
    ora = _oracle_df(nd_crawl)
    assert len(got) > 0, "planted mirrors must produce assignments"
    a = got.sort_values("node_id").reset_index(drop=True)
    b = ora.sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_ingest_dedup_covers_both_candidate_paths(nd_crawl):
    """The fixture plants hub-linked mirrors (source and copy fetched in
    the SAME round → in-round bucket path) and chained mirrors (copy
    linked from its source → fetched one round later → persisted-index
    path); both must appear in the assignments."""
    import pyarrow.dataset as pads

    from raycrawl.ingest_dedup import crawl_neardup

    got = crawl_neardup(nd_crawl).to_pandas()
    nodes = pads.dataset(
        os.path.join(nd_crawl, "final", "nodes")).to_table(
        columns=["node_id", "round", "attempts", "node_type"]).to_pandas()
    nodes = nodes[nodes.node_type == "URL"]
    probe_round = dict(zip(nodes.node_id, nodes["round"] + nodes.attempts))
    same = sum(probe_round[r.node_id] == probe_round[r.near_dup_of]
               for r in got.itertuples())
    cross = sum(probe_round[r.node_id] != probe_round[r.near_dup_of]
                for r in got.itertuples())
    assert same > 0, "no same-round (in-batch bucket) duplicate found"
    assert cross > 0, "no cross-round (persisted index) duplicate found"


def test_forced_ray_shingle_path_matches(nd_crawl, tmp_path, monkeypatch):
    """SHINGLE_RAY_GATE=0 forces the round's shingle/band computation
    through the parallel map_batches stage — identical assignments."""
    from raycrawl import ingest_dedup
    from raycrawl.ingest_dedup import crawl_neardup

    monkeypatch.setattr(ingest_dedup, "SHINGLE_RAY_GATE", 0)
    ck2 = str(tmp_path / "nd_ray_sh")
    _run(ck2)
    a = crawl_neardup(nd_crawl).to_pandas()
    b = crawl_neardup(ck2).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_forced_parallel_verify_path_matches(nd_crawl, tmp_path, monkeypatch):
    """_VERIFY_RAY_GATE=0 forces every prefilter/verify slice through the
    Ray-task path (plasma-shared arrays) — identical assignments."""
    from raycrawl import ingest_dedup
    from raycrawl.ingest_dedup import crawl_neardup

    monkeypatch.setattr(ingest_dedup, "_VERIFY_RAY_GATE", 0)
    ck2 = str(tmp_path / "nd_ray_vf")
    _run(ck2)
    a = crawl_neardup(nd_crawl).to_pandas()
    b = crawl_neardup(ck2).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_forced_dataset_round_path_matches(nd_crawl, tmp_path):
    """small_round_threshold=0 forces every round through the _run_round
    Dataset path — its neardup hook must produce identical assignments."""
    from raycrawl.ingest_dedup import crawl_neardup

    ck2 = str(tmp_path / "nd_ds")
    _run(ck2, small_round_threshold=0)
    a = crawl_neardup(nd_crawl).to_pandas()
    b = crawl_neardup(ck2).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_resume_guard_refuses_late_enable(ray_session, tmp_path):
    """A crawl started WITHOUT ingestion dedup has no index shards; a
    resume that turns it on must refuse instead of silently missing every
    cross-round duplicate."""
    from raycrawl.config import CrawlConfig
    from raycrawl.crawl import crawl

    c = _corpus()
    s = _seed(c)
    ck = str(tmp_path / "plain_ck")
    crawl(c, s["url"], 2, ck,
          cfg=CrawlConfig(num_seen_shards=2, fetch_concurrency=2),
          crawl_id="plain", resume=False)
    with pytest.raises(ValueError, match="ndx"):
        crawl(c, s["url"], 2, ck,
              cfg=CrawlConfig(num_seen_shards=2, fetch_concurrency=2,
                              neardup_threshold=0.6),
              crawl_id="plain", resume=True)


def test_neardup_resume_rebuilds_killed_round(nd_crawl, tmp_path):
    """Kill/resume: dropping the last round (index shard included, since
    it lives inside the round dir) and resuming reproduces the exact
    assignment set."""
    from raycrawl.crawl import _round_dir
    from raycrawl.ingest_dedup import crawl_neardup

    ck2 = str(tmp_path / "nd_resume")
    shutil.copytree(nd_crawl, ck2)
    before = crawl_neardup(ck2).to_pandas()
    r = 1
    while os.path.exists(os.path.join(_round_dir(ck2, r + 1), "_DONE")):
        r += 1
    shutil.rmtree(_round_dir(ck2, r))
    shutil.rmtree(os.path.join(ck2, "final"))
    _run(ck2)
    after = crawl_neardup(ck2).to_pandas()
    pd.testing.assert_frame_equal(before, after, check_dtype=False,
                                  check_exact=True)


def test_nodes_with_neardup_column_merge(nd_crawl):
    from raycrawl.ingest_dedup import crawl_neardup, nodes_with_neardup

    nd = crawl_neardup(nd_crawl).to_pandas()
    merged = nodes_with_neardup(nd_crawl).to_pandas()
    assert {"near_dup_of", "dup_jaccard"} <= set(merged.columns)
    hit = merged[merged.near_dup_of.notna()]
    assert sorted(hit.node_id) == sorted(nd.node_id)
    m = hit.set_index("node_id")
    for r in nd.itertuples():
        assert m.loc[r.node_id, "near_dup_of"] == r.near_dup_of
        assert m.loc[r.node_id, "dup_jaccard"] == r.jaccard
    assert merged[~merged.node_id.isin(nd.node_id)].near_dup_of.isna().all()


def test_cli_crawl_neardup_flag(ray_session, nd_crawl, tmp_path, capsys):
    """`python -m raycrawl crawl --neardup J` wires the ingestion-dedup
    stage into the job CLI and reports the assignment count; the run must
    match the library-driven crawl's assignment set exactly."""
    import json

    from raycrawl.__main__ import main
    from raycrawl.ingest_dedup import crawl_neardup

    c = _corpus()
    s = _seed(c)
    ck2 = str(tmp_path / "cli_nd")
    rc = main(["crawl", "--corpus", c, "--seed", s["url"], "--depth", "3",
               "--ckpt", ck2, "--crawl-id", "ndtest", "--seen-shards", "2",
               "--neardup", "0.6"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    a = crawl_neardup(nd_crawl).to_pandas()
    b = crawl_neardup(ck2).to_pandas()
    assert summary["near_dups"] == len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_forced_gram_budget_slicing_matches(nd_crawl, tmp_path, monkeypatch):
    """A tiny _GRAM_BUDGET forces every exact-verify through many
    gram-bounded sub-slices — identical assignments."""
    from raycrawl import ingest_dedup
    from raycrawl.ingest_dedup import crawl_neardup

    monkeypatch.setattr(ingest_dedup, "_GRAM_BUDGET", 64)
    ck2 = str(tmp_path / "nd_gb")
    _run(ck2)
    a = crawl_neardup(nd_crawl).to_pandas()
    b = crawl_neardup(ck2).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_forced_multiblock_shingle_order(nd_crawl, tmp_path, monkeypatch):
    """SHINGLE_RAY_GATE=0 with a tiny block size forces the round's
    shingle stage through MANY Ray blocks, and a per-block sleep keyed to
    the first node_id inverts their completion order (verified to
    misorder ``to_arrow_refs``) — the pid-keyed reorder must make
    assignments identical regardless (regression: at bench scale,
    unordered blocks silently paired stored shingles with the wrong
    pages and 92% of planted mirrors were missed)."""
    from raycrawl import ingest_dedup
    from raycrawl.ingest_dedup import crawl_neardup

    orig = ingest_dedup._shingle_band_batch

    def jittered(t, corpus_ref, k):
        import time

        time.sleep(0.1 * (hash(t["node_id"][0].as_py()) % 3))
        return orig(t, corpus_ref, k)

    monkeypatch.setattr(ingest_dedup, "SHINGLE_RAY_GATE", 0)
    monkeypatch.setattr(ingest_dedup, "_SHINGLE_BLOCK_MIN", 8)
    monkeypatch.setattr(ingest_dedup, "_shingle_band_batch", jittered)
    ck2 = str(tmp_path / "nd_mb")
    _run(ck2)
    a = crawl_neardup(nd_crawl).to_pandas()
    b = crawl_neardup(ck2).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
