"""M10 HTTP-status error surface + L3 existence probes — the manager's
``crawler_error_to_status`` mapping (manager/src/routes/crawl.rs:14-26)
and 404-on-unknown-crawl behavior (graph_service.rs:15-21)."""

import os

import pyarrow.parquet as pq
import pytest

from raycrawl import errors


def test_http_status_mapping_mirrors_manager():
    # crawl.rs:14-26
    assert errors.FetchTimeout("t").http_status == 504
    assert errors.FetchNotFound("t").http_status == 404
    assert errors.FetchFailed("t").http_status == 502
    assert errors.StateError("t").http_status == 500
    # route-level: crawl.rs:28-42 / graph_service.rs:15-21
    assert errors.InvalidDepth("t").http_status == 400
    assert errors.CrawlNotFound("t").http_status == 404
    assert errors.http_status_for(RuntimeError("x")) == 500
    assert errors.http_status_for(errors.FetchTimeout("t")) == 504


def test_fetch_error_classifier():
    assert isinstance(errors.fetch_error(404, "u"), errors.FetchNotFound)
    assert isinstance(errors.fetch_error(408, "u"), errors.FetchTimeout)
    assert isinstance(errors.fetch_error(503, "u"), errors.FetchFailed)
    assert isinstance(errors.fetch_error(500, "u"), errors.FetchFailed)


def test_invalid_depth_is_valueerror_and_400(tiny_corpus, tmp_path):
    """M9 depth validation raises the typed 400 error (still a ValueError
    for legacy callers). No Ray needed — validation precedes execution."""
    from raycrawl.crawl import crawl

    seeds = pq.read_table(os.path.join(tiny_corpus, "seeds.parquet")).to_pylist()
    with pytest.raises(errors.InvalidDepth) as ei:
        crawl(tiny_corpus, seeds[0]["url"], 6, str(tmp_path / "ck"),
              crawl_id="t", resume=False)
    assert isinstance(ei.value, ValueError)
    assert errors.http_status_for(ei.value) == 400


@pytest.mark.usefixtures("ray_session")
def test_unknown_crawl_404_probe(tiny_corpus, tmp_path):
    """Strict queries 404 unknown crawl ids (the manager's existence
    probe); non-strict keeps the empty-table contract."""
    from raycrawl.config import CrawlConfig
    from raycrawl.crawl import crawl
    from raycrawl.queries import (crawl_progress, crawl_stats,
                                  graph_export_nodes, load_nodes)

    s = pq.read_table(os.path.join(tiny_corpus, "seeds.parquet")).to_pylist()[0]
    ck = str(tmp_path / "ck")
    crawl(tiny_corpus, s["url"], 1, ck, crawl_id="probe",
          cfg=CrawlConfig(num_seen_shards=2), resume=False)
    nodes = load_nodes(ck)

    assert crawl_progress(nodes, "probe", strict=True).num_rows == 1
    with pytest.raises(errors.CrawlNotFound):
        crawl_progress(nodes, "nope", strict=True)
    with pytest.raises(errors.CrawlNotFound):
        crawl_stats(nodes, "nope", strict=True)
    with pytest.raises(errors.CrawlNotFound):
        graph_export_nodes(nodes, "nope", strict=True)
    # legacy non-strict: empty result, no raise
    assert crawl_progress(nodes, "nope").num_rows == 0


def test_permanent_failure_constants_match_predicate():
    """frontier's vectorized 4xx mask derives from sim's range constants;
    pin them to the scalar predicate over the whole status domain."""
    import numpy as np

    from raycrawl import sim

    statuses = np.arange(0, 700)
    mask = (statuses >= sim.PERMANENT_FAILURE_LO) & \
           (statuses < sim.PERMANENT_FAILURE_HI)
    assert mask.tolist() == [sim.is_permanent_failure(int(s)) for s in statuses]
