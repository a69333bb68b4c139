"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship demo on sf0.001 (+ the crawl itself on the tiny
synthetic corpus); ``queries()``/``oracle_sql()`` — one entry per operator
family from SURVEY.md §2 plus the training-data operators (dedup family,
similarity search, text analysis). The crawl-family queries (A1–A4, S5)
run over deterministic demo-crawl Parquet provisioned under /tmp (see
raycrawl/demo.py); their oracle SQL reads the same files via
``read_parquet``. Relational/text/embedding queries run directly over the
driver's pre-registered sf views.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in raycrawl) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_DEMO_READY = False


def _ensure_demo() -> None:
    global _DEMO_READY
    if not _DEMO_READY:
        from raycrawl.demo import ensure_demo_crawls

        ensure_demo_crawls()
        _DEMO_READY = True


def entry() -> Any:
    """Flagship: run a crawl on the synthetic corpus + summarize per-lang
    token stats of sf0.001 documents. Returns a stable-schema table."""
    from raycrawl import textops

    _ensure_demo()
    from raycrawl.demo import demo_ckpts
    from raycrawl.queries import crawl_stats, load_nodes

    stats = crawl_stats(load_nodes(demo_ckpts()), "demo0").to_pandas()
    tok = textops.token_stats_by_lang("/root/testdata/sf0.001").to_pandas()
    tok["crawl_total_urls"] = int(stats["total_urls"].iloc[0])
    return tok


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from raycrawl import ann, dedup, multimodal, relational, textops

    def _demo_nodes():
        _ensure_demo()
        from raycrawl.demo import demo_ckpts
        from raycrawl.queries import load_nodes

        return load_nodes(demo_ckpts())

    def _demo_edges():
        _ensure_demo()
        from raycrawl.demo import demo_ckpts
        from raycrawl.queries import load_edges

        return load_edges(demo_ckpts())

    def crawl_progress(_sf):
        from raycrawl.queries import crawl_progress as q

        return q(_demo_nodes(), "demo0")

    def crawl_list(_sf):
        from raycrawl.queries import list_crawls as q

        return q(_demo_nodes())

    def crawl_list_page(_sf):
        from raycrawl.queries import list_crawls as q

        return q(_demo_nodes(), limit=1, offset=1)

    def crawl_list_completed(_sf):
        from raycrawl.queries import list_crawls as q

        return q(_demo_nodes(), status_filter="completed")

    def crawl_stats(_sf):
        from raycrawl.queries import crawl_stats as q

        return q(_demo_nodes(), "demo0")

    def graph_nodes(_sf):
        from raycrawl.queries import graph_export_nodes as q

        return q(_demo_nodes(), "demo1")

    def graph_edges(_sf):
        from raycrawl.queries import graph_export_edges as q

        return q(_demo_edges(), "demo1")

    def nodes_by_depth(_sf):
        from raycrawl.queries import nodes_by_depth as q

        return q(_demo_nodes(), "demo0")

    def domain_rollup(_sf):
        from raycrawl.queries import domain_rollup as q

        return q(_demo_nodes(), "demo0")

    return {
        # --- crawl read-side (A1-A4, S5 — SURVEY §2.5, §2.1) ---
        "crawl_progress": crawl_progress,
        "crawl_list": crawl_list,
        "crawl_list_page": crawl_list_page,          # L2 pagination
        "crawl_list_completed": crawl_list_completed,  # A3 status filter
        "crawl_stats": crawl_stats,
        "graph_export_nodes": graph_nodes,
        "graph_export_edges": graph_edges,
        "crawl_nodes_by_depth": nodes_by_depth,
        "crawl_domain_rollup": domain_rollup,
        # --- relational operator coverage over sf views ---
        "q1_pricing_summary": relational.q1_pricing_summary,
        "revenue_by_nation": relational.revenue_by_nation,
        "top_customers_by_spend": relational.top_customers_by_spend,
        "order_lineitem_join_stats": relational.order_lineitem_join_stats,
        "events_hourly": relational.events_hourly,
        "top_users_by_value": relational.top_users_by_value,
        "parts_by_brand": relational.parts_by_brand,
        # --- text analysis over documents ---
        "token_stats_by_lang": textops.token_stats_by_lang,
        "lang_source_distribution": textops.lang_source_distribution,
        "quality_scores": textops.quality_scores,
        "langid": textops.langid,
        "doc_fingerprints": textops.fingerprints,
        # --- dedup family ---
        "exact_dedup_groups": dedup.exact_dedup_groups,
        "minhash_neardup_pairs": dedup.minhash_neardup_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "simhash_neardup_pairs": dedup.simhash_neardup_pairs,
        # --- multimodal plumbing (stubbed codec) ---
        "media_features": multimodal.media_features,       # rows-only (RNG body stats)
        "media_summary": multimodal.media_summary,
        # --- similarity search over embeddings ---
        "embedding_topk": ann.brute_force_topk,
        "embedding_similar_threshold": ann.similar_above_threshold,
        "embedding_lsh_topk": ann.lsh_topk,                # rows-only (approx)
        "embedding_neardup_pairs": dedup.embedding_neardup_pairs,
    }


# --------------------------------------------------------------------------
# oracle SQL
# --------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from raycrawl import ann, dedup, multimodal, relational, textops
    from raycrawl.demo import edges_glob, nodes_glob

    _ensure_demo()
    nodes = f"read_parquet('{nodes_glob()}')"
    edges = f"read_parquet('{edges_glob()}')"

    status_sums = """
           CAST(coalesce(sum(CASE WHEN u.status = 'COMPLETED' THEN 1 ELSE 0 END), 0) AS BIGINT) AS completed,
           CAST(coalesce(sum(CASE WHEN u.status = 'PENDING' THEN 1 ELSE 0 END), 0) AS BIGINT) AS pending,
           CAST(coalesce(sum(CASE WHEN u.status = 'IN-PROGRESS' THEN 1 ELSE 0 END), 0) AS BIGINT) AS in_progress,
           CAST(coalesce(sum(CASE WHEN u.status = 'FAILED' THEN 1 ELSE 0 END), 0) AS BIGINT) AS failed,
           CAST(coalesce(sum(CASE WHEN u.status = 'CANCELLED' THEN 1 ELSE 0 END), 0) AS BIGINT) AS cancelled
    """

    crawl_progress = f"""
    WITH u AS (SELECT * FROM {nodes} WHERE node_type = 'URL' AND crawl_id = 'demo0'),
         r AS (SELECT * FROM {nodes} WHERE node_type = 'ROOT' AND crawl_id = 'demo0'),
         c AS (SELECT CAST(count(*) AS BIGINT) AS total, {status_sums} FROM u)
    SELECT 'demo0' AS crawl_id,
           CASE WHEN c.pending = 0 AND c.in_progress = 0 THEN
             CASE WHEN c.cancelled > 0 AND c.completed = 0 THEN 'cancelled' ELSE 'completed' END
           ELSE 'running' END AS status,
           c.total, c.completed, c.pending, c.in_progress, c.failed, c.cancelled,
           r.http_type || r.name AS root_url,
           CAST(r.requested_depth AS BIGINT) AS requested_depth
    FROM c, r
    """

    crawl_list = f"""
    WITH u AS (SELECT crawl_id, status FROM {nodes} WHERE node_type = 'URL'),
         r AS (SELECT crawl_id, http_type || name AS root_url,
                      CAST(requested_depth AS BIGINT) AS requested_depth
               FROM {nodes} WHERE node_type = 'ROOT'),
         c AS (SELECT r.crawl_id, r.root_url, r.requested_depth,
                      CAST(count(u.status) AS BIGINT) AS total, {status_sums}
               FROM r LEFT JOIN u ON r.crawl_id = u.crawl_id
               GROUP BY r.crawl_id, r.root_url, r.requested_depth),
         d AS (SELECT *,
                      CASE WHEN pending = 0 AND in_progress = 0 THEN
                        CASE WHEN cancelled > 0 AND completed = 0 THEN 'cancelled' ELSE 'completed' END
                      ELSE 'running' END AS status
               FROM c)
    SELECT crawl_id, root_url, requested_depth, status, total, completed,
           failed, cancelled, CAST(count(*) OVER () AS BIGINT) AS total_count
    FROM d ORDER BY crawl_id LIMIT 20 OFFSET 0
    """

    crawl_list_page = crawl_list.replace("LIMIT 20 OFFSET 0", "LIMIT 1 OFFSET 1")
    # filtered variant: total_count counts the FILTERED set (matches the
    # reference's filtered Cypher, crawl_service.rs:150-160)
    crawl_list_completed = f"""
    WITH u AS (SELECT crawl_id, status FROM {nodes} WHERE node_type = 'URL'),
         r AS (SELECT crawl_id, http_type || name AS root_url,
                      CAST(requested_depth AS BIGINT) AS requested_depth
               FROM {nodes} WHERE node_type = 'ROOT'),
         c AS (SELECT r.crawl_id, r.root_url, r.requested_depth,
                      CAST(count(u.status) AS BIGINT) AS total, {status_sums}
               FROM r LEFT JOIN u ON r.crawl_id = u.crawl_id
               GROUP BY r.crawl_id, r.root_url, r.requested_depth),
         d AS (SELECT *,
                      CASE WHEN pending = 0 AND in_progress = 0 THEN
                        CASE WHEN cancelled > 0 AND completed = 0 THEN 'cancelled' ELSE 'completed' END
                      ELSE 'running' END AS status
               FROM c),
         flt AS (SELECT * FROM d WHERE status = 'completed')
    SELECT crawl_id, root_url, requested_depth, status, total, completed,
           failed, cancelled, CAST(count(*) OVER () AS BIGINT) AS total_count
    FROM flt ORDER BY crawl_id LIMIT 20 OFFSET 0
    """

    crawl_stats = f"""
    WITH u AS (SELECT * FROM {nodes} WHERE node_type = 'URL' AND crawl_id = 'demo0'),
         c AS (SELECT CAST(count(*) AS BIGINT) AS total_urls,
                      CAST(count(DISTINCT domain) AS BIGINT) AS unique_domains,
                      CAST(coalesce(max(depth), 0) AS BIGINT) AS max_depth_reached,
                      {status_sums}
               FROM u)
    SELECT 'demo0' AS crawl_id, total_urls, unique_domains, max_depth_reached,
           pending, in_progress, completed, failed, cancelled
    FROM c
    """

    graph_export_nodes = f"""
    SELECT node_id AS id, name AS label, domain, depth,
           CASE WHEN node_type = 'ROOT' THEN 'root' ELSE status END AS status,
           node_type
    FROM {nodes} WHERE crawl_id = 'demo1'
    """

    graph_export_edges = f"""
    SELECT src AS source, dst AS target FROM {edges} WHERE crawl_id = 'demo1'
    """

    nodes_by_depth = f"""
    SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes
    FROM {nodes} WHERE node_type = 'URL' AND crawl_id = 'demo0'
    GROUP BY depth ORDER BY depth
    """

    domain_rollup = f"""
    SELECT domain, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN status = 'COMPLETED' THEN 1 ELSE 0 END) AS BIGINT) AS n_completed
    FROM {nodes} WHERE node_type = 'URL' AND crawl_id = 'demo0'
    GROUP BY domain ORDER BY domain
    """

    return {
        "crawl_progress": crawl_progress,
        "crawl_list": crawl_list,
        "crawl_list_page": crawl_list_page,          # L2 pagination
        "crawl_list_completed": crawl_list_completed,  # A3 status filter
        "crawl_stats": crawl_stats,
        "graph_export_nodes": graph_export_nodes,
        "graph_export_edges": graph_export_edges,
        "crawl_nodes_by_depth": nodes_by_depth,
        "crawl_domain_rollup": domain_rollup,
        "q1_pricing_summary": relational.q1_oracle_sql(),
        "revenue_by_nation": relational.revenue_by_nation_sql(),
        "top_customers_by_spend": relational.top_customers_sql(),
        "order_lineitem_join_stats": relational.order_lineitem_join_sql(),
        "events_hourly": relational.events_hourly_sql(),
        "top_users_by_value": relational.top_users_sql(),
        "parts_by_brand": relational.parts_by_brand_sql(),
        "token_stats_by_lang": textops.token_stats_by_lang_sql(),
        "lang_source_distribution": textops.lang_source_distribution_sql(),
        "quality_scores": textops.quality_scores_sql(),
        "langid": textops.langid_sql(),
        "doc_fingerprints": textops.fingerprints_sql(),
        "exact_dedup_groups": dedup.exact_dedup_sql(),
        "minhash_neardup_pairs": dedup.minhash_neardup_sql(),
        "ngram_jaccard_pairs": dedup.ngram_jaccard_sql(),
        "simhash_neardup_pairs": dedup.simhash_neardup_sql(),
        "media_summary": multimodal.media_summary_sql(),
        "embedding_topk": ann.brute_force_topk_sql(),
        "embedding_similar_threshold": ann.similar_above_threshold_sql(),
        "embedding_neardup_pairs": dedup.embedding_neardup_sql(),
        # rows-only (non-SQL-expressible by nature): media_features
        # (channel stats over RNG-seeded payload bodies) and
        # embedding_lsh_topk (approximate — recall measured in pytest
        # against the oracled brute-force baseline instead)
    }
