"""raycrawl — a Ray-Data-native rebuild of the bluedotiya/web_crawler engine.

A BFS frontier-expansion crawl pipeline over Parquet tables of
Common-Crawl-style web pages (``url, warc_ts, html, text, lang``), plus the
read-side aggregation queries of the reference manager API, plus the
large-scale training-data operators (dedup family, similarity search, text
analysis, multimodal plumbing) that a 100 TB corpus pipeline needs.

Reference semantics are documented per-operator against
``/root/reference`` file:line in each module's docstrings (see SURVEY.md §2).

Nothing in this package calls ``ray.init()`` — sessions are owned by the
driver / bench / test fixture.
"""

from raycrawl.kernels import extract_urls, normalize_url  # noqa: F401
from raycrawl.config import CrawlConfig  # noqa: F401

__all__ = ["extract_urls", "normalize_url", "CrawlConfig"]
