"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here may call ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship crawl pipeline (seeds → frontier → corpus-backed
  fetch → parse → posts) over a deterministic synthetic pages corpus
  sized for sf0.001; returns the posts Dataset.
- ``queries()``: one callable per implemented operator (SURVEY.md §2),
  each taking ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for the SQL-expressible subset.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import ray.data

SMOKE_PAGES = 1_000
SMOKE_HOSTS = 16

_TMP_ROOT = os.path.join(tempfile.gettempdir(), "grc_corpus")


def entry() -> Any:
    """Flagship crawl on a deterministic sf0.001-scale corpus."""
    from game_review_crawler_ray.config import CrawlConfig
    from game_review_crawler_ray.pipelines.crawl import run_crawl
    from game_review_crawler_ray.sources.corpus import gen_pages
    from game_review_crawler_ray.sources.seeds import gen_seeds

    pages, _expected = gen_pages(SMOKE_PAGES, SMOKE_HOSTS, seed=42)
    seeds = gen_seeds(pages.column("url").to_pylist(), seed=42)
    out = tempfile.mkdtemp(prefix="grc_entry_", dir=tempfile.gettempdir())
    cfg = CrawlConfig(num_frontier_shards=4, fetch_concurrency=2)
    res = run_crawl(pages, seeds, out, cfg)
    return ray.data.read_parquet(res["posts_dir"])


def queries() -> dict[str, Callable[[str], Any]]:
    from game_review_crawler_ray.pipelines import (
        analytics, dashboard, filters, issues, textops,
    )

    out: dict[str, Callable[[str], Any]] = {}
    out.update(analytics.QUERIES)
    out.update(textops.QUERIES)
    out.update(issues.QUERIES)
    out.update(filters.QUERIES)
    out.update(dashboard.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from game_review_crawler_ray.pipelines import (
        analytics, dashboard, filters, issues, textops,
    )

    out: dict[str, str] = {}
    out.update(analytics.ORACLE_SQL)
    out.update(textops.ORACLE_SQL)
    out.update(issues.ORACLE_SQL)
    out.update(filters.ORACLE_SQL)
    out.update(dashboard.ORACLE_SQL)
    return out
