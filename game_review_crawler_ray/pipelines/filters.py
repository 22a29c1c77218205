"""DataFilter family — the reference's composable post filter/sort surface
(``crawler/utils/data_filter.py:15-229``) re-expressed on Ray Data.

Every reference method becomes a vectorized Arrow predicate pushed through
``map_batches`` (streaming — no driver collection); ``sort_posts`` maps
``SortField`` onto ``Dataset.sort``. ``FilterCriteria.apply`` composes
filters in the reference's ``apply_filters`` order (data_filter.py:137-151).

Four of the family are exposed as SQL-checked queries over the crawl-posts
parquet: a composite criteria filter, a sort, the game-keyword filter and
the sentiment-label filter.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime
from enum import Enum

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


class SortField(Enum):
    VIEW_COUNT = "view_count"
    COMMENT_COUNT = "comment_count"
    CREATED_AT = "created_at"
    LIKE_COUNT = "like_count"
    SENTIMENT_SCORE = "sentiment_score"


class SortOrder(Enum):
    ASC = "asc"
    DESC = "desc"


class SentimentFilter(Enum):
    ALL = "all"
    POSITIVE = "positive"
    NEGATIVE = "negative"
    NEUTRAL = "neutral"


class IssueTypeFilter(Enum):
    ALL = "all"
    BUG = "bug"
    HOT = "hot"
    NORMAL = "normal"


@dataclass
class FilterCriteria:
    game_id: str | None = None
    start_date: datetime | None = None
    end_date: datetime | None = None
    sites: list[str] | None = None
    keywords: list[str] | None = None
    min_view_count: int | None = None
    min_comment_count: int | None = None
    sentiment_filter: SentimentFilter = SentimentFilter.ALL
    sentiment_min: float | None = None
    sentiment_max: float | None = None
    issue_type_filter: IssueTypeFilter = IssueTypeFilter.ALL


def _batch_filter(fn):
    """Wrap a Table->BooleanArray predicate as a map_batches stage."""

    def stage(batch: pa.Table) -> pa.Table:
        return batch.filter(fn(batch))

    return stage


def _contains_any(col: pa.ChunkedArray, needles: list[str]):
    low = pc.utf8_lower(pc.coalesce(col, pa.scalar("")))
    mask = None
    for n in needles:
        m = pc.match_substring(low, n)
        mask = m if mask is None else pc.or_(mask, m)
    return mask


def filter_by_game(ds: ray.data.Dataset, game_ids: list[str]) -> ray.data.Dataset:
    """data_filter.py:60-78: keyword equals a game id, or title/body
    contains one."""
    if not game_ids:
        return ds
    ids = [g.lower() for g in game_ids]

    def pred(batch: pa.Table):
        kw = pc.utf8_lower(pc.coalesce(batch.column("keyword"), pa.scalar("")))
        mask = pc.is_in(kw, value_set=pa.array(ids))
        mask = pc.or_(mask, _contains_any(batch.column("title"), ids))
        return pc.or_(mask, _contains_any(batch.column("body"), ids))

    return ds.map_batches(_batch_filter(pred), batch_format="pyarrow")


def filter_by_date_range(ds: ray.data.Dataset,
                         start_date: datetime | None = None,
                         end_date: datetime | None = None) -> ray.data.Dataset:
    """data_filter.py:80-93: inclusive bounds; null created_at rows drop
    whenever a bound is set."""
    if start_date is None and end_date is None:
        return ds

    def pred(batch: pa.Table):
        ts = batch.column("created_at")
        mask = pc.is_valid(ts)
        if start_date is not None:
            mask = pc.and_(mask, pc.greater_equal(ts, pa.scalar(start_date)))
        if end_date is not None:
            mask = pc.and_(mask, pc.less_equal(ts, pa.scalar(end_date)))
        return mask

    return ds.map_batches(_batch_filter(pred), batch_format="pyarrow")


def filter_by_site(ds: ray.data.Dataset, sites: list[str]) -> ray.data.Dataset:
    if not sites:
        return ds
    wanted = pa.array([s.lower() for s in sites])

    def pred(batch: pa.Table):
        low = pc.utf8_lower(pc.coalesce(batch.column("site"), pa.scalar("")))
        return pc.is_in(low, value_set=wanted)

    return ds.map_batches(_batch_filter(pred), batch_format="pyarrow")


def filter_by_min_view_count(ds: ray.data.Dataset, min_count: int) -> ray.data.Dataset:
    def pred(batch: pa.Table):
        v = pc.coalesce(batch.column("view_count"), pa.scalar(0, pa.int64()))
        return pc.greater_equal(v, min_count)

    return ds.map_batches(_batch_filter(pred), batch_format="pyarrow")


def filter_by_min_comment_count(ds: ray.data.Dataset, min_count: int) -> ray.data.Dataset:
    def pred(batch: pa.Table):
        n = pc.list_value_length(batch.column("comments"))
        n = pc.coalesce(n, pa.scalar(0, pa.int32()))
        return pc.greater_equal(n, min_count)

    return ds.map_batches(_batch_filter(pred), batch_format="pyarrow")


def filter_by_sentiment(ds: ray.data.Dataset,
                        sentiment_filter: SentimentFilter = SentimentFilter.ALL,
                        min_score: float | None = None,
                        max_score: float | None = None) -> ray.data.Dataset:
    """data_filter.py:171-194 over a Dataset carrying score/label columns."""

    def pred(batch: pa.Table):
        mask = pa.array([True] * batch.num_rows)
        if sentiment_filter != SentimentFilter.ALL:
            mask = pc.and_(mask, pc.equal(batch.column("label"),
                                          sentiment_filter.value))
        s = batch.column("score")
        if min_score is not None:
            mask = pc.and_(mask, pc.greater_equal(s, min_score))
        if max_score is not None:
            mask = pc.and_(mask, pc.less_equal(s, max_score))
        return mask

    return ds.map_batches(_batch_filter(pred), batch_format="pyarrow")


def filter_by_issue_type(ds: ray.data.Dataset,
                         issue_type_filter: IssueTypeFilter = IssueTypeFilter.ALL
                         ) -> ray.data.Dataset:
    """data_filter.py:196-222 over a Dataset carrying is_bug/is_hot columns."""
    if issue_type_filter == IssueTypeFilter.ALL:
        return ds

    def pred(batch: pa.Table):
        bug = pc.coalesce(batch.column("is_bug"), pa.scalar(False))
        hot = (pc.coalesce(batch.column("is_hot"), pa.scalar(False))
               if "is_hot" in batch.column_names
               else pa.array([False] * batch.num_rows))
        if issue_type_filter == IssueTypeFilter.BUG:
            return bug
        if issue_type_filter == IssueTypeFilter.HOT:
            return hot
        return pc.and_(pc.invert(bug), pc.invert(hot))

    return ds.map_batches(_batch_filter(pred), batch_format="pyarrow")


def sort_posts(ds: ray.data.Dataset, field: SortField,
               order: SortOrder = SortOrder.DESC) -> ray.data.Dataset:
    """data_filter.py:117-134; COMMENT_COUNT sorts on the exploded length."""
    desc = order == SortOrder.DESC
    if field == SortField.COMMENT_COUNT:
        def add_cc(batch: pa.Table) -> pa.Table:
            n = pc.coalesce(pc.list_value_length(batch.column("comments")),
                            pa.scalar(0, pa.int32()))
            return batch.append_column("comment_count", pc.cast(n, pa.int64()))

        ds = ds.map_batches(add_cc, batch_format="pyarrow")
        key = "comment_count"
    elif field == SortField.SENTIMENT_SCORE:
        key = "score"
    else:
        key = field.value
    # url as deterministic tie-break (the reference's sorted() is stable on
    # input order, which a distributed sort cannot reproduce)
    return ds.sort([key, "url"], descending=[desc, False])


def apply_criteria(ds: ray.data.Dataset, criteria: FilterCriteria) -> ray.data.Dataset:
    """apply_filters composition order (data_filter.py:137-151)."""
    if criteria.game_id:
        ds = filter_by_game(ds, [criteria.game_id])
    if criteria.start_date or criteria.end_date:
        ds = filter_by_date_range(ds, criteria.start_date, criteria.end_date)
    if criteria.sites:
        ds = filter_by_site(ds, criteria.sites)
    if criteria.keywords:
        ds = filter_by_game(ds, criteria.keywords)
    if criteria.min_view_count is not None:
        ds = filter_by_min_view_count(ds, criteria.min_view_count)
    if criteria.min_comment_count is not None:
        ds = filter_by_min_comment_count(ds, criteria.min_comment_count)
    return ds


# ---------------------------------------------------------------------------
# SQL-checked queries over the crawl posts
# ---------------------------------------------------------------------------

def _posts(sf_dir: str, columns=None) -> ray.data.Dataset:
    from .textops import _crawl_out

    return ray.data.read_parquet(os.path.join(_crawl_out(sf_dir), "posts"),
                                 columns=columns)


def q_filter_posts_composite(sf_dir: str) -> pa.Table:
    from .analytics import _collect

    ds = _posts(sf_dir, columns=["url", "site", "created_at", "view_count",
                                 "comments"])
    crit = FilterCriteria(
        start_date=datetime(2024, 1, 5), end_date=datetime(2024, 1, 20),
        sites=["inven.co.kr", "ruliweb.com"],
        min_view_count=20_000, min_comment_count=2,
    )
    ds = apply_criteria(ds, crit)

    def proj(batch: pa.Table) -> pa.Table:
        n = pc.coalesce(pc.list_value_length(batch.column("comments")),
                        pa.scalar(0, pa.int32()))
        return pa.table({
            "url": batch.column("url"),
            "site": batch.column("site"),
            "created_at": batch.column("created_at"),
            "view_count": batch.column("view_count"),
            "comment_count": pc.cast(n, pa.int64()),
        })

    return _collect(ds.map_batches(proj, batch_format="pyarrow")).sort_by("url")


def q_sort_posts_views_top50(sf_dir: str) -> pa.Table:
    from .analytics import _collect

    ds = _posts(sf_dir, columns=["url", "view_count"])
    out = sort_posts(ds, SortField.VIEW_COUNT, SortOrder.DESC).limit(50)
    return _collect(out)


def q_filter_posts_game(sf_dir: str) -> pa.Table:
    from .analytics import _collect

    ds = _posts(sf_dir, columns=["url", "keyword", "title", "body"])
    out = filter_by_game(ds, ["버그"]).select_columns(["url", "keyword"])
    return _collect(out).sort_by("url")


def q_filter_posts_negative(sf_dir: str) -> pa.Table:
    """filter_by_sentiment(NEGATIVE) over title-weighted post scores."""
    import pandas as pd

    from ..functions.lexicon_ko import NEGATIVE_KO, POSITIVE_KO
    from .analytics import SentimentScorer, _collect

    class Score:
        def __init__(self):
            self.scorer = SentimentScorer(pos=POSITIVE_KO, neg=NEGATIVE_KO)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            t = batch["title"].fillna("")
            out = self.scorer.score_frame(t + " " + t + " " + batch["body"].fillna(""))
            out.insert(0, "url", batch["url"].values)
            return out

    ds = _posts(sf_dir, columns=["url", "title", "body"])
    from ..functions.stageutil import memoized_stage

    scored = ds.map_batches(memoized_stage("filters_score", Score),
                            batch_format="pandas")
    neg = filter_by_sentiment(scored, SentimentFilter.NEGATIVE)
    return _collect(neg).select(["url", "score"]).sort_by("url")


def _sql_posts_path() -> str:
    from .textops import _CRAWL01

    return f"{_CRAWL01}/posts/*.parquet"


def _filters_sql() -> dict[str, str]:
    from .issues import _SCORE_CASE, _ko_count_expr
    from ..functions.lexicon_ko import NEGATIVE_KO, POSITIVE_KO

    path = _sql_posts_path()
    composite = f"""
SELECT url, site, created_at, view_count,
       CAST(coalesce(len(comments), 0) AS BIGINT) AS comment_count
FROM read_parquet('{path}')
WHERE created_at IS NOT NULL
  AND created_at >= TIMESTAMP '2024-01-05'
  AND created_at <= TIMESTAMP '2024-01-20'
  AND lower(coalesce(site, '')) IN ('inven.co.kr', 'ruliweb.com')
  AND coalesce(view_count, 0) >= 20000
  AND coalesce(len(comments), 0) >= 2
ORDER BY url
"""
    sort50 = f"""
SELECT url, view_count FROM read_parquet('{path}')
ORDER BY view_count DESC, url ASC LIMIT 50
"""
    game = f"""
SELECT url, keyword FROM read_parquet('{path}')
WHERE lower(coalesce(keyword, '')) IN ('버그')
   OR lower(coalesce(title, '')) LIKE '%버그%'
   OR lower(coalesce(body, '')) LIKE '%버그%'
ORDER BY url
"""
    negative = f"""
WITH p AS (
    SELECT url, trim(regexp_replace(lower(coalesce(title, '') || ' ' ||
               coalesce(title, '') || ' ' || coalesce(body, '')),
               '\\s+', ' ', 'g')) AS t
    FROM read_parquet('{path}')
), c AS (
    SELECT url, {_ko_count_expr(POSITIVE_KO)} AS pos_cnt,
           {_ko_count_expr(NEGATIVE_KO)} AS neg_cnt
    FROM p
), s AS (SELECT url, {_SCORE_CASE} AS raw FROM c)
SELECT url, ROUND(raw, 6) AS score FROM s
WHERE ROUND(raw, 6) < -0.1 ORDER BY url
"""
    return {
        "filter_posts_composite": composite,
        "sort_posts_views_top50": sort50,
        "filter_posts_game": game,
        "filter_posts_negative": negative,
    }


QUERIES = {
    "filter_posts_composite": q_filter_posts_composite,
    "sort_posts_views_top50": q_sort_posts_views_top50,
    "filter_posts_game": q_filter_posts_game,
    "filter_posts_negative": q_filter_posts_negative,
}

ORACLE_SQL = _filters_sql()
