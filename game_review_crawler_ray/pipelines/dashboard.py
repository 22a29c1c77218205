"""Dashboard-equivalent read API — the reference Flask dashboard's route
payloads as plain functions (no web framework; callers serialize with
``json.dumps`` if they need wire JSON).

Route map (reference ``dashboard/app.py``):

==============================================  =========================
reference route                                 function here
==============================================  =========================
GET /api/games            (app.py:213,112)      ``games_summary``
GET /api/stats            (app.py:235,145)      ``stats``
GET /api/game/<g>/posts   (app.py:507)          ``game_posts``
GET /api/game/<g>/sentiment (app.py:702)        ``game_sentiment``
GET /api/game/<g>/issues  (app.py:832)          ``game_issues``
GET /api/game/<g>/issues/hot (app.py:939)       ``game_hot_issues``
GET /api/game/<g>/hot-posts (app.py:1048)       ``game_hot_posts``
GET /api/game/<g>/bugs    (app.py:1168)         ``game_bugs``
GET /api/game/<g>/sentiment/trend (app.py:1411) ``game_sentiment_trend``
GET /api/game/<g>/alerts  (app.py:1896)         ``game_alerts``
GET /api/game/<g>/alerts/urgent (app.py:1995)   ``game_alerts(urgent_only)``
==============================================  =========================

The reference loads every exported JSON into driver memory per request
(app.py:32-56); here each route aggregates over a posts ``Dataset`` with
per-block partials (games/dates/sites are LOW-cardinality keys, so only
partial rows reach the driver) or reads the few-KB analysis snapshot from
``AnalysisStore``. Nothing post-sized lands on the driver except the
explicitly-limited post lists a route returns.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .analytics import _collect, round6
from .filters import (
    FilterCriteria, SentimentFilter, SortField, SortOrder, apply_criteria,
    filter_by_date_range, filter_by_game, filter_by_sentiment,
    filter_by_site, sort_posts,
)
from .issues import (
    alerts_summary, analyze_posts, combined_sentiment_fn, generate_alerts,
)
from .store import AnalysisStore, analysis_to_dict


def _with_sentiment(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Append combined-sentiment ``score``/``label`` columns to a posts
    stream (``CombinedSentiment`` alone projects down to url+score; the
    dashboard routes need the post columns alongside)."""
    fn = combined_sentiment_fn()

    def stage(batch: pa.Table) -> pa.Table:
        scored = fn(batch)
        return (batch.append_column("score", scored.column("score"))
                .append_column("label", scored.column("label")))

    return ds.map_batches(stage, batch_format="pyarrow")


def _kebab(keyword: str) -> str:
    return keyword.lower().replace(" ", "-")


def _date_str(ts) -> str | None:
    if ts is None or (isinstance(ts, float) and np.isnan(ts)):
        return None
    if isinstance(ts, str):
        return ts[:10]
    return ts.strftime("%Y-%m-%d")


# ---------------------------------------------------------------------------
# /api/games — per-game summary cards (app.py:112-143)
# ---------------------------------------------------------------------------

def _games_partial(batch: pa.Table) -> pa.Table:
    """Per-block per-keyword partial: (keyword, n, views, comments,
    max_ts, sites as comma-joined uniques)."""
    df = pd.DataFrame({
        "keyword": batch.column("keyword").to_pylist(),
        "view_count": pc.coalesce(batch.column("view_count"),
                                  pa.scalar(0)).to_pylist(),
        "n_comments": pc.coalesce(
            pc.list_value_length(batch.column("comments")),
            pa.scalar(0, pa.int32())).to_pylist(),
        "created_at": batch.column("created_at").to_pylist(),
        "site": pc.coalesce(batch.column("site"), pa.scalar("")).to_pylist(),
    })
    df = df[df["keyword"].astype(bool)]
    if not len(df):
        return pa.table({"keyword": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "views": pa.array([], pa.int64()),
                         "comments": pa.array([], pa.int64()),
                         "max_ts": pa.array([], pa.timestamp("us")),
                         "sites": pa.array([], pa.string())})
    g = df.groupby("keyword", sort=False)
    out = pd.DataFrame({
        "n": g.size(),
        "views": g["view_count"].sum(),
        "comments": g["n_comments"].sum(),
        "max_ts": g["created_at"].max(),
        "sites": g["site"].agg(lambda s: ",".join(sorted({x for x in s if x}))),
    }).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def games_summary(posts: ray.data.Dataset) -> list[dict]:
    """GET /api/games payload: one card per game keyword, post-count
    descending (app.py:112-143 ``get_game_summary_list``)."""
    parts = _collect(posts.map_batches(_games_partial,
                                       batch_format="pyarrow")).to_pandas()
    if not len(parts):
        return []
    rows = []
    for keyword, g in parts.groupby("keyword", sort=False):
        sites: set[str] = set()
        for s in g["sites"]:
            sites.update(x for x in s.split(",") if x)
        max_ts = g["max_ts"].max()
        rows.append({
            "game_id": _kebab(keyword),
            "keyword": keyword,
            "name": keyword,
            "post_count": int(g["n"].sum()),
            "latest_date": _date_str(max_ts),
            "total_views": int(g["views"].sum()),
            "total_comments": int(g["comments"].sum()),
            "sites": sorted(sites),
        })
    rows.sort(key=lambda r: (-r["post_count"], r["keyword"]))
    return rows


# ---------------------------------------------------------------------------
# /api/stats — global totals + per-site + per-date (app.py:145-189)
# ---------------------------------------------------------------------------

def _stats_partial(batch: pa.Table) -> pa.Table:
    df = pd.DataFrame({
        "site": pc.coalesce(batch.column("site"),
                            pa.scalar("unknown")).to_pylist(),
        "views": pc.coalesce(batch.column("view_count"),
                             pa.scalar(0)).to_pylist(),
        "likes": pc.coalesce(batch.column("like_count"),
                             pa.scalar(0)).to_pylist(),
        "n_comments": pc.coalesce(
            pc.list_value_length(batch.column("comments")),
            pa.scalar(0, pa.int32())).to_pylist(),
        "date": [_date_str(t) or ""
                 for t in batch.column("created_at").to_pylist()],
    })
    g = df.groupby(["site", "date"], sort=False)
    out = pd.DataFrame({
        "n": g.size(),
        "views": g["views"].sum(),
        "likes": g["likes"].sum(),
        "comments": g["n_comments"].sum(),
    }).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def stats(posts: ray.data.Dataset) -> dict:
    """GET /api/stats payload (app.py:145-189 ``get_statistics``)."""
    parts = _collect(posts.map_batches(_stats_partial,
                                       batch_format="pyarrow")).to_pandas()
    if not len(parts):
        return {"total_posts": 0, "total_comments": 0, "total_views": 0,
                "total_likes": 0, "sites": {}, "dates": {}}
    sites = {}
    for site, g in parts.groupby("site", sort=False):
        sites[site] = {"count": int(g["n"].sum()),
                       "views": int(g["views"].sum()),
                       "likes": int(g["likes"].sum())}
    dated = parts[parts["date"].astype(bool)]
    dates = {d: int(g["n"].sum()) for d, g in dated.groupby("date")}
    return {
        "total_posts": int(parts["n"].sum()),
        "total_comments": int(parts["comments"].sum()),
        "total_views": int(parts["views"].sum()),
        "total_likes": int(parts["likes"].sum()),
        "sites": sites,
        "dates": dict(sorted(dates.items())),
    }


# ---------------------------------------------------------------------------
# per-game routes
# ---------------------------------------------------------------------------

def game_info(posts: ray.data.Dataset, game_id: str) -> dict | None:
    """The ``game`` header object every per-game route embeds
    (app.py:346-370 ``get_game_info``); None = 404."""
    for g in games_summary(posts):
        if g["game_id"] == game_id:
            return g
    return None


_POST_LIST_COLUMNS = ["url", "title", "site", "author", "created_at",
                      "view_count", "like_count", "keyword"]


def _post_rows(tbl: pa.Table) -> list[dict]:
    cols = [c for c in _POST_LIST_COLUMNS if c in tbl.column_names]
    extra = [c for c in ("comment_count", "score", "label")
             if c in tbl.column_names]
    rows = tbl.select(cols + extra).to_pylist()
    for r in rows:
        if isinstance(r.get("created_at"), datetime):
            r["created_at"] = r["created_at"].isoformat()
    return rows


def game_posts(posts: ray.data.Dataset, game_id: str, *,
               start_date: datetime | None = None,
               end_date: datetime | None = None,
               sites: list[str] | None = None,
               sort: str = "created_at", order: str = "desc",
               limit: int | None = None, offset: int = 0,
               sentiment: str | None = None,
               sentiment_min: float | None = None,
               sentiment_max: float | None = None) -> dict | None:
    """GET /api/game/<id>/posts payload (app.py:507-645): filter -> sort
    -> offset/limit; sentiment filters score the filtered stream first."""
    info = game_info(posts, game_id)
    if info is None:
        return None
    ds = apply_criteria(posts, FilterCriteria(
        game_id=game_id, start_date=start_date, end_date=end_date,
        sites=sites))
    if sentiment or sentiment_min is not None or sentiment_max is not None:
        ds = _with_sentiment(ds)
        ds = filter_by_sentiment(
            ds, SentimentFilter(sentiment) if sentiment else SentimentFilter.ALL,
            min_score=sentiment_min, max_score=sentiment_max)
    ds = ds.materialize()      # one pass feeds both count and page
    total = ds.count()
    ds = sort_posts(ds, SortField(sort), SortOrder(order))
    if limit is not None:
        ds = ds.limit(offset + limit)
    tbl = _collect(ds)
    if offset:
        tbl = tbl.slice(offset)
    return {"game": info, "posts": _post_rows(tbl), "total": total}


def game_sentiment(posts: ray.data.Dataset, game_id: str, *,
                   start_date: datetime | None = None,
                   end_date: datetime | None = None,
                   sites: list[str] | None = None,
                   negative_threshold: float = -0.3,
                   limit: int = 20) -> dict | None:
    """GET /api/game/<id>/sentiment payload (app.py:702-822):
    distribution + average + the ``limit`` most negative posts."""
    info = game_info(posts, game_id)
    if info is None:
        return None
    ds = filter_by_game(posts, [game_id])
    if start_date or end_date:
        ds = filter_by_date_range(ds, start_date, end_date)
    if sites:
        ds = filter_by_site(ds, sites)
    scored = _with_sentiment(ds).materialize()

    def dist_partial(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_pylist()
        s = np.asarray(pc.coalesce(batch.column("score"), pa.scalar(0.0))
                       .to_numpy(zero_copy_only=False), dtype=np.float64)
        return pa.table({
            "pos": pa.array([sum(1 for x in lab if x == "positive")], pa.int64()),
            "neg": pa.array([sum(1 for x in lab if x == "negative")], pa.int64()),
            "neu": pa.array([sum(1 for x in lab if x == "neutral")], pa.int64()),
            "n": pa.array([len(lab)], pa.int64()),
            "sum_score": pa.array([float(s.sum())], pa.float64()),
        })

    parts = _collect(scored.map_batches(dist_partial,
                                        batch_format="pyarrow")).to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    neg_tbl = _collect(
        scored.filter(expr=f"score <= {negative_threshold}")
        .sort(["score", "url"]).limit(limit))
    return {
        "game": info,
        "sentiment_distribution": {
            "positive": int(parts["pos"].sum()) if n else 0,
            "negative": int(parts["neg"].sum()) if n else 0,
            "neutral": int(parts["neu"].sum()) if n else 0,
        },
        "sentiment_avg": float(round6(parts["sum_score"].sum() / n)) if n else 0.0,
        "total_analyzed": n,
        "negative_posts": _post_rows(neg_tbl),
    }


# ---------------------------------------------------------------------------
# analysis-backed routes (issues / hot / bugs / hot-posts / alerts)
# ---------------------------------------------------------------------------

def game_analysis(posts: ray.data.Dataset, game_id: str,
                  store: AnalysisStore | None = None,
                  analyzed_at: datetime | None = None) -> dict | None:
    """Run the issue-analysis tier for one game's posts; optionally save
    the snapshot to ``store`` (the reference analyzes on request and
    persists via AnalysisStore, app.py:824-830 + analysis_store.py)."""
    info = game_info(posts, game_id)
    if info is None:
        return None
    analysis = analyze_posts(filter_by_game(posts, [game_id]))
    if store is not None:
        store.save_analysis(game_id, analysis,
                            analyzed_at or datetime.now())
    return analysis


def _analysis_rows(analysis: dict, key: str) -> list[dict]:
    """Rows of one analysis table, from either a live ``analyze_posts``
    dict (pa.Table values) or a stored JSON snapshot (list values)."""
    val = analysis.get(key)
    if isinstance(val, pa.Table):
        return analysis_to_dict({key: val})[key]
    return list(val or [])


def game_issues(analysis: dict) -> dict:
    """GET /api/game/<id>/issues payload (app.py:832-937)."""
    issues = _analysis_rows(analysis, "issues")
    return {"issues": issues, "total_issues": len(issues),
            "analyzed_at": analysis.get("analyzed_at")}


def game_hot_issues(analysis: dict) -> dict:
    """GET /api/game/<id>/issues/hot payload (app.py:939-1046): the
    is_hot subset (top priority decile), priority order preserved."""
    hot = [i for i in _analysis_rows(analysis, "issues") if i.get("is_hot")]
    return {"hot_issues": hot, "total_hot_issues": len(hot),
            "analyzed_at": analysis.get("analyzed_at")}


def game_hot_posts(analysis: dict) -> dict:
    """GET /api/game/<id>/hot-posts payload (app.py:1048-1166)."""
    hot = _analysis_rows(analysis, "hot_posts")
    return {"hot_posts": hot, "total_hot_posts": len(hot),
            "analyzed_at": analysis.get("analyzed_at")}


def game_bugs(analysis: dict) -> dict:
    """GET /api/game/<id>/bugs payload (app.py:1168-1301): bug-classified
    issues in severity order, plus severity counts."""
    bugs = _analysis_rows(analysis, "bug_issues")
    by_sev: dict[str, int] = {}
    for b in bugs:
        by_sev[b["severity"]] = by_sev.get(b["severity"], 0) + 1
    return {"bugs": bugs, "total_bugs": len(bugs),
            "severity_counts": by_sev,
            "analyzed_at": analysis.get("analyzed_at")}


def game_alerts(analysis: dict, urgent_only: bool = False) -> dict:
    """GET /api/game/<id>/alerts (+/urgent) payload (app.py:1896-2073)."""
    if isinstance(analysis.get("issues"), list):
        # stored snapshot -> rebuild the pa.Table generate_alerts expects
        analysis = dict(analysis)
        analysis["issues"] = (pa.Table.from_pylist(analysis["issues"])
                              if analysis["issues"] else pa.table({}))
    alerts = generate_alerts(analysis)
    if urgent_only:
        alerts = [a for a in alerts if a["priority"] == "critical"]
    return {"alerts": alerts, "summary": alerts_summary(alerts)}


def latest_game_analysis(store: AnalysisStore, game_id: str) -> dict | None:
    """Store-backed variant every analysis route falls back to (the
    dashboard reads the newest snapshot; analysis_store.py:118-136)."""
    return store.get_latest_analysis(game_id)


# ---------------------------------------------------------------------------
# /api/game/<id>/sentiment/trend (app.py:1411-1543)
# ---------------------------------------------------------------------------

def q_dashboard_games(sf_dir: str) -> pa.Table:
    """The /api/games payload as a flat SQL-checkable table over the
    cached crawl output (sites joined to one comma-separated string)."""
    from .textops import _crawl_out

    posts = ray.data.read_parquet(
        os.path.join(_crawl_out(sf_dir), "posts"),
        columns=["keyword", "site", "view_count", "like_count",
                 "created_at", "comments"])
    rows = games_summary(posts)
    return pa.table({
        "game_id": pa.array([r["game_id"] for r in rows], pa.string()),
        "keyword": pa.array([r["keyword"] for r in rows], pa.string()),
        "post_count": pa.array([r["post_count"] for r in rows], pa.int64()),
        "latest_date": pa.array([r["latest_date"] for r in rows], pa.string()),
        "total_views": pa.array([r["total_views"] for r in rows], pa.int64()),
        "total_comments": pa.array([r["total_comments"] for r in rows],
                                   pa.int64()),
        "sites": pa.array([",".join(r["sites"]) for r in rows], pa.string()),
    })


def q_dashboard_stats(sf_dir: str) -> pa.Table:
    """The /api/stats totals as a one-row SQL-checkable table."""
    from .textops import _crawl_out

    posts = ray.data.read_parquet(
        os.path.join(_crawl_out(sf_dir), "posts"),
        columns=["keyword", "site", "view_count", "like_count",
                 "created_at", "comments"])
    s = stats(posts)
    return pa.table({
        "total_posts": pa.array([s["total_posts"]], pa.int64()),
        "total_comments": pa.array([s["total_comments"]], pa.int64()),
        "total_views": pa.array([s["total_views"]], pa.int64()),
        "total_likes": pa.array([s["total_likes"]], pa.int64()),
    })


# the sf0.01 correctness gate's cached crawl output (same contract as
# issues._CRAWL01_POSTS: the Ray query runs first and materializes it)
_CRAWL01_POSTS = "/tmp/grc_crawl/run_n10000_h50/posts/*.parquet"

SQL_DASHBOARD_GAMES = f"""
WITH p AS (
    SELECT keyword, site, COALESCE(view_count, 0) AS views,
           len(comments) AS n_comments, created_at
    FROM read_parquet('{_CRAWL01_POSTS}')
    WHERE keyword IS NOT NULL AND keyword <> ''
)
SELECT lower(replace(keyword, ' ', '-')) AS game_id,
       keyword,
       count(*) AS post_count,
       strftime(max(created_at), '%Y-%m-%d') AS latest_date,
       CAST(sum(views) AS BIGINT) AS total_views,
       CAST(sum(n_comments) AS BIGINT) AS total_comments,
       string_agg(DISTINCT site, ',' ORDER BY site) AS sites
FROM p GROUP BY keyword
ORDER BY post_count DESC, keyword
"""

SQL_DASHBOARD_STATS = f"""
SELECT count(*) AS total_posts,
       CAST(sum(len(comments)) AS BIGINT) AS total_comments,
       CAST(sum(COALESCE(view_count, 0)) AS BIGINT) AS total_views,
       CAST(sum(COALESCE(like_count, 0)) AS BIGINT) AS total_likes
FROM read_parquet('{_CRAWL01_POSTS}')
"""

QUERIES = {
    "dashboard_games": q_dashboard_games,
    "dashboard_stats": q_dashboard_stats,
}

ORACLE_SQL = {
    "dashboard_games": SQL_DASHBOARD_GAMES,
    "dashboard_stats": SQL_DASHBOARD_STATS,
}


def game_sentiment_trend(posts: ray.data.Dataset, game_id: str,
                         unit: str = "daily") -> dict | None:
    """Bucketed sentiment time series + summary. Buckets are computed in
    per-block partials (bucket cardinality ~= days, tiny) and combined on
    the driver."""
    info = game_info(posts, game_id)
    if info is None:
        return None
    scored = _with_sentiment(filter_by_game(posts, [game_id]))
    fmt = "%Y-%m-%d" if unit == "daily" else "%Y-W%W"

    def bucket_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("created_at").to_pylist()
        s = np.asarray(pc.coalesce(batch.column("score"), pa.scalar(0.0))
                       .to_numpy(zero_copy_only=False), dtype=np.float64)
        lab = batch.column("label").to_pylist()
        df = pd.DataFrame({
            "bucket": [t.strftime(fmt) if t is not None else "" for t in ts],
            "score": s,
            "pos": [1 if x == "positive" else 0 for x in lab],
            "neg": [1 if x == "negative" else 0 for x in lab],
        })
        df = df[df["bucket"].astype(bool)]
        g = df.groupby("bucket", sort=False)
        out = pd.DataFrame({"n": g.size(), "sum_score": g["score"].sum(),
                            "pos": g["pos"].sum(), "neg": g["neg"].sum()})
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    parts = _collect(scored.map_batches(bucket_partial,
                                        batch_format="pyarrow")).to_pandas()
    if not len(parts):
        return {"game": info, "unit": unit, "trend": [], "summary": None}
    g = parts.groupby("bucket")
    series = [{
        "date": b,
        "post_count": int(r["n"].sum()),
        "avg_sentiment": float(round6(r["sum_score"].sum() / r["n"].sum())),
        "positive": int(r["pos"].sum()),
        "negative": int(r["neg"].sum()),
    } for b, r in sorted(g, key=lambda kv: kv[0])]
    avgs = [p["avg_sentiment"] for p in series]
    direction = ("stable" if len(avgs) < 2 or abs(avgs[-1] - avgs[0]) < 0.05
                 else "improving" if avgs[-1] > avgs[0] else "declining")
    return {
        "game": info,
        "unit": unit,
        "trend": series,
        "summary": {
            "avg_sentiment": float(round6(sum(avgs) / len(avgs))),
            "min_sentiment": min(avgs),
            "max_sentiment": max(avgs),
            "direction": direction,
            "total_posts": sum(p["post_count"] for p in series),
        },
    }
