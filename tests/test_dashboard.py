"""Dashboard-equivalent API route shapes (reference dashboard/app.py):
each route's payload is checked against a pure-python replica of the
reference's per-request logic over the same posts, and the analysis
routes against the STORED AnalysisStore snapshot content."""

import pyarrow.parquet as pq
import pytest
import ray.data

from game_review_crawler_ray.config import CrawlConfig
from game_review_crawler_ray.pipelines import dashboard as D
from game_review_crawler_ray.pipelines.crawl import run_crawl
from game_review_crawler_ray.pipelines.store import AnalysisStore
from game_review_crawler_ray.sources.corpus import gen_pages
from game_review_crawler_ray.sources.seeds import gen_seeds


@pytest.fixture(scope="module")
def posts_tbl(tmp_path_factory):
    pages, _ = gen_pages(300, n_hosts=8, seed=55)
    seeds = gen_seeds(pages.column("url").to_pylist(), seed=55)
    out = tmp_path_factory.mktemp("crawl")
    res = run_crawl(pages, seeds, str(out), CrawlConfig(num_frontier_shards=2))
    return pq.read_table(res["posts_dir"])


@pytest.fixture()
def posts(posts_tbl):
    return ray.data.from_arrow(posts_tbl)


def _rows(tbl):
    return tbl.to_pylist()


def _matches_game(post, game_id):
    """Reference filter_posts_by_game semantics (app.py:261-283)."""
    gid = game_id.lower()
    if (post.get("keyword") or "").lower() == gid:
        return True
    return (gid in (post.get("title") or "").lower()
            or gid in (post.get("body") or "").lower())


def test_games_summary_route(posts, posts_tbl):
    got = D.games_summary(posts)
    # python replica of extract_games_from_posts/get_game_summary_list
    games = {}
    for p in _rows(posts_tbl):
        kw = p.get("keyword") or ""
        if not kw:
            continue
        g = games.setdefault(kw, {"post_count": 0, "total_views": 0,
                                  "total_comments": 0, "sites": set(),
                                  "latest": None})
        g["post_count"] += 1
        g["total_views"] += p.get("view_count") or 0
        g["total_comments"] += len(p.get("comments") or [])
        if p.get("site"):
            g["sites"].add(p["site"])
        ts = p.get("created_at")
        if ts is not None and (g["latest"] is None or ts > g["latest"]):
            g["latest"] = ts
    assert len(got) == len(games)
    assert [r["post_count"] for r in got] == sorted(
        [r["post_count"] for r in got], reverse=True)
    for row in got:
        exp = games[row["keyword"]]
        assert row["game_id"] == row["keyword"].lower().replace(" ", "-")
        assert row["post_count"] == exp["post_count"]
        assert row["total_views"] == exp["total_views"]
        assert row["total_comments"] == exp["total_comments"]
        assert row["sites"] == sorted(exp["sites"])
        assert row["latest_date"] == exp["latest"].strftime("%Y-%m-%d")


def test_stats_route(posts, posts_tbl):
    got = D.stats(posts)
    rows = _rows(posts_tbl)
    assert got["total_posts"] == len(rows)
    assert got["total_comments"] == sum(len(p.get("comments") or [])
                                        for p in rows)
    assert got["total_views"] == sum(p.get("view_count") or 0 for p in rows)
    assert got["total_likes"] == sum(p.get("like_count") or 0 for p in rows)
    sites = {}
    for p in rows:
        s = p.get("site") or "unknown"
        d = sites.setdefault(s, {"count": 0, "views": 0, "likes": 0})
        d["count"] += 1
        d["views"] += p.get("view_count") or 0
        d["likes"] += p.get("like_count") or 0
    assert got["sites"] == sites
    dates = {}
    for p in rows:
        ts = p.get("created_at")
        if ts is not None:
            dates[ts.strftime("%Y-%m-%d")] = dates.get(
                ts.strftime("%Y-%m-%d"), 0) + 1
    assert got["dates"] == dict(sorted(dates.items()))
    assert list(got["dates"]) == sorted(got["dates"])


def test_game_posts_route(posts, posts_tbl):
    gid = D.games_summary(posts)[0]["game_id"]
    got = D.game_posts(posts, gid, sort="view_count", order="desc",
                       limit=10, offset=5)
    assert got is not None
    expect = [p for p in _rows(posts_tbl) if _matches_game(p, gid)]
    assert got["total"] == len(expect)
    assert len(got["posts"]) == 10
    exp_sorted = sorted(expect, key=lambda p: (-(p.get("view_count") or 0),
                                               p["url"]))
    assert [r["url"] for r in got["posts"]] == \
        [p["url"] for p in exp_sorted[5:15]]
    assert got["game"]["game_id"] == gid
    # unknown game -> None (the route 404s)
    assert D.game_posts(posts, "no-such-game-zzz") is None


def test_game_sentiment_route(posts, posts_tbl):
    from game_review_crawler_ray.pipelines.issues import CombinedSentiment

    gid = D.games_summary(posts)[0]["game_id"]
    got = D.game_sentiment(posts, gid, negative_threshold=-0.1, limit=5)
    assert got is not None
    by_url = {p["url"]: p for p in _rows(posts_tbl)}
    scored = CombinedSentiment()(posts_tbl)
    rows = [r for r in scored.to_pylist()
            if _matches_game(by_url[r["url"]], gid)]
    dist = {"positive": 0, "negative": 0, "neutral": 0}
    for r in rows:
        dist[r["label"]] += 1
    assert got["sentiment_distribution"] == dist
    assert got["total_analyzed"] == len(rows)
    exp_avg = round(sum(r["score"] for r in rows) / len(rows), 6)
    assert abs(got["sentiment_avg"] - exp_avg) < 1e-9
    exp_neg = sorted([r for r in rows if r["score"] <= -0.1],
                     key=lambda r: (r["score"], r["url"]))[:5]
    assert [r["url"] for r in got["negative_posts"]] == \
        [r["url"] for r in exp_neg]
    assert all("score" in r and "label" in r for r in got["negative_posts"])


def test_analysis_routes_match_stored_snapshot(posts, tmp_path):
    gid = D.games_summary(posts)[0]["game_id"]
    store = AnalysisStore(str(tmp_path / "analyses"))
    live = D.game_analysis(posts, gid, store=store)
    assert live is not None
    stored = D.latest_game_analysis(store, gid)
    assert stored is not None and stored["game_id"] == gid

    # every analysis-backed route yields the SAME payload from the live
    # analysis dict and from the persisted snapshot
    from game_review_crawler_ray.pipelines.store import _jsonable

    for route in (D.game_issues, D.game_hot_issues, D.game_hot_posts,
                  D.game_bugs):
        a = route(live)
        b = route(stored)
        a.pop("analyzed_at", None)
        b.pop("analyzed_at", None)
        assert _jsonable(a) == b

    issues = D.game_issues(stored)["issues"]
    assert issues, "analysis produced no issues on this corpus"
    hot = D.game_hot_issues(stored)["hot_issues"]
    assert hot == [i for i in issues if i["is_hot"]]
    bugs = D.game_bugs(stored)
    assert bugs["bugs"] == [i for i in sorted(
        (x for x in issues if x["is_bug"]),
        key=lambda x: ({"critical": 0, "high": 1, "medium": 2, "low": 3}
                       .get(x["severity"], 4), -x["priority_score"]))]
    assert sum(bugs["severity_counts"].values()) == bugs["total_bugs"]


def test_alerts_route(posts, tmp_path):
    gid = D.games_summary(posts)[0]["game_id"]
    store = AnalysisStore(str(tmp_path / "analyses"))
    live = D.game_analysis(posts, gid, store=store)
    stored = D.latest_game_analysis(store, gid)

    a = D.game_alerts(live)
    b = D.game_alerts(stored)
    assert a == b                       # stored snapshot == live analysis
    assert a["summary"]["total_alerts"] == len(a["alerts"])
    urgent = D.game_alerts(stored, urgent_only=True)
    assert urgent["alerts"] == [x for x in a["alerts"]
                                if x["priority"] == "critical"]


def test_sentiment_trend_route(posts, posts_tbl):
    from game_review_crawler_ray.pipelines.issues import CombinedSentiment

    gid = D.games_summary(posts)[0]["game_id"]
    got = D.game_sentiment_trend(posts, gid, unit="daily")
    assert got is not None and got["trend"]
    by_url = {p["url"]: p for p in _rows(posts_tbl)}
    scored = [r for r in CombinedSentiment()(posts_tbl).to_pylist()
              if _matches_game(by_url[r["url"]], gid)
              and by_url[r["url"]].get("created_at") is not None]
    buckets = {}
    for r in scored:
        b = by_url[r["url"]]["created_at"].strftime("%Y-%m-%d")
        buckets.setdefault(b, []).append(r)
    assert [p["date"] for p in got["trend"]] == sorted(buckets)
    for p in got["trend"]:
        rs = buckets[p["date"]]
        assert p["post_count"] == len(rs)
        exp = round(sum(r["score"] for r in rs) / len(rs), 6)
        assert abs(p["avg_sentiment"] - exp) < 1e-9
        assert p["positive"] == sum(1 for r in rs if r["label"] == "positive")
        assert p["negative"] == sum(1 for r in rs if r["label"] == "negative")
    assert got["summary"]["total_posts"] == len(scored)
    assert got["summary"]["direction"] in ("improving", "declining", "stable")
