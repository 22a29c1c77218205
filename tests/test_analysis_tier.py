"""Issue detection, exports, search/seed-source tier."""

import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from game_review_crawler_ray.functions.relevance import (
    filter_by_relevance, relevance_score,
)
from game_review_crawler_ray.pipelines.issues import (
    analyze_posts, cluster_is_bug, cluster_keywords, generate_alerts,
    keyword_similarity, severity_from_metrics,
)
from game_review_crawler_ray.sources.search import (
    AdapterThrottled, CorpusSearchAdapter, SearchCache, SearchManager,
    build_query, pages_index_from_corpus,
)


# ---------------------------------------------------------------------------
# pure-function parity (issue_detector.py formulas)
# ---------------------------------------------------------------------------

def test_keyword_similarity():
    assert keyword_similarity("버그", "버그") == 1.0
    assert keyword_similarity("버그", "버그수정") == 0.8
    assert keyword_similarity("abc", "bcd") == 2 / 4
    assert keyword_similarity("", "") == 1.0


def test_greedy_clustering_total_and_order_dependent():
    kws = ["버그", "버그수정", "이벤트", "이벤트보상", "렉"]
    clusters = cluster_keywords(kws)
    # every keyword in exactly one cluster (reference Property 7)
    all_kws = [k for c in clusters for k in c["keywords"]]
    assert sorted(all_kws) == sorted(kws)
    assert clusters[0]["representative"] == "버그"
    assert "버그수정" in clusters[0]["keywords"]


def test_severity_thresholds():
    assert severity_from_metrics(100, -1.0, 100) == "critical"   # 0.5+0.5
    assert severity_from_metrics(0, -1.0, 100) == "high"         # 0.5
    assert severity_from_metrics(0, -0.6, 100) == "medium"       # 0.3
    assert severity_from_metrics(0, 0.5, 100) == "low"
    # monotonic in frequency and negativity (reference Properties 17-18)
    order = ["low", "medium", "high", "critical"]
    prev = -1
    for n in (0, 30, 60, 100):
        s = order.index(severity_from_metrics(n, -0.45, 100))
        assert s >= prev
        prev = s


def test_bug_cluster_classification():
    assert cluster_is_bug(["무한로딩"])
    assert cluster_is_bug(["서버렉입니다"])   # containment
    assert not cluster_is_bug(["이벤트", "보상"])


def test_relevance_formula():
    # exact F1 formula: 1 keyword in title + snippet, freq 2
    s = relevance_score("버그 있음", ["버그"], title="버그 제보")
    base = 0.6 + 0.4
    bonus = 0.3 * (1 - 1 / (1 + 0.2))
    assert abs(s - min(1.0, base + bonus)) < 1e-12
    assert relevance_score("nothing here", ["버그"]) == 0.0
    kept = filter_by_relevance([("u1", "버그 제보", "버그 있음"),
                                ("u2", "irrelevant", "text")], ["버그"], 0.5)
    assert [k[0] for k in kept] == ["u1"]
    assert 0.0 <= kept[0][3] <= 1.0


# ---------------------------------------------------------------------------
# analyze_posts end-to-end on a small synthetic posts table
# ---------------------------------------------------------------------------

def _posts_table():
    rows = []
    base = datetime(2024, 1, 10, 12, 0, 0)
    for i in range(30):
        bug = i % 3 == 0
        body = ("버그 오류 때문에 게임이 튕김 최악 쓰레기 진짜 별로" if bug
                else "이벤트 보상 최고 좋다 대박 갓겜 재밌다")
        rows.append({
            "url": f"https://h{i % 4}.example.com/p/{i}",
            "title": "버그 제보" if bug else "이벤트 후기",
            "body": body,
            "site": f"h{i % 4}.example.com",
            "keyword": "테스트",
            "author": "유저",
            "created_at": base.replace(hour=i % 24),
            "view_count": 100 * (i + 1),
            "like_count": i,
            "comments": [{"author": "a", "content": "ㅇㅇ",
                          "created_at": None, "like_count": 0}] * (i % 4),
        })
    return pa.Table.from_pylist(rows)


def test_analyze_posts_pipeline():
    posts = ray.data.from_arrow(_posts_table())
    res = analyze_posts(posts)
    issues = res["issues"].to_pylist()
    assert issues
    # priority descending (K2)
    prios = [i["priority_score"] for i in issues]
    assert prios == sorted(prios, reverse=True)
    # hot issues top-10% >= 1 (K3)
    assert sum(i["is_hot"] for i in issues) == max(1, int(len(issues) * 0.1))
    # bug issues exist and carry severity (F6/F7)
    bug = [i for i in issues if i["is_bug"]]
    assert bug and all(i["severity"] in ("critical", "high", "medium", "low")
                       for i in bug)
    # negative sentiment on bug clusters, positive on event clusters
    ev = [i for i in issues if "이벤트" in i["title"]]
    if ev and bug:
        assert bug[0]["sentiment_avg"] <= ev[0]["sentiment_avg"]
    # hot posts (K4): bounded size, sorted desc
    hp = res["hot_posts"].to_pylist()
    assert 1 <= len(hp) <= 20
    hs = [p["hot_score"] for p in hp]
    assert hs == sorted(hs, reverse=True)
    # summary
    s = res["summary"].to_pylist()[0]
    assert s["n_posts"] == 30
    assert s["n_positive"] + s["n_negative"] + s["n_neutral"] == 30
    # alerts
    alerts = generate_alerts(res)
    assert isinstance(alerts, list)
    if alerts:
        pr = [a["priority"] for a in alerts]
        order = {"critical": 0, "high": 1, "medium": 2, "low": 3}
        assert [order[p] for p in pr] == sorted(order[p] for p in pr)


def test_hot_posts_direct_equals_analysis_tier():
    """hot_posts_direct (no-tokenize fast path used by q_hot_posts when
    the analysis cache is cold) must return rows IDENTICAL to the full
    analysis tier's hot_posts — the two copies of the hot-score/k/
    tie-break logic may not drift apart (ADVICE r03)."""
    from game_review_crawler_ray.pipelines.issues import hot_posts_direct

    tbl = _posts_table()
    full = analyze_posts(ray.data.from_arrow(tbl))["hot_posts"]
    direct = hot_posts_direct(ray.data.from_arrow(tbl))
    assert full.column_names == direct.column_names
    assert full.num_rows == direct.num_rows
    for col in full.column_names:
        assert full.column(col).to_pylist() == direct.column(col).to_pylist(), col


def test_analyze_posts_matches_serial_reference():
    """Distributed partial-aggregate analysis == a naive serial computation
    of the same reference formulas (issue_detector.py:170-257,464-516)."""
    from game_review_crawler_ray.functions.lexicon_ko import (
        NEGATIVE_KO, POSITIVE_KO,
    )
    from game_review_crawler_ray.functions.textproc import (
        combined_post_text, extract_keywords_from_text,
    )
    from game_review_crawler_ray.pipelines.analytics import (
        SentimentScorer, round6,
    )
    from game_review_crawler_ray.pipelines.issues import top_keywords

    tbl = _posts_table()
    rows = tbl.to_pylist()
    res = analyze_posts(ray.data.from_arrow(tbl))

    scorer = SentimentScorer(pos=POSITIVE_KO, neg=NEGATIVE_KO)
    import pandas as pd
    scores = {
        r["url"]: float(scorer.score_frame(
            pd.Series([f"{r['title']} {r['title']} {r['body']}"]))["score"][0])
        for r in rows
    }
    kws = top_keywords(ray.data.from_arrow(tbl), 50)
    clusters = cluster_keywords(kws)
    serial = {}
    for c in clusters:
        members = []
        for r in rows:
            text = combined_post_text(r["title"], r["body"],
                                      [cm["content"] for cm in r["comments"]])
            top100 = set(extract_keywords_from_text(text, top_n=100))
            if top100 & set(c["keywords"]):
                members.append(r)
        serial[c["cluster_id"]] = {
            "post_count": len(members),
            "total_views": sum(m["view_count"] for m in members),
            "total_comments": sum(len(m["comments"]) for m in members),
            "sentiment_avg": float(round6(
                sum(scores[m["url"]] for m in members) / len(members)))
            if members else 0.0,
            "related_posts": sorted(m["url"] for m in members),
            "first_seen": min((m["created_at"] for m in members
                               if m["created_at"] is not None), default=None),
        }
    got = {i["issue_id"]: i for i in res["issues"].to_pylist()}
    assert set(got) == set(serial)
    for cid, exp in serial.items():
        g = got[cid]
        for f in ("post_count", "total_views", "total_comments",
                  "sentiment_avg", "related_posts"):
            assert g[f] == exp[f], (cid, f, g[f], exp[f])
        g_fs = g["first_seen"]
        assert (g_fs is None) == (exp["first_seen"] is None)
        if g_fs is not None:
            assert pd.Timestamp(g_fs) == pd.Timestamp(exp["first_seen"])


# ---------------------------------------------------------------------------
# F3: combined post+comment sentiment (sentiment.py:249-287)
# ---------------------------------------------------------------------------

def _serial_sentiment(text: str) -> tuple[float, float]:
    """Reference analyze(): (score, confidence), serial reimplementation."""
    import re

    from game_review_crawler_ray.functions.lexicon_ko import (
        NEGATIVE_KO, POSITIVE_KO,
    )

    t = re.sub(r"\s+", " ", (text or "").lower()).strip()
    if not t:
        return 0.0, 0.5
    pos = sum(t.count(w) for w in POSITIVE_KO)
    neg = sum(t.count(w) for w in NEGATIVE_KO)
    total = pos + neg
    score = 0.0 if total == 0 else max(-1.0, min(1.0, (pos - neg) / total))
    n_words = len(t.split())
    conf = 0.5 if n_words == 0 else min(1.0, 0.5 + total / n_words * 0.5)
    return score, conf


def test_combined_sentiment_matches_serial_reference():
    from game_review_crawler_ray.pipelines.issues import combined_post_sentiment

    base = datetime(2024, 1, 10, 12, 0, 0)
    rows = []
    comment_sets = [
        [],  # no comments -> plain post result
        ["최고 좋다", "쓰레기 망했다 최악"],
        ["별로", "별로", "대박"],
        ["   "],  # whitespace-only comment -> (0.0, 0.5)
    ]
    for i, cset in enumerate(comment_sets):
        rows.append({
            "url": f"https://h.example.com/p/{i}",
            "title": "버그 제보 최악" if i % 2 else "이벤트 최고 좋다",
            "body": "게임 버그 튕김 짜증" if i % 2 else "보상 대박 재밌다",
            "comments": [{"author": "a", "content": c, "created_at": base,
                          "like_count": 0} for c in cset],
        })
    tbl = pa.Table.from_pylist(rows)
    got = {r["url"]: r for r in
           combined_post_sentiment(ray.data.from_arrow(tbl)).take_all()}
    for row in rows:
        p_score, p_conf = _serial_sentiment(
            f"{row['title']} {row['title']} {row['body']}")
        cres = [_serial_sentiment(c["content"]) for c in row["comments"]]
        if cres:
            c_score = sum(s for s, _ in cres) / len(cres)
            c_conf = sum(c for _, c in cres) / len(cres)
            score = max(-1.0, min(1.0, 0.7 * p_score + 0.3 * c_score))
            conf = (p_conf + c_conf) / 2
        else:
            score, conf = p_score, p_conf
        label = ("positive" if score > 0.1
                 else "negative" if score < -0.1 else "neutral")
        g = got[row["url"]]
        assert abs(g["score"] - score) < 1e-6
        assert abs(g["confidence"] - conf) < 1e-6
        assert g["label"] == label


# ---------------------------------------------------------------------------
# exports
# ---------------------------------------------------------------------------

def test_exports(tmp_path):
    from game_review_crawler_ray.pipelines.exports import (
        get_exporter, register_exporter, write_posts_csv, write_posts_json,
        write_posts_partitioned, write_quicksight,
    )

    posts_tbl = _posts_table()
    long_body = "x" * 1500
    posts_tbl = posts_tbl.set_column(
        posts_tbl.column_names.index("body"), "body",
        pa.array([long_body] + posts_tbl.column("body").to_pylist()[1:]))
    posts = ray.data.from_arrow(posts_tbl)

    jp = write_posts_json(posts, str(tmp_path))
    assert os.listdir(jp)
    pp, cp = write_posts_csv(posts, str(tmp_path))
    assert os.listdir(pp) and os.listdir(cp)
    dp = write_posts_partitioned(posts, str(tmp_path))
    parts = os.listdir(dp)
    assert any(p.startswith("date_key=") for p in parts)
    qs = write_quicksight(posts, None, str(tmp_path), game_id="g1")
    import pandas as pd
    import glob

    posts_csv = pd.concat([pd.read_csv(f) for f in glob.glob(qs["posts"] + "/*")])
    assert posts_csv["body"].str.len().max() <= 1000  # truncation (S9)
    assert (posts_csv["comment_count"] >= 0).all()
    # empty issues -> header-only issues.csv (quicksight_exporter.py:105-113)
    from game_review_crawler_ray.pipelines.exports import ISSUES_CSV_FIELDS
    empty = pd.read_csv(qs["issues"])
    assert list(empty.columns) == ISSUES_CSV_FIELDS and len(empty) == 0

    # registry plugin surface
    register_exporter("noop", lambda ds, o: "noop")
    assert get_exporter("noop")(posts, "") == "noop"
    with pytest.raises(ValueError):
        get_exporter("nope")


def test_quicksight_issues_csv_and_profiles(tmp_path):
    """Fourth QuickSight file with the reference field layout, per-game
    paths via GameProfileManager, analysis store latest-lookup, alert
    summary counts."""
    from game_review_crawler_ray.pipelines.exports import (
        ISSUES_CSV_FIELDS, write_quicksight,
    )
    from game_review_crawler_ray.pipelines.issues import (
        alerts_summary, generate_alerts,
    )
    from game_review_crawler_ray.pipelines.store import AnalysisStore
    from game_review_crawler_ray.state.profiles import (
        GameProfile, GameProfileManager,
    )
    import pandas as pd

    posts = ray.data.from_arrow(_posts_table())
    res = analyze_posts(posts)

    mgr = GameProfileManager()
    mgr.register_game(GameProfile(game_id="g2", game_name="Game Two",
                                  keywords=["버그"], target_sites=["inven"]))
    assert mgr.get_quicksight_path("g2") == "quicksight_data/g2"
    assert mgr.get_data_path("unregistered") == "data/unregistered"
    assert [p.game_id for p in mgr.list_games()] == ["g2"]

    qs = write_quicksight(posts, None, str(tmp_path), game_id="g2",
                          issues=res["issues"], profiles=mgr)
    issues_csv = pd.read_csv(qs["issues"], dtype={"is_bug": str, "is_hot": str})
    assert list(issues_csv.columns) == ISSUES_CSV_FIELDS
    assert len(issues_csv) == res["issues"].num_rows
    assert (issues_csv["game_id"] == "g2").all()
    assert issues_csv["is_bug"].isin(["true", "false"]).all()
    assert "quicksight_data/g2" in qs["issues"]

    # analysis store: timestamped snapshots + latest-lookup
    store = AnalysisStore(str(tmp_path / "data"))
    p1 = store.save_analysis("g2", res, datetime(2024, 1, 1, 10, 0, 0))
    p2 = store.save_analysis("g2", res, datetime(2024, 1, 2, 10, 0, 0))
    assert store.list_analyses("g2") == [p1, p2]
    latest = store.get_latest_analysis("g2")
    assert latest["analyzed_at"] == "2024-01-02T10:00:00"
    assert latest["summary"][0]["n_posts"] == 30
    assert store.get_latest_analysis("nope") is None

    # alert summary (alert_manager.py:467-508)
    alerts = generate_alerts(res)
    s = alerts_summary(alerts)
    assert s["total_alerts"] == len(alerts)
    assert (s["urgent_count"] + s["hot_issue_count"] + s["bug_count"]
            == len(alerts))
    if alerts:
        assert s["top_alert"] == alerts[0]
    assert alerts_summary([])["total_alerts"] == 0


def test_distinct_search_adapters():
    """S3/S4 adapter semantics: DDG error-message throttle classification,
    CSE credential gate + hard cap of 10, direct-crawl unfiltered list."""
    from game_review_crawler_ray.sources.search import (
        AdapterThrottled, DirectCrawlAdapter, DuckDuckGoAdapter,
        GoogleCSEAdapter, SearchManager, SearchCache,
    )

    pages = [{"url": f"https://a.example.com/p/{i}",
              "host": "a.example.com",
              "title": f"버그 제보 {i}" if i % 2 else f"이벤트 {i}",
              "text": "버그 오류 발생" if i % 2 else "이벤트 공지"}
             for i in range(30)]

    ddg = DuckDuckGoAdapter(pages, raw_errors=["Ratelimit 429 from upstream"])
    with pytest.raises(AdapterThrottled):
        ddg.search(["버그"], "a.example.com")
    assert ddg.search(["버그"], "a.example.com")  # recovered

    cse = GoogleCSEAdapter(pages)
    assert not cse.is_available()
    with pytest.raises(RuntimeError):
        cse.search(["버그"], "a.example.com")
    cse = GoogleCSEAdapter(pages, api_key="k", cse_id="c")
    assert cse.is_available()
    res = cse.search([], "a.example.com", max_results=25)
    assert len(res) == 10  # CSE hard cap (adapters.py:236)

    direct = DirectCrawlAdapter(pages)
    res = direct.search(["존재하지않는키워드"], "a.example.com", max_results=5)
    assert len(res) == 5  # list crawl ignores keyword containment

    # failover: throttled DDG -> CSE serves, sticky on CSE afterwards
    mgr = SearchManager(cache=SearchCache(ttl=0), relevance_threshold=0.0)
    mgr.register_adapter(DuckDuckGoAdapter(pages, raw_errors=["429", "429"]))
    mgr.register_adapter(GoogleCSEAdapter(pages, api_key="k", cse_id="c"))
    out = mgr.search(["버그"], "a.example.com")
    assert out and mgr._current == 1


def test_multimodal_resize_and_frames():
    from game_review_crawler_ray.stages.multimodal import (
        FrameSampler, gen_media, media_frames, media_resize,
    )

    media = gen_media(40, seed=7)
    resized = media_resize(media, target_w=32, target_h=32).take_all()
    for r in resized:
        if r["kind"] == "image":
            assert r["width"] == 32 and r["height"] == 32
            assert len(r["payload"]) == 32 * 32
        else:  # audio untouched
            assert r["sample_rate"] == 16000

    frames = media_frames(media, n_frames=4, frame_bytes=128).take_all()
    by_media: dict[int, list] = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f)
    kinds = {r["media_id"]: r["kind"] for r in media.to_pylist()}
    for mid, fs in by_media.items():
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs == list(range(len(fs)))
        if kinds[mid] == "image":
            assert len(fs) == 1
        else:
            assert 1 <= len(fs) <= 4
            assert all(len(f["frame"]) <= 128 for f in fs)
    # deterministic across runs
    frames2 = media_frames(media, n_frames=4, frame_bytes=128).take_all()
    key = lambda f: (f["media_id"], f["frame_idx"])
    assert sorted(frames, key=key) == sorted(frames2, key=key)


def test_load_exported_posts_tags_sources(tmp_path):
    from game_review_crawler_ray.pipelines.exports import (
        load_exported_posts, write_posts_json,
    )

    posts = ray.data.from_arrow(_posts_table())
    d1 = write_posts_json(posts, str(tmp_path / "g1"))
    d2 = write_posts_json(posts, str(tmp_path / "g2"))
    ds = load_exported_posts({"g1": d1, "g2": d2})
    rows = ds.take_all()
    assert len(rows) == 60
    tags = {r["game_id"] for r in rows}
    assert tags == {"g1", "g2"}
    assert all("url" in r for r in rows)


# ---------------------------------------------------------------------------
# DataFilter family (data_filter.py:15-229)
# ---------------------------------------------------------------------------

def test_datafilter_family_matches_serial():
    from game_review_crawler_ray.pipelines.filters import (
        FilterCriteria, IssueTypeFilter, SentimentFilter, SortField,
        SortOrder, apply_criteria, filter_by_issue_type,
        filter_by_sentiment, sort_posts,
    )

    tbl = _posts_table()
    rows = tbl.to_pylist()
    ds = ray.data.from_arrow(tbl)

    crit = FilterCriteria(
        start_date=datetime(2024, 1, 10, 5, 0, 0),
        end_date=datetime(2024, 1, 10, 20, 0, 0),
        sites=["h1.example.com", "h2.example.com"],
        min_view_count=500, min_comment_count=1,
    )
    got = sorted(r["url"] for r in apply_criteria(ds, crit).take_all())
    exp = sorted(
        r["url"] for r in rows
        if crit.start_date <= r["created_at"] <= crit.end_date
        and r["site"] in crit.sites
        and r["view_count"] >= 500 and len(r["comments"]) >= 1)
    assert got == exp and got

    # game filter: '버그' hits bug posts via title
    from game_review_crawler_ray.pipelines.filters import filter_by_game
    got = sorted(r["url"] for r in filter_by_game(ds, ["버그"]).take_all())
    exp = sorted(r["url"] for r in rows
                 if "버그" in r["title"] or "버그" in r["body"])
    assert got == exp

    # sort by comment count desc with url tie-break
    out = sort_posts(ds, SortField.COMMENT_COUNT, SortOrder.DESC).take_all()
    keys = [(-r["comment_count"], r["url"]) for r in out]
    assert keys == sorted(keys)

    # sentiment/issue-type filters over a scored table
    scored = pa.table({
        "url": pa.array(["a", "b", "c", "d"]),
        "score": pa.array([0.5, -0.5, 0.0, -0.2]),
        "label": pa.array(["positive", "negative", "neutral", "negative"]),
        "is_bug": pa.array([True, False, True, False]),
        "is_hot": pa.array([False, True, False, False]),
    })
    sds = ray.data.from_arrow(scored)
    neg = filter_by_sentiment(sds, SentimentFilter.NEGATIVE, min_score=-0.3)
    assert sorted(r["url"] for r in neg.take_all()) == ["d"]
    bug = filter_by_issue_type(sds, IssueTypeFilter.BUG)
    assert sorted(r["url"] for r in bug.take_all()) == ["a", "c"]
    norm = filter_by_issue_type(sds, IssueTypeFilter.NORMAL)
    assert sorted(r["url"] for r in norm.take_all()) == ["d"]


# ---------------------------------------------------------------------------
# search tier
# ---------------------------------------------------------------------------

def _index():
    from game_review_crawler_ray.sources.corpus import gen_pages

    pages, _ = gen_pages(150, n_hosts=8, seed=11)
    return pages_index_from_corpus(pages)


def test_corpus_search_and_query():
    idx = _index()
    assert build_query(["버그", "몬헌"], "inven.co.kr") == "버그 AND 몬헌 site:inven.co.kr"
    ad = CorpusSearchAdapter(idx)
    res = ad.search(["업데이트"], "inven.co.kr", max_results=5)
    assert len(res) <= 5
    for r in res:
        assert "inven.co.kr" in r.url


def test_search_cache_ttl_and_key_canonicalization():
    now = [1000.0]
    cache = SearchCache(ttl=10, clock=lambda: now[0])
    assert SearchCache.cache_key(["a", "b"], "s") == SearchCache.cache_key(["b", "a"], "s")
    assert SearchCache.cache_key(["a"], "s1") != SearchCache.cache_key(["a"], "s2")
    cache.put(["a", "b"], "s", ["r1"])
    assert cache.get(["b", "a"], "s") == ["r1"]   # order-insensitive hit
    now[0] += 11
    assert cache.get(["a", "b"], "s") is None     # TTL expired
    cache.put(["x"], "s", ["r2"])
    now[0] += 11
    assert cache.cleanup() == 1
    assert cache.stats()["entries"] == 0


def test_manager_failover_sticky_and_throttle():
    idx = _index()
    bad = CorpusSearchAdapter(idx, fail_times=1)
    throttled = CorpusSearchAdapter(idx, throttle_times=1)
    good = CorpusSearchAdapter(idx)
    now = [0.0]
    mgr = SearchManager(relevance_threshold=0.0, clock=lambda: now[0])
    mgr.cache._clock = lambda: now[0]
    for a in (bad, throttled, good):
        mgr.register_adapter(a)
    res = mgr.search(["업데이트"], "example.com")
    # bad failed, throttled raised -> good served; sticky index moved to good
    assert good.calls == 1 and mgr._current == 2
    res2 = mgr.search(["서버"], "example.com")
    assert good.calls == 2  # sticky adapter tried first
    # throttled adapter stays cooled down until the window passes
    assert mgr._throttled_until[1] > 0
    # cache serves repeats without adapter calls
    mgr.search(["서버"], "example.com")
    assert good.calls == 2
