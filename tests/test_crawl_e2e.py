"""End-to-end crawl pipeline conformance (Ray Data execution):

- posts byte-identical to the corpus oracle,
- crawl order == reference serial-loop order (via discovered_seq),
- URL-seen membership == reference seen set,
- per-host politeness invariant from fetch_log,
- 429 backoff/suspension end-to-end,
- kill-and-resume equivalence from the fetch_log checkpoint.
"""

import collections

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from game_review_crawler_ray.config import CrawlConfig
from game_review_crawler_ray.functions.urlnorm import normalize_url
from game_review_crawler_ray.pipelines.crawl import load_fetch_log, run_crawl
from game_review_crawler_ray.sources.corpus import gen_pages
from game_review_crawler_ray.sources.seeds import gen_seeds

from .reference_sim import simulate_reference_crawl


@pytest.fixture(scope="module")
def corpus():
    pages, expected = gen_pages(400, n_hosts=10, seed=77)
    seeds = gen_seeds(pages.column("url").to_pylist(), seed=77)
    return pages, expected, seeds


def _read_posts(res):
    return pq.read_table(res["posts_dir"])


@pytest.mark.parametrize("seed_prep", ["driver", "raydata"])
def test_e2e_conformance(tmp_path, corpus, seed_prep):
    pages, expected, seeds = corpus
    cfg = CrawlConfig(num_frontier_shards=3, fetch_concurrency=2,
                      seed_prep=seed_prep)
    res = run_crawl(pages, seeds, str(tmp_path / "out"), cfg)
    posts = _read_posts(res)

    # 1. byte-identical extraction vs the independent oracle
    exp_ok = {u: e for u, e in expected.items() if e is not None}
    rows = posts.to_pylist()
    assert rows
    for r in rows:
        e = exp_ok[r["url"]]
        assert r["body"] == e["body"]
        assert r["title"] == e["title"]
        assert r["comments"] == e["comments"]

    # 2. ordering + seen-set vs the reference serial simulation
    corpus_map = dict(zip(pages.column("url").to_pylist(),
                          pages.column("html").to_pylist()))
    ref_order, ref_seen, ref_posts = simulate_reference_crawl(
        seeds.column("url").to_pylist(), corpus_map)
    engine_order = [r["url"] for r in sorted(rows, key=lambda r: r["discovered_seq"])]
    assert engine_order == ref_order
    log = load_fetch_log(str(tmp_path / "out"))
    engine_granted_norms = {r["url_norm"] for r in log.to_pylist()
                            if r["grant_seq"] >= 0}
    # URL-seen membership: engine grants exactly the reference's seen set
    assert engine_granted_norms == ref_seen

    # 3. politeness: per-host inter-arrival within [delay+jmin, delay+jmax]
    jmin, jmax = cfg.jitter_range
    by_host = collections.defaultdict(list)
    for r in log.to_pylist():
        if r["grant_seq"] >= 0:
            by_host[r["host"]].append(r["fetch_ts"])
    for host, ts in by_host.items():
        ts = sorted(ts)
        for a, b in zip(ts, ts[1:]):
            gap = (b - a).total_seconds()
            assert gap >= cfg.default_delay + jmin - 1e-6, host
            assert gap <= cfg.default_delay + jmax + 1e-6, host

    # 4. counters
    assert res["metrics"]["granted"] == len(ref_seen)
    assert posts.num_rows == len(ref_order)


def test_429_backoff_and_suspension(tmp_path, corpus):
    pages, expected, seeds = corpus
    cfg = CrawlConfig(num_frontier_shards=2, fetch_concurrency=1)
    hot = "bbs.ruliweb.com"
    # 2 simulated 429s: retried within budget, then everything succeeds
    res = run_crawl(pages, seeds, str(tmp_path / "a"), cfg,
                    rate_limited={hot: 2})
    log = load_fetch_log(str(tmp_path / "a"))
    st = collections.Counter(log.column("status").to_pylist())
    assert st.get("suspended", 0) == 0
    attempts = [r["attempt"] for r in log.to_pylist() if r["host"] == hot]
    assert max(attempts) == 3  # two retries on the first fetched url

    # 10 simulated 429s: exceeds max_retries -> host suspended, rest skipped
    res2 = run_crawl(pages, seeds, str(tmp_path / "b"), cfg,
                     rate_limited={hot: 10})
    log2 = load_fetch_log(str(tmp_path / "b"))
    st2 = collections.Counter(
        r["status"] for r in log2.to_pylist() if r["host"] == hot)
    assert st2["suspended"] >= 1
    assert st2.get("ok", 0) == 0
    posts2 = _read_posts(res2)
    assert all(r["host"] != hot for r in posts2.to_pylist())


def test_429_pre_grant_vs_streaming(tmp_path, corpus):
    """Rate-limited hosts no longer force the streaming-offer path: the
    owning shard consumes the 429 budget at offer time (pre_grant=True).
    Terminal semantics must match the streaming path — same successful
    posts, same hot-host suspension outcome (the two paths may differ in
    WHERE the denial lineage row is emitted, frontier vs fetch)."""
    pages, expected, seeds = corpus
    hot = "bbs.ruliweb.com"
    for budget, expect_suspended in ((2, False), (10, True)):
        urls = {}
        for mode, pre in (("pre", True), ("stream", False)):
            cfg = CrawlConfig(num_frontier_shards=2, fetch_concurrency=1,
                              pre_grant=pre)
            res = run_crawl(pages, seeds, str(tmp_path / f"{mode}{budget}"),
                            cfg, rate_limited={hot: budget})
            posts = _read_posts(res)
            urls[mode] = sorted(posts.column("url").to_pylist())
            log = load_fetch_log(str(tmp_path / f"{mode}{budget}"))
            st = collections.Counter(
                r["status"] for r in log.to_pylist() if r["host"] == hot)
            if expect_suspended:
                assert st.get("ok", 0) == 0 and st["suspended"] >= 1, mode
            else:
                assert st.get("suspended", 0) == 0, mode
        assert urls["pre"] == urls["stream"], budget


def test_robots_denial(tmp_path, corpus):
    pages, expected, seeds = corpus
    cfg = CrawlConfig(num_frontier_shards=2, fetch_concurrency=1)
    res = run_crawl(pages, seeds, str(tmp_path / "r"), cfg,
                    robots={"gall.dcinside.com": "User-agent: *\nDisallow: /board/"})
    log = load_fetch_log(str(tmp_path / "r"))
    dc = [r for r in log.to_pylist() if r["host"] == "gall.dcinside.com"]
    assert dc and all(r["status"] == "robots_denied" for r in dc)
    assert all(r["host"] != "gall.dcinside.com" for r in _read_posts(res).to_pylist())


def test_kill_and_resume(tmp_path, corpus):
    """A run killed mid-way resumes from the fetch_log checkpoint and the
    union of outputs equals an uninterrupted run."""
    pages, expected, seeds = corpus
    out = str(tmp_path / "res")
    cfg = CrawlConfig(num_frontier_shards=2, fetch_concurrency=1)
    # "killed" run: only the first 40% of the seed list got processed
    n_cut = int(seeds.num_rows * 0.4)
    res1 = run_crawl(pages, seeds.slice(0, n_cut), out, cfg)
    posts1 = _read_posts(res1)
    log1 = load_fetch_log(out)
    assert log1.num_rows > 0

    # resume with the full seed list
    res2 = run_crawl(pages, seeds, out, cfg, resume=True)
    log2 = load_fetch_log(out)
    posts_all = pq.read_table(res2["posts_dir"])

    # no url fetched twice across the two runs
    norms = [r["url_norm"] for r in log2.to_pylist() if r["status"] == "ok"]
    assert len(norms) == len(set(norms))

    # union equals a fresh uninterrupted run
    res_full = run_crawl(pages, seeds, str(tmp_path / "full"),
                         CrawlConfig(num_frontier_shards=2, fetch_concurrency=1))
    full = _read_posts(res_full)
    assert set(r["url"] for r in posts_all.to_pylist()) == \
        set(r["url"] for r in full.to_pylist())


def test_load_fetch_log_resolution_is_file_order_independent(tmp_path):
    """Duplicate url_norm rows resolve by max (grant_seq, fetch_ts), not by
    lineage-file enumeration order (uuid filenames sort randomly)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from game_review_crawler_ray.state.frontier import FETCH_LOG_SCHEMA

    def row(status, grant_seq, ts_s):
        return {
            "url": "https://h/p", "url_norm": "https://h/p", "host": "h",
            "fetch_ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts_s),
            "status": status, "attempt": 1, "wait_s": 0.0,
            "grant_seq": grant_seq, "discovered_seq": 0, "partition_id": 0,
        }

    log_dir = tmp_path / "fetch_log"
    log_dir.mkdir()
    # the LATER grant (seq 5, ok) lives in the file that sorts FIRST; the
    # stale row (seq 1) sorts last — file-order last-wins would pick seq 1
    pq.write_table(pa.Table.from_pylist([row("ok", 5, 10.0)],
                                        schema=FETCH_LOG_SCHEMA),
                   log_dir / "aaa.parquet")
    pq.write_table(pa.Table.from_pylist([row("retry_pending", 1, 3.0)],
                                        schema=FETCH_LOG_SCHEMA),
                   log_dir / "zzz.parquet")
    log = load_fetch_log(str(tmp_path)).to_pylist()
    assert len(log) == 1
    assert log[0]["grant_seq"] == 5 and log[0]["status"] == "ok"


def test_bloom_mode_no_duplicate_fetches(tmp_path, corpus):
    """seen_exact=False: the frontier's bloom shards are the ONLY dedup
    line (seed prep skips the exact first-wins pass). Feeding every seed
    twice must still fetch each URL at most once — this pins the gate that
    keeps the pre-offered-grant hash join off in bloom mode, where a
    shard-denied dup row would otherwise match its original's grant and be
    fetched twice."""
    pages, expected, seeds = corpus
    shifted = seeds.set_column(
        seeds.schema.get_field_index("seed_rank"), "seed_rank",
        pc.add(seeds.column("seed_rank"),
               pa.scalar(seeds.num_rows, pa.int64())))
    dup = pa.concat_tables([seeds, shifted])
    cfg = CrawlConfig(num_frontier_shards=3, fetch_concurrency=2,
                      seen_exact=False)
    res = run_crawl(pages, dup, str(tmp_path / "out"), cfg)
    posts = _read_posts(res)
    urls = posts.column("url").to_pylist()
    assert len(urls) == len(set(urls))
    exp_ok = {u for u, e in expected.items() if e is not None}
    assert set(urls) == exp_ok


def test_pre_grant_equals_streaming_offers(tmp_path, corpus):
    """The pre-offered-grant path (driver fires offers, pipeline joins by
    url_hash) must produce EXACTLY the streaming offer stage's output:
    same granted set, same grant_seq/politeness schedule, same lineage."""
    pages, expected, seeds = corpus

    outs = {}
    for mode, pre in (("pre", True), ("stream", False)):
        cfg = CrawlConfig(num_frontier_shards=3, fetch_concurrency=2,
                          pre_grant=pre)
        res = run_crawl(pages, seeds, str(tmp_path / mode), cfg)
        posts = _read_posts(res).to_pandas().sort_values("url")
        log = load_fetch_log(res["fetch_log_dir"]).to_pandas() \
            .sort_values("url_norm")
        outs[mode] = (posts, log)

    p1, l1 = outs["pre"]
    p2, l2 = outs["stream"]
    assert list(p1["url"]) == list(p2["url"])
    for col in ("title", "body", "view_count"):
        assert list(p1[col]) == list(p2[col])
    for col in ("url_norm", "host", "status", "grant_seq",
                "discovered_seq", "wait_s", "fetch_ts"):
        assert list(l1[col]) == list(l2[col]), col
