"""Frontier shard properties: politeness intervals, jitter range, backoff
powers, suspension, robots, dedup — ported from the reference's property
suite (tests/test_rate_limiter_property.py Properties 7-9,
test_jitter_range_property.py Property 13) onto fetch_log timestamps
instead of wall-clock sleeps."""

import collections

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from game_review_crawler_ray.config import CrawlConfig
from game_review_crawler_ray.functions.urlnorm import annotate_urls
from game_review_crawler_ray.state.bloom import BloomSeen, ExactSeen
from game_review_crawler_ray.state.frontier import FrontierShard
from game_review_crawler_ray.state.robots import parse_robots


def _seed_table(urls):
    return annotate_urls(pa.table({
        "url": urls,
        "seed_rank": list(range(len(urls))),
        "keyword": ["k"] * len(urls),
    }))


def _offer(shard, urls):
    """Offer + reconstruct the granted table from the compact response."""
    t = _seed_table(urls)
    g = shard.offer(t)
    taken = t.take(pa.array(g["idx"], pa.int64()))
    return (taken.append_column("grant_seq", pa.array(g["grant_seq"], pa.int64()))
            .append_column("sched_s", pa.array(g["sched_s"], pa.float64()))
            .append_column("wait_s", pa.array(g["wait_s"], pa.float64())))


def test_first_request_no_wait_then_min_gap():
    cfg = CrawlConfig(num_frontier_shards=1)
    sh = FrontierShard(0, cfg)
    urls = [f"https://h1.example.com/p/{i}" for i in range(20)]
    g = _offer(sh, urls)
    waits = g.column("wait_s").to_pylist()
    scheds = g.column("sched_s").to_pylist()
    assert waits[0] == 0.0
    jmin, jmax = cfg.jitter_range
    for w in waits[1:]:
        assert cfg.default_delay + jmin <= w <= cfg.default_delay + jmax
    gaps = np.diff(sorted(scheds))
    assert (gaps >= cfg.default_delay + jmin - 1e-9).all()


@given(st.floats(0.0, 3.0), st.floats(0.0, 3.0))
@settings(max_examples=25, deadline=None)
def test_jitter_within_configured_range(a, b):
    jmin, jmax = min(a, b), max(a, b)
    cfg = CrawlConfig(jitter_range=(jmin, jmax), num_frontier_shards=1)
    sh = FrontierShard(0, cfg)
    for k in range(1, 30):
        j = sh._jitter("host.example.com", k)
        assert jmin <= j <= jmax


def test_jitter_disabled_and_deterministic():
    cfg = CrawlConfig(jitter_enabled=False, num_frontier_shards=1)
    assert FrontierShard(0, cfg)._jitter("h", 1) == 0.0
    cfg2 = CrawlConfig(num_frontier_shards=1)
    assert FrontierShard(0, cfg2)._jitter("h", 5) == FrontierShard(0, cfg2)._jitter("h", 5)


def test_per_host_override_independent():
    cfg = CrawlConfig(host_delays={"slow.example.com": 10.0}, num_frontier_shards=1)
    sh = FrontierShard(0, cfg)
    g = _offer(sh, [f"https://slow.example.com/{i}" for i in range(5)]
               + [f"https://fast.example.com/{i}" for i in range(5)])
    by_host = collections.defaultdict(list)
    for r in g.to_pylist():
        by_host[r["host"]].append(r["wait_s"])
    assert all(w >= 10.5 for w in by_host["slow.example.com"][1:])
    assert all(w <= 5.0 for w in by_host["fast.example.com"][1:])


def test_backoff_powers_and_suspension():
    cfg = CrawlConfig(num_frontier_shards=1)
    sh = FrontierShard(0, cfg)
    results = [sh.report_429("h.example.com") for _ in range(4)]
    assert [r[1] for r in results[:3]] == [2.0, 4.0, 8.0]
    assert results[3] == (False, 0.0)
    assert sh.is_suspended("h.example.com")
    # suspended host urls are refused at grant time
    g = _offer(sh, ["https://h.example.com/x"])
    assert g.num_rows == 0
    # success resets; resume clears suspension
    sh.resume_host("h.example.com")
    assert not sh.is_suspended("h.example.com")
    sh.report_429("h.example.com")
    sh.report_success("h.example.com")
    assert sh.report_429("h.example.com")[1] == 2.0  # counter was reset


def test_dedup_first_wins_and_preload():
    cfg = CrawlConfig(num_frontier_shards=1)
    sh = FrontierShard(0, cfg)
    g1 = _offer(sh, ["https://a.example.com/1", "https://a.example.com/1/",
                     "https://a.example.com/1#f", "https://a.example.com/2"])
    assert g1.column("url").to_pylist() == ["https://a.example.com/1", "https://a.example.com/2"]
    g2 = _offer(sh, ["https://a.example.com/2", "https://a.example.com/3"])
    assert g2.column("url").to_pylist() == ["https://a.example.com/3"]
    # preload acts as resume anti-join
    sh2 = FrontierShard(0, cfg)
    t = _seed_table(["https://a.example.com/9"])
    sh2.preload_hashes(np.asarray(t.column("url_hash").to_numpy(), dtype=np.uint64))
    assert _offer(sh2, ["https://a.example.com/9"]).num_rows == 0


def test_robots_rules():
    r = parse_robots("User-agent: *\nDisallow: /private/\nAllow: /private/ok\nCrawl-delay: 7")
    assert not r.allowed("/private/x")
    assert r.allowed("/private/ok/page")
    assert r.allowed("/public")
    assert r.crawl_delay == 7.0
    r2 = parse_robots("User-agent: other\nDisallow: /\n\nUser-agent: mybot\nDisallow: /no",
                      agent="mybot")
    assert r2.disallow == ["/no"] and r2.allowed("/yes") and not r2.allowed("/no")
    # unknown agent with no * group -> allow all
    assert parse_robots("User-agent: other\nDisallow: /", "any").allowed("/anything")
    assert parse_robots("", "any").allowed("/anything")


def test_bloom_seen_no_false_negatives():
    b = BloomSeen(capacity=10_000, fpp=1e-3)
    keys = np.random.default_rng(0).integers(0, 2**63, 5000, dtype=np.uint64)
    fresh = b.add_if_new(keys)
    uniq = len(set(keys.tolist()))
    assert fresh.sum() <= uniq
    assert b.contains(keys).all()          # no false negatives
    other = np.random.default_rng(1).integers(0, 2**63, 5000, dtype=np.uint64)
    fp = b.contains(other).sum()
    assert fp < 50                          # fpp sanity
    e = ExactSeen()
    f1 = e.add_if_new(np.array([1, 2, 1], dtype=np.uint64))
    assert f1.tolist() == [True, True, False]


def test_bloom_vectorized_matches_exact():
    """Batched add_if_new == ExactSeen over streams with in-batch and
    cross-batch duplicates (realistic 64-bit hash keys, fpp tight enough
    that no false positive is expected at this scale)."""
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    b = BloomSeen(capacity=10_000, fpp=1e-6)
    e = ExactSeen()
    for _ in range(20):
        batch = pool[rng.integers(0, len(pool), size=200)]
        mb = b.add_if_new(batch.copy())
        me = e.add_if_new(batch.copy())
        assert (mb == me).all()
    assert b.add_if_new(np.array([], dtype=np.uint64)).shape == (0,)


def test_denied_log_and_flush(tmp_path):
    """The shard logs only DENIED rows (robots/suspended); granted-row
    lineage is written by the pipeline's write_log stage."""
    cfg = CrawlConfig(num_frontier_shards=1)
    sh = FrontierShard(0, cfg)
    sh.set_checkpoint_dir(str(tmp_path))
    sh.set_robots("h.example.com", "User-agent: *\nDisallow: /blocked")
    granted = _offer(sh, [f"https://h.example.com/blocked/{i}" for i in range(5)]
                     + ["https://h.example.com/ok"])
    assert granted.num_rows == 1
    path = sh.flush_log()
    import pyarrow.parquet as pq
    t = pq.read_table(path)
    assert t.num_rows == 5
    assert set(t.column("status").to_pylist()) == {"robots_denied"}
    assert sh.flush_log() is None  # nothing new


def test_priority_queue_pull_model():
    """enqueue/drain: per-host priority order + global politeness order."""
    cfg = CrawlConfig(num_frontier_shards=1, jitter_enabled=False)
    sh = FrontierShard(0, cfg)
    # enqueue out of priority order across two hosts
    urls = [("https://a.example.com/3", 3), ("https://a.example.com/1", 1),
            ("https://b.example.com/2", 2), ("https://a.example.com/5", 5),
            ("https://b.example.com/0", 0)]
    t = annotate_urls(pa.table({
        "url": [u for u, _ in urls],
        "seed_rank": [r for _, r in urls],
        "keyword": ["k"] * len(urls),
    }))
    assert sh.enqueue(t) == 5
    assert sh.queue_depth() == 5
    g = sh.drain(limit=10)
    rows = g.to_pylist()
    # within each host: priority (seed_rank) ascending
    for host in ("a.example.com", "b.example.com"):
        ranks = [r["discovered_seq"] for r in rows if r["host"] == host]
        assert ranks == sorted(ranks)
    # politeness: per-host gaps >= delay (jitter disabled)
    for host in ("a.example.com", "b.example.com"):
        scheds = sorted(r["sched_s"] for r in rows if r["host"] == host)
        for x, y in zip(scheds, scheds[1:]):
            assert y - x >= cfg.default_delay - 1e-9
    # drained everything; idempotent on empty
    assert sh.queue_depth() == 0
    assert sh.drain().num_rows == 0
    # dedup on enqueue
    assert sh.enqueue(t) == 0


def test_priority_queue_respects_limit_and_suspension():
    cfg = CrawlConfig(num_frontier_shards=1, jitter_enabled=False)
    sh = FrontierShard(0, cfg)
    t = annotate_urls(pa.table({
        "url": [f"https://h.example.com/{i}" for i in range(6)],
        "seed_rank": list(range(6)),
        "keyword": ["k"] * 6,
    }))
    sh.enqueue(t)
    g1 = sh.drain(limit=2)
    assert g1.num_rows == 2 and sh.queue_depth() == 4
    # suspend the host: remaining urls drain as logged denials, not grants
    for _ in range(4):
        sh.report_429("h.example.com")
    g2 = sh.drain(limit=10)
    assert g2.num_rows == 0
    assert sh.queue_depth() == 0


def test_apply_grants_fn_is_position_free():
    """The pre-grant join must be correct under ANY Ray Data batching:
    bundled blocks, reordered rows, rows from several shards mixed."""
    import ray

    from game_review_crawler_ray.pipelines.crawl import (
        _concat_grants, apply_grants_fn)

    urls = [f"https://h{i % 4}.example.com/p{i}" for i in range(40)]
    batch = annotate_urls(pa.table({
        "url": urls, "seed_rank": list(range(40)), "keyword": ["k"] * 40}))
    cfg = CrawlConfig(num_frontier_shards=1)
    shard = FrontierShard(0, cfg)
    # two block-sized offers, as the driver would fire them
    g1 = shard.offer(batch.slice(0, 25), True)
    g2 = shard.offer(batch.slice(25), True)
    grants_ref = _concat_grants.remote(g1, g2)
    apply = apply_grants_fn(grants_ref)

    # bundled + reversed batch spanning both original blocks
    shuffled = batch.take(pa.array(list(reversed(range(40)))))
    out = apply(shuffled)
    assert out.num_rows == 40  # all unique -> all granted
    # each row carries ITS OWN grant: rebuild expected map from responses
    expected = {}
    for g, base in ((g1, 0), (g2, 25)):
        for j, i in enumerate(g["idx"]):
            expected[base + int(i)] = (int(g["grant_seq"][j]),
                                       float(g["sched_s"][j]))
    got = {int(r["discovered_seq"]): (int(r["grant_seq"]),
                                      float(r["sched_s"]))
           for r in out.to_pylist()}
    assert got == expected

    # a duplicate-of-granted row (same url_hash) was denied by the shard;
    # in exact mode prep removes it before blocks form, so the join only
    # ever sees each hash once — but an all-denied batch must come back
    # empty with the grant schema
    dup = shard.offer(batch.slice(0, 5), True)
    assert len(dup["idx"]) == 0
    empty = apply(batch.slice(0, 0))
    assert empty.num_rows == 0
    assert "grant_seq" in empty.column_names
