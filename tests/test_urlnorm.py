"""URL normalization / dedup properties (reference Requirements 3.4,
tests/test_url_deduplicator? — semantics from url_deduplicator.py:14-62)."""

import pyarrow as pa
from hypothesis import given, strategies as st

from game_review_crawler_ray.functions.urlnorm import (
    annotate_urls, extract_host, normalize_url, url_hash64,
)


def test_normalize_basics():
    assert normalize_url("HTTPS://Example.COM/A/B/") == "https://example.com/a/b"
    assert normalize_url("https://example.com/a#frag") == "https://example.com/a"
    assert normalize_url("https://example.com/a?q=1#f") == "https://example.com/a?q=1"
    assert normalize_url("  https://example.com/x  ") == "https://example.com/x"
    assert normalize_url("notaurl") == "notaurl"


def test_normalize_idempotent_on_canonical():
    u = "https://gall.dcinside.com/board/123"
    assert normalize_url(u) == u


@given(st.text(max_size=80))
def test_normalize_total_function(s):
    # never raises; lowercase; idempotent on its own output
    out = normalize_url(s)
    assert out == out.lower()
    assert normalize_url(out) == normalize_url(normalize_url(out))


def test_extract_host():
    assert extract_host("https://bbs.ruliweb.com/board/1") == "bbs.ruliweb.com"
    assert extract_host("bbs.ruliweb.com") == "bbs.ruliweb.com"


def test_hash_stable_and_distinct():
    h1 = url_hash64("https://a.com/x")
    assert h1 == url_hash64("https://a.com/x")
    assert h1 != url_hash64("https://a.com/y")
    assert 0 <= h1 < 2**64


def test_annotate_urls_batch():
    t = pa.table({
        "url": ["HTTPS://A.com/p/", "https://b.com/q#z"],
        "seed_rank": [0, 1],
        "keyword": ["k", "k"],
    })
    out = annotate_urls(t)
    assert out.column("url_norm").to_pylist() == ["https://a.com/p", "https://b.com/q"]
    assert out.column("host").to_pylist() == ["a.com", "b.com"]
    assert out.column("url_hash").type == pa.uint64()


URLISH = st.one_of(
    st.text(max_size=60),
    st.builds(
        lambda scheme, host, path, q, frag: f"{scheme}://{host}{path}{q}{frag}",
        st.sampled_from(["http", "https", "HTTP", "HTTPS", "ftp"]),
        st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
        st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,10}){0,4}/?", fullmatch=True),
        st.one_of(st.just(""), st.from_regex(r"\?[A-Za-z0-9=&/?]{0,12}", fullmatch=True)),
        st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9/?]{0,8}", fullmatch=True)),
    ),
)


@given(URLISH)
def test_fast_normalize_equals_reference_impl(u):
    from game_review_crawler_ray.functions.urlnorm import _normalize_fast

    assert _normalize_fast(u) == normalize_url(u)


@given(st.lists(URLISH, min_size=1, max_size=8))
def test_batch_normalize_equals_reference_impl(us):
    # the vectorized RE2 kernel must agree with the per-row reference on
    # arbitrary text, including query strings that themselves contain '?'
    # (regression: 'http://a/b?x=1?' must keep its trailing '?')
    from game_review_crawler_ray.functions.urlnorm import normalize_url_batch

    got = normalize_url_batch(pa.array(us, type=pa.string())).to_pylist()
    assert got == [normalize_url(u) for u in us]


def test_batch_normalize_trailing_question_regressions():
    from game_review_crawler_ray.functions.urlnorm import normalize_url_batch

    cases = ["http://a/b?x=1?", "http://a/??", "http://a/b/?", "?",
             "http://a/b?", "http://a/b?//", "http://a/b/??x"]
    got = normalize_url_batch(pa.array(cases, type=pa.string())).to_pylist()
    assert got == [normalize_url(u) for u in cases]
