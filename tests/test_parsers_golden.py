"""Golden-HTML parser fixtures (reference test model:
tests/test_site_parsers_unit.py) + full-corpus byte-identical conformance."""

from datetime import datetime

import pytest

from game_review_crawler_ray.functions.parsers import (
    DCInsideParser, GenericParser, InvenParser, ParseFailure, ParserRegistry,
    RuliwebParser, parse_page,
)
from game_review_crawler_ray.sources.corpus import gen_pages


INVEN_HTML = """
<html><body>
<div class="articleHead">
  <div class="articleTitle">몬헌 신규 무기 평가</div>
  <span class="articleWriter">헌터왕</span>
  <span class="articleDate">2024-03-05 14:30</span>
  <span class="articleHit">조회 12,345</span>
  <span class="articleLike">추천 678</span>
</div>
<div class="articleContent"><p>첫 줄 내용입니다</p><p>둘째 줄!</p></div>
<div class="comment-list">
  <div class="comment-item"><span class="nickname">댓글러</span><span class="content">동의함</span>
    <span class="date">2024-03-05 15:00</span><span class="like">3</span></div>
  <div class="comment-item"><span class="content">작성자 없는 댓글</span></div>
</div>
</body></html>
"""


def test_inven_golden():
    rec = InvenParser().parse_post(INVEN_HTML, "https://www.inven.co.kr/board/1")
    assert rec["title"] == "몬헌 신규 무기 평가"
    assert rec["body"] == "첫 줄 내용입니다\n둘째 줄!"
    assert rec["author"] == "헌터왕"
    assert rec["created_at"] == datetime(2024, 3, 5, 14, 30)
    assert rec["view_count"] == 12345
    assert rec["like_count"] == 678
    assert rec["site"] == "inven.co.kr"
    c = rec["comments"]
    assert len(c) == 2
    assert c[0] == {"author": "댓글러", "content": "동의함",
                    "created_at": datetime(2024, 3, 5, 15, 0), "like_count": 3}
    assert c[1]["author"] == "익명" and c[1]["created_at"] is None


RULIWEB_HTML = """
<html><body>
<div class="board_main">
  <div class="subject_text">발더스 공략 정리</div>
  <div class="user_info"><span class="nick">루리유저</span></div>
  <span class="regdate">2024.02.10 09:15:33</span>
  <span class="hit">4,567</span>
  <span class="like">89</span>
  <div class="view_content"><p>본문 첫 줄</p><p>본문 둘째 줄</p></div>
</div>
<div class="comment_view">
  <div class="comment_element"><span class="nick">ㄱㄴㄷ</span><span class="text">좋은 정보</span>
    <span class="date">2024.02.10 10:00:00</span><span class="like">5</span></div>
</div>
</body></html>
"""


def test_ruliweb_golden():
    rec = RuliwebParser().parse_post(RULIWEB_HTML, "https://bbs.ruliweb.com/board/2")
    assert rec["title"] == "발더스 공략 정리"
    assert rec["body"] == "본문 첫 줄\n본문 둘째 줄"
    assert rec["author"] == "루리유저"
    assert rec["created_at"] == datetime(2024, 2, 10, 9, 15, 33)
    assert rec["view_count"] == 4567
    assert rec["like_count"] == 89
    assert rec["comments"][0]["content"] == "좋은 정보"


DC_HTML = """
<html><body>
<div class="gallview_head">
  <span class="title_subject">[정보] 디아블로 시즌 정리</span>
  <div class="gall_writer"><span class="nickname" data-nick="갤러A">갤러A(1.2)</span></div>
  <span class="gall_date" title="2024-04-01 20:11:22">24.04.01</span>
  <span class="gall_count">7,890</span>
  <span class="gall_reply_num">12</span>
</div>
<div class="write_div"><p>본문이다</p><div class="ad">광고광고</div><p>- dc official App</p></div>
<div class="reply_list">
  <div class="reply_item"><span class="nickname" data-nick="댓글B">댓글B</span>
    <span class="usertxt">ㅇㅈ</span><span class="date_time">2024.04.01 21:00:00</span>
    <span class="reply_num">7</span></div>
  <div class="reply_item"><span class="del_reply">삭제된 댓글입니다</span></div>
</div>
</body></html>
"""


def test_dcinside_golden():
    rec = DCInsideParser().parse_post(DC_HTML, "https://gall.dcinside.com/board/3")
    assert rec["title"] == "디아블로 시즌 정리"          # [말머리] stripped
    assert rec["body"] == "본문이다"                     # ad + dc-app suffix removed
    assert rec["author"] == "갤러A"                      # data-nick wins
    assert rec["created_at"] == datetime(2024, 4, 1, 20, 11, 22)  # title attr
    assert rec["view_count"] == 7890
    assert rec["like_count"] == 12
    assert len(rec["comments"]) == 1                     # deleted comment skipped
    assert rec["comments"][0]["author"] == "댓글B"
    assert rec["comments"][0]["like_count"] == 7


GENERIC_HTML = """
<html><head><title>head title</title></head><body>
<header><nav>NAV</nav></header>
<h1 class="title">제너릭 포스트</h1>
<div class="meta"><span class="author">글쓴이</span>
<time datetime="2024-05-06T07:08:09Z">2024.05.06</time>
<span class="view-count">조회 42</span><span class="like-box">추천 7</span></div>
<article><div class="content"><p>이 본문은 오십자가 넘어야 셀렉터 경로로 추출됩니다 자 채워봅시다</p>
<p>둘째 단락도 있습니다 넉넉하게</p></div></article>
<footer>footer txt</footer>
</body></html>
"""


def test_generic_golden():
    rec = GenericParser().parse_post(GENERIC_HTML, "https://blog.example.com/p/1")
    assert rec["title"] == "제너릭 포스트"
    assert rec["body"] == ("이 본문은 오십자가 넘어야 셀렉터 경로로 추출됩니다 자 채워봅시다\n"
                           "둘째 단락도 있습니다 넉넉하게")
    assert rec["author"] == "글쓴이"
    assert rec["created_at"] == datetime(2024, 5, 6, 7, 8, 9)
    assert rec["view_count"] == 42
    assert rec["like_count"] == 7
    assert rec["site"] == "blog.example.com"


def test_generic_short_body_fallback():
    html = '<html><body><h1 class="title">T</h1><article><div class="content">짧음</div></article></body></html>'
    rec = GenericParser().parse_post(html, "https://x.example.com/1")
    assert rec["body"] == "T\n짧음"  # <body> fallback (generic.py:193-198)


def test_generic_date_dash_quirk():
    # the reference's [.-/] char class does NOT match '-' (generic.py:233-236)
    html = ('<html><body><h1 class="title">T</h1>'
            '<span class="date">2024-03-05</span>'
            '<article><div class="content">' + "본문 " * 20 + '</div></article></body></html>')
    rec = GenericParser().parse_post(html, "https://x.example.com/2")
    assert rec["created_at"] is None
    html2 = html.replace("2024-03-05", "2024.03.05")
    rec2 = GenericParser().parse_post(html2, "https://x.example.com/2")
    assert rec2["created_at"] == datetime(2024, 3, 5)


def test_registry_dispatch():
    reg = ParserRegistry()
    assert isinstance(reg.get_parser("https://www.inven.co.kr/x"), InvenParser)
    assert isinstance(reg.get_parser("https://m.inven.co.kr/x"), InvenParser)
    assert isinstance(reg.get_parser("https://sub.deep.ruliweb.com/x"), RuliwebParser)  # suffix match
    assert isinstance(reg.get_parser("https://gall.dcinside.com/x"), DCInsideParser)
    assert type(reg.get_parser("https://unknown.example.com/x")) is GenericParser


def test_parse_failure_and_fallback():
    with pytest.raises(ParseFailure):
        parse_page("<html><body><div></div></body></html>", "https://z.example.com/1")
    # site parser fails on generic-ish markup -> falls back to GenericParser
    rec = parse_page(GENERIC_HTML, "https://www.inven.co.kr/weird")
    assert rec["title"]  # inven h1 fallback or generic fallback succeeded


def test_corpus_conformance_byte_identical():
    """Every generated page parses byte-identically to the independent
    oracle — the engine's per-row invariant (BASELINE.json input_hint)."""
    pages, expected = gen_pages(600, n_hosts=14, seed=1234)
    reg = ParserRegistry()
    checked = 0
    for i in range(pages.num_rows):
        url = pages.column("url")[i].as_py()
        html = pages.column("html")[i].as_py().decode("utf-8")
        exp = expected[url]
        if exp is None:
            with pytest.raises(ParseFailure):
                parse_page(html, url, registry=reg)
            continue
        rec = parse_page(html, url, registry=reg)
        assert rec["body"] == exp["body"] == pages.column("text")[i].as_py()
        for k in ("title", "site", "author", "created_at", "view_count", "like_count"):
            assert rec[k] == exp[k], (url, k)
        assert rec["comments"] == exp["comments"], url
        checked += 1
    assert checked > 500


def test_charset_normalized_parse_cp949():
    """M14: a cp949/euc-kr page parses to the identical record as its
    utf-8 twin (meta-charset sniff -> decode -> byte-identical extraction)."""
    from game_review_crawler_ray.sources.corpus import gen_pages
    from game_review_crawler_ray.stages.fetch import decode_html

    pages, expected = gen_pages(50, n_hosts=6, seed=77)
    reg = ParserRegistry()
    checked = 0
    for i in range(pages.num_rows):
        url = pages.column("url")[i].as_py()
        if expected[url] is None:
            continue
        html = pages.column("html")[i].as_py().decode("utf-8")
        try:
            cp949 = html.replace("charset='utf-8'", "charset='euc-kr'") \
                        .encode("cp949")
        except UnicodeEncodeError:
            continue  # rare chars outside cp949 — skip
        rec_utf8 = parse_page(html, url, registry=reg)
        rec_kr = parse_page(decode_html(cp949), url, registry=reg)
        assert rec_kr["body"] == rec_utf8["body"]
        assert rec_kr["title"] == rec_utf8["title"]
        assert rec_kr["comments"] == rec_utf8["comments"]
        checked += 1
    assert checked >= 20


def test_ua_rotation_deterministic_from_pool():
    from game_review_crawler_ray.stages.fetch import UARotator, USER_AGENTS

    r = UARotator(seed=3)
    seq = [r.next() for _ in range(20)]
    assert set(seq) <= set(USER_AGENTS)
    assert len(set(seq)) > 1                      # actually rotates
    r2 = UARotator(seed=3)
    assert seq == [r2.next() for _ in range(20)]  # replayable
