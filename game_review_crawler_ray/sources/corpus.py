"""Deterministic Common-Crawl-style page corpus (the ``pages`` table).

Schema per BASELINE.json ``input_hint``::

    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

One row per crawlable page; "fetching" a URL at test scale is a lookup into
this table. Every page is rendered from a per-site HTML template whose slot
values are drawn from a seeded RNG, and the ``text`` oracle column is
computed *independently from the slot values* (never by running the engine's
parser) so parser conformance tests are a genuine oracle.

Templates mirror the golden fixtures of the reference test-suite
(``tests/test_site_parsers_unit.py:23-310``): inven / ruliweb / dcinside /
generic markup, plus edge variants (short body -> <body> fallback,
empty page -> parse failure, [말머리] prefix stripping, ad-node removal,
deleted comments, missing authors/dates, comma-grouped counts).

Host distribution is Zipf-skewed to exercise per-host skew handling.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.textproc import clean_text

BASE_TS = datetime(2024, 1, 1)
WINDOW_DAYS = 30

GAMES = ["몬헌", "로아", "세나", "발더스", "디아블로", "철권", "스타"]
TOPICS = ["업데이트", "패치노트", "이벤트", "밸런스", "신규던전", "보스전", "커뮤니티"]
FILLER_KO = [
    "오늘", "서버", "접속", "상태", "확인", "문제", "발생", "관련", "내용",
    "정리", "공유", "드디어", "다들", "어떻게", "생각", "하시나요", "정보",
    "공략", "참고", "바랍니다", "레벨", "장비", "세팅", "효율", "구간",
]
POS_KO = ["좋다", "최고", "재밌다", "대박", "갓겜", "명작", "꿀잼", "혜자"]
NEG_KO = ["싫다", "별로", "최악", "쓰레기", "망했다", "노잼", "창렬", "실망"]
BUG_KO = ["버그", "오류", "렉", "튕김", "크래시", "무한로딩", "멈춤", "끊김"]
BUG_EN = ["bug", "error", "crash", "freeze", "lag"]
FILLER_EN = [
    "update", "server", "status", "issue", "patch", "notes", "guide",
    "build", "boss", "event", "season", "reset", "review", "thoughts",
]
AUTHORS = ["게임러버", "하늘소풍", "Dragonfly", "익산주민", "malgum", "별빛바다",
           "프로겐지러", "소금빵", "Kestrel", "달려라하니"]
COMMENT_POOL = FILLER_KO + POS_KO + NEG_KO + BUG_KO + BUG_EN

SPECIAL_HOSTS = ["www.inven.co.kr", "bbs.ruliweb.com", "gall.dcinside.com", "m.inven.co.kr"]


def host_list(n_hosts: int) -> list[str]:
    hosts = list(SPECIAL_HOSTS[: max(4, min(n_hosts, 4))])
    for k in range(max(0, n_hosts - len(hosts))):
        hosts.append(f"generic-{k}.example.com")
    return hosts


def _zipf_weights(n: int, s: float = 1.1) -> list[float]:
    return [1.0 / (rank + 1) ** s for rank in range(n)]


def _sentence(rng: random.Random, pools: list[list[str]], n_words: tuple[int, int]) -> str:
    words = []
    for _ in range(rng.randint(*n_words)):
        pool = rng.choice(pools)
        words.append(rng.choice(pool))
    return " ".join(words)


def _body_lines(rng: random.Random, lang: str) -> list[str]:
    if lang == "ko":
        pools = [FILLER_KO, FILLER_KO, FILLER_KO, POS_KO, NEG_KO, BUG_KO, BUG_EN]
    else:
        pools = [FILLER_EN, FILLER_EN, FILLER_EN, BUG_EN]
    return [_sentence(rng, pools, (4, 9)) for _ in range(rng.randint(3, 8))]


def _title(rng: random.Random) -> str:
    parts = [rng.choice(GAMES), rng.choice(TOPICS)]
    if rng.random() < 0.5:
        parts.append(rng.choice(POS_KO + NEG_KO + BUG_KO))
    return " ".join(parts)


def _ts_for(i: int, rng: random.Random) -> datetime:
    sec = (i * 977 + rng.randint(0, 3600)) % (WINDOW_DAYS * 86400)
    return BASE_TS + timedelta(seconds=sec)


def _comments(rng: random.Random, dt: datetime, site: str) -> list[dict]:
    out = []
    for _ in range(rng.randint(0, 5)):
        anonymous = rng.random() < 0.2
        has_date = rng.random() < 0.8
        cdt = dt + timedelta(minutes=rng.randint(1, 600)) if has_date else None
        out.append({
            "author": None if anonymous else rng.choice(AUTHORS),
            "content": _sentence(rng, [COMMENT_POOL], (2, 8)),
            "created_at": cdt,
            "like_count": rng.randint(0, 50) if rng.random() < 0.7 else 0,
            "deleted": site == "dcinside.com" and rng.random() < 0.1,
        })
    return out


# ---------------------------------------------------------------------------
# Per-site template renderers: html + independently-computed expected record
# ---------------------------------------------------------------------------

def _render_inven(rng: random.Random, url: str, i: int) -> tuple[str, dict]:
    title = _title(rng)
    author = rng.choice(AUTHORS)
    dt = _ts_for(i, rng).replace(second=0, microsecond=0)
    views, likes = rng.randint(0, 99999), rng.randint(0, 999)
    lines = _body_lines(rng, "ko")
    comments = _comments(rng, dt, "inven.co.kr")
    c_html = "".join(
        '<div class="comment-item">'
        + (f'<span class="nickname">{c["author"]}</span>' if c["author"] else "")
        + f'<span class="content">{c["content"]}</span>'
        + (f'<span class="date">{c["created_at"]:%Y-%m-%d %H:%M}</span>' if c["created_at"] else "")
        + f'<span class="like">{c["like_count"]}</span></div>'
        for c in comments
    )
    html = (
        "<html><head><meta charset='utf-8'></head><body>"
        '<div class="articleHead">'
        f'<div class="articleTitle">{title}</div>'
        f'<span class="articleWriter">{author}</span>'
        f'<span class="articleDate">{dt:%Y-%m-%d %H:%M}</span>'
        f'<span class="articleHit">조회 {views:,}</span>'
        f'<span class="articleLike">추천 {likes:,}</span>'
        "</div>"
        '<div class="articleContent">'
        + "".join(f"<p>{ln}</p>" for ln in lines)
        + "</div>"
        '<div class="comment-list">' + c_html + "</div>"
        "</body></html>"
    )
    expected = {
        "url": url, "title": title, "body": clean_text("\n".join(lines)),
        "site": "inven.co.kr", "author": author,
        "created_at": dt.replace(second=0),
        "view_count": views, "like_count": likes,
        "comments": [
            {"author": c["author"] or "익명", "content": c["content"],
             "created_at": c["created_at"].replace(second=0, microsecond=0) if c["created_at"] else None,
             "like_count": c["like_count"]}
            for c in comments
        ],
    }
    return html, expected


def _render_ruliweb(rng: random.Random, url: str, i: int) -> tuple[str, dict]:
    title = _title(rng)
    author = rng.choice(AUTHORS)
    dt = _ts_for(i, rng).replace(microsecond=0)
    views, likes = rng.randint(0, 99999), rng.randint(0, 999)
    lines = _body_lines(rng, "ko")
    comments = _comments(rng, dt, "ruliweb.com")
    c_html = "".join(
        '<div class="comment_element">'
        + (f'<span class="nick">{c["author"]}</span>' if c["author"] else "")
        + f'<span class="text">{c["content"]}</span>'
        + (f'<span class="date">{c["created_at"]:%Y.%m.%d %H:%M:%S}</span>' if c["created_at"] else "")
        + f'<span class="like">{c["like_count"]}</span></div>'
        for c in comments
    )
    html = (
        "<html><body>"
        '<div class="board_main">'
        f'<div class="subject_text">{title}</div>'
        f'<div class="user_info"><span class="nick">{author}</span></div>'
        f'<span class="regdate">{dt:%Y.%m.%d %H:%M:%S}</span>'
        f'<span class="hit">{views:,}</span>'
        f'<span class="like">{likes:,}</span>'
        '<div class="view_content">'
        + "".join(f"<p>{ln}</p>" for ln in lines)
        + "</div></div>"
        '<div class="comment_view">' + c_html + "</div>"
        "</body></html>"
    )
    expected = {
        "url": url, "title": title, "body": clean_text("\n".join(lines)),
        "site": "ruliweb.com", "author": author, "created_at": dt,
        "view_count": views, "like_count": likes,
        "comments": [
            {"author": c["author"] or "익명", "content": c["content"],
             "created_at": c["created_at"], "like_count": c["like_count"]}
            for c in comments
        ],
    }
    return html, expected


def _render_dcinside(rng: random.Random, url: str, i: int) -> tuple[str, dict]:
    title = _title(rng)
    prefixed = rng.random() < 0.5
    shown_title = f"[공지] {title}" if prefixed else title
    author = rng.choice(AUTHORS)
    dt = _ts_for(i, rng).replace(microsecond=0)
    views, likes = rng.randint(0, 99999), rng.randint(0, 999)
    lines = _body_lines(rng, "ko")
    has_ad = rng.random() < 0.5
    app_suffix = rng.random() < 0.3
    comments = _comments(rng, dt, "dcinside.com")
    c_html = "".join(
        '<div class="reply_item">'
        + ('<span class="del_reply">삭제된 댓글</span>' if c["deleted"] else "")
        + (f'<span class="nickname" data-nick="{c["author"]}">{c["author"]}</span>' if c["author"] else "")
        + f'<span class="usertxt">{c["content"]}</span>'
        + (f'<span class="date_time">{c["created_at"]:%Y.%m.%d %H:%M:%S}</span>' if c["created_at"] else "")
        + f'<span class="reply_num">{c["like_count"]}</span></div>'
        for c in comments
    )
    body_html = "".join(f"<p>{ln}</p>" for ln in lines)
    if has_ad:
        body_html += '<div class="ad">파워링크 광고 영역</div>'
    if app_suffix:
        body_html += "<p>- dc official App</p>"
    html = (
        "<html><body>"
        '<div class="gallview_head">'
        f'<span class="title_subject">{shown_title}</span>'
        f'<div class="gall_writer"><span class="nickname" data-nick="{author}">{author}</span></div>'
        f'<span class="gall_date" title="{dt:%Y-%m-%d %H:%M:%S}">{dt:%y.%m.%d}</span>'
        f'<span class="gall_count">{views:,}</span>'
        f'<span class="gall_reply_num">{likes:,}</span>'
        "</div>"
        f'<div class="write_div">{body_html}</div>'
        '<div class="reply_list">' + c_html + "</div>"
        "</body></html>"
    )
    # expected body: ad node removed pre-extraction; "- dc official App"
    # removed by the dcinside clean_text variant (dcinside.py:389-395)
    body_txt = "\n".join(lines) + ("\n- dc official App" if app_suffix else "")
    body_txt = clean_text(body_txt)
    body_txt = body_txt.replace("- dc official App", "").strip()
    expected = {
        "url": url, "title": title, "body": body_txt,
        "site": "dcinside.com", "author": author, "created_at": dt,
        "view_count": views, "like_count": likes,
        "comments": [
            {"author": c["author"] or "익명", "content": c["content"],
             "created_at": c["created_at"], "like_count": c["like_count"]}
            for c in comments if not c["deleted"]
        ],
    }
    return html, expected


def _render_generic(rng: random.Random, url: str, i: int) -> tuple[str, dict]:
    title = _title(rng) if rng.random() < 0.7 else " ".join(
        rng.choice(FILLER_EN) for _ in range(3)
    )
    author = rng.choice(AUTHORS)
    lang = "ko" if rng.random() < 0.7 else "en"
    dt = _ts_for(i, rng).replace(microsecond=0)
    views, likes = rng.randint(0, 9999), rng.randint(0, 500)
    lines = _body_lines(rng, lang)
    # ensure the article body passes the >50-char gate (generic.py:190)
    while len("\n".join(lines)) <= 60:
        lines.append(_sentence(rng, [FILLER_KO if lang == "ko" else FILLER_EN], (5, 9)))
    comments = _comments(rng, dt, "generic")
    c_html = "".join(
        '<div class="comment">'
        + (f'<span class="author">{c["author"]}</span>' if c["author"] else "")
        + f'<span class="content">{c["content"]}</span>'
        + (f'<time datetime="{c["created_at"]:%Y-%m-%dT%H:%M:%S}Z">{c["created_at"]:%Y.%m.%d}</time>'
           if c["created_at"] else "")
        + f'<span class="like">{c["like_count"]}</span></div>'
        for c in comments
    )
    html = (
        "<html><head><meta charset='utf-8'></head><body>"
        "<header><nav>HOME 게시판 로그인</nav></header>"
        f'<h1 class="title">{title}</h1>'
        '<div class="meta">'
        f'<span class="author">{author}</span>'
        f'<time datetime="{dt:%Y-%m-%dT%H:%M:%S}Z">{dt:%Y.%m.%d}</time>'
        f'<span class="view-count">조회 {views}</span>'
        f'<span class="like-box">추천 {likes}</span>'
        "</div>"
        '<article><div class="content">'
        + "".join(f"<p>{ln}</p>" for ln in lines)
        + "</div></article>"
        '<div class="comments">' + c_html + "</div>"
        "<footer>copyright example</footer>"
        "</body></html>"
    )
    expected = {
        "url": url, "title": title, "body": clean_text("\n".join(lines)),
        "site": url.split("/")[2], "author": author, "created_at": dt,
        "view_count": views, "like_count": likes,
        "comments": [
            {"author": c["author"] or "익명", "content": c["content"],
             "created_at": c["created_at"], "like_count": c["like_count"]}
            for c in comments
        ],
    }
    return html, expected


def _render_short_generic(rng: random.Random, url: str, i: int) -> tuple[str, dict]:
    """Body under 50 chars -> full-<body> fallback (generic.py:193-198)."""
    title = _title(rng)
    short = _sentence(rng, [FILLER_KO], (2, 4))[:40]
    html = (
        "<html><body>"
        f'<h1 class="title">{title}</h1>'
        f'<article><div class="content">{short}</div></article>'
        "</body></html>"
    )
    expected = {
        "url": url, "title": title, "body": clean_text(f"{title}\n{short}"),
        "site": url.split("/")[2], "author": None, "created_at": None,
        "view_count": 0, "like_count": 0, "comments": [],
    }
    return html, expected


def _render_unparseable(rng: random.Random, url: str, i: int) -> tuple[str, dict | None]:
    """No title, no body -> ParseFailure path (content_crawler.py:213-215)."""
    html = '<html><body><div class="adzone"></div></body></html>'
    return html, None


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

COMMENT_TYPE = pa.struct([
    ("author", pa.string()),
    ("content", pa.string()),
    ("created_at", pa.timestamp("us")),
    ("like_count", pa.int64()),
])

POSTS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("title", pa.string()),
    ("body", pa.string()),
    ("site", pa.string()),
    ("keyword", pa.string()),
    ("author", pa.string()),
    ("created_at", pa.timestamp("us")),
    ("view_count", pa.int64()),
    ("like_count", pa.int64()),
    ("comments", pa.list_(COMMENT_TYPE)),
])

_RENDERERS = {
    "inven.co.kr": _render_inven,
    "ruliweb.com": _render_ruliweb,
    "dcinside.com": _render_dcinside,
}


def gen_pages(n_pages: int, n_hosts: int = 16, seed: int = 42):
    """Generate the corpus.

    Returns ``(pages: pa.Table, expected: dict[url, record|None])`` where
    ``expected[url] is None`` marks an unparseable page.
    """
    hosts = host_list(n_hosts)
    weights = _zipf_weights(len(hosts))
    urls, tss, htmls, texts, langs = [], [], [], [], []
    expected: dict[str, dict | None] = {}
    assigner = random.Random(f"hosts:{seed}")
    for i in range(n_pages):
        rng = random.Random(f"page:{seed}:{i}")
        host = assigner.choices(hosts, weights=weights, k=1)[0]
        url = f"https://{host}/board/{i}"
        if i % 97 == 13:
            html, exp = _render_unparseable(rng, url, i)
        elif host.startswith("generic-") and i % 11 == 7:
            html, exp = _render_short_generic(rng, url, i)
        elif host.endswith("inven.co.kr"):
            html, exp = _render_inven(rng, url, i)
        elif host.endswith("ruliweb.com"):
            html, exp = _render_ruliweb(rng, url, i)
        elif host.endswith("dcinside.com"):
            html, exp = _render_dcinside(rng, url, i)
        else:
            html, exp = _render_generic(rng, url, i)
        urls.append(url)
        tss.append(_ts_for(i, random.Random(f"ts:{seed}:{i}")))
        htmls.append(html.encode("utf-8"))
        texts.append(exp["body"] if exp else "")
        langs.append("ko" if (exp and is_mostly_korean(exp["body"])) else "en")
        expected[url] = exp
    pages = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )
    return pages, expected


def is_mostly_korean(text: str) -> bool:
    if not text:
        return False
    ko = sum(1 for ch in text if "가" <= ch <= "힣")
    return ko * 3 > len(text)


def write_corpus(out_dir: str, n_pages: int, n_hosts: int = 16, seed: int = 42,
                 n_shards: int = 8) -> str:
    """Write the pages table as sharded Parquet (resumable layout: one file
    per shard so readers/writers can skip finished partitions)."""
    os.makedirs(out_dir, exist_ok=True)
    pages, _ = gen_pages(n_pages, n_hosts, seed)
    n = pages.num_rows
    per = (n + n_shards - 1) // n_shards
    for s in range(n_shards):
        chunk = pages.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_dir, f"pages-{s:04d}.parquet"))
    return out_dir


def ensure_corpus(tmp_root: str, n_pages: int, n_hosts: int = 16, seed: int = 42) -> str:
    """Idempotent cached corpus dir keyed by parameters."""
    out = os.path.join(tmp_root, f"pages_n{n_pages}_h{n_hosts}_s{seed}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        write_corpus(out, n_pages, n_hosts, seed)
        with open(marker, "w") as f:
            f.write("ok")
    return out
