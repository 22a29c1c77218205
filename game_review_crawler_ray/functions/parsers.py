"""HTML post/comment extraction — pure functions over the mini-DOM.

Re-implements the reference's parser family with identical extraction
semantics (selector cascades, fallbacks, date regexes, count extraction,
text cleaning) so that every URL yields byte-identical extracted text:

- GenericParser   -> ``crawler/parsers/generic.py``
- InvenParser     -> ``crawler/parsers/inven.py``
- RuliwebParser   -> ``crawler/parsers/ruliweb.py``
- DCInsideParser  -> ``crawler/parsers/dcinside.py``
- ParserRegistry  -> ``crawler/parsers/base.py:61-135`` (exact domain match,
  then suffix match, else generic fallback)
- dispatch + fallback-to-generic on failure ->
  ``crawler/content_crawler.py:180-238``

All functions are stateless and picklable; the parse stage builds one
registry per Ray worker (cheap) and runs these per Arrow batch.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Optional
from urllib.parse import urlparse

from .minidom import Element, parse_html
from .textproc import clean_text

ANONYMOUS = "익명"

_NUM_RE = re.compile(r"\d+")
_NUMC_RE = re.compile(r"[\d,]+")
_VIEW_KO_RE = re.compile(r"조회[:\s]*([0-9,]+)")
_LIKE_KO_RE = re.compile(r"추천[:\s]*([0-9,]+)")
_HEAD_BRACKET_RE = re.compile(r"^\[.*?\]\s*")
_DC_APP_OFFICIAL_RE = re.compile(r"- dc official App")
_DC_APP_RE = re.compile(r"- dc App")


def _naive_utc(dt: datetime) -> datetime:
    """Normalize tz-aware datetimes to naive UTC for Arrow timestamp[us]."""
    if dt.tzinfo is not None:
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def parse_iso_attr(value: str) -> Optional[datetime]:
    """``datetime.fromisoformat`` with Z handling (generic.py:215-219)."""
    try:
        return _naive_utc(datetime.fromisoformat(value.replace("Z", "+00:00")))
    except (ValueError, TypeError):
        return None


def _first_int(text: str) -> Optional[int]:
    nums = _NUM_RE.findall(text)
    return int(nums[0]) if nums else None


def _first_int_comma(text: str) -> Optional[int]:
    nums = _NUMC_RE.findall(text)
    return int(nums[0].replace(",", "")) if nums else None


def _select_first_text(root: Element, selectors: list[str]) -> str:
    for sel in selectors:
        el = root.select_one(sel)
        if el is not None:
            text = el.get_text(strip=True)
            if text:
                return text
    return ""


class ParseFailure(Exception):
    """Raised when a parser produces neither title nor body
    (content_crawler.py:213-215)."""


# ---------------------------------------------------------------------------
# Generic parser (generic.py)
# ---------------------------------------------------------------------------

class GenericParser:
    SITE = None  # derived from URL netloc
    SUPPORTED_DOMAINS: list[str] = []

    TITLE_SELECTORS = [
        "h1.title", "h1.post-title", "h1.entry-title", "h1.article-title",
        ".title h1", ".post-title", ".entry-title", ".article-title",
        "article h1", ".content h1", "main h1",
        "h1", "title",
    ]
    BODY_SELECTORS = [
        "article .content", "article .body", "article .post-content",
        ".post-content", ".entry-content", ".article-content", ".article-body",
        ".content-body", ".post-body", ".main-content",
        "article", "main", ".content", "#content",
    ]
    DATE_SELECTORS = [
        "time[datetime]", ".date", ".post-date", ".entry-date",
        ".published", ".created", ".timestamp", ".meta-date",
    ]
    AUTHOR_SELECTORS = [
        ".author", ".writer", ".nickname", ".username",
        ".post-author", ".entry-author", ".byline",
    ]
    COMMENT_SELECTORS = [
        ".comments", ".comment-list", "#comments", ".comment-area",
        ".reply-list", ".comment-wrap",
    ]
    COMMENT_ITEM_SELECTORS = [".comment", ".comment-item", ".reply", ".reply-item"]

    PRUNE_TAGS = ["script", "style", "nav", "header", "footer", "aside"]
    BODY_MIN_LEN = 50

    # NOTE: the reference writes the char class as [.-/] (generic.py:233-236),
    # which in a regex is the range '.'..'/' — it matches '.' and '/' but NOT
    # '-'. Replicated verbatim for byte-identical behavior.
    _DATE_PATTERNS = [
        re.compile(r"(\d{4})[.-/](\d{1,2})[.-/](\d{1,2})"),  # 2024.01.15, 2024/01/15
        re.compile(r"(\d{1,2})[.-/](\d{1,2})[.-/](\d{4})"),  # 01.15.2024
    ]

    def parse_post(self, html: str, url: str, keyword: str = "") -> dict:
        dom = parse_html(html)
        site = self._extract_site(url)
        title = self._extract_title(dom)
        # comments are parsed from a pristine DOM in the reference (a fresh
        # BeautifulSoup); extract them before pruning so one parse suffices.
        comments = self._parse_comments_dom(dom)
        body = self._extract_body(dom)  # prunes script/style/nav/... first
        author = self._extract_author(dom)
        created_at = self._extract_date(dom)
        view_count = self._extract_count(dom, ["view", "hit", "조회"])
        like_count = self._extract_count(dom, ["like", "recommend", "추천", "좋아요"])
        return {
            "url": url, "title": title, "body": body, "site": site,
            "keyword": keyword, "author": author, "created_at": created_at,
            "view_count": view_count, "like_count": like_count,
            "comments": comments,
        }

    def parse_comments(self, html: str) -> list[dict]:
        return self._parse_comments_dom(parse_html(html))

    # -- pieces ------------------------------------------------------------

    def _extract_site(self, url: str) -> str:
        return urlparse(url).netloc or ""

    def _extract_title(self, dom: Element) -> str:
        return _select_first_text(dom, self.TITLE_SELECTORS)

    def _prune(self, dom: Element) -> None:
        for tag in dom.find_all(self.PRUNE_TAGS):
            tag.decompose()

    def _extract_body(self, dom: Element) -> str:
        self._prune(dom)
        for sel in self.BODY_SELECTORS:
            el = dom.select_one(sel)
            if el is not None:
                text = el.get_text(separator="\n", strip=True)
                if len(text) > self.BODY_MIN_LEN:
                    return self._clean_text(text)
        body = dom.find("body")
        if body is not None:
            return self._clean_text(body.get_text(separator="\n", strip=True))
        return ""

    def _extract_author(self, dom: Element) -> Optional[str]:
        text = _select_first_text(dom, self.AUTHOR_SELECTORS)
        return text or None

    def _extract_date(self, dom: Element) -> Optional[datetime]:
        for sel in self.DATE_SELECTORS:
            el = dom.select_one(sel)
            if el is not None:
                if el.has_attr("datetime"):
                    parsed = parse_iso_attr(el["datetime"])
                    if parsed is not None:
                        return parsed
                parsed = self._parse_date_string(el.get_text(strip=True))
                if parsed is not None:
                    return parsed
        return None

    def _parse_date_string(self, text: str) -> Optional[datetime]:
        for i, pattern in enumerate(self._DATE_PATTERNS):
            m = pattern.search(text)
            if m:
                g = m.groups()
                try:
                    if len(g[0]) == 4:
                        return datetime(int(g[0]), int(g[1]), int(g[2]))
                    return datetime(int(g[2]), int(g[0]), int(g[1]))
                except (ValueError, TypeError):
                    continue
        return None

    def _extract_count(self, dom: Element, keywords: list[str]) -> int:
        for kw in keywords:
            pat = re.compile(kw, re.I)
            for el in dom.find_all(class_=pat):
                n = _first_int(el.get_text(strip=True))
                if n is not None:
                    return n
            for tnode in dom.find_all(string=pat):
                parent = tnode.parent
                if parent is not None:
                    n = _first_int(parent.get_text(strip=True))
                    if n is not None:
                        return n
        return 0

    def _parse_comments_dom(self, dom: Element) -> list[dict]:
        area = None
        for sel in self.COMMENT_SELECTORS:
            area = dom.select_one(sel)
            if area is not None:
                break
        if area is None:
            return []
        items: list[Element] = []
        for sel in self.COMMENT_ITEM_SELECTORS:
            items = area.select(sel)
            if items:
                break
        out = []
        for item in items:
            c = self._parse_comment_item(item)
            if c is not None:
                out.append(c)
        return out

    def _parse_comment_item(self, item: Element) -> Optional[dict]:
        author = _select_first_text(item, [".author", ".writer", ".nickname", ".name"]) or ANONYMOUS
        content = _select_first_text(item, [".content", ".text", ".body", ".comment-text"])
        if not content:
            content = item.get_text(strip=True)
        if not content:
            return None
        created_at = None
        for sel in [".date", ".time", "time"]:
            el = item.select_one(sel)
            if el is not None:
                if el.has_attr("datetime"):
                    created_at = parse_iso_attr(el["datetime"])
                else:
                    created_at = self._parse_date_string(el.get_text(strip=True))
                break
        like_count = 0
        for sel in [".like", ".recommend", ".vote"]:
            el = item.select_one(sel)
            if el is not None:
                n = _first_int(el.get_text(strip=True))
                if n is not None:
                    like_count = n
                break
        return {"author": author, "content": content,
                "created_at": created_at, "like_count": like_count}

    def _clean_text(self, text: str) -> str:
        return clean_text(text)


# ---------------------------------------------------------------------------
# Shared site-parser machinery (inven/ruliweb/dcinside share a YYYY-style
# date grammar and comma-grouped count extraction)
# ---------------------------------------------------------------------------

def _parse_site_date(text: str, patterns: list[tuple[re.Pattern, int]]) -> Optional[datetime]:
    for pattern, group_count in patterns:
        m = pattern.search(text)
        if m:
            g = m.groups()
            try:
                year = int(g[0])
                if year < 100:
                    year += 2000
                if group_count >= 6:
                    return datetime(year, int(g[1]), int(g[2]), int(g[3]), int(g[4]), int(g[5]))
                if group_count >= 5:
                    return datetime(year, int(g[1]), int(g[2]), int(g[3]), int(g[4]))
                return datetime(year, int(g[1]), int(g[2]))
            except (ValueError, TypeError):
                continue
    return None


class _SiteParser(GenericParser):
    """Common scaffolding for the three site-specific parsers."""

    SITE: str = ""
    PRUNE_TAGS = ["script", "style"]
    BODY_MIN_LEN = 10
    DATE_PATTERNS: list[tuple[re.Pattern, int]] = []
    TITLE_FALLBACK_TAG = "h1"
    COMMENT_LIST_SELECTORS: list[str] = []
    COMMENT_AUTHOR_SELECTORS: list[str] = []
    COMMENT_CONTENT_SELECTORS: list[str] = []
    COMMENT_DATE_SELECTORS: list[str] = []
    COMMENT_LIKE_SELECTORS: list[str] = []
    COMMENT_STRIP_CLASS_RE = re.compile(r"(nick|author|date|time|like)")
    VIEW_SELECTORS: list[str] = []
    LIKE_SELECTORS: list[str] = []

    def parse_post(self, html: str, url: str, keyword: str = "") -> dict:
        dom = parse_html(html)
        title = self._extract_title(dom)
        comments = self._parse_comments_dom(dom)
        body = self._extract_body(dom)
        author = self._extract_author(dom)
        created_at = self._extract_date(dom)
        view_count = self._extract_view_count(dom)
        like_count = self._extract_like_count(dom)
        return {
            "url": url, "title": title, "body": body, "site": self.SITE,
            "keyword": keyword, "author": author, "created_at": created_at,
            "view_count": view_count, "like_count": like_count,
            "comments": comments,
        }

    def _extract_title(self, dom: Element) -> str:
        text = _select_first_text(dom, self.TITLE_SELECTORS)
        if text:
            return self._postprocess_title(text)
        fb = dom.find(self.TITLE_FALLBACK_TAG)
        if fb is not None:
            return fb.get_text(strip=True)
        return ""

    def _postprocess_title(self, text: str) -> str:
        return text

    def _extract_body(self, dom: Element) -> str:
        self._prune(dom)
        for sel in self.BODY_SELECTORS:
            el = dom.select_one(sel)
            if el is not None:
                self._prune_body_element(el)
                text = el.get_text(separator="\n", strip=True)
                if len(text) > self.BODY_MIN_LEN:
                    return self._clean_text(text)
        return ""

    def _prune_body_element(self, el: Element) -> None:
        pass

    def _parse_date_string(self, text: str) -> Optional[datetime]:
        return _parse_site_date(text, self.DATE_PATTERNS)

    def _extract_date(self, dom: Element) -> Optional[datetime]:
        for sel in self.DATE_SELECTORS:
            el = dom.select_one(sel)
            if el is not None:
                if self._date_from_title_attr and el.has_attr("title"):
                    parsed = self._parse_date_string(el["title"])
                    if parsed is not None:
                        return parsed
                if el.has_attr("datetime"):
                    parsed = parse_iso_attr(el["datetime"])
                    if parsed is not None:
                        return parsed
                parsed = self._parse_date_string(el.get_text(strip=True))
                if parsed is not None:
                    return parsed
        return None

    _date_from_title_attr = False

    def _extract_counter(self, dom: Element, selectors: list[str], fallback_re: re.Pattern) -> int:
        for sel in selectors:
            el = dom.select_one(sel)
            if el is not None:
                n = _first_int_comma(el.get_text(strip=True))
                if n is not None:
                    return n
        m = fallback_re.search(dom.get_text())
        if m:
            return int(m.group(1).replace(",", ""))
        return 0

    def _extract_view_count(self, dom: Element) -> int:
        return self._extract_counter(dom, self.VIEW_SELECTORS, _VIEW_KO_RE)

    def _extract_like_count(self, dom: Element) -> int:
        return self._extract_counter(dom, self.LIKE_SELECTORS, _LIKE_KO_RE)

    def _parse_comments_dom(self, dom: Element) -> list[dict]:
        items: list[Element] = []
        for sel in self.COMMENT_LIST_SELECTORS:
            items = dom.select(sel)
            if items:
                break
        out = []
        for item in items:
            c = self._parse_comment_item(item)
            if c is not None:
                out.append(c)
        return out

    def _comment_skip(self, item: Element) -> bool:
        return False

    def _comment_author(self, item: Element) -> str:
        return _select_first_text(item, self.COMMENT_AUTHOR_SELECTORS) or ANONYMOUS

    def _parse_comment_item(self, item: Element) -> Optional[dict]:
        if self._comment_skip(item):
            return None
        author = self._comment_author(item)
        content = _select_first_text(item, self.COMMENT_CONTENT_SELECTORS)
        if not content:
            for tag in item.find_all(["span", "div"], class_=self.COMMENT_STRIP_CLASS_RE):
                tag.decompose()
            content = item.get_text(strip=True)
        if not content:
            return None
        created_at = None
        for sel in self.COMMENT_DATE_SELECTORS:
            el = item.select_one(sel)
            if el is not None:
                if el.has_attr("datetime"):
                    created_at = parse_iso_attr(el["datetime"])
                elif self._date_from_title_attr and el.has_attr("title"):
                    created_at = self._parse_date_string(el["title"])
                else:
                    created_at = self._parse_date_string(el.get_text(strip=True))
                break
        like_count = 0
        for sel in self.COMMENT_LIKE_SELECTORS:
            el = item.select_one(sel)
            if el is not None:
                n = _first_int(el.get_text(strip=True))
                if n is not None:
                    like_count = n
                break
        return {"author": author, "content": content,
                "created_at": created_at, "like_count": like_count}


class InvenParser(_SiteParser):
    """inven.co.kr parser (crawler/parsers/inven.py)."""

    SITE = "inven.co.kr"
    SUPPORTED_DOMAINS = ["inven.co.kr", "www.inven.co.kr", "m.inven.co.kr"]
    TITLE_SELECTORS = [
        ".articleTitle", ".article-head .title", ".contentBody .title",
        "h1.title", ".view-title", "#content .title",
    ]
    BODY_SELECTORS = [
        ".articleContent", ".article-body", ".contentBody .content",
        "#content .content", ".view-content", ".postContent",
    ]
    AUTHOR_SELECTORS = [
        ".articleWriter", ".article-head .writer", ".nickname", ".author", ".user-name",
    ]
    DATE_SELECTORS = [".articleDate", ".article-head .date", ".regdate", ".date", "time"]
    DATE_PATTERNS = [
        (re.compile(r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})\s*(\d{1,2}):(\d{2})"), 5),
        (re.compile(r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})"), 3),
        (re.compile(r"(\d{2})[.\-](\d{1,2})[.\-](\d{1,2})"), 3),
    ]
    VIEW_SELECTORS = [".articleHit", ".hit", ".view-count", ".read"]
    LIKE_SELECTORS = [".articleLike", ".recommend", ".like-count", ".vote-up"]
    COMMENT_LIST_SELECTORS = [
        ".comment-list .comment-item", ".commentList .comment",
        ".reply-list li", "#comment-list .comment", ".cmtList li",
    ]
    COMMENT_AUTHOR_SELECTORS = [".nickname", ".writer", ".author", ".name", ".user"]
    COMMENT_CONTENT_SELECTORS = [".content", ".text", ".comment-text", ".body", ".reply-content"]
    COMMENT_DATE_SELECTORS = [".date", ".time", "time", ".regdate"]
    COMMENT_LIKE_SELECTORS = [".like", ".recommend", ".vote", ".good"]


class RuliwebParser(_SiteParser):
    """ruliweb.com parser (crawler/parsers/ruliweb.py)."""

    SITE = "ruliweb.com"
    SUPPORTED_DOMAINS = ["ruliweb.com", "www.ruliweb.com", "m.ruliweb.com", "bbs.ruliweb.com"]
    TITLE_SELECTORS = [
        ".board_main .subject_text", ".board_main_top .subject",
        ".view_title .subject", "h1.subject", ".article_title", ".subject_inner_text",
    ]
    BODY_SELECTORS = [
        ".board_main .view_content", ".board_main_view .content",
        ".article_content", ".view_content", "#content .content", ".source_url + div",
    ]
    AUTHOR_SELECTORS = [
        ".board_main .user_info .nick", ".board_main_top .nick",
        ".user_view .nick", ".writer .nick", ".nickname",
    ]
    DATE_SELECTORS = [
        ".board_main .regdate", ".board_main_top .regdate",
        ".user_view .regdate", ".article_info .date", "time.date",
    ]
    DATE_PATTERNS = [
        (re.compile(r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})\s*(\d{1,2}):(\d{2}):(\d{2})"), 6),
        (re.compile(r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})\s*(\d{1,2}):(\d{2})"), 5),
        (re.compile(r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})"), 3),
        (re.compile(r"(\d{2})[.\-](\d{1,2})[.\-](\d{1,2})\s*(\d{1,2}):(\d{2})"), 5),
    ]
    VIEW_SELECTORS = [
        ".board_main .hit", ".board_main_top .hit", ".article_info .hit",
        ".view_count", ".read_count",
    ]
    LIKE_SELECTORS = [
        ".board_main .like", ".recommend_btn .like_value",
        ".article_info .recommend", ".like_count", ".vote_up",
    ]
    COMMENT_LIST_SELECTORS = [
        ".comment_view .comment_element", ".comment_list .comment_item",
        ".reply_list .reply_item", "#comment .comment_element", ".board_comment .comment",
    ]
    COMMENT_AUTHOR_SELECTORS = [".nick", ".nickname", ".writer", ".author", ".user_info"]
    COMMENT_CONTENT_SELECTORS = [".text", ".content", ".comment_content", ".reply_content", ".comment_text"]
    COMMENT_DATE_SELECTORS = [".date", ".time", "time", ".regdate", ".comment_date"]
    COMMENT_LIKE_SELECTORS = [".like", ".recommend", ".vote", ".good", ".like_count"]
    COMMENT_STRIP_CLASS_RE = re.compile(r"(nick|author|date|time|like|btn)")


class DCInsideParser(_SiteParser):
    """dcinside.com parser (crawler/parsers/dcinside.py)."""

    SITE = "dcinside.com"
    SUPPORTED_DOMAINS = ["dcinside.com", "gall.dcinside.com", "m.dcinside.com"]
    TITLE_SELECTORS = [
        ".gallview_head .title_subject", ".view_content_wrap .title",
        ".title_headtext + span", ".title_subject", "h3.title", ".gall_tit",
    ]
    TITLE_FALLBACK_TAG = "h3"
    BODY_SELECTORS = [
        ".gallview_contents .inner .writing_view_box", ".write_div",
        ".view_content_wrap .content", ".gallery_re_content", ".thum_contents", ".view_main",
    ]
    AUTHOR_SELECTORS = [
        ".gallview_head .nickname", ".gall_writer .nickname",
        ".fl .nickname", ".writer_info .nickname", ".user_info .nick",
    ]
    DATE_SELECTORS = [
        ".gallview_head .gall_date", ".gall_date", ".fl .date",
        ".writer_info .date", "time.date",
    ]
    DATE_PATTERNS = [
        (re.compile(r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})\s*(\d{1,2}):(\d{2}):(\d{2})"), 6),
        (re.compile(r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})\s*(\d{1,2}):(\d{2})"), 5),
        (re.compile(r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})"), 3),
        (re.compile(r"(\d{2})[.\-](\d{1,2})[.\-](\d{1,2})\s*(\d{1,2}):(\d{2})"), 5),
        (re.compile(r"(\d{2})/(\d{1,2})/(\d{1,2})\s*(\d{1,2}):(\d{2})"), 5),
    ]
    VIEW_SELECTORS = [".gallview_head .gall_count", ".gall_count", ".view_info .hit", ".view_count"]
    LIKE_SELECTORS = [
        ".gallview_head .gall_reply_num", ".gall_recommend",
        ".recommend_btn .up_num", ".btn_recommend_box .up_num", ".like_count",
    ]
    COMMENT_LIST_SELECTORS = [
        ".reply_list .reply_item", ".comment_list .comment_item",
        "#comment_list li", ".cmt_list li", ".reply_box .reply",
    ]
    COMMENT_AUTHOR_SELECTORS = [".nickname", ".nick", ".writer", ".user_info", ".gall_writer"]
    COMMENT_CONTENT_SELECTORS = [".reply_content", ".usertxt", ".comment_text", ".cmt_txt", ".reply_txt"]
    COMMENT_DATE_SELECTORS = [".date_time", ".date", ".time", "time", ".reply_date"]
    COMMENT_LIKE_SELECTORS = [".reply_num", ".like", ".recommend", ".vote", ".good"]
    COMMENT_STRIP_CLASS_RE = re.compile(r"(nick|author|date|time|like|btn|del)")
    _date_from_title_attr = True

    AD_CLASS_RE = re.compile(r"(ad|banner|promotion)")

    def _postprocess_title(self, text: str) -> str:
        # strip the [말머리] category prefix (dcinside.py:137-139)
        return _HEAD_BRACKET_RE.sub("", text)

    def _prune_body_element(self, el: Element) -> None:
        for ad in el.find_all(class_=self.AD_CLASS_RE):
            ad.decompose()

    def _comment_skip(self, item: Element) -> bool:
        return item.select_one(".del_reply") is not None or item.select_one(".deleted") is not None

    def _comment_author(self, item: Element) -> str:
        for sel in self.COMMENT_AUTHOR_SELECTORS:
            el = item.select_one(sel)
            if el is not None:
                if el.has_attr("data-nick"):
                    return el["data-nick"]
                text = el.get_text(strip=True)
                if text:
                    return text
                break
        return ANONYMOUS

    def _extract_author(self, dom: Element) -> Optional[str]:
        for sel in self.AUTHOR_SELECTORS:
            el = dom.select_one(sel)
            if el is not None:
                if el.has_attr("data-nick"):
                    return el["data-nick"]
                text = el.get_text(strip=True)
                if text:
                    return text
        return None

    def _clean_text(self, text: str) -> str:
        text = clean_text(text)
        text = _DC_APP_OFFICIAL_RE.sub("", text)
        text = _DC_APP_RE.sub("", text)
        return text.strip()


# ---------------------------------------------------------------------------
# Registry + dispatch
# ---------------------------------------------------------------------------

class ParserRegistry:
    """Domain -> parser registry with suffix matching and generic fallback
    (base.py:61-135). Plugin surface: register() accepts any object with the
    GenericParser interface."""

    def __init__(self, with_defaults: bool = True):
        self._parsers: dict[str, GenericParser] = {}
        self._generic = GenericParser()
        if with_defaults:
            self.register(InvenParser())
            self.register(RuliwebParser())
            self.register(DCInsideParser())

    def register(self, parser: GenericParser) -> None:
        for domain in parser.SUPPORTED_DOMAINS:
            self._parsers[domain.lower()] = parser

    def get_parser(self, url: str) -> GenericParser:
        parsed = urlparse(url)
        domain = (parsed.netloc or parsed.path.split("/")[0]).lower()
        if domain in self._parsers:
            return self._parsers[domain]
        for registered, parser in self._parsers.items():
            if domain.endswith("." + registered) or domain == registered:
                return parser
        return self._generic


def parse_page(html: str, url: str, keyword: str = "",
               registry: ParserRegistry | None = None) -> dict:
    """Dispatch + parse + validate, with generic fallback on failure.

    Mirrors ``ContentCrawler.crawl_post`` (content_crawler.py:180-238):
    site parser first; if it raises or yields neither title nor body, retry
    with GenericParser; if that also yields nothing, raise ParseFailure.
    """
    if registry is None:
        registry = ParserRegistry()
    parser = registry.get_parser(url)
    try:
        record = parser.parse_post(html, url, keyword)
        if not record["title"] and not record["body"]:
            raise ParseFailure(url)
        return record
    except Exception:
        if isinstance(parser, GenericParser) and type(parser) is GenericParser:
            raise ParseFailure(url)
        record = GenericParser().parse_post(html, url, keyword)
        if not record["title"] and not record["body"]:
            raise ParseFailure(url)
        return record
