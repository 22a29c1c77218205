"""Seed-source (search) tier: adapters, TTL cache, failover manager.

Re-expresses the reference's search subsystem as the engine's seed-source
plugin protocol (SURVEY.md §2.10):

- ``SearchAdapter`` ABC            -> crawler/search/adapters.py:22-60
- ``CorpusSearchAdapter``          -> stands in for DuckDuckGo/Google CSE
  (adapters.py:63-262) at test scale: "searching" scans the pages corpus
  titles/text for the keywords; result caps and throttle detection keep
  the same semantics. Live HTTP adapters are out of scope in this sandbox.
- ``SearchCache``                  -> crawler/search/cache.py:29-176
  (md5 of sorted keywords + site — keyword-order-insensitive, D2 — with
  TTL expiry and cleanup)
- ``SearchManager``                -> crawler/search/manager.py:41-203
  (sticky adapter index, round-robin failover, relevance scoring +
  threshold filter, per-site result cap)
"""

from __future__ import annotations

import hashlib
import re
import time
from abc import ABC, abstractmethod

from ..functions.relevance import filter_by_relevance


class SearchResult:
    __slots__ = ("url", "title", "snippet", "relevance_score")

    def __init__(self, url: str, title: str, snippet: str,
                 relevance_score: float = 0.0):
        self.url = url
        self.title = title
        self.snippet = snippet
        self.relevance_score = relevance_score

    def __repr__(self):  # pragma: no cover
        return f"SearchResult({self.url!r}, score={self.relevance_score})"


class AdapterThrottled(Exception):
    """Adapter signalled rate limiting (adapters.py:156-159)."""


class SearchAdapter(ABC):
    name = "base"

    @abstractmethod
    def search(self, keywords: list[str], site: str,
               max_results: int = 10) -> list[SearchResult]:
        ...


class CorpusSearchAdapter(SearchAdapter):
    """Corpus-backed search: keyword containment over page title/text.

    Query semantics follow the reference's builder: all keywords must
    appear (the " AND ".join query, adapters.py:116-118) and results are
    restricted to the site (the site: operator). ``fail_times`` /
    ``throttle_times`` simulate adapter failure/throttling for failover
    tests (manager.py:119-174 paths).
    """

    name = "corpus"

    def __init__(self, pages_index: list[dict], fail_times: int = 0,
                 throttle_times: int = 0):
        # pages_index: [{url, host, title, text}] — small driver-side index
        self._pages = pages_index
        self.fail_times = fail_times
        self.throttle_times = throttle_times
        self.calls = 0

    def search(self, keywords: list[str], site: str,
               max_results: int = 10) -> list[SearchResult]:
        self.calls += 1
        if self.fail_times > 0:
            self.fail_times -= 1
            raise RuntimeError("simulated adapter failure")
        if self.throttle_times > 0:
            self.throttle_times -= 1
            raise AdapterThrottled(self.name)
        kws = [k.lower() for k in keywords if k.strip()]
        out = []
        for page in self._pages:
            if site and site not in page["host"]:
                continue
            hay = (page["title"] + " " + page["text"]).lower()
            if all(k in hay for k in kws):
                out.append(SearchResult(page["url"], page["title"],
                                        page["text"][:160]))
                if len(out) >= max_results:
                    break
        return out


class DuckDuckGoAdapter(CorpusSearchAdapter):
    """S3: DuckDuckGo semantics on the corpus index (adapters.py:63-169).

    Distinctive behavior kept: throttling is detected by CLASSIFYING the
    underlying library's error message ("rate"/"429" substrings,
    adapters.py:156-159) rather than by exception type — simulated here
    via ``raw_errors``, a list of error strings the underlying engine will
    raise on successive calls."""

    name = "duckduckgo"

    def __init__(self, pages_index: list[dict], raw_errors: list[str] | None = None):
        super().__init__(pages_index)
        self._raw_errors = list(raw_errors or [])

    def search(self, keywords: list[str], site: str,
               max_results: int = 10) -> list[SearchResult]:
        if self._raw_errors:
            msg = self._raw_errors.pop(0)
            if "rate" in msg.lower() or "429" in msg:
                raise AdapterThrottled(self.name)
            raise RuntimeError(msg)
        return super().search(keywords, site, max_results)


class GoogleCSEAdapter(CorpusSearchAdapter):
    """S4: Google CSE semantics on the corpus index (adapters.py:172-262).

    Distinctive behavior kept: requires credentials (``is_available``,
    adapters.py:197) and hard-caps every request at 10 results
    (``num=min(max_results, 10)``, adapters.py:236)."""

    name = "google_cse"
    MAX_NUM = 10

    def __init__(self, pages_index: list[dict], api_key: str | None = None,
                 cse_id: str | None = None):
        super().__init__(pages_index)
        self._api_key = api_key
        self._cse_id = cse_id

    def is_available(self) -> bool:
        return bool(self._api_key and self._cse_id)

    def search(self, keywords: list[str], site: str,
               max_results: int = 10) -> list[SearchResult]:
        if not self.is_available():
            raise RuntimeError("google_cse: api key / cse id not configured")
        return super().search(keywords, site,
                              min(max_results, self.MAX_NUM))


class DirectCrawlAdapter(CorpusSearchAdapter):
    """Board-list direct crawl fallback (adapters.py:265-420): returns the
    site's pages in discovery order WITHOUT keyword containment — the
    reference crawls the board list and leaves relevance filtering to the
    manager. Only absolute http(s) links survive (adapters.py:387-413)."""

    name = "direct"

    def search(self, keywords: list[str], site: str,
               max_results: int = 10) -> list[SearchResult]:
        self.calls += 1
        out = []
        for page in self._pages:
            if site and site not in page["host"]:
                continue
            if not page["url"].startswith(("http://", "https://")):
                continue
            out.append(SearchResult(page["url"], page["title"],
                                    page["text"][:160]))
            if len(out) >= max_results:
                break
        return out


class SearchCache:
    """TTL cache keyed by md5(','.join(sorted(keywords)) + ':' + site)
    (cache.py:42-56) — keyword order-insensitive (operator D2)."""

    def __init__(self, ttl: int = 3600, clock=time.time):
        self.ttl = ttl
        self._clock = clock
        self._store: dict[str, tuple[list[SearchResult], float]] = {}
        self.hits = 0
        self.misses = 0

    @staticmethod
    def cache_key(keywords: list[str], site: str) -> str:
        raw = ",".join(sorted(keywords)) + ":" + site
        return hashlib.md5(raw.encode("utf-8")).hexdigest()

    def get(self, keywords: list[str], site: str):
        key = self.cache_key(keywords, site)
        hit = self._store.get(key)
        if hit is None:
            self.misses += 1
            return None
        results, stored = hit
        if self._clock() - stored > self.ttl:
            del self._store[key]
            self.misses += 1
            return None
        self.hits += 1
        return results

    def put(self, keywords: list[str], site: str,
            results: list[SearchResult]) -> None:
        self._store[self.cache_key(keywords, site)] = (results, self._clock())

    def cleanup(self) -> int:
        now = self._clock()
        stale = [k for k, (_, t) in self._store.items() if now - t > self.ttl]
        for k in stale:
            del self._store[k]
        return len(stale)

    def stats(self) -> dict:
        return {"entries": len(self._store), "hits": self.hits,
                "misses": self.misses}


class SearchManager:
    """Failover search across registered adapters (manager.py:68-203).

    - cache check first; sticky ``_current_adapter_index`` (last working
      adapter tried first), round-robin over the rest on failure;
    - throttled adapters get a cooldown (adapters.py:156-159 — 5 min);
    - results scored + filtered by relevance threshold, capped per site.
    """

    THROTTLE_COOLDOWN_S = 300.0

    def __init__(self, cache: SearchCache | None = None,
                 relevance_threshold: float = 0.5, clock=time.time):
        self._adapters: list[SearchAdapter] = []
        self._current = 0
        self._throttled_until: dict[int, float] = {}
        self.cache = cache or SearchCache()
        self.threshold = relevance_threshold
        self._clock = clock

    def register_adapter(self, adapter: SearchAdapter) -> None:
        self._adapters.append(adapter)

    def search(self, keywords: list[str], site: str,
               max_results: int = 10) -> list[SearchResult]:
        cached = self.cache.get(keywords, site)
        if cached is not None:
            return cached
        n = len(self._adapters)
        if n == 0:
            return []
        now = self._clock()
        last_error = None
        for step in range(n):
            idx = (self._current + step) % n
            if self._throttled_until.get(idx, 0.0) > now:
                continue
            adapter = self._adapters[idx]
            try:
                raw = adapter.search(keywords, site, max_results)
            except AdapterThrottled:
                self._throttled_until[idx] = now + self.THROTTLE_COOLDOWN_S
                continue
            except Exception as e:  # noqa: BLE001 - failover on any error
                last_error = e
                continue
            self._current = idx  # sticky: next search starts here
            scored = filter_by_relevance(
                [(r.url, r.title, r.snippet) for r in raw],
                keywords, self.threshold)
            results = [SearchResult(u, t, s, sc) for (u, t, s, sc) in scored]
            results = results[:max_results]
            self.cache.put(keywords, site, results)
            return results
        if last_error is not None:
            raise last_error
        return []


def build_query(keywords: list[str], site: str) -> str:
    """M15: the reference's query string (adapters.py:116-118)."""
    return " AND ".join(keywords) + f" site:{site}"


def pages_index_from_corpus(pages, limit: int | None = None) -> list[dict]:
    """Small driver-side search index over the corpus (title via a cheap
    regex probe of the html head — search only needs display strings)."""
    title_re = re.compile(
        r'class="(?:articleTitle|subject_text|title_subject|title)"[^>]*>([^<]*)<')
    out = []
    n = pages.num_rows if limit is None else min(limit, pages.num_rows)
    urls = pages.column("url").to_pylist()[:n]
    texts = pages.column("text").to_pylist()[:n]
    htmls = pages.column("html").to_pylist()[:n]
    for url, text, html in zip(urls, texts, htmls):
        m = title_re.search(html.decode("utf-8", "ignore"))
        host = url.split("/")[2] if "://" in url else url
        out.append({"url": url, "host": host,
                    "title": m.group(1) if m else "", "text": text})
    return out
