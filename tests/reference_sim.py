"""In-process simulator of the reference crawl-loop semantics.

Replicates ``CrawlerOrchestrator.crawl_urls`` (reference
``crawler/orchestrator.py:362-423``): first-wins dedup over normalized
URLs preserving input order and the original URL string
(``url_deduplicator.py:40-62``), then a strictly serial fetch+parse loop.
Used as the conformance oracle for crawl ordering and seen-set membership;
extraction byte-equality is checked against the corpus generator's
independent ``text`` column, not against this simulator.
"""

from __future__ import annotations

from game_review_crawler_ray.functions.parsers import ParseFailure, ParserRegistry, parse_page
from game_review_crawler_ray.functions.urlnorm import normalize_url


def simulate_reference_crawl(seed_urls: list[str], corpus: dict[str, bytes]):
    """Return (crawl_order, seen_set, posts) exactly as the reference would."""
    seen: set[str] = set()
    unique: list[str] = []
    for url in seed_urls:
        norm = normalize_url(url)
        if norm not in seen:
            seen.add(norm)
            unique.append(url)

    registry = ParserRegistry()
    posts = []
    order = []
    for url in unique:
        html = corpus.get(url) or corpus.get(normalize_url(url))
        if html is None:
            continue
        try:
            rec = parse_page(html.decode("utf-8"), url, registry=registry)
        except ParseFailure:
            continue
        order.append(url)
        posts.append(rec)
    return order, seen, posts
