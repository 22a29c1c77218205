"""Seed-list generation (frontier conformance fixture).

Mirrors the reference flow where search adapters produce an ordered
result list whose order defines the crawl order after first-wins dedup
(``crawler/orchestrator.py:213-221``). Seeds deliberately include
duplicates and near-duplicate URL variants (case, trailing slash,
fragment) to exercise ``normalize_url`` dedup
(``crawler/utils/url_deduplicator.py:14-62``).

Schema: ``url: string, seed_rank: int64, keyword: string``.
"""

from __future__ import annotations

import random

import pyarrow as pa

SEED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("seed_rank", pa.int64()),
    ("keyword", pa.string()),
])

KEYWORDS = ["버그", "패치", "이벤트", "밸런스", "점검"]


def _variant(url: str, rng: random.Random) -> str:
    kind = rng.randrange(3)
    if kind == 0:
        return url + "/"
    if kind == 1:
        return url + "#comment"
    scheme, rest = url.split("://", 1)
    host, _, path = rest.partition("/")
    return f"{scheme.upper()}://{host.upper()}/{path}"


def gen_seeds(page_urls: list[str], seed: int = 42, dup_every: int = 7) -> pa.Table:
    """Ordered seed list over the corpus URLs with injected duplicates.

    Every ``dup_every``-th URL re-appears later as a normalized-equal
    variant; first-wins dedup must keep the original occurrence and the
    original (non-normalized) URL string.
    """
    rng = random.Random(f"seeds:{seed}")
    urls: list[str] = []
    for i, u in enumerate(page_urls):
        urls.append(u)
        if i % dup_every == 3:
            # duplicate injected a few positions later
            insert_at = min(len(urls) + rng.randint(1, 5), len(urls))
            urls.insert(insert_at, _variant(u, rng))
    ranks = list(range(len(urls)))
    kws = [KEYWORDS[r % len(KEYWORDS)] for r in ranks]
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(ranks, pa.int64()), pa.array(kws, pa.string())],
        schema=SEED_SCHEMA,
    )
