"""Relevance scoring (F1: crawler/utils/relevance_filter.py:30-132).

score = 0.6 * title_match_ratio + 0.4 * snippet_match_ratio
        + min(0.3, 0.3 * (1 - 1 / (1 + 0.1 * total_frequency)))
clamped to [0, 1]; filter keeps results with score >= threshold (0.5
default, data_models.py:162).
"""

from __future__ import annotations

import re

TITLE_WEIGHT = 0.6
BODY_WEIGHT = 0.4
FREQUENCY_BONUS_MAX = 0.3


def relevance_score(content: str, keywords: list[str], title: str = "") -> float:
    if not keywords:
        return 0.0
    kws = [k.strip().lower() for k in keywords if k.strip()]
    if not kws:
        return 0.0
    content_l = content.lower() if content else ""
    title_l = title.lower() if title else ""
    title_hits = sum(1.0 for k in kws if k in title_l)
    body_hits = sum(1.0 for k in kws if k in content_l)
    freq = sum(len(re.findall(re.escape(k), title_l))
               + len(re.findall(re.escape(k), content_l)) for k in kws)
    base = (title_hits / len(kws)) * TITLE_WEIGHT + (body_hits / len(kws)) * BODY_WEIGHT
    bonus = min(FREQUENCY_BONUS_MAX,
                FREQUENCY_BONUS_MAX * (1 - 1 / (1 + freq * 0.1))) if freq > 0 else 0.0
    return min(1.0, max(0.0, base + bonus))


def filter_by_relevance(results: list[tuple[str, str, str]], keywords: list[str],
                        threshold: float = 0.5) -> list[tuple[str, str, str, float]]:
    """results: (url, title, snippet) -> kept (url, title, snippet, score)."""
    out = []
    for url, title, snippet in results:
        score = relevance_score(snippet, keywords, title)
        if score >= threshold:
            out.append((url, title, snippet, score))
    return out
