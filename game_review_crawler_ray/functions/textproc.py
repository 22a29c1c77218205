"""Text processing kernels — clean/preprocess/tokenize/stopwords.

Pure functions, shared by the parse stage, the analytics pipelines and the
tests. Semantics match the reference:

- ``clean_text``: collapse blank-line runs and space runs, strip
  (``crawler/parsers/generic.py:334-339``, duplicated in every parser).
- ``preprocess_sentiment``: lowercase + collapse whitespace
  (``crawler/analysis/sentiment.py:74-92``).
- ``preprocess_keywords``: lowercase, URL-strip, HTML-tag-strip, keep
  word chars/whitespace/Hangul, collapse spaces
  (``crawler/analysis/keyword_extractor.py:82-106``).
- ``tokenize``: whitespace split, length filter [2,20], plus 2-/3-grams of
  Korean tokens of length >= 4 (``keyword_extractor.py:108-156``).
- ``DEFAULT_STOPWORDS``: the reference's Korean stopword list
  (``keyword_extractor.py:29-55``).
"""

from __future__ import annotations

import re

_BLANKLINE_RE = re.compile(r"\n\s*\n")
_SPACES_RE = re.compile(r" +")
_WS_RE = re.compile(r"\s+")
_URL_RE = re.compile(r"https?://\S+")
_TAG_RE = re.compile(r"<[^>]+>")
_NONWORD_RE = re.compile(r"[^\w\s가-힣]")
_KOREAN_RE = re.compile(r"[가-힣]")


def clean_text(text: str) -> str:
    text = _BLANKLINE_RE.sub("\n\n", text)
    text = _SPACES_RE.sub(" ", text)
    return text.strip()


def preprocess_sentiment(text: str) -> str:
    if not text:
        return ""
    return _WS_RE.sub(" ", text.lower()).strip()


def preprocess_keywords(text: str) -> str:
    if not text:
        return ""
    text = _URL_RE.sub("", text)
    text = _TAG_RE.sub("", text)
    text = _NONWORD_RE.sub(" ", text)
    text = _WS_RE.sub(" ", text)
    return text.strip().lower()


def is_korean(text: str) -> bool:
    return bool(_KOREAN_RE.search(text))


def tokenize(text: str, min_len: int = 2, max_len: int = 20) -> list[str]:
    """Whitespace tokens within [min_len, max_len] + Korean 2-/3-grams."""
    if not text:
        return []
    out: list[str] = []
    for token in text.split():
        if len(token) < min_len or len(token) > max_len:
            continue
        out.append(token)
        if len(token) >= 4 and is_korean(token):
            for i in range(len(token) - 1):
                ngram = token[i : i + 2]
                if len(ngram) >= min_len:
                    out.append(ngram)
            for i in range(len(token) - 2):
                ngram = token[i : i + 3]
                if len(ngram) >= min_len:
                    out.append(ngram)
    return out


DEFAULT_STOPWORDS = frozenset({
    # particles
    "이", "가", "은", "는", "을", "를", "의", "에", "에서", "로", "으로",
    "와", "과", "도", "만", "까지", "부터", "에게", "한테", "께",
    # pronouns
    "나", "너", "저", "우리", "그", "그녀", "이것", "저것", "그것",
    # conjunctions / adverbs
    "그리고", "그러나", "하지만", "그래서", "따라서", "또한", "또",
    "그런데", "그러면", "그렇지만", "왜냐하면", "즉", "곧",
    # common verb/adjective endings
    "하다", "되다", "있다", "없다", "같다", "보다", "주다", "받다",
    "한다", "된다", "있는", "없는", "같은", "보는", "주는", "받는",
    "했다", "됐다", "있었다", "없었다", "같았다", "봤다", "줬다", "받았다",
    "합니다", "됩니다", "있습니다", "없습니다", "같습니다",
    "해요", "돼요", "있어요", "없어요", "같아요",
    # generic words
    "것", "수", "등", "때", "중", "더", "잘", "못", "안", "좀",
    "정말", "진짜", "너무", "매우", "아주", "완전", "엄청",
    "이번", "다음", "지금", "오늘", "어제", "내일",
    "여기", "거기", "저기", "어디",
    # gaming-community terms
    "게임", "유저", "플레이", "플레이어", "캐릭터", "캐릭",
    "ㅋㅋ", "ㅋㅋㅋ", "ㅋㅋㅋㅋ", "ㅎㅎ", "ㅎㅎㅎ",
    "ㅠㅠ", "ㅜㅜ", "ㅠㅠㅠ", "ㅜㅜㅜ",
    # numerals
    "하나", "둘", "셋", "넷", "다섯",
})


def extract_keywords_from_text(
    text: str,
    top_n: int = 20,
    stopwords: frozenset[str] = DEFAULT_STOPWORDS,
) -> list[str]:
    """Top-N tokens by frequency after preprocess+tokenize+stopword filter.

    Ties broken by first occurrence (Counter.most_common semantics in the
    reference: insertion order for equal counts).
    """
    from collections import Counter

    if not text or not text.strip():
        return []
    tokens = [t for t in tokenize(preprocess_keywords(text)) if t not in stopwords]
    if not tokens:
        return []
    return [w for w, _ in Counter(tokens).most_common(top_n)]


def combined_post_text(title: str, body: str, comment_contents: list[str] | None = None) -> str:
    """Title-weighted composite text: title twice + body (+ comments).

    Reference: ``sentiment.py:212-228``, ``keyword_extractor.py:200-217``.
    """
    text = f"{title} {title} {body}"
    if comment_contents:
        for c in comment_contents:
            text += f" {c}"
    return text
