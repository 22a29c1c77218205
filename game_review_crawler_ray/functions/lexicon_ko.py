"""Compact Korean sentiment lexicon (engine fixture).

The reference loads ~470 lexicon lines from
``crawler/analysis/lexicon/{positive,negative}.txt`` (sentiment.py:43-72).
This is the engine's own compact fixture covering the corpus vocabulary;
the scorer accepts arbitrary word lists, so a deployment can drop in a
full lexicon via ``SentimentScorer(pos=..., neg=...)``.
"""

POSITIVE_KO = [
    "좋다", "좋아", "좋네", "좋은", "최고", "대박", "갓겜", "명작",
    "재밌다", "재밌어", "꿀잼", "혜자", "짱", "굿", "감동", "추천한다",
]

NEGATIVE_KO = [
    "싫다", "싫어", "나쁘다", "별로", "최악", "쓰레기", "망했다", "망함",
    "노잼", "창렬", "실망", "짜증", "헬", "버그투성이",
]
