"""Analytics operators over the driver's testdata tables.

Each reference analytics operator (SURVEY.md §2.5-2.8) is re-expressed as a
Ray Data pipeline over the TPC-H-ish testdata tables (``documents`` stands
in for posts, ``events`` for the time-series) with a DuckDB-equivalent
oracle SQL string. Column names and float rounding (6dp, half-away-from-
zero) match exactly between the two so the driver's value-hash comparison
is meaningful.

Scale notes per operator are inline: partial aggregation inside
``map_batches`` before any ``groupby`` (combiner pattern), broadcast small
sides via ``ray.put``, column pruning at the read.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.stageutil import memoized_stage

# ---------------------------------------------------------------------------
# English lexicon for the documents table (the reference's Korean lexicon —
# crawler/analysis/lexicon/*.txt — applies to the crawl-posts pipeline; the
# scoring FORMULA here is identical: sentiment.py:94-179)
# ---------------------------------------------------------------------------
EN_POS = ["fast", "small", "good", "win"]
EN_NEG = ["slow", "error", "crash", "lag", "dup"]
BUG_WORDS = ["bug", "error", "crash", "freeze", "lag"]
REL_KEYWORDS = ["spark", "merge"]


def round6(x: np.ndarray | float):
    """Half-away-from-zero rounding to 6dp (matches DuckDB ROUND)."""
    arr = np.asarray(x, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * 1e6 + 0.5) / 1e6


def _collect(ds: ray.data.Dataset) -> pa.Table:
    """Materialize a (small) Dataset result to one Arrow table, skipping the
    empty schema-less blocks that pandas-block aggregates can emit.

    ``materialize()`` first: ``to_arrow_refs`` on a lazy plan that contains
    an AllToAll op (sort-based groupby) re-executes the whole plan; the
    materialized handle hands back its block refs without re-running."""
    ds = ds.materialize()
    tables = []
    for blk in ray.get(ds.to_arrow_refs()):
        if isinstance(blk, pd.DataFrame):  # some paths leave pandas blocks
            blk = pa.Table.from_pandas(blk, preserve_index=False)
        if blk.num_rows > 0 and blk.num_columns > 0:
            tables.append(blk)
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


def _combine_partials(part: ray.data.Dataset, keys: list[str],
                      sums: list[str]) -> pa.Table:
    """Collect per-block partial aggregates and finish the (small-key)
    combine on the driver with pandas.

    Ray's sort-based ``groupby().sum()`` is an all-to-all that this replaces:
    the partial frames are already tiny (one row per key per block), so the
    final combine is microseconds — and it avoids the plan re-execution that
    ``to_arrow_refs`` after an AllToAll op incurs.
    """
    dfs = []
    for blk in ray.get(part.to_arrow_refs()):
        if isinstance(blk, pd.DataFrame):
            if len(blk):
                dfs.append(blk)
        elif blk.num_rows:
            dfs.append(blk.to_pandas())
    if not dfs:
        return pa.table({})
    merged = pd.concat(dfs).groupby(keys, as_index=False)[sums].sum()
    return pa.Table.from_pandas(merged, preserve_index=False)


def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Sentiment (F2: sentiment.py:94-210; A1/A2: :314-355)
# ---------------------------------------------------------------------------

class SentimentScorer:
    """Actor-pool batch scorer — lexicon compiled once per actor (T4).

    Vectorized: one pandas ``str.count`` pass per lexicon word per batch
    (C-level), no per-row Python loop.
    """

    def __init__(self, pos: list[str] | None = None, neg: list[str] | None = None):
        self.pos = [re.compile(re.escape(w)) for w in (pos or EN_POS)]
        self.neg = [re.compile(re.escape(w)) for w in (neg or EN_NEG)]

    def score_frame(self, texts: pd.Series, raw: bool = False) -> pd.DataFrame:
        t = texts.fillna("").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
        pos_cnt = sum(t.str.count(p) for p in self.pos)
        neg_cnt = sum(t.str.count(p) for p in self.neg)
        total = pos_cnt + neg_cnt
        with np.errstate(invalid="ignore", divide="ignore"):
            score = np.where(total == 0, 0.0,
                             (pos_cnt - neg_cnt) / np.where(total == 0, 1, total))
        score = np.clip(score, -1.0, 1.0)
        label = np.where(score > 0.1, "positive",
                         np.where(score < -0.1, "negative", "neutral"))
        n_words = t.str.split().str.len().fillna(0).astype(int)
        n_words = np.where(t.str.len() == 0, 0, n_words)
        conf = np.where(n_words == 0, 0.5,
                        np.minimum(1.0, 0.5 + (total / np.where(n_words == 0, 1, n_words)) * 0.5))
        if raw:  # unrounded, for formulas that combine scores downstream
            return pd.DataFrame({"score": score, "label": label, "confidence": conf})
        return pd.DataFrame({
            "score": round6(score), "label": label, "confidence": round6(conf),
        })

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = self.score_frame(batch["text"])
        out.insert(0, "doc_id", batch["doc_id"].values)
        return out


_SENT_SQL_PRE = """
WITH pre AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
    FROM documents
), cnt AS (
    SELECT doc_id, t,
           {pos_expr} AS pos_cnt,
           {neg_expr} AS neg_cnt,
           CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_words
    FROM pre
), scored AS (
    SELECT doc_id,
           CASE WHEN pos_cnt + neg_cnt = 0 THEN 0.0
                ELSE GREATEST(-1.0, LEAST(1.0,
                     (pos_cnt - neg_cnt) / CAST(pos_cnt + neg_cnt AS DOUBLE)))
           END AS raw_score,
           CASE WHEN n_words = 0 THEN 0.5
                ELSE LEAST(1.0, 0.5 + ((pos_cnt + neg_cnt) / CAST(n_words AS DOUBLE)) * 0.5)
           END AS raw_conf
    FROM cnt
)
"""


def _count_expr(words: list[str]) -> str:
    terms = [f"(length(t) - length(replace(t, '{w}', ''))) / {len(w)}" for w in words]
    return " + ".join(terms)


def _sent_sql_base() -> str:
    return _SENT_SQL_PRE.format(pos_expr=_count_expr(EN_POS), neg_expr=_count_expr(EN_NEG))


def q_sentiment_scores(sf_dir: str) -> pa.Table:
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = ds.map_batches(memoized_stage("sentiment", SentimentScorer),
                      batch_format="pandas")
    return _collect(out).sort_by("doc_id")


SQL_SENTIMENT_SCORES = _sent_sql_base() + """
SELECT doc_id, ROUND(raw_score, 6) AS score,
       CASE WHEN raw_score > 0.1 THEN 'positive'
            WHEN raw_score < -0.1 THEN 'negative' ELSE 'neutral' END AS label,
       ROUND(raw_conf, 6) AS confidence
FROM scored ORDER BY doc_id
"""


def q_sentiment_distribution(sf_dir: str) -> pa.Table:
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    scored = ds.map_batches(memoized_stage("sentiment", SentimentScorer),
                      batch_format="pandas")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:  # combiner before groupby
        return batch.groupby("label", as_index=False).agg(n=("doc_id", "size"))

    part = scored.map_batches(partial, batch_format="pandas")
    tbl = _combine_partials(part, ["label"], ["n"]).rename_columns(
        ["label", "n_docs"])
    return tbl.sort_by("label")


SQL_SENTIMENT_DISTRIBUTION = _sent_sql_base() + """
SELECT CASE WHEN raw_score > 0.1 THEN 'positive'
            WHEN raw_score < -0.1 THEN 'negative' ELSE 'neutral' END AS label,
       count(*) AS n_docs
FROM scored GROUP BY 1 ORDER BY label
"""


def q_sentiment_avg(sf_dir: str) -> pa.Table:
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    scored = ds.map_batches(memoized_stage("sentiment", SentimentScorer),
                      batch_format="pandas")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [batch["score"].sum()], "n": [len(batch)]})

    agg = scored.map_batches(partial, batch_format="pandas")
    tot = agg.sum(["s", "n"])
    avg = tot["sum(s)"] / tot["sum(n)"] if tot["sum(n)"] else 0.0
    return pa.table({"avg_score": pa.array([float(round6(avg))], pa.float64()),
                     "n_docs": pa.array([int(tot["sum(n)"])], pa.int64())})


SQL_SENTIMENT_AVG = _sent_sql_base() + """
SELECT ROUND(avg(ROUND(raw_score, 6)), 6) AS avg_score, count(*) AS n_docs FROM scored
"""


def q_negative_docs(sf_dir: str) -> pa.Table:
    """filter_negative_posts (sentiment.py:289-312), threshold -0.3."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    scored = ds.map_batches(memoized_stage("sentiment", SentimentScorer),
                      batch_format="pandas")
    neg = scored.filter(expr="score < -0.3")
    t = _collect(neg)
    return t.select(["doc_id", "score"]).sort_by("doc_id")


SQL_NEGATIVE_DOCS = _sent_sql_base() + """
SELECT doc_id, ROUND(raw_score, 6) AS score FROM scored
WHERE ROUND(raw_score, 6) < -0.3 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Tokens / keywords (M16-M18 preprocess+tokenize, A3/K1 counts + top-N)
# ---------------------------------------------------------------------------

_PRE_SQL = """
WITH pre AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s가-힣]', ' ', 'g'),
                               '\\s+', ' ', 'g')) AS t
    FROM documents
), toks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM pre
    ) WHERE length(w) BETWEEN 2 AND 20
)
"""


def _tokenize_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch token counting (combiner before the small groupby)."""
    from ..functions.textproc import DEFAULT_STOPWORDS, preprocess_keywords, tokenize

    counts: dict[str, int] = {}
    for text in batch["text"]:
        for tok in tokenize(preprocess_keywords(text)):
            if tok not in DEFAULT_STOPWORDS:
                counts[tok] = counts.get(tok, 0) + 1
    return pd.DataFrame({"token": list(counts.keys()),
                         "n": np.fromiter(counts.values(), dtype=np.int64,
                                          count=len(counts))})


def q_token_counts_top50(sf_dir: str) -> pa.Table:
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    part = ds.map_batches(_tokenize_partial, batch_format="pandas")
    tbl = _combine_partials(part, ["token"], ["n"])
    tbl = tbl.rename_columns(["token", "n_occurrences"])
    tbl = tbl.sort_by([("n_occurrences", "descending"), ("token", "ascending")])
    return tbl.slice(0, 50)


SQL_TOKEN_COUNTS_TOP50 = _PRE_SQL + """
SELECT w AS token, count(*) AS n_occurrences FROM toks
GROUP BY w ORDER BY n_occurrences DESC, token ASC LIMIT 50
"""


def q_keyword_doc_mapping(sf_dir: str) -> pa.Table:
    """J2: top-10 tokens -> (doc_count, total_chars) of containing docs.

    Broadcast the (tiny) top-token set; per-batch membership; partial
    aggregation; final small groupby.
    """
    top = q_token_counts_top50(sf_dir).slice(0, 10).column("token").to_pylist()
    top_set = set(top)
    from ..functions.textproc import preprocess_keywords, tokenize

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {t: [0, 0] for t in top_set}
        for text, n_chars in zip(batch["text"], batch["n_chars"]):
            toks = set(tokenize(preprocess_keywords(text))) & top_set
            for t in toks:
                rows[t][0] += 1
                rows[t][1] += int(n_chars)
        return pd.DataFrame({"token": list(rows.keys()),
                             "dc": [v[0] for v in rows.values()],
                             "tc": [v[1] for v in rows.values()]})

    ds = _docs(sf_dir, columns=["doc_id", "text", "n_chars"])
    part = ds.map_batches(pairs, batch_format="pandas")
    tbl = _combine_partials(part, ["token"], ["dc", "tc"])
    tbl = tbl.rename_columns(["token", "doc_count", "total_chars"])
    return tbl.sort_by("token")


SQL_KEYWORD_DOC_MAPPING = _PRE_SQL + """
, top AS (
    SELECT w FROM toks GROUP BY w ORDER BY count(*) DESC, w ASC LIMIT 10
), pairs AS (
    SELECT DISTINCT t.doc_id, t.w FROM toks t JOIN top USING (w)
)
SELECT p.w AS token, count(*) AS doc_count, CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM pairs p JOIN documents d USING (doc_id)
GROUP BY p.w ORDER BY token
"""


# ---------------------------------------------------------------------------
# Relevance (F1: relevance_filter.py:30-132)
# ---------------------------------------------------------------------------

def q_relevance_scores(sf_dir: str) -> pa.Table:
    kws = REL_KEYWORDS

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("").str.lower()
        body_hits = sum(t.str.contains(re.escape(k), regex=True).astype(int) for k in kws)
        freq = sum(t.str.count(re.escape(k)) for k in kws)
        body_ratio = body_hits / len(kws)
        bonus = np.where(freq > 0, 0.3 * (1 - 1 / (1 + freq * 0.1)), 0.0)
        s = np.minimum(1.0, np.maximum(0.0, body_ratio * 0.4 + bonus))
        return pd.DataFrame({"doc_id": batch["doc_id"].values,
                             "relevance_score": round6(s)})

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = ds.map_batches(score, batch_format="pandas")
    return _collect(out).sort_by("doc_id")


SQL_RELEVANCE_SCORES = """
WITH pre AS (SELECT doc_id, lower(text) AS t FROM documents),
cnt AS (
    SELECT doc_id,
           ({present}) AS body_hits,
           ({freq}) AS freq
    FROM pre
)
SELECT doc_id,
       ROUND(LEAST(1.0, GREATEST(0.0,
             (body_hits / {nk}.0) * 0.4 +
             CASE WHEN freq > 0 THEN 0.3 * (1 - 1 / (1 + freq * 0.1)) ELSE 0.0 END)), 6)
           AS relevance_score
FROM cnt ORDER BY doc_id
""".format(
    present=" + ".join(f"CASE WHEN t LIKE '%{k}%' THEN 1 ELSE 0 END" for k in REL_KEYWORDS),
    freq=" + ".join(f"(length(t) - length(replace(t, '{k}', ''))) / {len(k)}"
                    for k in REL_KEYWORDS),
    nk=len(REL_KEYWORDS),
)


# ---------------------------------------------------------------------------
# Bug classification (F6: issue_detector.py:40-46,259-311)
# ---------------------------------------------------------------------------

def q_bug_docs(sf_dir: str) -> pa.Table:
    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("").str.lower()
        is_bug = np.zeros(len(t), dtype=bool)
        for w in BUG_WORDS:
            is_bug |= t.str.contains(re.escape(w), regex=True).values
        return pd.DataFrame({"doc_id": batch["doc_id"].values, "is_bug": is_bug})

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = ds.map_batches(classify, batch_format="pandas")
    return _collect(out).sort_by("doc_id")


SQL_BUG_DOCS = """
SELECT doc_id, ({expr}) AS is_bug FROM documents ORDER BY doc_id
""".format(expr=" OR ".join(f"lower(text) LIKE '%{w}%'" for w in BUG_WORDS))


# ---------------------------------------------------------------------------
# Trends (A6-A9, F9, F10: trend_analyzer.py)
# ---------------------------------------------------------------------------

def _trend(sf_dir: str, unit: str) -> pa.Table:
    ds = _events(sf_dir, columns=["ts", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        date = pc.floor_temporal(batch.column("ts"), unit=unit,
                                 week_starts_monday=True)
        # partial per-batch aggregation: (date, sum, count)
        t = pa.table({"date": date, "value": batch.column("value")})
        g = t.group_by("date").aggregate([("value", "sum"), ("value", "count")])
        return g.rename_columns(["date", "s", "n"])

    part = ds.map_batches(bucket, batch_format="pyarrow")
    tbl = _combine_partials(part, ["date"], ["s", "n"])
    value = round6(np.array(tbl.column("s")) / np.array(tbl.column("n")))
    out = pa.table({
        "date": tbl.column("date"),
        "value": pa.array(value, pa.float64()),
        "count": pc.cast(tbl.column("n"), pa.int64()),
    })
    return out.sort_by("date")


def q_trend_daily(sf_dir: str) -> pa.Table:
    return _trend(sf_dir, "day")


SQL_TREND_DAILY = """
SELECT date_trunc('day', ts) AS date, ROUND(avg(value), 6) AS value,
       count(*) AS count
FROM events GROUP BY 1 ORDER BY date
"""


def q_trend_weekly(sf_dir: str) -> pa.Table:
    return _trend(sf_dir, "week")


SQL_TREND_WEEKLY = """
SELECT date_trunc('week', ts) AS date, ROUND(avg(value), 6) AS value,
       count(*) AS count
FROM events GROUP BY 1 ORDER BY date
"""


def q_trend_summary(sf_dir: str) -> pa.Table:
    daily = q_trend_daily(sf_dir)
    v = np.array(daily.column("value"))
    c = np.array(daily.column("count"))
    return pa.table({
        "total_points": pa.array([len(v)], pa.int64()),
        "avg_value": pa.array([float(round6(v.mean()))], pa.float64()),
        "min_value": pa.array([float(v.min())], pa.float64()),
        "max_value": pa.array([float(v.max())], pa.float64()),
        "total_count": pa.array([int(c.sum())], pa.int64()),
    })


SQL_TREND_SUMMARY = """
WITH t AS (
    SELECT date_trunc('day', ts) AS date, ROUND(avg(value), 6) AS value,
           count(*) AS count
    FROM events GROUP BY 1
)
SELECT count(*) AS total_points, ROUND(avg(value), 6) AS avg_value,
       min(value) AS min_value, max(value) AS max_value,
       CAST(sum(count) AS BIGINT) AS total_count
FROM t
"""


def q_trend_changes(sf_dir: str) -> pa.Table:
    """F9: consecutive-point delta >= threshold (trend_analyzer.py:136-149).
    The daily trend is tiny (one row per day); the pairwise scan runs on the
    driver exactly like the reference's ordered scan."""
    threshold = 5.0
    daily = q_trend_daily(sf_dir).to_pylist()
    rows = []
    for prev, cur in zip(daily, daily[1:]):
        change = cur["value"] - prev["value"]
        if abs(change) >= threshold:
            rows.append({"date": cur["date"], "prev_value": prev["value"],
                         "value": cur["value"], "change": float(round6(change))})
    if not rows:
        return pa.table({"date": pa.array([], pa.timestamp("us")),
                         "prev_value": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64()),
                         "change": pa.array([], pa.float64())})
    return pa.Table.from_pylist(rows).sort_by("date")


SQL_TREND_CHANGES = """
WITH t AS (
    SELECT date_trunc('day', ts) AS date, ROUND(avg(value), 6) AS value
    FROM events GROUP BY 1
), lagged AS (
    SELECT date, value, lag(value) OVER (ORDER BY date) AS prev_value FROM t
)
SELECT date, prev_value, value, ROUND(value - prev_value, 6) AS change
FROM lagged WHERE prev_value IS NOT NULL AND abs(value - prev_value) >= 5.0
ORDER BY date
"""


def q_trend_spikes(sf_dir: str) -> pa.Table:
    """F9 spike points: daily-trend points whose value falls below the
    threshold (trend_analyzer.py:129-134 ``detect_sentiment_spike``
    semantics, threshold scaled to the events value domain)."""
    threshold = 48.0
    daily = q_trend_daily(sf_dir)
    return daily.filter(pc.less(daily.column("value"), threshold))


SQL_TREND_SPIKES = """
WITH t AS (
    SELECT date_trunc('day', ts) AS date, ROUND(avg(value), 6) AS value,
           count(*) AS count
    FROM events GROUP BY 1
)
SELECT date, value, count FROM t WHERE value < 48.0 ORDER BY date
"""


def q_period_comparison(sf_dir: str) -> pa.Table:
    """A9: avg of two date windows + delta (trend_analyzer.py:178-204)."""
    ds = _events(sf_dir, columns=["ts", "value"])

    def windows(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        import datetime as dt

        w1 = pc.and_(pc.greater_equal(ts, pa.scalar(dt.datetime(2024, 1, 1))),
                     pc.less(ts, pa.scalar(dt.datetime(2024, 1, 11))))
        w2 = pc.and_(pc.greater_equal(ts, pa.scalar(dt.datetime(2024, 1, 15))),
                     pc.less(ts, pa.scalar(dt.datetime(2024, 1, 25))))
        v = batch.column("value")
        return pa.table({
            "s1": [pc.sum(pc.filter(v, w1)).as_py() or 0.0],
            "n1": [pc.sum(pc.cast(w1, pa.int64())).as_py() or 0],
            "s2": [pc.sum(pc.filter(v, w2)).as_py() or 0.0],
            "n2": [pc.sum(pc.cast(w2, pa.int64())).as_py() or 0],
        })

    part = ds.map_batches(windows, batch_format="pyarrow")
    tot = part.sum(["s1", "n1", "s2", "n2"])
    a1 = tot["sum(s1)"] / tot["sum(n1)"] if tot["sum(n1)"] else 0.0
    a2 = tot["sum(s2)"] / tot["sum(n2)"] if tot["sum(n2)"] else 0.0
    return pa.table({
        "p1_count": pa.array([int(tot["sum(n1)"])], pa.int64()),
        "p1_avg": pa.array([float(round6(a1))], pa.float64()),
        "p2_count": pa.array([int(tot["sum(n2)"])], pa.int64()),
        "p2_avg": pa.array([float(round6(a2))], pa.float64()),
        "change": pa.array([float(round6(a2 - a1))], pa.float64()),
    })


SQL_PERIOD_COMPARISON = """
WITH w1 AS (
    SELECT count(*) AS c, avg(value) AS a FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-11'
), w2 AS (
    SELECT count(*) AS c, avg(value) AS a FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-25'
)
SELECT w1.c AS p1_count, ROUND(w1.a, 6) AS p1_avg,
       w2.c AS p2_count, ROUND(w2.a, 6) AS p2_avg,
       ROUND(w2.a - w1.a, 6) AS change
FROM w1, w2
"""


# ---------------------------------------------------------------------------
# Filters / sorts (data_filter.py family) and top-k (K4/K6/K8)
# ---------------------------------------------------------------------------

def q_filter_docs(sf_dir: str) -> pa.Table:
    ds = _docs(sf_dir, columns=["doc_id", "source", "lang", "n_chars"])

    def flt(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(batch.column("source"), value_set=pa.array(["src1", "src3"])),
            pc.greater_equal(batch.column("n_chars"), 300),
        )
        return batch.filter(mask)

    out = ds.map_batches(flt, batch_format="pyarrow")
    return _collect(out).sort_by("doc_id")


SQL_FILTER_DOCS = """
SELECT doc_id, source, lang, n_chars FROM documents
WHERE source IN ('src1', 'src3') AND n_chars >= 300 ORDER BY doc_id
"""


def q_sort_docs_top20(sf_dir: str) -> pa.Table:
    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])
    out = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)
    return _collect(out)


SQL_SORT_DOCS_TOP20 = """
SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 20
"""


def q_hot_users_topk(sf_dir: str) -> pa.Table:
    """K4 hot-score pattern: per-entity counts, normalize by global max,
    weighted sum, top-k (issue_detector.py:664-705). Two-pass: partial
    counts in map_batches, small groupby, driver-side score+sort of the
    per-user table."""
    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.assign(
            n_view=(batch["event_type"] == "view").astype(np.int64),
            n_click=(batch["event_type"] == "click").astype(np.int64),
            n_error=(batch["event_type"] == "error").astype(np.int64),
        ).groupby("user_id", as_index=False)[["n_view", "n_click", "n_error"]].sum()
        return g

    part = ds.map_batches(partial, batch_format="pandas")
    tbl = _combine_partials(part, ["user_id"], ["n_view", "n_click", "n_error"])
    nv = np.array(tbl.column("n_view"), dtype=np.float64)
    ncl = np.array(tbl.column("n_click"), dtype=np.float64)
    ne = np.array(tbl.column("n_error"), dtype=np.float64)
    score = round6(0.4 * nv / nv.max() + 0.3 * ncl / ncl.max() + 0.3 * ne / ne.max())
    out = pa.table({
        "user_id": tbl.column("user_id"),
        "hot_score": pa.array(score, pa.float64()),
    }).sort_by([("hot_score", "descending"), ("user_id", "ascending")])
    return out.slice(0, 10)


SQL_HOT_USERS_TOPK = """
WITH c AS (
    SELECT user_id,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
    FROM events GROUP BY user_id
), m AS (
    SELECT max(n_view) AS mv, max(n_click) AS mc, max(n_error) AS me FROM c
)
SELECT user_id,
       ROUND(0.4 * n_view / CAST(mv AS DOUBLE) + 0.3 * n_click / CAST(mc AS DOUBLE)
             + 0.3 * n_error / CAST(me AS DOUBLE), 6) AS hot_score
FROM c, m ORDER BY hot_score DESC, user_id ASC LIMIT 10
"""


def q_urgent_window(sf_dir: str) -> pa.Table:
    """A11: error events within the trailing 24h window, count >= 2
    (issue_detector.py:619-662 urgency semantics)."""
    ds = _events(sf_dir, columns=["ts", "user_id", "event_type"])
    max_ts = ds.max("ts")
    import datetime as dt

    cutoff = max_ts - dt.timedelta(hours=24)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch[(batch["event_type"] == "error") & (batch["ts"] >= cutoff)]
        return sel.groupby("user_id", as_index=False).agg(n_errors=("ts", "size"))

    part = ds.map_batches(partial, batch_format="pandas")
    tbl = _combine_partials(part, ["user_id"], ["n_errors"])
    tbl = tbl.filter(pc.greater_equal(tbl.column("n_errors"), 2))
    return tbl.sort_by("user_id")


SQL_URGENT_WINDOW = """
WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT user_id, count(*) AS n_errors
FROM events, mx
WHERE event_type = 'error' AND ts >= m - INTERVAL '24 hours'
GROUP BY user_id HAVING count(*) >= 2 ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Joins / grouped stats (J-family, A13)
# ---------------------------------------------------------------------------

def q_site_stats(sf_dir: str) -> pa.Table:
    """A13 dashboard stats: per (source, lang) count + avg chars."""
    ds = _docs(sf_dir, columns=["source", "lang", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["source", "lang"], as_index=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum"))
        return g

    part = ds.map_batches(partial, batch_format="pandas")
    tbl = _combine_partials(part, ["source", "lang"], ["n", "s"])
    tbl = tbl.rename_columns(["source", "lang", "n_docs", "s"])
    avg = round6(np.array(tbl.column("s"), dtype=np.float64)
                 / np.array(tbl.column("n_docs"), dtype=np.float64))
    out = pa.table({
        "source": tbl.column("source"), "lang": tbl.column("lang"),
        "n_docs": pc.cast(tbl.column("n_docs"), pa.int64()),
        "avg_chars": pa.array(avg, pa.float64()),
    })
    return out.sort_by([("source", "ascending"), ("lang", "ascending")])


SQL_SITE_STATS = """
SELECT source, lang, count(*) AS n_docs, ROUND(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY source, lang ORDER BY source, lang
"""


def q_events_per_nation(sf_dir: str) -> pa.Table:
    """Broadcast join: events ⋈ customer ⋈ nation (small sides via ray.put),
    then partial count + small groupby — the J1/J3 lookup pattern."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation_of = dict(zip(cust.column("c_custkey").to_pylist(),
                         cust.column("c_nationkey").to_pylist()))
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    lookup_ref = ray.put((nation_of, name_of))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        nation_of_, name_of_ = ray.get(lookup_ref)
        names = batch["user_id"].map(lambda u: name_of_.get(nation_of_.get(u)))
        g = batch.assign(n_name=names).dropna(subset=["n_name"]).groupby(
            "n_name", as_index=False).agg(n=("value", "size"), s=("value", "sum"))
        return g

    ds = _events(sf_dir, columns=["user_id", "value"])
    part = ds.map_batches(partial, batch_format="pandas")
    tbl = _combine_partials(part, ["n_name"], ["n", "s"])
    tbl = tbl.rename_columns(["n_name", "n_events", "s"])
    out = pa.table({
        "n_name": tbl.column("n_name"),
        "n_events": pc.cast(tbl.column("n_events"), pa.int64()),
        "total_value": pa.array(round6(np.array(tbl.column("s"))), pa.float64()),
    })
    return out.sort_by("n_name")


SQL_EVENTS_PER_NATION = """
SELECT n.n_name, count(*) AS n_events, ROUND(sum(e.value), 6) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""


def q_docs_join_embeddings(sf_dir: str) -> pa.Table:
    """Distributed HASH JOIN (both sides partitioned — the big⋈big shape,
    unlike the broadcast lookups used when one side is small): documents
    ⋈ embeddings on doc_id == vec_id via ``Dataset.join``."""
    docs = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
    embs = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "label"])
    joined = docs.join(embs, join_type="inner", num_partitions=8,
                       on=("doc_id",), right_on=("vec_id",))

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_chars": batch.column("n_chars"),
            "label": pc.cast(batch.column("label"), pa.int64()),
        })

    return _collect(joined.map_batches(proj, batch_format="pyarrow")
                    ).sort_by("doc_id")


SQL_DOCS_JOIN_EMBEDDINGS = """
SELECT d.doc_id, d.lang, d.n_chars, CAST(e.label AS BIGINT) AS label
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "sentiment_scores": q_sentiment_scores,
    "sentiment_distribution": q_sentiment_distribution,
    "sentiment_avg": q_sentiment_avg,
    "negative_docs": q_negative_docs,
    "token_counts_top50": q_token_counts_top50,
    "keyword_doc_mapping": q_keyword_doc_mapping,
    "relevance_scores": q_relevance_scores,
    "bug_docs": q_bug_docs,
    "trend_daily": q_trend_daily,
    "trend_weekly": q_trend_weekly,
    "trend_summary": q_trend_summary,
    "trend_changes": q_trend_changes,
    "trend_spikes": q_trend_spikes,
    "period_comparison": q_period_comparison,
    "filter_docs": q_filter_docs,
    "sort_docs_top20": q_sort_docs_top20,
    "hot_users_topk": q_hot_users_topk,
    "urgent_window": q_urgent_window,
    "site_stats": q_site_stats,
    "events_per_nation": q_events_per_nation,
    "docs_join_embeddings": q_docs_join_embeddings,
}

ORACLE_SQL = {
    "sentiment_scores": SQL_SENTIMENT_SCORES,
    "sentiment_distribution": SQL_SENTIMENT_DISTRIBUTION,
    "sentiment_avg": SQL_SENTIMENT_AVG,
    "negative_docs": SQL_NEGATIVE_DOCS,
    "token_counts_top50": SQL_TOKEN_COUNTS_TOP50,
    "keyword_doc_mapping": SQL_KEYWORD_DOC_MAPPING,
    "relevance_scores": SQL_RELEVANCE_SCORES,
    "bug_docs": SQL_BUG_DOCS,
    "trend_daily": SQL_TREND_DAILY,
    "trend_weekly": SQL_TREND_WEEKLY,
    "trend_summary": SQL_TREND_SUMMARY,
    "trend_changes": SQL_TREND_CHANGES,
    "trend_spikes": SQL_TREND_SPIKES,
    "period_comparison": SQL_PERIOD_COMPARISON,
    "filter_docs": SQL_FILTER_DOCS,
    "sort_docs_top20": SQL_SORT_DOCS_TOP20,
    "hot_users_topk": SQL_HOT_USERS_TOPK,
    "urgent_window": SQL_URGENT_WINDOW,
    "site_stats": SQL_SITE_STATS,
    "events_per_nation": SQL_EVENTS_PER_NATION,
    "docs_join_embeddings": SQL_DOCS_JOIN_EMBEDDINGS,
}
