"""Issue detection + game analysis over crawled posts — the reference's
``GameAnalyzer``/``IssueDetector`` tier (SURVEY.md §3.3) re-expressed on
Ray Data.

Formula parity (constants cited from /root/reference):

- post sentiment: lexicon scoring of "title title body"
  (sentiment.py:212-228), Korean fixture lexicon (functions/lexicon_ko).
- keywords: each post's top-100 tokens; global frequency = number of posts
  whose top-100 contains the token (keyword_extractor.py:219-249
  Counter-over-lists semantics). Tie-break on equal counts is
  lexicographic here (the reference inherits dict insertion order, which
  is not a stable spec — documented deviation).
- clustering: greedy first-fit vs cluster representative, threshold 0.5,
  similarity = equality 1.0 / containment 0.8 / char-set Jaccard
  (issue_detector.py:77-168). Order-dependent — runs on the driver over
  the <=50 top keywords (SURVEY.md §7.3).
- cluster stats: distinct posts whose top-100 keywords intersect the
  cluster (issue_detector.py:170-207).
- priority: 0.3*views/total_views + 0.3*comments/total_comments +
  0.4*posts/total_posts (issue_detector.py:209-257).
- bug flag: any cluster keyword containing a BUG_KEYWORDS entry
  (issue_detector.py:478-481); severity = 0.5*min(1, n/total_posts) +
  0.5*max(0, -sentiment_avg), thresholds 0.7/0.5/0.3
  (issue_detector.py:334-380).
- hot issues: top (1-0.9) fraction, >=1 (issue_detector.py:518-551).
- hot posts: 0.4*views/max + 0.3*comments/max + 0.3*(1-score)/2, top
  min(10%, 20) (issue_detector.py:664-791).
- urgent: issue mentioned by >=10 posts in the trailing 24h window
  (issue_detector.py:619-662 semantics).

Distribution shape: two vectorized map_batches passes over posts (score +
per-post keyword sets), partial keyword counts combined on the driver,
cluster membership as broadcast-keyword containment pairs, and the greedy
clustering + per-cluster math on the driver over <=50 rows.
"""

from __future__ import annotations

from collections import Counter
from datetime import timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.lexicon_ko import NEGATIVE_KO, POSITIVE_KO
from ..functions.textproc import (
    combined_post_text, extract_keywords_from_text,
)
from .analytics import SentimentScorer, _collect, round6

BUG_KEYWORDS = {
    "버그", "오류", "에러", "렉", "튕김", "접속불가",
    "크래시", "프리징", "멈춤", "안됨", "불가", "안돼",
    "오작동", "작동안함", "실행안됨", "로딩", "무한로딩",
    "끊김", "팅김", "다운", "서버다운", "점검", "긴급점검",
    "bug", "error", "crash", "freeze", "lag",
}

SEVERITY_ORDER = {"critical": 0, "high": 1, "medium": 2, "low": 3}


def keyword_similarity(kw1: str, kw2: str) -> float:
    """F4: equality 1.0, containment 0.8, else char-set Jaccard."""
    if kw1 == kw2:
        return 1.0
    if kw1 in kw2 or kw2 in kw1:
        return 0.8
    s1, s2 = set(kw1), set(kw2)
    union = len(s1 | s2)
    return len(s1 & s2) / union if union else 0.0


def cluster_keywords(keywords: list[str], threshold: float = 0.5) -> list[dict]:
    """F5: greedy first-fit clustering vs the representative (first) keyword.
    Order-dependent; runs single-threaded on the driver."""
    clusters: list[list[str]] = []
    for kw in keywords:
        best_idx, best_sim = -1, 0.0
        for ci, ckws in enumerate(clusters):
            sim = keyword_similarity(kw, ckws[0])
            if sim >= threshold and sim > best_sim:
                best_sim, best_idx = sim, ci
        if best_idx >= 0:
            clusters[best_idx].append(kw)
        else:
            clusters.append([kw])
    return [{"cluster_id": f"cluster_{i}", "keywords": kws, "representative": kws[0]}
            for i, kws in enumerate(clusters)]


def cluster_is_bug(keywords: list[str]) -> bool:
    return any(
        kw.lower() in BUG_KEYWORDS
        or any(b in kw.lower() for b in BUG_KEYWORDS)
        for kw in keywords
    )


def severity_from_metrics(post_count: int, sentiment_avg: float,
                          max_post_count: int) -> str:
    freq = min(1.0, post_count / max(max_post_count, 1))
    senti = max(0.0, -sentiment_avg)
    score = 0.5 * freq + 0.5 * senti
    if score >= 0.7:
        return "critical"
    if score >= 0.5:
        return "high"
    if score >= 0.3:
        return "medium"
    return "low"


# ---------------------------------------------------------------------------
# Distributed passes
# ---------------------------------------------------------------------------

class _PostScore:
    """Per-post enrich pass: sentiment (title-weighted), bug flag, comment
    count AND the per-post top-100 keyword list — computed ONCE, so the
    downstream keyword-count / cluster-membership passes never re-tokenize
    (tokenization dominates the tier's CPU)."""

    def __init__(self, with_tokens: bool = False, n_keep: int = 100):
        self.scorer = SentimentScorer(pos=POSITIVE_KO, neg=NEGATIVE_KO)
        self.with_tokens = with_tokens
        self.n_keep = n_keep

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        title = batch["title"].fillna("")
        body = batch["body"].fillna("")
        combined = title + " " + title + " " + body
        scored = self.scorer.score_frame(combined)
        text_lower = (title + " " + body).str.lower()
        is_bug = np.zeros(len(batch), dtype=bool)
        for w in BUG_KEYWORDS:
            is_bug |= text_lower.str.contains(w, regex=False).values
        out = pd.DataFrame({
            "url": batch["url"].values,
            "title": title.values,
            "site": batch["site"].values,
            "author": batch["author"].fillna("").values,
            "created_at": batch["created_at"].values,
            "view_count": batch["view_count"].values,
            "like_count": batch["like_count"].values,
            "n_comments": batch["comments"].map(
                lambda c: len(c) if c is not None else 0).values,
            "score": scored["score"].values,
            "is_bug": is_bug,
        })
        if self.with_tokens:
            toks = []
            for t, b, comments in zip(title, body, batch["comments"]):
                clist = comments if comments is not None else []
                text = combined_post_text(t or "", b or "",
                                          [c["content"] for c in clist])
                toks.append(extract_keywords_from_text(text, top_n=self.n_keep))
            out["tokens"] = toks
        return out


_POSTSCORE_MEMO: dict = {}

ISSUES_PERSIST_ROOT = "/tmp/grc_issues"


def _persist_analysis_inputs(scored: ray.data.Dataset, clusters: list[dict],
                             target: str) -> None:
    """Write the analysis tier's two oracle inputs — the enriched per-post
    table (Ray Data write, nothing post-sized on the driver) and the
    <=50-row cluster map — into a temp dir renamed into place (atomic vs
    readers and concurrent builders)."""
    import os
    import shutil
    import uuid

    import pyarrow.parquet as pq

    tmp = f"{target}.tmp-{uuid.uuid4().hex}"
    (scored.map_batches(
        lambda b: b[["url", "score", "view_count", "n_comments",
                     "created_at", "tokens"]],
        batch_format="pandas")
     .write_parquet(os.path.join(tmp, "scored")))
    rows = [{"cluster_id": c["cluster_id"], "keyword": kw, "kw_idx": j,
             "representative": c["representative"]}
            for c in clusters for j, kw in enumerate(c["keywords"])]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(tmp, "clusters.parquet"))
    shutil.rmtree(target, ignore_errors=True)
    try:
        os.rename(tmp, target)
    except OSError:            # concurrent builder won the rename
        shutil.rmtree(tmp, ignore_errors=True)


def cluster_partials_fn(top_ref, kw_cluster_ref, cutoff):
    """Task-pool form of ``_ClusterPartials``: instance memoized per worker
    keyed by the broadcast refs (the derefs are a <=50-keyword set/map)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        key = ("cluster", top_ref.hex(), kw_cluster_ref.hex(), str(cutoff))
        inst = _POSTSCORE_MEMO.get(key)
        if inst is None:
            if len(_POSTSCORE_MEMO) > 8:
                _POSTSCORE_MEMO.clear()
            inst = _POSTSCORE_MEMO[key] = _ClusterPartials(
                top_ref, kw_cluster_ref, cutoff)
        return inst(batch)

    return fn


def post_score_fn(with_tokens: bool = False, n_keep: int = 100):
    """Task-pool form of ``_PostScore``: the scorer is memoized in worker
    module state (construction is just two lexicon dicts), so the stage
    needs no actor pool — measured ~2s of (2,32)-actor spin-up per query
    on an otherwise ~3s pipeline."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        key = (with_tokens, n_keep)
        inst = _POSTSCORE_MEMO.get(key)
        if inst is None:
            inst = _POSTSCORE_MEMO[key] = _PostScore(
                with_tokens=with_tokens, n_keep=n_keep)
        return inst(batch)

    return fn


def _post_keywords_stage(_unused=None, n_keep: int = 100):
    """Per-block partial counts of per-post top-100 keyword membership
    (keyword_extractor.py:219-249 Counter-over-lists semantics)."""

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        counts: Counter = Counter()
        for title, body, comments in zip(batch["title"], batch["body"],
                                         batch["comments"]):
            clist = comments if comments is not None else []
            text = combined_post_text(
                title or "", body or "",
                [c["content"] for c in clist])
            counts.update(extract_keywords_from_text(text, top_n=n_keep))
        return pd.DataFrame({"token": list(counts.keys()),
                             "n": np.fromiter(counts.values(), np.int64,
                                              len(counts))})

    return stage


def top_keywords(posts: ray.data.Dataset, top_n: int = 50) -> list[str]:
    """A3/K1: global top-N keywords (post-level presence counts)."""
    part = posts.map_batches(_post_keywords_stage(None), batch_format="pandas")
    merged: Counter = Counter()
    for t in ray.get(part.to_arrow_refs()):
        if t.num_rows:
            for tok, n in zip(t.column("token").to_pylist(),
                              t.column("n").to_pylist()):
                merged[tok] += n
    # deterministic tie-break: count desc, token asc
    ordered = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    return [k for k, _ in ordered[:top_n]]


RELATED_POSTS_CAP = 200  # per-issue drill-down list cap (deterministic: smallest urls)


def _global_stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-block scalar partials over the scored posts (one row per block)."""
    s = batch["score"]
    return pd.DataFrame({
        "n": [len(batch)],
        "sum_score": [float(s.sum())],
        "n_pos": [int((s > 0.1).sum())],
        "n_neg": [int((s < -0.1).sum())],
        "sum_views": [int(batch["view_count"].sum())],
        "sum_comments": [int(batch["n_comments"].sum())],
        "max_views": [int(batch["view_count"].max())],
        "max_comments": [int(batch["n_comments"].max())],
        "max_ts": [batch["created_at"].max()],
    })


class _ClusterPartials:
    """Per-block per-cluster partial stats (issue_detector.py:170-207,464-474
    semantics, distributed) over the ENRICHED posts (score + top-100 token
    list precomputed by _PostScore — no re-tokenize, no re-score).

    Distinct (cluster, url) membership is exact across blocks because each
    url lives in exactly one block. Emits <= n_clusters rows per block:
    counts/sums/min-ts/urgent-count plus a capped, url-sorted sample of
    related post urls (driver merge re-caps, so the drill-down list is the
    deterministic smallest-url prefix).
    """

    def __init__(self, top_ref, kw_cluster_ref, cutoff,
                 cap: int = RELATED_POSTS_CAP):
        self.top = ray.get(top_ref)
        self.kw_cluster = ray.get(kw_cluster_ref)
        self.cutoff = cutoff
        self.cap = cap

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        acc: dict[str, list] = {}
        for url, toks, views, n_com, score, ts in zip(
                batch["url"], batch["tokens"], batch["view_count"],
                batch["n_comments"], batch["score"], batch["created_at"]):
            kws = set(toks) & self.top
            cids = {self.kw_cluster[k] for k in kws}
            for cid in cids:
                a = acc.get(cid)
                if a is None:
                    a = acc[cid] = [0, 0, 0, 0.0, None, 0, []]
                a[0] += 1
                a[1] += int(views)
                a[2] += int(n_com)
                a[3] += float(score)
                if ts is not None and not pd.isna(ts):
                    a[4] = ts if a[4] is None else min(a[4], ts)
                    if self.cutoff is not None and ts >= self.cutoff:
                        a[5] += 1
                a[6].append(url)
        rows = []
        for cid, a in acc.items():
            rows.append({
                "cluster_id": cid, "n_posts": a[0], "views": a[1],
                "comments": a[2], "sum_score": a[3], "min_ts": a[4],
                "n_urgent": a[5], "urls": sorted(a[6])[: self.cap],
            })
        return pd.DataFrame(rows, columns=["cluster_id", "n_posts", "views",
                                           "comments", "sum_score", "min_ts",
                                           "n_urgent", "urls"])


def _token_presence_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-block presence counts over the precomputed per-post token lists
    (each list is unique tokens, so update == post-level presence)."""
    counts: Counter = Counter()
    for toks in batch["tokens"]:
        counts.update(toks)
    return pd.DataFrame({"token": list(counts.keys()),
                         "n": np.fromiter(counts.values(), np.int64,
                                          len(counts))})


def _hot_partial_fn(maxes_ref, k: int = 20):
    """Per-block top-k hot posts (K4); global maxes broadcast. The final
    top-k is a tiny driver merge of <=k rows per block."""

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        max_views, max_comments = ray.get(maxes_ref)
        hot = (0.4 * np.minimum(batch["view_count"] / max_views, 1.0)
               + 0.3 * np.minimum(batch["n_comments"] / max_comments, 1.0)
               + 0.3 * (1.0 - batch["score"]) / 2.0)
        df = batch.assign(hot_score=round6(np.minimum(hot, 1.0)))
        df = df.sort_values(["hot_score", "url"], ascending=[False, True])
        return df.head(k)

    return stage


def analyze_posts(posts: ray.data.Dataset, top_n_keywords: int = 50,
                  urgent_hours: int = 24, urgent_min_posts: int = 10,
                  persist_dir: str | None = None) -> dict:
    """Full analysis: returns dict of small result tables (pa.Table).

    ``persist_dir``: when set, the enriched per-post table (url, score,
    views, comments, ts, top-100 tokens) and the driver's cluster map are
    written as parquet so the DuckDB oracle (SQL_DETECTED_ISSUES) can
    independently recompute everything downstream of tokenization —
    membership, cluster stats, priority, bug/severity, urgency, hot rank.

    Distribution shape (nothing post-sized ever lands on the driver):

    1. scored = posts -> _PostScore(with_tokens) map_batches, materialized
       in the OBJECT STORE (spillable): score, metadata AND the per-post
       top-100 token list, computed once (tokenization dominates the
       tier's CPU) and consumed by every later pass.
    2. global scalars (counts/sums/maxes/max_ts) via per-block partials +
       a one-row driver combine.
    3. top keywords via partial presence counts over the token lists;
       greedy clustering of the <=50 keywords on the driver
       (order-dependent by spec, SURVEY.md §7.3).
    4. per-cluster stats + capped related-post urls via broadcast
       keyword->cluster map and per-block partials (<= n_clusters rows per
       block), merged on the driver.
    5. hot posts via per-block top-20 partials (global maxes broadcast)
       merged on the driver.
    """
    scored = posts.map_batches(
        post_score_fn(with_tokens=True),
        batch_format="pandas").materialize()

    # --- pass 1: global scalars (A1/A2 + maxes + max_ts) ---
    gparts = [t for t in ray.get(
        scored.map_batches(_global_stats_partial, batch_format="pandas")
        .to_arrow_refs()) if t.num_rows]
    if not gparts:
        return {"issues": pa.table({}), "bug_issues": pa.table({}),
                "hot_posts": pa.table({}), "summary": pa.table({})}
    g = pa.concat_tables(gparts).to_pandas()
    n_posts = int(g["n"].sum())
    n_pos, n_neg = int(g["n_pos"].sum()), int(g["n_neg"].sum())
    avg_sentiment = float(round6(g["sum_score"].sum() / n_posts))
    total_views = max(int(g["sum_views"].sum()), 1)
    total_comments = max(int(g["sum_comments"].sum()), 1)
    max_views = max(int(g["max_views"].max()), 1)
    max_comments = max(int(g["max_comments"].max()), 1)
    max_ts = g["max_ts"].max()

    # --- keywords + clusters (driver-side over <=50 rows by design) ---
    part = scored.map_batches(_token_presence_partial, batch_format="pandas")
    merged: Counter = Counter()
    for t in ray.get(part.to_arrow_refs()):
        if t.num_rows:
            for tok, n in zip(t.column("token").to_pylist(),
                              t.column("n").to_pylist()):
                merged[tok] += n
    ordered = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    kws = [k for k, _ in ordered[:top_n_keywords]]
    clusters = cluster_keywords(kws)
    kw_cluster = {}
    for c in clusters:
        for k in c["keywords"]:
            kw_cluster[k] = c["cluster_id"]
    urgent_cut = max_ts - timedelta(hours=urgent_hours) if pd.notna(max_ts) else None

    if persist_dir:
        _persist_analysis_inputs(scored, clusters, persist_dir)

    # --- pass 2: per-cluster partials over the enriched posts ---
    cparts_ds = scored.map_batches(
        cluster_partials_fn(ray.put(set(kws)), ray.put(kw_cluster),
                            urgent_cut),
        batch_format="pandas")
    cstats: dict[str, list] = {}
    for t in ray.get(cparts_ds.to_arrow_refs()):
        if not t.num_rows:
            continue
        for r in t.to_pylist():
            a = cstats.get(r["cluster_id"])
            if a is None:
                a = cstats[r["cluster_id"]] = [0, 0, 0, 0.0, None, 0, []]
            a[0] += r["n_posts"]
            a[1] += r["views"]
            a[2] += r["comments"]
            a[3] += r["sum_score"]
            if r["min_ts"] is not None:
                a[4] = r["min_ts"] if a[4] is None else min(a[4], r["min_ts"])
            a[5] += r["n_urgent"]
            a[6] = sorted(a[6] + r["urls"])[:RELATED_POSTS_CAP]

    issues = []
    for c in clusters:
        st = cstats.get(c["cluster_id"], [0, 0, 0, 0.0, None, 0, []])
        post_count, views, comments = st[0], st[1], st[2]
        senti_avg = float(round6(st[3] / post_count)) if post_count else 0.0
        priority = (0.3 * views / total_views + 0.3 * comments / total_comments
                    + 0.4 * post_count / max(n_posts, 1))
        is_bug = cluster_is_bug(c["keywords"])
        severity = (severity_from_metrics(post_count, senti_avg, n_posts)
                    if is_bug else "low")
        first_seen = st[4]
        issues.append({
            "issue_id": c["cluster_id"],
            "title": c["representative"],
            "keywords": c["keywords"],
            "post_count": post_count,
            "total_views": views,
            "total_comments": comments,
            "priority_score": float(round6(priority)),
            "is_bug": is_bug,
            "severity": severity,
            "sentiment_avg": senti_avg,
            "first_seen": first_seen if first_seen is not None and pd.notna(first_seen) else None,
            "is_urgent": st[5] >= urgent_min_posts,
            "related_posts": st[6],
        })

    # K2 priority sort + K3 hot issues (top 10%, >=1)
    issues.sort(key=lambda x: -x["priority_score"])
    hot_count = max(1, int(len(issues) * 0.1))
    for i, issue in enumerate(issues):
        issue["is_hot"] = i < hot_count

    # K5 bug severity sort
    bug_issues = sorted(
        (i for i in issues if i["is_bug"]),
        key=lambda x: (SEVERITY_ORDER.get(x["severity"], 4), -x["priority_score"]))

    # --- pass 3: hot posts (K4) via per-block top-k partials ---
    k = min(max(1, int(n_posts * 0.1)), 20, n_posts)
    maxes_ref = ray.put((max_views, max_comments))
    hparts = [t.to_pandas() for t in ray.get(
        scored.map_batches(_hot_partial_fn(maxes_ref), batch_format="pandas")
        .to_arrow_refs()) if t.num_rows]
    hp = pd.concat(hparts).sort_values(["hot_score", "url"],
                                       ascending=[False, True])
    hot_posts = hp.head(k)[["url", "title", "site", "author", "created_at",
                            "view_count", "n_comments", "like_count",
                            "hot_score", "score", "is_bug"]]

    summary = pa.table({
        "n_posts": pa.array([n_posts], pa.int64()),
        "avg_sentiment": pa.array([avg_sentiment], pa.float64()),
        "n_positive": pa.array([n_pos], pa.int64()),
        "n_negative": pa.array([n_neg], pa.int64()),
        "n_neutral": pa.array([n_posts - n_pos - n_neg], pa.int64()),
        "n_issues": pa.array([len(issues)], pa.int64()),
        "n_bug_issues": pa.array([len(bug_issues)], pa.int64()),
        "n_hot_issues": pa.array([hot_count], pa.int64()),
    })

    issues_tbl = pa.Table.from_pylist([
        {k: (list(v) if k in ("keywords", "related_posts") else v)
         for k, v in i.items()}
        for i in issues
    ]) if issues else pa.table({})
    bug_tbl = pa.Table.from_pylist([
        {k: (list(v) if k in ("keywords", "related_posts") else v)
         for k, v in i.items()}
        for i in bug_issues
    ]) if bug_issues else pa.table({})
    return {
        "issues": issues_tbl,
        "bug_issues": bug_tbl,
        "hot_posts": pa.Table.from_pandas(hot_posts.reset_index(drop=True),
                                          preserve_index=False),
        "summary": summary,
    }


# ---------------------------------------------------------------------------
# F3: combined post+comment sentiment (sentiment.py:249-287)
# ---------------------------------------------------------------------------

class CombinedSentiment:
    """Per-post combined sentiment: ``clamp(0.7*post + 0.3*mean(comments))``
    with confidence ``(post_conf + mean(comment_conf)) / 2`` — the
    reference's ``analyze_post_with_comments`` (sentiment.py:249-287).
    Posts without comments fall back to the plain post result.

    Vectorized: comment contents are flattened once per batch via
    ``pc.list_flatten`` and scored in one pass; per-post means come from
    ``np.add.at`` over ``pc.list_parent_indices``.
    """

    def __init__(self):
        self.scorer = SentimentScorer(pos=POSITIVE_KO, neg=NEGATIVE_KO)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        title = batch.column("title").to_pandas().fillna("")
        body = batch.column("body").to_pandas().fillna("")
        post = self.scorer.score_frame(title + " " + title + " " + body, raw=True)
        comments = batch.column("comments")
        if isinstance(comments, pa.ChunkedArray):
            comments = comments.combine_chunks()
        parent = pc.list_parent_indices(comments).to_numpy(zero_copy_only=False)
        contents = pc.list_flatten(comments).field("content").to_pandas()
        cres = self.scorer.score_frame(contents, raw=True)

        n = batch.num_rows
        c_cnt = np.zeros(n, dtype=np.int64)
        c_sum = np.zeros(n, dtype=np.float64)
        c_conf_sum = np.zeros(n, dtype=np.float64)
        np.add.at(c_cnt, parent, 1)
        np.add.at(c_sum, parent, cres["score"].to_numpy())
        np.add.at(c_conf_sum, parent, cres["confidence"].to_numpy())
        has_c = c_cnt > 0
        denom = np.maximum(c_cnt, 1)
        c_avg, c_conf_avg = c_sum / denom, c_conf_sum / denom

        p = post["score"].to_numpy()
        p_conf = post["confidence"].to_numpy()
        score = np.where(has_c, np.clip(0.7 * p + 0.3 * c_avg, -1.0, 1.0), p)
        conf = np.where(has_c, (p_conf + c_conf_avg) / 2.0, p_conf)
        label = np.where(score > 0.1, "positive",
                         np.where(score < -0.1, "negative", "neutral"))
        return pa.table({
            "url": batch.column("url"),
            "score": pa.array(round6(score), pa.float64()),
            "label": pa.array(label, pa.string()),
            "confidence": pa.array(round6(conf), pa.float64()),
        })


def combined_sentiment_fn():
    """Task-pool form of ``CombinedSentiment`` (scorer memoized per worker
    — same rationale as ``post_score_fn``: the (2,32) actor pool's spin-up
    dominated the ~3s query)."""

    def fn(batch: pa.Table) -> pa.Table:
        inst = _POSTSCORE_MEMO.get("combined")
        if inst is None:
            inst = _POSTSCORE_MEMO["combined"] = CombinedSentiment()
        return inst(batch)

    return fn


def combined_post_sentiment(posts: ray.data.Dataset) -> ray.data.Dataset:
    return posts.map_batches(combined_sentiment_fn(), batch_format="pyarrow")


def q_combined_sentiment(sf_dir: str) -> pa.Table:
    import os

    from .textops import _crawl_out

    out = _crawl_out(sf_dir)
    posts = ray.data.read_parquet(os.path.join(out, "posts"),
                                  columns=["url", "title", "body", "comments"])
    return _collect(combined_post_sentiment(posts)).sort_by("url")


# Correctness gate runs at sf0.01, whose cached crawl lives at this
# deterministic path (textops._crawl_out: n=10000, hosts=50). The Ray query
# runs first and materializes it; the oracle then recomputes the formula
# from the raw parquet with DuckDB.
_CRAWL01_POSTS = "/tmp/grc_crawl/run_n10000_h50/posts/*.parquet"


def _ko_count_expr(words: list[str]) -> str:
    return " + ".join(
        f"(length(t) - length(replace(t, '{w}', ''))) / {len(w)}" for w in words)


_SCORE_CASE = ("CASE WHEN pos_cnt + neg_cnt = 0 THEN 0.0 "
               "ELSE GREATEST(-1.0, LEAST(1.0, "
               "(pos_cnt - neg_cnt) / CAST(pos_cnt + neg_cnt AS DOUBLE))) END")
_CONF_CASE = ("CASE WHEN n_words = 0 THEN 0.5 "
              "ELSE LEAST(1.0, 0.5 + ((pos_cnt + neg_cnt) / "
              "CAST(n_words AS DOUBLE)) * 0.5) END")

SQL_COMBINED_SENTIMENT = """
WITH posts AS (
    SELECT url, coalesce(title, '') AS title, coalesce(body, '') AS body, comments
    FROM read_parquet('{path}')
), p AS (
    SELECT url, trim(regexp_replace(lower(title || ' ' || title || ' ' || body),
                                    '\\s+', ' ', 'g')) AS t
    FROM posts
), ps AS (
    SELECT url, {pos} AS pos_cnt, {neg} AS neg_cnt,
           CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_words
    FROM p
), pscore AS (
    SELECT url, {score_case} AS p_score, {conf_case} AS p_conf FROM ps
), com AS (
    SELECT url, trim(regexp_replace(lower(coalesce(c.content, '')), '\\s+', ' ', 'g')) AS t
    FROM (SELECT url, unnest(comments) AS c FROM posts)
), cs AS (
    SELECT url, {pos} AS pos_cnt, {neg} AS neg_cnt,
           CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_words
    FROM com
), cscore AS (
    SELECT url, avg({score_case}) AS c_score, avg({conf_case}) AS c_conf,
           count(*) AS n
    FROM cs GROUP BY url
), fin AS (
    SELECT p.url,
           CASE WHEN c.n IS NULL OR c.n = 0 THEN p.p_score
                ELSE GREATEST(-1.0, LEAST(1.0, p.p_score * 0.7 + c.c_score * 0.3))
           END AS raw_score,
           CASE WHEN c.n IS NULL OR c.n = 0 THEN p.p_conf
                ELSE (p.p_conf + c.c_conf) / 2 END AS raw_conf
    FROM pscore p LEFT JOIN cscore c ON p.url = c.url
)
SELECT url, ROUND(raw_score, 6) AS score,
       CASE WHEN raw_score > 0.1 THEN 'positive'
            WHEN raw_score < -0.1 THEN 'negative' ELSE 'neutral' END AS label,
       ROUND(raw_conf, 6) AS confidence
FROM fin ORDER BY url
""".format(path=_CRAWL01_POSTS,
           pos=_ko_count_expr(POSITIVE_KO), neg=_ko_count_expr(NEGATIVE_KO),
           score_case=_SCORE_CASE, conf_case=_CONF_CASE)


# ---------------------------------------------------------------------------
# Alerts (alert_manager.py:286-465 semantics, small driver-side data)
# ---------------------------------------------------------------------------

PRIORITY_ORDER = {"critical": 0, "high": 1, "medium": 2, "low": 3}


def generate_alerts(analysis: dict) -> list[dict]:
    """A12/T9: alerts for urgent issues, critical bugs and hot issues."""
    alerts = []
    issues = analysis["issues"].to_pylist() if analysis["issues"].num_rows else []
    for i in issues:
        if i.get("is_urgent"):
            alerts.append({"alert_type": "urgent_issue", "priority": "critical",
                           "title": f"긴급: {i['title']}", "issue_id": i["issue_id"]})
        if i.get("is_bug") and i.get("severity") in ("critical", "high"):
            alerts.append({"alert_type": "bug", "priority": i["severity"],
                           "title": f"버그: {i['title']}", "issue_id": i["issue_id"]})
        if i.get("is_hot"):
            alerts.append({"alert_type": "hot_issue", "priority": "medium",
                           "title": f"핫이슈: {i['title']}", "issue_id": i["issue_id"]})
    alerts.sort(key=lambda a: PRIORITY_ORDER.get(a["priority"], 4))
    return alerts


def alerts_summary(alerts: list[dict]) -> dict:
    """A12: counts by type/priority + top alert (alert_manager.py:467-508)."""
    if not alerts:
        return {"total_alerts": 0, "urgent_count": 0, "hot_issue_count": 0,
                "bug_count": 0, "critical_count": 0, "top_alert": None}
    return {
        "total_alerts": len(alerts),
        "urgent_count": sum(1 for a in alerts if a["alert_type"] == "urgent_issue"),
        "hot_issue_count": sum(1 for a in alerts if a["alert_type"] == "hot_issue"),
        "bug_count": sum(1 for a in alerts if a["alert_type"] == "bug"),
        "critical_count": sum(1 for a in alerts if a["priority"] == "critical"),
        "top_alert": dict(alerts[0]),
    }


# ---------------------------------------------------------------------------
# Queries (rows-only: crawl-derived)
# ---------------------------------------------------------------------------

_ANALYSIS_CACHE: dict[str, dict] = {}


def _analysis_for(sf_dir: str) -> dict:
    import os

    from .textops import _crawl_out

    if sf_dir in _ANALYSIS_CACHE:
        return _ANALYSIS_CACHE[sf_dir]
    from .textops import _sf_of

    out = _crawl_out(sf_dir)
    posts = ray.data.read_parquet(os.path.join(out, "posts"))
    res = analyze_posts(posts, persist_dir=os.path.join(
        ISSUES_PERSIST_ROOT, f"sf{_sf_of(sf_dir)}"))
    _ANALYSIS_CACHE[sf_dir] = res
    return res


def q_detected_issues(sf_dir: str) -> pa.Table:
    t = _analysis_for(sf_dir)["issues"]
    if "keywords" in t.column_names:
        t = t.drop_columns(["keywords"])
    if "related_posts" in t.column_names:
        # gate shape: the capped url list as one comma-joined scalar (the
        # value-hash comparator stringifies object columns, and a numpy
        # list repr would never match DuckDB's); the analysis tier itself
        # keeps the list column.
        idx = t.column_names.index("related_posts")
        joined = pa.array([",".join(v) for v in
                           t.column("related_posts").to_pylist()], pa.string())
        t = t.set_column(idx, "related_posts", joined)
    return t


def hot_posts_direct(posts: ray.data.Dataset, k_cap: int = 20) -> pa.Table:
    """K4 hot posts without the analysis tier: score pass WITHOUT
    tokenization (the hot-score formula needs only sentiment + maxes;
    issue_detector.py:664-791), per-block scalar partials for the global
    maxes, per-block top-k partials, tiny driver merge. Identical rows to
    ``analyze_posts(...)['hot_posts']`` (same formula, same tie-break) at
    a fraction of the cost — tokenizing every post for this query was the
    single slowest bench row in round 2."""
    scored = posts.map_batches(
        post_score_fn(with_tokens=False),
        batch_format="pandas").materialize()
    gparts = [t for t in ray.get(
        scored.map_batches(_global_stats_partial, batch_format="pandas")
        .to_arrow_refs()) if t.num_rows]
    if not gparts:
        return pa.table({})
    g = pa.concat_tables(gparts).to_pandas()
    n_posts = int(g["n"].sum())
    max_views = max(int(g["max_views"].max()), 1)
    max_comments = max(int(g["max_comments"].max()), 1)
    k = min(max(1, int(n_posts * 0.1)), k_cap, n_posts)
    maxes_ref = ray.put((max_views, max_comments))
    hparts = [t.to_pandas() for t in ray.get(
        scored.map_batches(_hot_partial_fn(maxes_ref, k=k_cap),
                           batch_format="pandas")
        .to_arrow_refs()) if t.num_rows]
    hp = pd.concat(hparts).sort_values(["hot_score", "url"],
                                       ascending=[False, True])
    hot = hp.head(k)[["url", "title", "site", "author", "created_at",
                      "view_count", "n_comments", "like_count",
                      "hot_score", "score", "is_bug"]]
    return pa.Table.from_pandas(hot.reset_index(drop=True),
                                preserve_index=False)


def q_hot_posts(sf_dir: str) -> pa.Table:
    import os

    from .textops import _crawl_out

    # reuse a full analysis if one already ran this session; else the
    # direct path (no tokenization — 4x cheaper than the analysis tier)
    if sf_dir in _ANALYSIS_CACHE:
        return _ANALYSIS_CACHE[sf_dir]["hot_posts"]
    out = _crawl_out(sf_dir)
    posts = ray.data.read_parquet(
        os.path.join(out, "posts"),
        columns=["url", "title", "body", "site", "author", "created_at",
                 "view_count", "like_count", "comments"])
    return hot_posts_direct(posts)


def q_analysis_summary(sf_dir: str) -> pa.Table:
    return _analysis_for(sf_dir)["summary"]


def q_alerts_summary(sf_dir: str) -> pa.Table:
    s = alerts_summary(generate_alerts(_analysis_for(sf_dir)))
    top = s.pop("top_alert")
    s["top_alert_type"] = top["alert_type"] if top else None
    s["top_alert_title"] = top["title"] if top else None
    return pa.Table.from_pylist([s])


QUERIES = {
    "detected_issues": q_detected_issues,
    "hot_posts": q_hot_posts,
    "analysis_summary": q_analysis_summary,
    "combined_sentiment": q_combined_sentiment,
    "alerts_summary": q_alerts_summary,
}

# K4 hot posts are SQL-expressible end-to-end (score -> maxes -> weighted
# hot score -> top-k): the oracle recomputes the whole chain from the raw
# posts parquet, checking the distributed partial-top-k implementation.
_BUG_LIKE = " OR ".join(f"tl LIKE '%{w}%'" for w in sorted(BUG_KEYWORDS))

SQL_HOT_POSTS = """
WITH posts AS (
    SELECT url, title, body, site, author, created_at, view_count, like_count,
           CAST(coalesce(len(comments), 0) AS BIGINT) AS n_comments
    FROM read_parquet('{path}')
), p AS (
    SELECT *, trim(regexp_replace(lower(coalesce(title, '') || ' ' ||
                   coalesce(title, '') || ' ' || coalesce(body, '')),
                   '\\s+', ' ', 'g')) AS t,
           lower(coalesce(title, '') || ' ' || coalesce(body, '')) AS tl
    FROM posts
), c AS (
    SELECT *, {pos} AS pos_cnt, {neg} AS neg_cnt FROM p
), s AS (
    SELECT *, ROUND({score_case}, 6) AS score FROM c
), m AS (
    SELECT GREATEST(max(view_count), 1) AS mv,
           GREATEST(max(n_comments), 1) AS mc
    FROM s
)
SELECT url, title, site, author, created_at, view_count, n_comments,
       like_count,
       ROUND(LEAST(0.4 * LEAST(view_count / CAST(mv AS DOUBLE), 1.0)
             + 0.3 * LEAST(n_comments / CAST(mc AS DOUBLE), 1.0)
             + 0.3 * (1.0 - score) / 2.0, 1.0), 6) AS hot_score,
       score,
       ({bug_expr}) AS is_bug
FROM s, m
ORDER BY hot_score DESC, url ASC LIMIT 20
""".format(path=_CRAWL01_POSTS,
           pos=_ko_count_expr(POSITIVE_KO), neg=_ko_count_expr(NEGATIVE_KO),
           score_case=_SCORE_CASE, bug_expr=_BUG_LIKE)

# A4/A5 oracle: everything downstream of tokenization — cluster
# membership, per-cluster stats, priority, bug flag + severity, urgency,
# hot rank, the capped related-url list and the priority ordering — is
# recomputed by DuckDB from the two engine-persisted inputs
# (_persist_analysis_inputs): the enriched per-post table (url, score,
# views, comments, ts, top-100 tokens) and the driver's greedy cluster
# map (greedy first-fit is order-dependent over <=50 rows by spec —
# SURVEY.md §7.3 — so the map itself is the one engine-side input).
_BUG_LIST = "[" + ", ".join(f"'{w}'" for w in sorted(BUG_KEYWORDS)) + "]"
_ISSUES01 = f"{ISSUES_PERSIST_ROOT}/sf0.01"

_ISSUES_CTE = """
WITH scored AS (
    SELECT * FROM read_parquet('{root}/scored/*.parquet')
), clusters AS (
    SELECT * FROM read_parquet('{root}/clusters.parquet')
), totals AS (
    SELECT count(*) AS n_posts,
           GREATEST(sum(view_count), 1) AS tot_views,
           GREATEST(sum(n_comments), 1) AS tot_comments,
           max(created_at) AS max_ts
    FROM scored
), member AS (
    SELECT DISTINCT c.cluster_id, s.url
    FROM (SELECT url, unnest(tokens) AS tok FROM scored) s
    JOIN clusters c ON c.keyword = s.tok
), mstats AS (
    SELECT m.cluster_id,
           count(*) AS post_count,
           CAST(sum(s.view_count) AS BIGINT) AS total_views,
           CAST(sum(s.n_comments) AS BIGINT) AS total_comments,
           sum(s.score) AS sum_score,
           min(s.created_at) AS first_seen,
           sum(CASE WHEN s.created_at >=
                    (SELECT max_ts FROM totals) - INTERVAL 24 HOUR
                    THEN 1 ELSE 0 END) AS n_urgent,
           array_to_string(list_slice(list_sort(list(s.url)), 1, {cap}),
                           ',') AS related_posts
    FROM member m JOIN scored s ON s.url = m.url
    GROUP BY m.cluster_id
), cmeta AS (
    SELECT cluster_id, any_value(representative) AS title,
           CAST(string_split(cluster_id, '_')[2] AS BIGINT) AS cidx,
           bool_or(len(list_filter({bugs},
                        b -> contains(lower(keyword), b))) > 0) AS is_bug
    FROM clusters GROUP BY cluster_id
), enriched AS (
    SELECT c.cluster_id AS issue_id, c.title, c.cidx, c.is_bug,
           m.post_count, m.total_views, m.total_comments,
           ROUND(0.3 * m.total_views / t.tot_views
                 + 0.3 * m.total_comments / t.tot_comments
                 + 0.4 * m.post_count / GREATEST(t.n_posts, 1), 6)
               AS priority_score,
           ROUND(m.sum_score / m.post_count, 6) AS sentiment_avg,
           m.first_seen, m.n_urgent >= {urgent_min} AS is_urgent,
           m.related_posts, t.n_posts AS n_total
    FROM cmeta c JOIN mstats m USING (cluster_id), totals t
), ranked AS (
    SELECT *,
           row_number() OVER (ORDER BY priority_score DESC, cidx ASC) AS rn,
           count(*) OVER () AS n_issues,
           0.5 * LEAST(1.0, post_count / CAST(GREATEST(n_total, 1) AS DOUBLE))
               + 0.5 * GREATEST(0.0, -sentiment_avg) AS sev
    FROM enriched
), fin AS (
    SELECT issue_id, title, post_count, total_views, total_comments,
           priority_score, is_bug,
           CASE WHEN NOT is_bug THEN 'low'
                WHEN sev >= 0.7 THEN 'critical'
                WHEN sev >= 0.5 THEN 'high'
                WHEN sev >= 0.3 THEN 'medium'
                ELSE 'low' END AS severity,
           sentiment_avg, first_seen, is_urgent, related_posts,
           rn <= GREATEST(1, CAST(floor(n_issues * 0.1) AS BIGINT)) AS is_hot,
           rn
    FROM ranked
)
""".format(root=_ISSUES01, cap=RELATED_POSTS_CAP, bugs=_BUG_LIST,
           urgent_min=10)

SQL_DETECTED_ISSUES = _ISSUES_CTE + """
SELECT issue_id, title, post_count, total_views, total_comments,
       priority_score, is_bug, severity, sentiment_avg, first_seen,
       is_urgent, related_posts, is_hot
FROM fin ORDER BY rn
"""

# A13 summary recomputed from the persisted analysis inputs.
SQL_ANALYSIS_SUMMARY = """
WITH scored AS (
    SELECT * FROM read_parquet('{root}/scored/*.parquet')
), clusters AS (
    SELECT * FROM read_parquet('{root}/clusters.parquet')
), t AS (
    SELECT CAST(count(*) AS BIGINT) AS n_posts,
           ROUND(sum(score) / count(*), 6) AS avg_sentiment,
           CAST(sum(CASE WHEN score > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_positive,
           CAST(sum(CASE WHEN score < -0.1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative
    FROM scored
), cb AS (
    SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_issues,
           CAST(count(DISTINCT CASE WHEN len(list_filter({bugs},
                    b -> contains(lower(keyword), b))) > 0
                THEN cluster_id END) AS BIGINT) AS n_bug_issues
    FROM clusters
)
SELECT n_posts, avg_sentiment, n_positive, n_negative,
       n_posts - n_positive - n_negative AS n_neutral,
       n_issues, n_bug_issues,
       GREATEST(1, CAST(floor(n_issues * 0.1) AS BIGINT)) AS n_hot_issues
FROM t, cb
""".format(root=_ISSUES01, bugs=_BUG_LIST)

# A12/T9 alert summary: the alert list is regenerated in SQL from the
# per-issue enrichment — one alert per (urgent issue, critical/high bug,
# hot issue), ordered exactly like generate_alerts' stable priority sort
# (priority rank, then issue priority order, then within-issue generation
# order urgent->bug->hot).
SQL_ALERTS_SUMMARY = _ISSUES_CTE + """
, alerts AS (
    SELECT 'urgent_issue' AS alert_type, 'critical' AS priority,
           '긴급: ' || title AS title, rn, 0 AS kind
    FROM fin WHERE is_urgent
    UNION ALL
    SELECT 'bug', severity, '버그: ' || title, rn, 1
    FROM fin WHERE is_bug AND severity IN ('critical', 'high')
    UNION ALL
    SELECT 'hot_issue', 'medium', '핫이슈: ' || title, rn, 2
    FROM fin WHERE is_hot
), ord AS (
    SELECT *,
           (CASE priority WHEN 'critical' THEN 0 WHEN 'high' THEN 1
                 WHEN 'medium' THEN 2 ELSE 3 END) * 1000000
               + rn * 10 + kind AS sort_key
    FROM alerts
)
SELECT CAST(count(*) AS BIGINT) AS total_alerts,
       CAST(coalesce(sum(CASE WHEN alert_type = 'urgent_issue'
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS urgent_count,
       CAST(coalesce(sum(CASE WHEN alert_type = 'hot_issue'
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS hot_issue_count,
       CAST(coalesce(sum(CASE WHEN alert_type = 'bug'
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS bug_count,
       CAST(coalesce(sum(CASE WHEN priority = 'critical'
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS critical_count,
       arg_min(alert_type, sort_key) AS top_alert_type,
       arg_min(title, sort_key) AS top_alert_title
FROM ord
"""

ORACLE_SQL = {
    "combined_sentiment": SQL_COMBINED_SENTIMENT,
    "hot_posts": SQL_HOT_POSTS,
    "detected_issues": SQL_DETECTED_ISSUES,
    "analysis_summary": SQL_ANALYSIS_SUMMARY,
    "alerts_summary": SQL_ALERTS_SUMMARY,
}
