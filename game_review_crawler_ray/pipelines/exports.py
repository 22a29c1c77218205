"""Export sinks — the reference's exporter family on Ray Data.

- posts -> JSON (S5: crawler/exporters/exporters.py:39-86)
- posts + comments child CSV (S6: exporters.py:89-193)
- date-partitioned Parquet (S7: crawler/exporters/data_store.py:99-136,
  generalized to partitioned parquet — resumable layout)
- QuickSight-style projected CSVs with truncation (S9:
  crawler/exporters/quicksight_exporter.py:55-206 — body cut to 1000
  chars, comment content to 500, ISO dates)

All sinks stream (`write_json`/`write_csv`/`write_parquet`); the comments
child table is a `map_batches` explode (one row per comment keyed by
post_url), and truncation uses `pyarrow.compute.utf8_slice_codeunits`.
A format registry mirrors the reference's ExporterFactory plugin surface
(exporters.py:196-227).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

BODY_TRUNC = 1000
COMMENT_TRUNC = 500


def explode_comments(batch: pa.Table) -> pa.Table:
    """posts -> child comment rows (post_url, author, content, created_at,
    like_count) — exporters.py:167-189 layout."""
    urls, authors, contents, dates, likes = [], [], [], [], []
    for url, comments in zip(batch.column("url").to_pylist(),
                             batch.column("comments").to_pylist()):
        for c in comments or []:
            urls.append(url)
            authors.append(c["author"])
            contents.append(c["content"])
            dates.append(c["created_at"])
            likes.append(c["like_count"])
    return pa.table({
        "post_url": pa.array(urls, pa.string()),
        "author": pa.array(authors, pa.string()),
        "content": pa.array(contents, pa.string()),
        "created_at": pa.array(dates, pa.timestamp("us")),
        "like_count": pa.array(likes, pa.int64()),
    })


def _flat_posts(batch: pa.Table, body_trunc: int | None = None) -> pa.Table:
    body = batch.column("body")
    if body_trunc:
        body = pc.utf8_slice_codeunits(body, 0, body_trunc)
    n_comments = pc.list_value_length(batch.column("comments"))
    n_comments = pc.cast(pc.coalesce(n_comments, pa.scalar(0, pa.int32())), pa.int64())
    return pa.table({
        "url": batch.column("url"),
        "title": batch.column("title"),
        "body": body,
        "site": batch.column("site"),
        "keyword": batch.column("keyword"),
        "author": batch.column("author"),
        "created_at": batch.column("created_at"),
        "view_count": batch.column("view_count"),
        "like_count": batch.column("like_count"),
        "comment_count": n_comments,
    })


def write_posts_json(posts: ray.data.Dataset, out_dir: str) -> str:
    """S5: JSON export (flat projection; nested comments exported via the
    child table to keep line-JSON consumable)."""
    path = os.path.join(out_dir, "posts_json")
    posts.map_batches(_flat_posts, batch_format="pyarrow").write_json(path)
    return path


def write_posts_csv(posts: ray.data.Dataset, out_dir: str) -> tuple[str, str]:
    """S6: two CSV sinks — posts + comments child keyed by post_url."""
    posts_path = os.path.join(out_dir, "posts_csv")
    comments_path = os.path.join(out_dir, "comments_csv")
    posts.map_batches(_flat_posts, batch_format="pyarrow").write_csv(posts_path)
    posts.map_batches(explode_comments, batch_format="pyarrow").write_csv(comments_path)
    return posts_path, comments_path


def write_posts_partitioned(posts: ray.data.Dataset, out_dir: str) -> str:
    """S7: date-partitioned parquet (YYYY-MM-DD key, 'unknown' for null
    dates — data_store.py:112-136 semantics), resumable per partition."""

    def add_date_key(batch: pa.Table) -> pa.Table:
        created = batch.column("created_at")
        day = pc.strftime(created, format="%Y-%m-%d")
        day = pc.coalesce(day, pa.scalar("unknown"))
        return batch.append_column("date_key", day)

    path = os.path.join(out_dir, "posts_by_date")
    posts.map_batches(add_date_key, batch_format="pyarrow").write_parquet(
        path, partition_cols=["date_key"])
    return path


def write_quicksight(posts: ray.data.Dataset, sentiment: ray.data.Dataset | None,
                     out_dir: str, game_id: str = "default") -> dict[str, str]:
    """S9: four projected CSV exports under quicksight_data/{game_id}/.

    posts.csv (body truncated to 1000 chars), comments.csv (content
    truncated to 500), sentiment.csv, issues.csv (written by the issues
    pipeline when available).
    """
    base = os.path.join(out_dir, "quicksight_data", game_id)
    os.makedirs(base, exist_ok=True)
    out = {}

    def posts_proj(batch: pa.Table) -> pa.Table:
        return _flat_posts(batch, body_trunc=BODY_TRUNC)

    p = os.path.join(base, "posts")
    posts.map_batches(posts_proj, batch_format="pyarrow").write_csv(p)
    out["posts"] = p

    def comments_proj(batch: pa.Table) -> pa.Table:
        t = explode_comments(batch)
        return t.set_column(t.column_names.index("content"), "content",
                            pc.utf8_slice_codeunits(t.column("content"), 0,
                                                    COMMENT_TRUNC))

    c = os.path.join(base, "comments")
    posts.map_batches(comments_proj, batch_format="pyarrow").write_csv(c)
    out["comments"] = c

    if sentiment is not None:
        s = os.path.join(base, "sentiment")
        sentiment.write_csv(s)
        out["sentiment"] = s
    return out


# -- format registry (ExporterFactory plugin surface) -----------------------

EXPORTERS = {
    "json": write_posts_json,
    "csv": write_posts_csv,
    "parquet": write_posts_partitioned,
}


def register_exporter(name: str, fn) -> None:
    EXPORTERS[name] = fn


def get_exporter(name: str):
    if name not in EXPORTERS:
        raise ValueError(f"unknown export format: {name!r} "
                         f"(available: {sorted(EXPORTERS)})")
    return EXPORTERS[name]
