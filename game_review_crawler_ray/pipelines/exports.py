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
    like_count) — exporters.py:167-189 layout. Fully vectorized: Arrow
    ``list_parent_indices`` + ``list_flatten`` + struct field extraction,
    no per-row Python."""
    comments = batch.column("comments")
    if isinstance(comments, pa.ChunkedArray):
        comments = comments.combine_chunks()
    parent = pc.list_parent_indices(comments)
    flat = pc.list_flatten(comments)
    return pa.table({
        "post_url": pc.take(batch.column("url"), parent),
        "author": flat.field("author"),
        "content": flat.field("content"),
        "created_at": flat.field("created_at"),
        "like_count": flat.field("like_count"),
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


ISSUES_CSV_FIELDS = [
    "issue_id", "title", "keywords", "priority_score", "is_hot", "is_bug",
    "severity", "post_count", "total_views", "total_comments",
    "sentiment_avg", "first_seen", "game_id",
]


def issues_csv_table(issues: pa.Table, game_id: str) -> pa.Table:
    """DetectedIssue table -> the reference's issues.csv layout
    (quicksight_exporter.py:326-372): keywords pipe-joined, scores rounded
    to 4dp, booleans as 'true'/'false', ISO dates, trailing game_id."""
    rows = []
    for i in issues.to_pylist():
        rows.append({
            "issue_id": i["issue_id"],
            "title": i["title"],
            "keywords": "|".join(i.get("keywords") or []),
            "priority_score": round(i["priority_score"], 4),
            "is_hot": "true" if i.get("is_hot") else "false",
            "is_bug": "true" if i.get("is_bug") else "false",
            "severity": i["severity"],
            "post_count": i["post_count"],
            "total_views": i["total_views"],
            "total_comments": i["total_comments"],
            "sentiment_avg": round(i["sentiment_avg"], 4),
            "first_seen": i["first_seen"].isoformat() if i.get("first_seen") else "",
            "game_id": game_id,
        })
    if not rows:
        return pa.table({f: pa.array([], pa.string()) for f in ISSUES_CSV_FIELDS})
    t = pa.Table.from_pylist(rows)
    return t.select(ISSUES_CSV_FIELDS)


def write_quicksight(posts: ray.data.Dataset, sentiment: ray.data.Dataset | None,
                     out_dir: str, game_id: str = "default",
                     issues: pa.Table | None = None,
                     profiles=None) -> dict[str, str]:
    """S9: four projected CSV exports under quicksight_data/{game_id}/.

    posts.csv (body truncated to 1000 chars), comments.csv (content
    truncated to 500), sentiment.csv, issues.csv (reference layout; an
    empty header-only table when no issues were detected —
    quicksight_exporter.py:105-113). A ``GameProfileManager`` may be
    passed to resolve per-game export paths (game_profile.py:134-148).
    """
    if profiles is not None:
        base = os.path.join(out_dir, profiles.get_quicksight_path(game_id))
    else:
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

    issues_tbl = issues_csv_table(
        issues if issues is not None else pa.table({}), game_id)
    ipath = os.path.join(base, "issues.csv")
    import pyarrow.csv as pacsv

    pacsv.write_csv(issues_tbl, ipath)
    out["issues"] = ipath
    return out


def load_exported_posts(game_dirs: dict[str, str]) -> ray.data.Dataset:
    """S11 dashboard loader: read several games' exported post-JSON
    directories into ONE Dataset, each row tagged with its ``game_id``
    source (the reference dashboard's multi-file JSON load + tagging,
    dashboard/data_loader semantics)."""
    parts = []
    for game_id, path in sorted(game_dirs.items()):
        ds = ray.data.read_json(path)

        def tag(batch: pa.Table, g=game_id) -> pa.Table:
            return batch.append_column(
                "game_id", pa.array([g] * batch.num_rows, pa.string()))

        parts.append(ds.map_batches(tag, batch_format="pyarrow"))
    if not parts:
        raise ValueError("no game dirs given")
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


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
