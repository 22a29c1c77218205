"""Parse stage — stateless map_batches over Arrow batches.

Decodes ``html`` bytes, dispatches to the site parser by host and emits
the relational ``posts`` columns (nested comments as list<struct>), the
per-row invariant being byte-identical extracted text vs the reference
parsers (SURVEY.md §7.0). The parser registry is rebuilt once per task /
actor (cheap — a dict of 4 stateless objects). The wide ``html`` column is
dropped on output so it never travels further down the pipeline
(SURVEY.md §4.2: keep binary payloads out of long-lived state).
"""

from __future__ import annotations


import pyarrow as pa

from ..functions.parsers import ParseFailure, ParserRegistry, parse_page
from ..sources.corpus import COMMENT_TYPE
from .fetch import decode_html

POST_COLUMNS = [
    ("title", pa.string()),
    ("body", pa.string()),
    ("site", pa.string()),
    ("author", pa.string()),
    ("created_at", pa.timestamp("us")),
    ("view_count", pa.int64()),
    ("like_count", pa.int64()),
    ("comments", pa.list_(COMMENT_TYPE)),
]

CARRY_COLUMNS = ["url", "url_norm", "host", "keyword", "discovered_seq",
                 "grant_seq", "sched_s", "wait_s", "warc_ts", "status", "attempt"]


class ParseBatch:
    """Actor-pool variant of the parse stage (registry built once per actor
    in __init__). The task-based ``parse_batch_fn`` below is the default."""

    def __init__(self):
        self.registry = ParserRegistry()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _parse_with(self.registry, batch)


_REGISTRY: ParserRegistry | None = None


def parse_batch_fn(batch: pa.Table) -> pa.Table:
    """Task-based variant: stateless map_batches function. The registry is a
    per-worker-process singleton (4 stateless parser objects — cheap), so no
    actor pool slot is reserved for this stage."""
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = ParserRegistry()
    return _parse_with(_REGISTRY, batch)


def _parse_with(registry: ParserRegistry, batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    kws = batch.column("keyword").to_pylist()
    statuses = batch.column("status").to_pylist()
    n = len(urls)
    cols: dict[str, list] = {name: [] for name, _ in POST_COLUMNS}
    out_status: list[str] = []
    for i in range(n):
        if statuses[i] != "ok":
            rec = None
            out_status.append(statuses[i])
        else:
            try:
                # charset-normalized decode (meta sniff -> utf-8 -> cp949
                # -> replacement; fetch.decode_html) — a hostile page is a
                # parse failure for THAT row, never a task failure
                rec = parse_page(decode_html(htmls[i]), urls[i], kws[i],
                                 registry=registry)
                out_status.append("ok")
            except (ParseFailure, UnicodeDecodeError):
                rec = None
                out_status.append("parse_failed")
        for name, _t in POST_COLUMNS:
            cols[name].append(rec[name] if rec is not None else
                              ([] if name == "comments" else None))
    arrays = [batch.column(c) for c in CARRY_COLUMNS if c in batch.column_names
              and c != "status"]
    names = [c for c in CARRY_COLUMNS if c in batch.column_names and c != "status"]
    for name, typ in POST_COLUMNS:
        names.append(name)
        arrays.append(pa.array(cols[name], typ))
    names.append("status")
    arrays.append(pa.array(out_status, pa.string()))
    return pa.Table.from_arrays(arrays, names=names)
