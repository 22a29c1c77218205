"""Fetch stage — corpus-backed page resolution as a map_batches actor pool.

At test scale "fetching" a URL is a lookup into the Common-Crawl-style
``pages`` table (BASELINE.json input_hint); the table lives once in the Ray
object store (``ray.put``) and every fetch actor maps it zero-copy and
builds a url->row index once in ``__init__`` — the broadcast-small-side
pattern, nothing is re-shipped per batch. A live deployment swaps
``CorpusFetcher`` for an HTTP fetcher with the same signature (the
reference's session/UA/encoding logic, content_crawler.py:69-178, is
network-bound and cannot run in this sandbox: see ``HttpFetcher`` stub).

The actor also simulates HTTP 429 responses for configured hosts so the
politeness/backoff state machine (frontier.report_429) is exercised
end-to-end in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.urlnorm import url_hash64


class CorpusFetcher:
    """Callable class for ``map_batches`` (one instance per actor).

    Input batch columns: url, url_norm, host, keyword, discovered_seq,
    grant_seq, sched_s, wait_s.
    Output: input columns + html (binary), warc_ts, status, attempt.
    """

    def __init__(
        self,
        corpus_ref,                      # ray.ObjectRef -> pa.Table (pages)
        frontier_handles: list,          # FrontierShard actors, host-sharded
        num_shards: int,
        rate_limited: dict[str, int] | None = None,  # host -> #429s to serve
        max_retries: int = 3,
    ):
        corpus: pa.Table = ray.get(corpus_ref)
        self._urls = corpus.column("url").to_pylist()
        self._index = {u: i for i, u in enumerate(self._urls)}
        self._html = corpus.column("html")
        self._warc = corpus.column("warc_ts")
        self._frontier = frontier_handles
        self._num_shards = num_shards
        self._rate_limited = dict(rate_limited or {})
        self._max_retries = max_retries

    def _shard_of(self, host: str) -> int:
        return url_hash64(host) % self._num_shards

    def _suspended_hosts(self, hosts: list[str]) -> set[str]:
        """One RPC per involved shard per batch: hosts suspended since their
        URLs were granted must be skipped, mirroring the reference's
        wait()-time skip of suspended domains (rate_limiter.py:176-181)."""
        shard_ids = {self._shard_of(h) for h in set(hosts)}
        refs = [self._frontier[s].suspended_hosts.remote() for s in shard_ids]
        out: set[str] = set()
        for lst in ray.get(refs):
            out.update(lst)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        norms = batch.column("url_norm").to_pylist()
        hosts = batch.column("host").to_pylist()
        suspended = self._suspended_hosts(hosts) if self._rate_limited else set()
        n = len(urls)
        indices, statuses, attempts = [], [], []
        for i in range(n):
            if hosts[i] in suspended:
                indices.append(0)
                statuses.append("suspended")
                attempts.append(0)
                continue
            idx = self._index.get(urls[i])
            if idx is None:
                idx = self._index.get(norms[i])
            host = hosts[i]
            attempt = 1
            status = "ok"
            # simulated 429s: consult the frontier's backoff state machine
            while host in self._rate_limited and self._rate_limited[host] > 0:
                self._rate_limited[host] -= 1
                shard = self._frontier[self._shard_of(host)]
                retry_ok, _backoff = ray.get(shard.report_429.remote(host))
                if not retry_ok:
                    status = "suspended"
                    suspended.add(host)
                    break
                attempt += 1
            if status == "ok" and attempt > 1:
                # success after retries resets the counter (rate_limiter.py:259-268)
                self._frontier[self._shard_of(host)].report_success.remote(host)
            if status == "ok" and idx is None:
                status = "not_found"
            indices.append(idx if idx is not None else 0)
            statuses.append(status)
            attempts.append(attempt)
        take = pa.array(indices, pa.int64())
        html = self._html.take(take)
        warc = self._warc.take(take)
        status_arr = pa.array(statuses, pa.string())
        out = (
            batch.append_column("html", html.combine_chunks() if isinstance(html, pa.ChunkedArray) else html)
            .append_column("warc_ts", warc.combine_chunks() if isinstance(warc, pa.ChunkedArray) else warc)
            .append_column("status", status_arr)
            .append_column("attempt", pa.array(attempts, pa.int32()))
        )
        return out


class HttpFetcher:
    """Live-network fetcher stub (no network in this sandbox).

    Would replicate the reference's session keep-alive, UA rotation,
    charset sniffing and timeout behavior (content_crawler.py:32-178)
    inside a map_batches actor pool; the Ray-side plumbing (signature,
    batch schema, frontier integration) is identical to CorpusFetcher.
    """

    def __init__(self, *a, **kw):
        raise NotImplementedError("no network access in this environment")
