"""Fetch stage — corpus-backed page resolution as a map_batches actor pool.

At test scale "fetching" a URL is a lookup into the Common-Crawl-style
``pages`` table (BASELINE.json input_hint); the table lives once in the Ray
object store (``ray.put``) and every fetch actor maps it zero-copy in
``__init__`` — the broadcast-small-side pattern, nothing is re-shipped per
batch. Lookups are fully vectorized: the actor keeps a sorted array of
64-bit URL hashes and resolves a whole batch with one ``np.searchsorted``
(granted rows already carry ``url_hash`` = hash of the normalized URL,
which equals the canonical corpus URL's hash). A live deployment swaps
``CorpusFetcher`` for an HTTP fetcher with the same signature (the
reference's session/UA/encoding logic, content_crawler.py:69-178, is
network-bound and cannot run in this sandbox: see ``HttpFetcher`` stub).

Scale boundary: the whole-corpus ``ray.put`` is a SIMULATION-HARNESS
artifact, not a pipeline stage — the "web" has to live somewhere for
fetch-as-lookup to be meaningful, and one zero-copy object-store entry
shared by every actor on the node is the cheapest place. It bounds the
simulated corpus to node RAM (~100 GB); at real scale the fetcher is
HTTP and nothing corpus-sized is materialized anywhere. No other stage
of the crawl pipeline materializes a dataset-sized object.

When ``rate_limited`` is configured (tests), the stage drops to a per-row
path that simulates HTTP 429s against the frontier's backoff state machine.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray

from ..functions.urlnorm import url_hash64, url_hash64_batch


def build_corpus_index(corpus: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(sorted url hashes, argsort order) — computed once (driver) and
    broadcast so fetch actors start in O(1)."""
    col = corpus.column("url")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h_np = np.asarray(url_hash64_batch(col).to_numpy(zero_copy_only=False),
                      dtype=np.uint64)
    order = np.argsort(h_np, kind="stable")
    return h_np[order], order


class CorpusFetcher:
    """Callable class for ``map_batches`` (one instance per actor).

    Input batch: the frontier GRANT_SCHEMA columns (incl. url_hash).
    Output: input + html (binary), warc_ts, status, attempt.
    """

    def __init__(
        self,
        corpus_ref,                      # ray.ObjectRef -> pa.Table (pages)
        frontier_handles: list,          # FrontierShard actors, host-sharded
        num_shards: int,
        rate_limited: dict[str, int] | None = None,  # host -> #429s to serve
        max_retries: int = 3,
        index_ref=None,                  # optional precomputed (sorted_hashes, order)
    ):
        corpus: pa.Table = ray.get(corpus_ref)
        if index_ref is not None:
            self._hashes_sorted, self._order = ray.get(index_ref)
        else:
            self._hashes_sorted, self._order = build_corpus_index(corpus)
        # html stays a list of chunks: both combine_chunks AND
        # ChunkedArray.take concatenate >2GB of binary into one array,
        # overflowing 32-bit offsets (observed at the 3M-page corpus).
        # _take_chunked gathers per chunk instead, never touching the
        # full column.
        self._html_chunks = corpus.column("html").chunks
        self._html_bounds = np.cumsum(
            [0] + [len(c) for c in self._html_chunks], dtype=np.int64)
        self._warc = corpus.column("warc_ts").combine_chunks() \
            if isinstance(corpus.column("warc_ts"), pa.ChunkedArray) \
            else corpus.column("warc_ts")
        self._frontier = frontier_handles
        self._num_shards = num_shards
        self._rate_limited = dict(rate_limited or {})
        self._max_retries = max_retries

    def _shard_of(self, host: str) -> int:
        return url_hash64(host) % self._num_shards

    def _lookup(self, url_hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized hash join: (row_indices, found_mask)."""
        pos = np.searchsorted(self._hashes_sorted, url_hashes)
        pos_clip = np.minimum(pos, len(self._hashes_sorted) - 1)
        found = self._hashes_sorted[pos_clip] == url_hashes
        idx = self._order[pos_clip]
        return idx, found

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import time

        _t0 = time.perf_counter()
        n = batch.num_rows
        # pre-offered grants under rate limiting already carry the
        # shard-simulated attempt count — preserve it (crawl.py disables
        # this stage's 429 path in that mode)
        has_attempt = "attempt" in batch.column_names
        if n == 0:
            out = batch.append_column("html", pa.array([], pa.binary())) \
                .append_column("warc_ts", pa.array([], pa.timestamp("us"))) \
                .append_column("status", pa.array([], pa.string()))
            return out if has_attempt else \
                out.append_column("attempt", pa.array([], pa.int32()))
        hashes = np.asarray(batch.column("url_hash").to_numpy(zero_copy_only=False),
                            dtype=np.uint64)
        idx, found = self._lookup(hashes)
        if self._rate_limited:
            statuses, attempts = self._slow_path(batch, found)
        else:
            statuses = np.where(found, "ok", "not_found").tolist()
            attempts = np.ones(n, dtype=np.int32)
        take_np = np.where(found, idx, 0).astype(np.int64)
        out = (
            batch.append_column("html", self._take_html(take_np))
            .append_column("warc_ts", self._warc.take(pa.array(take_np)))
            .append_column("status", pa.array(statuses, pa.string()))
        )
        if not has_attempt:
            out = out.append_column("attempt", pa.array(attempts, pa.int32()))
        if os.environ.get("GRC_TIMING"):
            print(f"[fetch] {n} rows {time.perf_counter()-_t0:.3f}s")
        return out

    def _take_html(self, idx: np.ndarray) -> pa.Array:
        """take() over the chunked html column without concatenating the
        source: group indices per chunk, take within each chunk (small
        outputs), then restore the original order."""
        ci = np.searchsorted(self._html_bounds, idx, side="right") - 1
        local = idx - self._html_bounds[ci]
        order = np.argsort(ci, kind="stable")
        inv = np.empty(len(idx), dtype=np.int64)
        inv[order] = np.arange(len(idx))
        parts = []
        start = 0
        ci_sorted = ci[order]
        local_sorted = local[order]
        while start < len(idx):
            c = ci_sorted[start]
            end = start
            while end < len(idx) and ci_sorted[end] == c:
                end += 1
            parts.append(self._html_chunks[int(c)].take(
                pa.array(local_sorted[start:end])))
            start = end
        grouped = pa.concat_arrays(parts) if len(parts) != 1 else parts[0]
        return grouped.take(pa.array(inv))

    # ------------------------------------------------------------------
    def _slow_path(self, batch: pa.Table, found: np.ndarray):
        """Per-row path exercising the 429/backoff/suspension state machine
        (tests only; mirrors rate_limiter.py:213-268 semantics).

        The remaining-429 budget lives in the host's frontier shard
        (``consume_429``) — the single source of truth — so any number of
        parallel fetch workers still serve exactly N global 429s per host.
        ``self._rate_limited`` here is only the set of hosts that take this
        path at all; unaffected hosts skip the RPCs entirely."""
        hosts = batch.column("host").to_pylist()
        suspended = self._suspended_hosts(hosts)
        statuses, attempts = [], []
        for i, host in enumerate(hosts):
            if host in suspended:
                statuses.append("suspended")
                attempts.append(0)
                continue
            attempt = 1
            status = "ok"
            shard = self._frontier[self._shard_of(host)]
            while host in self._rate_limited:
                served, retry_ok = ray.get(shard.consume_429.remote(host))
                if not served:
                    break
                if not retry_ok:
                    status = "suspended"
                    suspended.add(host)
                    break
                attempt += 1
            if status == "ok" and attempt > 1:
                # success after retries resets the counter (rate_limiter.py:259-268)
                shard.report_success.remote(host)
            if status == "ok" and not found[i]:
                status = "not_found"
            statuses.append(status)
            attempts.append(attempt)
        return statuses, attempts

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


_CORPUS_CACHE: dict = {}


def make_corpus_fetch_fn(corpus_ref, index_ref, frontier_handles, num_shards,
                         rate_limited=None, max_retries=3):
    """Task-based fetch stage.

    The corpus + hash index are broadcast refs; each Ray *worker process*
    resolves them once (zero-copy from plasma) and caches the resulting
    CorpusFetcher in module state — so the stage needs no actor pool (and
    its ~1.5 s per-run spin-up) while still paying setup once per worker.
    The 429-simulation path still talks to the frontier actors.
    """
    key = corpus_ref.hex()

    def fetch(batch: pa.Table) -> pa.Table:
        fetcher = _CORPUS_CACHE.get(key)
        if fetcher is None:
            fetcher = CorpusFetcher(corpus_ref, frontier_handles, num_shards,
                                    rate_limited=rate_limited,
                                    max_retries=max_retries,
                                    index_ref=index_ref)
            _CORPUS_CACHE.clear()  # one corpus per worker is plenty
            _CORPUS_CACHE[key] = fetcher
        return fetcher(batch)

    return fetch


# browser UA pool — conformance contract with content_crawler.py:32-38
USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Safari/605.1.15",
]


class UARotator:
    """M13: per-request User-Agent rotation (content_crawler.py:97-103,133).

    The reference draws with unseeded ``random.choice``; the engine seeds
    the stream so a resumed run replays identical headers (same
    reproducibility policy as the frontier's jitter)."""

    def __init__(self, agents: list[str] | None = None, seed: int = 42):
        import random as _random

        self.agents = list(agents or USER_AGENTS)
        self._rng = _random.Random(seed)

    def next(self) -> str:
        return self._rng.choice(self.agents)


_CHARSET_RE = re.compile(rb"charset=[\"']?([a-zA-Z0-9_\-]+)")


def sniff_charset(raw: bytes) -> str | None:
    """Meta-tag charset sniff over the document head (the offline half of
    requests' ``apparent_encoding``)."""
    m = _CHARSET_RE.search(raw[:2048])
    return m.group(1).decode("ascii", "ignore").lower() if m else None


def decode_html(raw: bytes, content_type: str | None = None) -> str:
    """M14 encoding normalization (content_crawler.py:159-166 order):
    Content-Type charset first, then the sniffed/apparent encoding, then
    utf-8; a page that defeats all of them decodes with replacement
    rather than failing the task.

    Fast path: for pages with no Content-Type charset AND no sniffable
    meta charset the cascade is exactly [utf-8, cp949], so a strict-utf-8
    decode IS the cascade's first step — provably identical output, no
    precedence inversion (a non-utf-8 declared page whose bytes happen to
    be valid utf-8 still takes the full cascade; ADVICE r03). The sniff
    is one regex over the first 2 KB."""
    sniffed = None
    if content_type is None or "charset=" not in content_type:
        sniffed = sniff_charset(raw)
        if sniffed is None or sniffed in ("utf-8", "utf8"):
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError:
                pass
    tried: list[str] = []
    if content_type and "charset=" in content_type:
        tried.append(content_type.split("charset=")[-1].split(";")[0].strip())
        sniffed = sniff_charset(raw)
    if sniffed:
        tried.append(sniffed)
    tried += ["utf-8", "cp949"]
    for enc in tried:
        try:
            return raw.decode(enc)
        except (LookupError, UnicodeDecodeError):
            continue
    return raw.decode("utf-8", errors="replace")


class HttpFetcher:
    """Live HTTP fetch stage (S1/T6) with the reference's session and
    retry semantics (content_crawler.py:60-178), same batch signature as
    ``CorpusFetcher``:

    - one keep-alive ``requests.Session`` per worker with the reference's
      default header set (Accept/Accept-Language/gzip-deflate-no-brotli/
      keep-alive, content_crawler.py:71-78);
    - per-request User-Agent from the seeded ``UARotator`` (M13);
    - (connect=10s, read=30s) timeouts (content_crawler.py:79-80);
    - HTTP 429 -> exponential backoff via the host's frontier shard
      (``report_429``: 2^retry seconds, suspension past max_retries —
      the SHARD is the single source of truth so any fetch parallelism
      still counts retries per host globally), sleep scaled by
      ``backoff_scale`` (1.0 = the reference's 2,4,8 s inline sleeps;
      tests use ~0.01), retry the same URL, and reset the counter on
      eventual success (content_crawler.py:139-155);
    - 404 -> "not_found" (parity with CorpusFetcher's corpus miss), other
      >=400 -> "http_error", timeouts -> "timeout", transport errors ->
      "error" (the reference logs and returns None for all of these);
    - response bytes pass through RAW; charset handling stays in
      ``decode_html`` at the parse stage (same cascade the reference
      applies via response.encoding/apparent_encoding).

    The sandbox has no external network; the loopback e2e tests
    (tests/test_http_fetch.py) exercise this against a 127.0.0.1
    ``http.server`` and pin byte-identical output vs CorpusFetcher.
    """

    DEFAULT_HEADERS = {
        "Accept": ("text/html,application/xhtml+xml,application/xml;q=0.9,"
                   "image/webp,*/*;q=0.8"),
        "Accept-Language": "ko-KR,ko;q=0.9,en-US;q=0.8,en;q=0.7",
        "Accept-Encoding": "gzip, deflate",  # no brotli (reference parity)
        "Connection": "keep-alive",
        "Upgrade-Insecure-Requests": "1",
    }

    def __init__(self, frontier_handles: list, num_shards: int,
                 ua_seed: int = 42, connect_timeout: float = 10.0,
                 read_timeout: float = 30.0, backoff_scale: float = 1.0):
        import requests

        self._frontier = frontier_handles
        self._num_shards = num_shards
        self._ua = UARotator(seed=ua_seed)
        self._timeout = (connect_timeout, read_timeout)
        self._backoff_scale = backoff_scale
        self.session = requests.Session()
        self.session.trust_env = False   # no proxy env interference
        self.session.headers.update(self.DEFAULT_HEADERS)

    def _shard_of(self, host: str) -> int:
        return url_hash64(host) % self._num_shards

    def _fetch_one(self, url: str, host: str) -> tuple[bytes, str, int]:
        """(raw body, status, attempts) for one URL, driving the shard's
        429 state machine on real rate-limit responses."""
        import time

        import requests

        shard = self._frontier[self._shard_of(host)]
        attempt = 1
        while True:
            try:
                resp = self.session.get(
                    url, headers={"User-Agent": self._ua.next()},
                    timeout=self._timeout)
            except requests.exceptions.Timeout:
                return (b"", "timeout", attempt)
            except requests.exceptions.RequestException:
                return (b"", "error", attempt)
            if resp.status_code == 429:
                retry_ok, backoff = ray.get(shard.report_429.remote(host))
                if not retry_ok:
                    return (b"", "suspended", attempt)
                if backoff > 0 and self._backoff_scale > 0:
                    time.sleep(backoff * self._backoff_scale)
                attempt += 1
                continue
            if resp.status_code == 404:
                return (b"", "not_found", attempt)
            if resp.status_code >= 400:
                return (b"", "http_error", attempt)
            if attempt > 1:
                # success after retries resets the counter
                # (rate_limiter.py:259-268)
                shard.report_success.remote(host)
            return (resp.content, "ok", attempt)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from datetime import datetime, timezone

        n = batch.num_rows
        has_attempt = "attempt" in batch.column_names
        if has_attempt:
            batch = batch.drop_columns(["attempt"])
        urls = batch.column("url").to_pylist() if n else []
        hosts = batch.column("host").to_pylist() if n else []
        suspended = self._suspended_hosts(hosts) if n else set()
        htmls: list[bytes] = []
        statuses: list[str] = []
        attempts: list[int] = []
        for url, host in zip(urls, hosts):
            if host in suspended:
                htmls.append(b"")
                statuses.append("suspended")
                attempts.append(0)
                continue
            html, status, attempt = self._fetch_one(url, host)
            if status == "suspended":
                suspended.add(host)
            htmls.append(html)
            statuses.append(status)
            attempts.append(attempt)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        return (batch
                .append_column("html", pa.array(htmls, pa.binary()))
                .append_column("warc_ts", pa.array([now] * n,
                                                   pa.timestamp("us")))
                .append_column("status", pa.array(statuses, pa.string()))
                .append_column("attempt", pa.array(attempts, pa.int32())))

    # shared with CorpusFetcher: hosts suspended since their URLs were
    # granted are skipped with one RPC per involved shard per batch
    _suspended_hosts = CorpusFetcher._suspended_hosts


_HTTP_CACHE: dict = {}


def make_http_fetch_fn(frontier_handles, num_shards, ua_seed=42,
                       connect_timeout=10.0, read_timeout=30.0,
                       backoff_scale=1.0):
    """Task-based live-HTTP fetch stage: one keep-alive session per Ray
    worker process (same memoized-task-pool pattern as
    ``make_corpus_fetch_fn`` — setup once per worker, no actor-pool
    spin-up)."""
    key = ("http", num_shards, ua_seed, connect_timeout, read_timeout,
           backoff_scale)

    def fetch(batch: pa.Table) -> pa.Table:
        fetcher = _HTTP_CACHE.get(key)
        if fetcher is None:
            fetcher = HttpFetcher(frontier_handles, num_shards,
                                  ua_seed=ua_seed,
                                  connect_timeout=connect_timeout,
                                  read_timeout=read_timeout,
                                  backoff_scale=backoff_scale)
            _HTTP_CACHE.clear()
            _HTTP_CACHE[key] = fetcher
        return fetcher(batch)

    return fetch
