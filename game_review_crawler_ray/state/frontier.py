"""Sharded URL frontier: politeness + seen-set + robots + lineage.

This is the engine's replacement for the reference's process-local trio of
``RateLimiter`` (crawler/utils/rate_limiter.py), the dedup ``seen`` set
(crawler/utils/url_deduplicator.py:53-62) and the (absent) robots handling.
Hosts are sharded by ``hash(host) % num_shards``; because a normalized URL
determines its host, one sharding key serves both the per-host politeness
state and the URL-seen set — no cross-shard coordination is ever needed for
a single URL.

Each shard is a Ray actor (wrapped in pipelines/crawl.py) holding:

- a seen-set shard (``ExactSeen`` for conformance, ``BloomSeen`` at scale),
- per-host politeness state: virtual next-free clock, deterministic jitter
  (seeded per (host, k) — the reference uses unseeded ``random.uniform``,
  rate_limiter.py:152), retry counters, exponential ``2^n`` backoff and
  suspension after ``max_retries`` (rate_limiter.py:213-257),
- a robots.txt cache per host (allow-all until ``set_robots``),
- the ``fetch_log`` lineage buffer, periodically flushed to Parquet so a
  killed run resumes from the last flush (at-least-once re-crawl of the
  unflushed tail).

Politeness semantics: the reference enforces "gap since last same-host
request >= delay + jitter" by sleeping inline in a serial loop
(rate_limiter.py:163-211). The engine schedules grants on a per-host
virtual clock: t_0 = 0, t_k = t_{k-1} + delay + jitter_k — which implies
the same per-host inter-arrival invariant (verified from fetch_log in
tests) without serializing the whole pipeline on sleeps. Crawl *order*
conformance is carried by ``discovered_seq`` (= seed rank of the first
occurrence), the quantity the reference's serial loop ordering preserves.
"""

from __future__ import annotations

import os
from datetime import datetime
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from .bloom import BloomSeen, ExactSeen
from .robots import parse_robots

VIRTUAL_EPOCH = datetime(2024, 1, 1)

FETCH_LOG_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("url_norm", pa.string()),
    ("host", pa.string()),
    ("fetch_ts", pa.timestamp("us")),
    ("status", pa.string()),
    ("attempt", pa.int32()),
    ("wait_s", pa.float64()),
    ("grant_seq", pa.int64()),
    ("discovered_seq", pa.int64()),
    ("partition_id", pa.int32()),
])

GRANT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("url_norm", pa.string()),
    ("url_hash", pa.uint64()),
    ("host", pa.string()),
    ("keyword", pa.string()),
    ("discovered_seq", pa.int64()),
    ("grant_seq", pa.int64()),
    ("sched_s", pa.float64()),
    ("wait_s", pa.float64()),
])


class HostState:
    __slots__ = ("count", "next_free_s", "retry_count", "suspended", "delay")

    def __init__(self, delay: float):
        self.count = 0
        self.next_free_s = 0.0
        self.retry_count = 0
        self.suspended = False
        self.delay = delay


class FrontierShard:
    def __init__(self, shard_id: int, config: CrawlConfig | None = None):
        self.shard_id = shard_id
        self.cfg = config or CrawlConfig()
        if self.cfg.seen_exact:
            self.seen = ExactSeen()
        else:
            self.seen = BloomSeen(self.cfg.bloom_capacity, self.cfg.bloom_fpp)
        self.hosts: dict[str, HostState] = {}
        self.robots: dict[str, object] = {}
        self.rate_budget: dict[str, int] = {}   # host -> remaining simulated 429s
        self._grant_counter = 0
        self._log: list[tuple] = []             # unflushed tail only
        self._total_log_rows = 0
        self._status_counter: dict[str, int] = {}
        self._flushed_files = 0
        self._checkpoint_dir: str | None = None
        self.flush_every = 10_000

    # ------------------------------------------------------------------
    def _host_state(self, host: str) -> HostState:
        st = self.hosts.get(host)
        if st is None:
            st = HostState(self.cfg.host_delays.get(host, self.cfg.default_delay))
            self.hosts[host] = st
        return st

    def _jitter(self, host: str, k: int) -> float:
        """Deterministic jitter in [jmin, jmax], keyed by (seed, host, k).

        Hash-based rather than ``random.Random(seed_str)`` (the Mersenne
        seeding alone costs ~15us/call; blake2b is ~1.3us) — same
        properties: uniform in range, reproducible across runs/resume."""
        if not self.cfg.jitter_enabled:
            return 0.0
        jmin, jmax = self.cfg.jitter_range
        from ..functions.hashing import stable_hash64

        u = stable_hash64(f"{self.cfg.rng_seed}:{host}:{k}") / 2.0 ** 64
        return jmin + (jmax - jmin) * u

    def _robots_allowed(self, host: str, url: str) -> bool:
        if not self.robots:          # no robots anywhere: hot-path shortcut
            return True
        rules = self.robots.get(host)
        if rules is None:
            return True
        return rules.allowed(urlparse(url).path or "/")

    def _log_row(self, url, url_norm, host, status, attempt, wait_s,
                 grant_seq, discovered_seq, sched_s):
        self._log.append([url, url_norm, host, sched_s, status, attempt,
                          wait_s, grant_seq, discovered_seq, self.shard_id])
        self._total_log_rows += 1
        self._status_counter[status] = self._status_counter.get(status, 0) + 1
        if len(self._log) >= self.flush_every and self._checkpoint_dir:
            self.flush_log()

    def set_checkpoint_dir(self, path: str) -> None:
        self._checkpoint_dir = path
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------------
    def offer(self, batch: pa.Table, echo_hash: bool = False) -> dict:
        """Admit a batch of candidate URLs; return a compact grant.

        Input columns: url, url_norm, host, url_hash, seed_rank, keyword.
        Returns numpy arrays (cheap to build and ship, no string echo):
        ``idx`` — positions of granted rows in the request batch — plus the
        politeness metadata (grant_seq, sched_s, wait_s). The caller
        reconstructs the granted table with ``batch.take(idx)``
        (frontier_offer_fn). Denied rows (dup / suspended / robots) are
        logged shard-side; granted-row lineage is written downstream by the
        write_log stage, so the hot path does no per-grant logging.
        """
        import os as _os
        import time as _t

        _t0 = _t.perf_counter()
        hashes = np.asarray(batch.column("url_hash").to_numpy(zero_copy_only=False),
                            dtype=np.uint64)
        fresh = self.seen.add_if_new(hashes)
        hosts = batch.column("host").to_pylist()
        n = len(hosts)
        idx_out = np.empty(n, dtype=np.int64)
        grant_out = np.empty(n, dtype=np.int64)
        sched_out = np.empty(n, dtype=np.float64)
        wait_out = np.empty(n, dtype=np.float64)
        att_out = np.empty(n, dtype=np.int32)
        m = 0
        lazy_urls = None
        for i in np.nonzero(fresh)[0]:
            host = hosts[i]
            st = self._host_state(host)
            if st.suspended or not self._robots_allowed_lazy(host, batch, i):
                if lazy_urls is None:
                    lazy_urls = batch.column("url")
                status = "suspended" if st.suspended else "robots_denied"
                self._log_row(lazy_urls[i].as_py(),
                              batch.column("url_norm")[i].as_py(), host,
                              status, 0, 0.0, -1,
                              batch.column("seed_rank")[i].as_py(),
                              st.next_free_s)
                continue
            k = st.count
            wait = 0.0 if k == 0 else st.delay + self._jitter(host, k)
            sched = st.next_free_s + wait
            st.next_free_s = sched
            st.count += 1
            attempt = 1
            if echo_hash and self.rate_budget.get(host, 0) > 0:
                # Pre-offered-grant mode: the simulated-429 budget is
                # consumed HERE, serially per host (the reference's serial
                # loop semantics, rate_limiter.py:213-268) — deterministic
                # under the virtual clock, and the backoff bumps land on
                # next_free_s BEFORE later same-host grants are scheduled
                # (the streaming path applies them racily at fetch time).
                # The fetch stage then runs budget-free (crawl.py passes
                # rate_limited=None when grants are pre-offered).
                suspended_now = False
                while self.rate_budget.get(host, 0) > 0:
                    self.rate_budget[host] -= 1
                    st.retry_count += 1
                    if st.retry_count > self.cfg.max_retries:
                        st.suspended = True
                        suspended_now = True
                        break
                    st.next_free_s += float(2 ** st.retry_count)
                    attempt += 1
                if suspended_now:
                    if lazy_urls is None:
                        lazy_urls = batch.column("url")
                    self._log_row(lazy_urls[i].as_py(),
                                  batch.column("url_norm")[i].as_py(), host,
                                  "suspended", attempt, wait, -1,
                                  batch.column("seed_rank")[i].as_py(), sched)
                    continue
                if attempt > 1:   # success after retries resets the counter
                    st.retry_count = 0
            grant_seq = self._grant_counter * self.cfg.num_frontier_shards + self.shard_id
            self._grant_counter += 1
            idx_out[m] = i
            grant_out[m] = grant_seq
            sched_out[m] = sched
            wait_out[m] = wait
            att_out[m] = attempt
            m += 1
        if _os.environ.get("GRC_TIMING"):
            print(f"[shard{self.shard_id}] offer {batch.num_rows} rows "
                  f"{_t.perf_counter() - _t0:.3f}s")
        out = {
            "idx": idx_out[:m],
            "grant_seq": grant_out[:m],
            "sched_s": sched_out[:m],
            "wait_s": wait_out[:m],
        }
        if echo_hash:
            # pre-offered-grant mode (crawl.py): the caller joins grants
            # back to rows by url_hash instead of by batch position, so the
            # response must identify granted rows position-independently.
            # attempt carries the shard-simulated 429 retries (1 if none).
            out["url_hash"] = hashes[idx_out[:m]]
            out["attempt"] = att_out[:m]
        return out

    def _robots_allowed_lazy(self, host: str, batch: pa.Table, i: int) -> bool:
        # robots rules are matched against the NORMALIZED url's path, the
        # same key the seen-set dedups on — mixed-case variants of one page
        # therefore always get the same verdict.
        if not self.robots or host not in self.robots:
            return True
        return self._robots_allowed(host, batch.column("url_norm")[i].as_py())

    # ------------------------------------------------------------------
    # Pull model: per-host PRIORITY QUEUES drained in politeness order.
    #
    # The streaming corpus pipeline uses the inline-grant offer() above
    # (arrival order == seed order after the exact-dedup prep). A live
    # HTTP crawl instead enqueues discovered URLs with a priority and
    # pulls batches as hosts become polite-able — bounded in-flight per
    # host, highest-priority URL first within a host, earliest next-free
    # host first across hosts.
    # ------------------------------------------------------------------

    def enqueue(self, batch: pa.Table) -> int:
        """Admit candidate URLs into per-host priority queues (dedup via the
        seen shard). Priority = seed_rank (lower = sooner). Returns the
        number of URLs enqueued."""
        import heapq

        hashes = np.asarray(batch.column("url_hash").to_numpy(zero_copy_only=False),
                            dtype=np.uint64)
        fresh = self.seen.add_if_new(hashes)
        urls = batch.column("url").to_pylist()
        norms = batch.column("url_norm").to_pylist()
        hosts = batch.column("host").to_pylist()
        ranks = batch.column("seed_rank").to_pylist()
        kws = batch.column("keyword").to_pylist()
        if not hasattr(self, "_queues"):
            self._queues: dict[str, list] = {}
        added = 0
        for i in np.nonzero(fresh)[0]:
            host = hosts[i]
            heapq.heappush(self._queues.setdefault(host, []),
                           (ranks[i], urls[i], norms[i], kws[i]))
            added += 1
        return added

    def drain(self, limit: int = 1024) -> pa.Table:
        """Pop up to ``limit`` grants in global politeness order: the host
        whose virtual clock frees earliest goes first; within a host, the
        highest-priority queued URL. Suspended/robots-denied URLs are
        logged and skipped (same semantics as offer())."""
        import heapq

        queues = getattr(self, "_queues", None) or {}
        ready = [(self._host_state(h).next_free_s, h) for h, q in queues.items() if q]
        heapq.heapify(ready)
        out = {n: [] for n in GRANT_SCHEMA.names}
        n_out = 0
        while ready and n_out < limit:
            _, host = heapq.heappop(ready)
            q = queues[host]
            rank, url, norm, kw = heapq.heappop(q)
            st = self._host_state(host)
            if st.suspended or not self._robots_allowed(host, norm):
                status = "suspended" if st.suspended else "robots_denied"
                self._log_row(url, norm, host, status, 0, 0.0, -1, rank,
                              st.next_free_s)
            else:
                k = st.count
                wait = 0.0 if k == 0 else st.delay + self._jitter(host, k)
                sched = st.next_free_s + wait
                st.next_free_s = sched
                st.count += 1
                grant_seq = (self._grant_counter * self.cfg.num_frontier_shards
                             + self.shard_id)
                self._grant_counter += 1
                out["url"].append(url)
                out["url_norm"].append(norm)
                out["host"].append(host)
                out["keyword"].append(kw)
                out["discovered_seq"].append(rank)
                out["grant_seq"].append(grant_seq)
                out["sched_s"].append(sched)
                out["wait_s"].append(wait)
                n_out += 1
            if q:
                heapq.heappush(ready, (self._host_state(host).next_free_s, host))
        from ..functions.urlnorm import url_hash64_batch

        out["url_hash"] = url_hash64_batch(out["url_norm"])  # one batch call
        return pa.Table.from_arrays(
            [pa.array(out[n], GRANT_SCHEMA.field(n).type)
             if n != "url_hash" else out[n]
             for n in GRANT_SCHEMA.names],
            schema=GRANT_SCHEMA)

    def queue_depth(self) -> int:
        return sum(len(q) for q in getattr(self, "_queues", {}).values())

    # ------------------------------------------------------------------
    def report_429(self, host: str) -> tuple[bool, float]:
        """Exponential backoff on HTTP 429 (rate_limiter.py:213-257)."""
        st = self._host_state(host)
        st.retry_count += 1
        if st.retry_count > self.cfg.max_retries:
            st.suspended = True
            return (False, 0.0)
        backoff = float(2 ** st.retry_count)
        st.next_free_s += backoff
        return (True, backoff)

    def set_rate_limited(self, budgets: dict[str, int]) -> None:
        """Install simulated-429 budgets for hosts this shard owns. The
        budget lives HERE — the single source of truth per host — so fetch
        parallelism > 1 still serves exactly N global 429s per host (the
        reference's serial loop semantics, rate_limiter.py:213-257)."""
        self.rate_budget.update(budgets)

    def consume_429(self, host: str) -> tuple[bool, bool]:
        """Atomically consume one simulated 429 for ``host``.

        Returns (served, retry_ok): served=False means the budget is
        exhausted (the fetch succeeds); retry_ok=False means the host just
        exceeded max_retries and is now suspended."""
        if self.rate_budget.get(host, 0) <= 0:
            return (False, True)
        self.rate_budget[host] -= 1
        retry_ok, _backoff = self.report_429(host)
        return (True, retry_ok)

    def report_success(self, host: str) -> None:
        self._host_state(host).retry_count = 0

    # ------------------------------------------------------------------
    def set_robots(self, host: str, robots_txt: str, agent: str = "*") -> None:
        self.robots[host] = parse_robots(robots_txt, agent)

    def set_host_delay(self, host: str, delay: float) -> None:
        self._host_state(host).delay = delay

    def resume_host(self, host: str) -> None:
        st = self._host_state(host)
        st.suspended = False
        st.retry_count = 0

    def is_suspended(self, host: str) -> bool:
        return self._host_state(host).suspended

    def suspended_hosts(self) -> list[str]:
        return [h for h, st in self.hosts.items() if st.suspended]

    def preload_hashes(self, hashes: np.ndarray) -> int:
        """Resume: mark already-fetched URLs as seen (anti-join by preload)."""
        fresh = self.seen.add_if_new(np.asarray(hashes, dtype=np.uint64))
        return int(fresh.sum())

    # ------------------------------------------------------------------
    def _log_table(self, rows: list[list]) -> pa.Table:
        cols = list(zip(*rows)) if rows else [[] for _ in range(10)]
        sched = np.asarray(cols[3], dtype=np.float64) if cols[3] else np.array([])
        ts = (sched * 1e6).astype(np.int64) + np.int64(
            (VIRTUAL_EPOCH - datetime(1970, 1, 1)).total_seconds() * 1e6)
        arrays = [
            pa.array(list(cols[0]), pa.string()),
            pa.array(list(cols[1]), pa.string()),
            pa.array(list(cols[2]), pa.string()),
            pa.array(ts, pa.timestamp("us")) if len(ts) else pa.array([], pa.timestamp("us")),
            pa.array(list(cols[4]), pa.string()),
            pa.array(list(cols[5]), pa.int32()),
            pa.array(list(cols[6]), pa.float64()),
            pa.array(list(cols[7]), pa.int64()),
            pa.array(list(cols[8]), pa.int64()),
            pa.array(list(cols[9]), pa.int32()),
        ]
        return pa.Table.from_arrays(arrays, schema=FETCH_LOG_SCHEMA)

    def flush_log(self) -> str | None:
        """Flush the unflushed lineage tail to a numbered Parquet file and
        drop the flushed rows (the shard's memory stays bounded over a
        long crawl; running status counters survive in
        ``_status_counter``)."""
        if self._checkpoint_dir is None or not self._log:
            return None
        path = os.path.join(
            self._checkpoint_dir,
            f"fetch_log-shard{self.shard_id:03d}-{self._flushed_files:05d}.parquet",
        )
        pq.write_table(self._log_table(self._log), path)
        self._log = []
        self._flushed_files += 1
        return path

    def get_log(self) -> pa.Table:
        """The UNFLUSHED lineage tail (flushed rows live in parquet)."""
        return self._log_table(self._log)

    def status_counts(self) -> dict:
        """Running counts over every row logged this run (flushed or not)."""
        return dict(self._status_counter)

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "hosts": len(self.hosts),
            "granted": self._grant_counter,
            "log_rows": self._total_log_rows,
            "seen_approx": self.seen.approx_len(),
            "suspended_hosts": sum(1 for s in self.hosts.values() if s.suspended),
        }
