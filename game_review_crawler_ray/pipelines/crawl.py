"""The flagship crawl pipeline: seeds → frontier → fetch → parse → posts.

Ray-Data-first shape (SURVEY.md §3.1 mapping):

    seeds (Dataset)
      → map_batches(annotate: url_norm/host/url_hash)        [stateless]
      → exact first-wins dedup (groupby url_norm, min rank)  [shuffle; conformance path]
      → map_batches(frontier offer)                          [actor RPC, host-sharded]
      → map_batches(CorpusFetcher, concurrency=N)            [actor pool, broadcast corpus]
      → map_batches(ParseBatch)                              [stateless, drops html]
      → map_batches(report lineage statuses)                 [actor RPC]
      → write_parquet(out/posts)                             [streaming sink]

The frontier actor pool (host-sharded politeness + seen set + robots +
lineage) is the only non-Dataset state; everything else streams with
backpressure. Dedup has two modes:

- ``exact`` (default, conformance): distributed ``groupby(url_norm)``
  keeping the min ``seed_rank`` — byte-identical first-wins membership and
  retained-URL vs the reference (url_deduplicator.py:40-62), at the cost of
  one shuffle of the (tiny) seed table.
- ``frontier`` (scale): no shuffle; the sharded bloom/exact seen-set in the
  frontier dedups on arrival. Membership identical (modulo documented bloom
  FPP); the retained URL string for near-duplicate variants is
  first-arrival rather than first-in-seed-order.

Resume: ``resume=True`` preloads the frontier seen-shards from the
``fetch_log`` checkpoint Parquet (terminal statuses only), so already
crawled URLs dedup away — the anti-join expressed as state preload
(SURVEY.md §2.4 J6).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import CrawlConfig
from ..functions.urlnorm import annotate_urls, url_hash64
from ..state.frontier import FrontierShard
from ..stages.fetch import CorpusFetcher
from ..stages.parse import parse_batch_fn

TERMINAL_STATUSES = ("ok", "parse_failed", "not_found")


def make_frontier(cfg: CrawlConfig, checkpoint_dir: str | None = None):
    """Create the host-sharded frontier actor pool."""
    # num_cpus=0: frontier shards are lightweight RPC state holders that must
    # never compete with the map_batches worker pools for CPU slots (a full
    # CPU each can deadlock the actor-pool stages on a small cluster).
    Actor = ray.remote(num_cpus=0)(FrontierShard)
    shards = [Actor.remote(i, cfg) for i in range(cfg.num_frontier_shards)]
    if checkpoint_dir:
        ray.get([s.set_checkpoint_dir.remote(checkpoint_dir) for s in shards])
    return shards


def _annotate(batch: pa.Table) -> pa.Table:
    return annotate_urls(batch)


def _keep_first_seed(group: pa.Table) -> pa.Table:
    """First-wins within one url_norm group: keep the min seed_rank row."""
    ranks = group.column("seed_rank").to_numpy(zero_copy_only=False)
    return group.take(pa.array([int(np.argmin(ranks))]))


def dedup_first_wins(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact distributed first-wins dedup (operator D1, exact path)."""
    return ds.groupby("url_norm").map_groups(_keep_first_seed, batch_format="pyarrow")


def frontier_offer_fn(frontier, num_shards: int):
    def offer(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        shard_ids = np.fromiter((url_hash64(h) % num_shards for h in hosts),
                                dtype=np.int64, count=len(hosts))
        refs = []
        for s in np.unique(shard_ids):
            sub = batch.filter(pa.array(shard_ids == s))
            refs.append(frontier[int(s)].offer.remote(sub))
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            from ..state.frontier import GRANT_SCHEMA
            return GRANT_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return offer


def report_results_fn(frontier, num_shards: int):
    def report(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        norms = batch.column("url_norm").to_pylist()
        statuses = batch.column("status").to_pylist()
        attempts = batch.column("attempt").to_pylist()
        by_shard: dict[int, list[int]] = {}
        for i, h in enumerate(hosts):
            by_shard.setdefault(url_hash64(h) % num_shards, []).append(i)
        for s, idxs in by_shard.items():
            frontier[s].report_results.remote(
                [norms[i] for i in idxs],
                [statuses[i] for i in idxs],
                [attempts[i] for i in idxs],
            )
        return batch

    return report


def load_seeds(seeds) -> ray.data.Dataset:
    if isinstance(seeds, ray.data.Dataset):
        return seeds
    if isinstance(seeds, str):
        return ray.data.read_parquet(seeds)
    return ray.data.from_arrow(seeds)


def load_fetch_log(out_dir: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(out_dir, "fetch_log", "*.parquet")))
    if not files:
        from ..state.frontier import FETCH_LOG_SCHEMA
        return FETCH_LOG_SCHEMA.empty_table()
    return pa.concat_tables([pq.read_table(f) for f in files])


def run_crawl(
    pages,                       # pa.Table | parquet path/dir of the pages corpus
    seeds,                       # pa.Table | Dataset | parquet path
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    rate_limited: dict[str, int] | None = None,
    robots: dict[str, str] | None = None,
    parallelism: int | None = None,
) -> dict:
    """Run the crawl; returns paths + metrics. Ray must be initialised."""
    cfg = cfg or CrawlConfig()
    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, "fetch_log")
    frontier = make_frontier(cfg, checkpoint_dir=ckpt)

    if robots:
        waits = []
        for host, txt in robots.items():
            shard = frontier[url_hash64(host) % cfg.num_frontier_shards]
            waits.append(shard.set_robots.remote(host, txt))
        ray.get(waits)

    if resume:
        log = load_fetch_log(out_dir)
        if log.num_rows:
            mask = pa.compute.is_in(log.column("status"),
                                    value_set=pa.array(TERMINAL_STATUSES))
            done = log.filter(mask)
            hosts = done.column("host").to_pylist()
            norms = done.column("url_norm").to_pylist()
            by_shard: dict[int, list[int]] = {}
            for norm, host in zip(norms, hosts):
                by_shard.setdefault(url_hash64(host) % cfg.num_frontier_shards, []).append(
                    url_hash64(norm))
            ray.get([
                frontier[s].preload_hashes.remote(np.array(hs, dtype=np.uint64))
                for s, hs in by_shard.items()
            ])

    # corpus broadcast: one copy in the object store, shared by all fetchers
    if isinstance(pages, str):
        paths = sorted(glob.glob(os.path.join(pages, "*.parquet"))) or [pages]
        pages_tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    else:
        pages_tbl = pages
    corpus_ref = ray.put(pages_tbl)

    ds = load_seeds(seeds)
    if parallelism:
        ds = ds.repartition(parallelism)
    ds = ds.map_batches(_annotate, batch_format="pyarrow")
    if cfg.seen_exact:
        ds = dedup_first_wins(ds)
    ds = ds.map_batches(frontier_offer_fn(frontier, cfg.num_frontier_shards),
                        batch_format="pyarrow", batch_size=cfg.parse_batch_size)
    ds = ds.map_batches(
        CorpusFetcher,
        fn_constructor_kwargs=dict(
            corpus_ref=corpus_ref,
            frontier_handles=frontier,
            num_shards=cfg.num_frontier_shards,
            rate_limited=rate_limited,
            max_retries=cfg.max_retries,
        ),
        concurrency=cfg.fetch_concurrency,
        batch_size=cfg.parse_batch_size,
        batch_format="pyarrow",
    )
    ds = ds.map_batches(parse_batch_fn, batch_size=cfg.parse_batch_size,
                        batch_format="pyarrow")
    ds = ds.map_batches(report_results_fn(frontier, cfg.num_frontier_shards),
                        batch_format="pyarrow")

    posts_dir = os.path.join(out_dir, "posts")
    ok_ds = ds.filter(expr="status == 'ok'")
    ok_ds.write_parquet(posts_dir)

    ray.get([s.flush_log.remote() for s in frontier])
    stats = ray.get([s.stats.remote() for s in frontier])
    metrics = {
        "granted": sum(s["granted"] for s in stats),
        "hosts": sum(s["hosts"] for s in stats),
        "suspended_hosts": sum(s["suspended_hosts"] for s in stats),
        "log_rows": sum(s["log_rows"] for s in stats),
        "shards": stats,
    }
    log = load_fetch_log(out_dir)
    if log.num_rows:
        import collections

        counts = collections.Counter(log.column("status").to_pylist())
        metrics["status_counts"] = dict(counts)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)

    for s in frontier:
        ray.kill(s)
    return {"posts_dir": posts_dir, "fetch_log_dir": ckpt, "metrics": metrics}
