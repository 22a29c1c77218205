"""The flagship crawl pipeline: seeds → frontier → fetch → parse → posts.

Ray-Data-first shape (SURVEY.md §3.1 mapping):

    seeds (table)
      → prep: annotate + exact first-wins dedup + shard-aligned blocks
      → map_batches(frontier offer)     [1 actor RPC/block, compact response]
      → map_batches(corpus fetch)       [task-based, broadcast corpus + hash index]
      → map_batches(parse)              [stateless, drops html]
      → map_batches(write fetch_log)    [per-task lineage Parquet]
      → filter(ok) → write_parquet(out/posts)   [streaming sink]

The frontier actor pool (host-sharded politeness + seen set + robots +
denied-row lineage) is the only non-Dataset state; everything else streams
with backpressure. Dedup has two modes:

- ``exact`` (default, conformance): first-wins by min ``seed_rank`` per
  url_norm — byte-identical membership and retained-URL vs the reference
  (url_deduplicator.py:40-62). Done in the seed prep (duplicated-mask over
  the rank-ordered table) for table inputs, or as a per-block partial-min
  combiner (``dedup_first_wins``) for Dataset inputs — no all-to-all
  shuffle either way.
- ``frontier`` (scale): no prep; the sharded bloom/exact seen-set in the
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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import CrawlConfig
from ..functions.urlnorm import annotate_urls, host_shard_ids, url_hash64
from ..state.frontier import FrontierShard
from ..stages.fetch import CorpusFetcher  # noqa: F401 (actor-pool variant)
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
        # no ray.get needed. Driver-submitted calls (pre-offered grants,
        # flush_log) are FIFO-ordered after this per caller. Offers
        # submitted from map workers (streaming path) carry NO ordering
        # guarantee vs this call — that is safe only because _log_row
        # defers flushing while _checkpoint_dir is None and the final
        # flush_log is driver-submitted (so ordered after this): a mid-run
        # flush is merely deferred, never lost. Changing flush semantics
        # must preserve that argument. Skipping the get lets actor
        # construction (~0.9s for 16 processes) overlap seed prep.
        for s in shards:
            s.set_checkpoint_dir.remote(checkpoint_dir)
    return shards


def _annotate(batch: pa.Table) -> pa.Table:
    return annotate_urls(batch)


def dedup_first_wins(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact distributed first-wins dedup (operator D1, exact path).

    Winner per url_norm = the min seed_rank; since seed_rank is globally
    unique, ``groupby(url_norm).min(seed_rank)`` yields exactly the winner
    rank set. Combiner pattern, no all-to-all shuffle: per-block partial mins
    (map_batches), a tiny driver merge, broadcast winner-rank filter.
    This conformance path suits seed lists up to ~10^8; beyond that the
    scale path is the frontier's sharded bloom dedup (cfg.seen_exact=False),
    which needs no shuffle at all.
    """
    import pandas as pd

    def partial_winners(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "url_norm": batch.column("url_norm").to_pandas(),
            "seed_rank": batch.column("seed_rank").to_numpy(zero_copy_only=False),
        })
        g = df.groupby("url_norm", as_index=False)["seed_rank"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = [t.to_pandas() for t in
             ray.get(ds.map_batches(partial_winners, batch_format="pyarrow")
                     .to_arrow_refs()) if t.num_rows]
    if parts:
        merged = pd.concat(parts).groupby("url_norm", as_index=False)["seed_rank"].min()
        ranks = np.sort(merged["seed_rank"].to_numpy())
    else:
        ranks = np.array([], dtype=np.int64)
    ranks_ref = ray.put(ranks)

    def keep_winners(batch: pa.Table) -> pa.Table:
        w = ray.get(ranks_ref)
        mask = np.isin(batch.column("seed_rank").to_numpy(zero_copy_only=False), w,
                       assume_unique=True)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep_winners, batch_format="pyarrow")


def _grant_to_table(batch: pa.Table, grant: dict) -> pa.Table:
    """Reconstruct the granted-rows table from a compact shard response."""
    taken = batch.take(pa.array(grant["idx"], pa.int64()))
    names = ["discovered_seq" if n == "seed_rank" else n
             for n in taken.column_names]
    taken = taken.rename_columns(names)
    return (taken.append_column("grant_seq", pa.array(grant["grant_seq"], pa.int64()))
            .append_column("sched_s", pa.array(grant["sched_s"], pa.float64()))
            .append_column("wait_s", pa.array(grant["wait_s"], pa.float64())))


def frontier_offer_fn(frontier, num_shards: int):
    def offer(batch: pa.Table) -> pa.Table:
        import os
        import time

        _t0 = time.perf_counter()
        hosts = batch.column("host").to_pylist()
        shard_ids = host_shard_ids(batch.column("host"), num_shards) \
            if len(hosts) else np.empty(0, dtype=np.int64)
        uniq = np.unique(shard_ids)
        if len(uniq) == 1:
            # shard-aligned block (prep_seed_blocks layout): one RPC
            _t1 = time.perf_counter()
            grant = ray.get(frontier[int(uniq[0])].offer.remote(batch))
            _t2 = time.perf_counter()
            tables = [_grant_to_table(batch, grant)]
            if os.environ.get("GRC_TIMING"):
                print(f"[offer_rpc] {len(hosts)} rows {_t2-_t1:.3f}s")
        else:
            subs, refs = [], []
            for s in uniq:
                sub = batch.filter(pa.array(shard_ids == s))
                subs.append(sub)
                refs.append(frontier[int(s)].offer.remote(sub))
            tables = [_grant_to_table(sub, g)
                      for sub, g in zip(subs, ray.get(refs))]
        tables = [t for t in tables if t.num_rows]
        if os.environ.get("GRC_TIMING"):
            print(f"[offer] {len(hosts)} rows {time.perf_counter()-_t0:.3f}s")
        if not tables:
            return _empty_grant(batch)
        return pa.concat_tables(tables)

    return offer


def _empty_grant(batch: pa.Table, with_attempt: bool = False) -> pa.Table:
    taken = batch.slice(0, 0)
    names = ["discovered_seq" if n == "seed_rank" else n
             for n in taken.column_names]
    taken = taken.rename_columns(names)
    out = (taken.append_column("grant_seq", pa.array([], pa.int64()))
           .append_column("sched_s", pa.array([], pa.float64()))
           .append_column("wait_s", pa.array([], pa.float64())))
    if with_attempt:
        out = out.append_column("attempt", pa.array([], pa.int32()))
    return out


def write_fetch_log_fn(log_dir: str, num_shards: int, run_id: str = "r0"):
    """Lineage sink: each task writes its block's fetch_log rows straight to
    a uniquely-named Parquet file (per-partition lineage, resumable). This
    replaces per-row report RPCs into the frontier — the hot path never
    blocks on actor state. Task retries may duplicate a file; readers
    resolve by max (grant_seq, fetch_ts) per url_norm (load_fetch_log).
    ``run_id`` scopes filenames so a resumed run's metrics count only the
    rows IT wrote (earlier runs' files stay for resume/lineage)."""
    from ..state.frontier import FETCH_LOG_SCHEMA, VIRTUAL_EPOCH
    import datetime as _dt
    import uuid

    epoch_us = np.int64((VIRTUAL_EPOCH - _dt.datetime(1970, 1, 1))
                        .total_seconds() * 1e6)

    def write_log(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            sid = host_shard_ids(batch.column("host"), num_shards)
            sched = np.asarray(batch.column("sched_s").to_numpy(
                zero_copy_only=False), dtype=np.float64)
            ts = (sched * 1e6).astype(np.int64) + epoch_us
            log = pa.Table.from_arrays([
                batch.column("url"),
                batch.column("url_norm"),
                batch.column("host"),
                pa.array(ts, pa.timestamp("us")),
                batch.column("status"),
                pc.cast(batch.column("attempt"), pa.int32()),
                batch.column("wait_s"),
                batch.column("grant_seq"),
                batch.column("discovered_seq"),
                pa.array(sid.astype(np.int32), pa.int32()),
            ], schema=FETCH_LOG_SCHEMA)
            path = os.path.join(
                log_dir, f"fetch_log-task-{run_id}-{uuid.uuid4().hex}.parquet")
            pq.write_table(log, path)
        return batch

    return write_log


def prep_seed_blocks(seeds: pa.Table, cfg: CrawlConfig, parallelism: int,
                     exact_dedup: bool = True, return_refs: bool = False):
    """Seed prep: annotate, exact first-wins dedup, sort by (frontier
    shard, seed_rank), emit shard-aligned blocks.

    The CPU-heavy parts (normalize/hash/shard-id) run in parallel Ray
    tasks; the driver does only vectorized numpy over fixed-width columns
    (``np.unique`` on the 64-bit url hashes for first-wins dedup — the
    same key the frontier seen-set dedups on — and one stable argsort on
    shard ids). Suits seed tables up to ~10^8 rows on one node; beyond
    that run the same steps as a Ray Data sort keyed on the shard id
    (documented scale path) or skip dedup entirely and let the frontier
    bloom shards absorb duplicates (cfg.seen_exact=False).
    """
    num_shards = cfg.num_frontier_shards

    @ray.remote(num_returns=2)
    def _annotate_slice(t: pa.Table, off: int, n: int):
        out = annotate_urls(t.slice(off, n))
        sid = host_shard_ids(out.column("host"), num_shards)
        out = out.append_column("shard_id", pa.array(sid, pa.int64()))
        hashes = out.column("url_hash").to_numpy(zero_copy_only=False)
        # second return: ONLY the compact dedup keys — the table itself
        # stays in the object store (the driver never gathers row data)
        return out, (np.asarray(hashes, dtype=np.uint64), sid)

    @ray.remote
    def _keep_masks(*small):
        """Global exact first-wins dedup barrier as ONE worker task: the
        driver launches it and moves on instead of ray.get-ing the wave-1
        keys and running np.unique serially (that get + unique + split
        was ~0.5s of driver-serial floor at 3M seeds). Rows are in
        seed_rank order, so the first occurrence per 64-bit url hash is
        the min-seed_rank winner (D1) — the identical key the frontier's
        exact seen-set uses. Returns one bool mask per wave-1 slice, or
        None when there are no duplicates at all."""
        hashes = np.concatenate([s[0] for s in small]) if small else \
            np.array([], dtype=np.uint64)
        _, first_idx = np.unique(hashes, return_index=True)
        if len(first_idx) == len(hashes):
            return None
        keep = np.zeros(len(hashes), dtype=bool)
        keep[first_idx] = True
        parts, off = [], 0
        for s in small:
            parts.append(keep[off: off + len(s[0])])
            off += len(s[0])
        return parts

    @ray.remote
    def _split_by_shard(n_shards: int, masks, mask_idxs, *tables):
        t = pa.concat_tables(tables)
        if masks is not None:
            # masks = the _keep_masks result for ALL slices; this group
            # selects its own slices' masks
            t = t.filter(pa.array(
                np.concatenate([masks[i] for i in mask_idxs])))
        sid = t.column("shard_id").to_numpy(zero_copy_only=False)
        t = t.drop_columns(["shard_id"])
        return tuple(t.filter(pa.array(sid == s)) for s in range(n_shards))

    n_slices = max(1, min(parallelism, seeds.num_rows // 2000 + 1))
    per = (seeds.num_rows + n_slices - 1) // n_slices
    # ONE plasma put of the seed table; tasks slice it zero-copy. Passing
    # per-task slices inline made the driver serialize n_slices arrow
    # tables back-to-back — ~1s of serial wave-launch time at 3M seeds.
    seeds_ref = ray.put(seeds)
    wave1 = [_annotate_slice.remote(seeds_ref, i * per, per)
             for i in range(n_slices)]
    tbl_refs = [w[0] for w in wave1]
    masks_ref = (_keep_masks.remote(*[w[1] for w in wave1])
                 if exact_dedup else None)

    # wave 2 groups CONSECUTIVE annotate slices so each (group, shard)
    # block lands near 8k rows — the measured sweet spot: blocks carry
    # ~2KB/row of html downstream (bigger blows worker heaps), while
    # halving block size costs ~30% throughput in per-task overhead
    # floor: ~min_blocks_per_cpu blocks per worker — one block per worker
    # runs small corpora as a single task wave whose makespan is the
    # SLOWEST block (shard-size skew makes blocks uneven; measured 5.0s
    # vs ~2s of mean work at 100k pages/32 cpus), a few waves let the
    # scheduler pack around the skew
    n_groups = int(np.clip(
        max(round(seeds.num_rows / (8192 * num_shards)),
            -(-cfg.min_blocks_per_cpu * parallelism // num_shards)),
        1, n_slices))
    groups = np.array_split(np.arange(n_slices), n_groups)
    wave2 = []
    for idxs in groups:
        wave2.append(_split_by_shard.options(num_returns=num_shards).remote(
            num_shards, masks_ref, [int(i) for i in idxs],
            *[tbl_refs[i] for i in idxs]))
    if num_shards == 1:  # num_returns=1 yields a bare ref, not a list
        wave2 = [[r] for r in wave2]
    # shard-major, seed-order-minor ref layout: every block holds one
    # shard's rows (single-RPC offers) and blocks within a shard keep
    # global seed order
    ordered = [wave2[g][s] for s in range(num_shards) for g in range(len(wave2))]
    if return_refs:
        shard_of_ref = [s for s in range(num_shards) for _ in range(len(wave2))]
        return ordered, shard_of_ref
    return ray.data.from_arrow_refs(ordered)


@ray.remote
def _concat_grants(*grants: dict) -> dict:
    """Merge per-block grant responses into one url_hash-sorted lookup.

    Compact fixed-width arrays only: 32 B per granted seed (~110 MB at 3M
    seeds) — one broadcast object, zero-copy-shared per node. This bounds
    the pre-offered-grant path to seed sets whose grant metadata fits a
    worker heap (~10^9 seeds); beyond that use the streaming offer stage
    (cfg.virtual_clock=False semantics) or the raydata seed-prep path.
    """
    h = np.concatenate([g["url_hash"] for g in grants]) if grants else \
        np.empty(0, dtype=np.uint64)
    order = np.argsort(h, kind="stable")
    return {
        "url_hash": h[order],
        "grant_seq": np.concatenate(
            [g["grant_seq"] for g in grants])[order] if grants else
            np.empty(0, dtype=np.int64),
        "sched_s": np.concatenate(
            [g["sched_s"] for g in grants])[order] if grants else
            np.empty(0, dtype=np.float64),
        "wait_s": np.concatenate(
            [g["wait_s"] for g in grants])[order] if grants else
            np.empty(0, dtype=np.float64),
        "attempt": np.concatenate(
            [g["attempt"] for g in grants])[order] if grants else
            np.empty(0, dtype=np.int32),
    }


def apply_grants_fn(grants_ref):
    """First pipeline stage of the pre-offered-grant path: join each seed
    block against the broadcast grant lookup by url_hash (position-free, so
    it is correct under any Ray Data batching/splitting of input blocks).
    Rows absent from the lookup were denied (dup/robots/suspended) and were
    already logged shard-side; they drop here exactly as the streaming
    offer stage drops them."""
    cache: dict = {}

    def apply(batch: pa.Table) -> pa.Table:
        g = cache.get("g")
        if g is None:
            g = cache["g"] = ray.get(grants_ref)
        if batch.num_rows == 0:
            return _empty_grant(batch, with_attempt=True)
        hashes = np.asarray(
            batch.column("url_hash").to_numpy(zero_copy_only=False),
            dtype=np.uint64)
        gh = g["url_hash"]
        pos = np.searchsorted(gh, hashes)
        pos_clip = np.minimum(pos, max(len(gh) - 1, 0))
        found = (gh[pos_clip] == hashes) if len(gh) else \
            np.zeros(len(hashes), dtype=bool)
        if not found.any():
            return _empty_grant(batch, with_attempt=True)
        taken = batch.filter(pa.array(found))
        names = ["discovered_seq" if n == "seed_rank" else n
                 for n in taken.column_names]
        taken = taken.rename_columns(names)
        sel = pos_clip[found]
        return (taken
                .append_column("grant_seq",
                               pa.array(g["grant_seq"][sel], pa.int64()))
                .append_column("sched_s",
                               pa.array(g["sched_s"][sel], pa.float64()))
                .append_column("wait_s",
                               pa.array(g["wait_s"][sel], pa.float64()))
                .append_column("attempt",
                               pa.array(g["attempt"][sel], pa.int32())))

    return apply


def prep_seed_blocks_raydata(seeds, cfg: CrawlConfig, parallelism: int,
                             exact_dedup: bool = True) -> ray.data.Dataset:
    """Seed prep as a pure Ray Data job — the documented >10^8-seed scale
    path (``cfg.seed_prep="raydata"``). Same semantics as
    ``prep_seed_blocks`` (annotate, exact first-wins dedup by url_hash ==
    min-seed_rank winner, (frontier shard, seed_rank) order) but nothing
    seed-sized ever touches the driver:

    - annotate + shard-id: ``map_batches``
    - first-wins dedup: keyed shuffle on ``url_hash % K`` coarse
      partitions (all occurrences of a hash land together), winner
      resolved with one vectorized sort+drop_duplicates per partition
    - layout: ``Dataset.sort`` on (shard_id, seed_rank) — blocks come out
      shard-contiguous; at most the two boundary rows' worth of a block
      spans two shards, which ``frontier_offer_fn``'s split path handles
      with one extra RPC per boundary block.

    The driver path stays the default: for seed tables that fit the
    driver (every sandbox corpus), two task waves + ``from_arrow_refs``
    beat a full Ray sort by seconds of fixed all-to-all overhead.
    """
    num_shards = cfg.num_frontier_shards
    n_dedup_parts = max(64, parallelism)
    ds = load_seeds(seeds, parallelism)

    def annotate_shard(batch: pa.Table) -> pa.Table:
        out = annotate_urls(batch)
        sid = host_shard_ids(out.column("host"), num_shards)
        return out.append_column("shard_id", pa.array(sid, pa.int64()))

    ds = ds.map_batches(annotate_shard, batch_format="pyarrow")

    if exact_dedup:
        def add_dk(batch: pa.Table) -> pa.Table:
            h = np.asarray(batch.column("url_hash").to_numpy(
                zero_copy_only=False), dtype=np.uint64)
            return batch.append_column(
                "dk", pa.array((h % np.uint64(n_dedup_parts)).astype(np.int64),
                               pa.int64()))

        def winners(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["url_hash", "seed_rank"], kind="stable")
            return g.drop_duplicates(subset="url_hash").drop(columns=["dk"])

        ds = (ds.map_batches(add_dk, batch_format="pyarrow")
              .groupby("dk").map_groups(winners, batch_format="pandas"))

    ds = ds.sort(["shard_id", "seed_rank"])
    return ds.map_batches(lambda b: b.drop_columns(["shard_id"]),
                          batch_format="pyarrow")


def load_seeds(seeds, parallelism: int | None = None) -> ray.data.Dataset:
    """Seed table -> Dataset, pre-split into blocks driver-side.

    Slicing the (small) seed table into blocks here avoids Ray's
    all-to-all ``repartition`` (seconds of fixed overhead per run for
    megabytes of data). Datasets and paths pass through untouched.
    """
    if isinstance(seeds, ray.data.Dataset):
        return seeds
    if isinstance(seeds, str):
        return ray.data.read_parquet(seeds)
    n_blocks = max(1, parallelism or 64)
    per = max(1, (seeds.num_rows + n_blocks - 1) // n_blocks)
    slices = [seeds.slice(i * per, per) for i in range(n_blocks)]
    return ray.data.from_arrow([s for s in slices if s.num_rows])


def preload_from_checkpoint(frontier, out_dir: str, num_shards: int) -> int:
    """Resume (J6 anti-join): stream the fetch_log checkpoint through Ray
    Data and preload each frontier shard's seen-set with the hashes of
    terminal rows — grouped per batch by the lineage ``partition_id`` (the
    owning shard), so no per-row RPCs and NOTHING post-sized ever lands on
    the driver (the old path concatenated the whole log into driver
    pandas; at 10^10 URLs the checkpoint outgrows the driver).

    Duplicate url_norms across files dedup inside the shard's seen-set.
    Returns the number of fresh hashes preloaded."""
    files = sorted(glob.glob(os.path.join(out_dir, "fetch_log", "*.parquet")))
    if not files:
        return 0
    ds = ray.data.read_parquet(
        files, columns=["url_norm", "host", "status"])

    def preload(batch: pa.Table) -> pa.Table:
        from ..functions.urlnorm import host_shard_ids, url_hash64_batch

        mask = pc.is_in(batch.column("status"),
                        value_set=pa.array(TERMINAL_STATUSES))
        sel = batch.filter(mask)
        # recompute the owning shard from the logged host with the CURRENT
        # hash family — the persisted partition_id was computed by the
        # original run, and the url-hash family (polars xxhash / blake2b
        # fallback) is not guaranteed stable across environments; routing
        # by a stale shard id would preload the wrong seen-set and
        # re-crawl duplicates (ADVICE r04)
        parts = host_shard_ids(sel.column("host"), num_shards)
        hashes = np.asarray(url_hash64_batch(sel.column("url_norm"))
                            .to_numpy(zero_copy_only=False), dtype=np.uint64)
        refs = [frontier[int(s)].preload_hashes.remote(hashes[parts == s])
                for s in np.unique(parts)]
        fresh = sum(ray.get(refs)) if refs else 0
        return pa.table({"fresh": pa.array([fresh], pa.int64())})

    out = ray.get(ds.map_batches(preload, batch_format="pyarrow")
                  .to_arrow_refs())
    return int(sum(t.column("fresh").to_numpy().sum() for t in out if t.num_rows))


def load_fetch_log(out_dir: str) -> pa.Table:
    """TEST-SCALE helper: concatenate the per-shard lineage files into one
    driver table; duplicate rows per url_norm (task retries, corrective
    late-status rows) are resolved by an explicit monotonic key — max
    (grant_seq, fetch_ts) wins — so the result does not depend on file
    enumeration order. Production paths never gather the log: resume
    streams it (``preload_from_checkpoint``) and the politeness query
    aggregates it per-host in Ray Data (``textops.q_politeness_summary``)."""
    files = sorted(glob.glob(os.path.join(out_dir, "fetch_log", "*.parquet")))
    if not files:
        from ..state.frontier import FETCH_LOG_SCHEMA
        return FETCH_LOG_SCHEMA.empty_table()
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    df = tbl.to_pandas()
    df = (df.sort_values(["grant_seq", "fetch_ts"], kind="stable")
          .drop_duplicates(subset=["url_norm"], keep="last")
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False,
                                schema=tbl.schema)


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
    import time as _time

    _timing = os.environ.get("GRC_TIMING")
    _marks = [("start", _time.perf_counter())]

    def _mark(name):
        if _timing:
            _marks.append((name, _time.perf_counter()))

    import uuid as _uuid

    cfg = cfg or CrawlConfig()
    run_id = _uuid.uuid4().hex[:12]
    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, "fetch_log")
    frontier = make_frontier(cfg, checkpoint_dir=ckpt)
    _mark("frontier_setup")

    if robots:
        waits = []
        for host, txt in robots.items():
            shard = frontier[url_hash64(host) % cfg.num_frontier_shards]
            waits.append(shard.set_robots.remote(host, txt))
        ray.get(waits)

    if rate_limited:
        # simulated-429 budgets live in the owning shard (single source of
        # truth per host; correct at any fetch parallelism)
        by_shard: dict[int, dict[str, int]] = {}
        for host, n in rate_limited.items():
            by_shard.setdefault(
                url_hash64(host) % cfg.num_frontier_shards, {})[host] = n
        ray.get([frontier[s].set_rate_limited.remote(m)
                 for s, m in by_shard.items()])

    if resume:
        preload_from_checkpoint(frontier, out_dir, cfg.num_frontier_shards)

    # corpus broadcast: one copy in the object store, shared by all fetchers.
    # callers running repeatedly (bench) may pass a pre-put
    # (corpus_ref, index_ref) tuple to amortize the put + index build.
    from ..stages.fetch import build_corpus_index

    if cfg.fetcher == "http":
        # live HTTP mode: no corpus to broadcast — fetch goes to the wire
        corpus_ref = index_ref = None
        _mark("corpus_load")
        _mark("corpus_put")
    elif isinstance(pages, tuple):
        corpus_ref, index_ref = pages
        _mark("corpus_load")
        _mark("corpus_put")
    else:
        if isinstance(pages, str):
            paths = sorted(glob.glob(os.path.join(pages, "*.parquet"))) or [pages]
            pages_tbl = pa.concat_tables([pq.read_table(p) for p in paths])
        else:
            pages_tbl = pages
        _mark("corpus_load")
        corpus_ref = ray.put(pages_tbl)
        index_ref = ray.put(build_corpus_index(pages_tbl))
        _mark("corpus_put")

    try:
        pre_granted = False
        seed_prep_mode = cfg.seed_prep
        if seed_prep_mode == "auto":
            # driver-assembled prep is measured-faster up to ~10^8 seeds
            # (two task waves beat a full Ray sort by seconds of fixed
            # all-to-all overhead); beyond the threshold every prep step
            # must be a Ray Data operator
            seed_prep_mode = ("raydata" if isinstance(seeds, pa.Table)
                              and seeds.num_rows > cfg.seed_prep_raydata_rows
                              else "driver")
        if seed_prep_mode == "raydata":
            # >10^8-seed scale path: every prep step is a Ray Data
            # operator (see prep_seed_blocks_raydata)
            ds = prep_seed_blocks_raydata(seeds, cfg, parallelism or 64,
                                          exact_dedup=cfg.seen_exact)
        elif isinstance(seeds, pa.Table) and cfg.virtual_clock \
                and cfg.seen_exact and cfg.pre_grant:
            # (seen_exact gate: the url_hash join treats hash equality as
            # identity, which is only bijective after the exact prep dedup;
            # in bloom mode a dup seed denied shard-side would still match
            # its original's grant here and be fetched twice)
            # seed prep (annotate + exact first-wins dedup + shard-aligned
            # block layout) happens up front: the seed table is tiny relative
            # to the pages it fans out to. With the VIRTUAL politeness clock
            # grants are deterministic, so the driver fires every shard
            # offer asynchronously right here (per-shard arrival order ==
            # seed order, exactly the serial reference's) and the pipeline
            # starts from already-granted blocks. Measured motivation: an
            # in-pipeline offer's ray.get holds a CPU slot idle ~370ms per
            # block while all cores run parse (7ms of actor work) — at 100k
            # pages/32cpus that wait was ~25% of wall. A live deployment
            # (virtual_clock=False) keeps the streaming offer stage, where
            # real time must elapse between grants.
            # Simulated-429 budgets (rate_limited) are consumed by the
            # owning shard AT OFFER TIME in this mode (deterministic under
            # the virtual clock; frontier.offer), so the fetch stage runs
            # budget-free — the hardened path and the scale path are the
            # same code.
            refs, ref_shards = prep_seed_blocks(seeds, cfg, parallelism or 64,
                                                exact_dedup=cfg.seen_exact,
                                                return_refs=True)
            _mark("seeds_prep_waves")
            grant_refs = [frontier[s].offer.remote(r, True)
                          for r, s in zip(refs, ref_shards)]
            grants_ref = _concat_grants.remote(*grant_refs)
            _mark("seeds_prep_offers")
            # from_arrow_refs blocks only on the cheap wave-2 split tasks;
            # grant computation overlaps pipeline startup, and the first
            # map stage joins by hash against the broadcast lookup.
            ds = ray.data.from_arrow_refs(refs)
            ds = ds.map_batches(apply_grants_fn(grants_ref),
                                batch_format="pyarrow")
            pre_granted = True
        elif isinstance(seeds, pa.Table):
            # interactive-politeness path (simulated 429s / live clock):
            # offers stay a streaming stage so backoff state evolves with
            # the pipeline. Shard-aligned blocks keep each offer ONE RPC.
            ds = prep_seed_blocks(seeds, cfg, parallelism or 64,
                                  exact_dedup=cfg.seen_exact)
        else:
            ds = load_seeds(seeds, parallelism)
            ds = ds.map_batches(_annotate, batch_format="pyarrow")
            if cfg.seen_exact:
                ds = ds.materialize()
                ds = dedup_first_wins(ds)
        _mark("seeds_prep")
        if not pre_granted:
            ds = ds.map_batches(frontier_offer_fn(frontier,
                                                  cfg.num_frontier_shards),
                                batch_format="pyarrow")
        from ..stages.fetch import make_corpus_fetch_fn, make_http_fetch_fn

        if cfg.fetcher == "http":
            ds = ds.map_batches(
                make_http_fetch_fn(frontier, cfg.num_frontier_shards,
                                   ua_seed=cfg.rng_seed,
                                   connect_timeout=cfg.http_connect_timeout,
                                   read_timeout=cfg.http_read_timeout,
                                   backoff_scale=cfg.http_backoff_scale),
                batch_format="pyarrow",
            )
        else:
            ds = ds.map_batches(
                make_corpus_fetch_fn(corpus_ref, index_ref, frontier,
                                     cfg.num_frontier_shards,
                                     # pre-offered grants already consumed the
                                     # 429 budgets shard-side (offer simulation)
                                     rate_limited=None if pre_granted
                                     else rate_limited,
                                     max_retries=cfg.max_retries),
                batch_format="pyarrow",
            )
        ds = ds.map_batches(parse_batch_fn, batch_size=cfg.parse_batch_size,
                            batch_format="pyarrow")
        os.makedirs(ckpt, exist_ok=True)
        ds = ds.map_batches(
            write_fetch_log_fn(ckpt, cfg.num_frontier_shards, run_id),
            batch_format="pyarrow")

        posts_dir = os.path.join(out_dir, "posts")
        ok_ds = ds.filter(expr="status == 'ok'")
        # zstd: the posts sink is disk-bandwidth-bound on a single box (~2GB
        # per million pages with snappy); zstd halves the bytes for ~free CPU
        ok_ds.write_parquet(posts_dir, compression="zstd")
        _mark("write")
        if os.environ.get("GRC_PRINT_STATS"):
            print(ok_ds.stats())

        _mark("drain")
        ray.get([s.flush_log.remote() for s in frontier])
        stats = ray.get([s.stats.remote() for s in frontier])
        metrics = {
            "granted": sum(s["granted"] for s in stats),
            "hosts": sum(s["hosts"] for s in stats),
            "suspended_hosts": sum(s["suspended_hosts"] for s in stats),
            "log_rows": sum(s["log_rows"] for s in stats),
            "shards": stats,
        }
        # status counts: denied rows from the shard logs + terminal statuses
        # from THIS run's lineage files (run_id-scoped glob — a resumed run
        # must not re-count rows earlier runs wrote), column-pruned read
        counts: dict[str, int] = {}
        for c in ray.get([s.status_counts.remote() for s in frontier]):
            for k, v in c.items():
                counts[k] = counts.get(k, 0) + v

        @ray.remote
        def _file_counts(paths: list[str]) -> dict:
            import collections as _c

            acc: _c.Counter = _c.Counter()
            for p in paths:
                acc.update(pq.read_table(p, columns=["status"])
                           .column("status").to_pylist())
            return dict(acc)

        files = glob.glob(os.path.join(ckpt, f"fetch_log-task-{run_id}-*.parquet"))
        n_tasks = max(1, min(len(files), parallelism or 32))
        chunks = [files[i::n_tasks] for i in range(n_tasks)]
        for c in ray.get([_file_counts.remote(ch) for ch in chunks if ch]):
            for k, v in c.items():
                counts[k] = counts.get(k, 0) + v
        if counts:
            metrics["status_counts"] = counts
        _mark("flush_metrics")
        if _timing:
            prev = _marks[0][1]
            for name, t in _marks[1:]:
                print(f"[phase] {name}: {t - prev:.2f}s")
                prev = t
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2, default=str)
    finally:
        # always reap the num_cpus=0 shard actors, even when the pipeline
        # raises — leaked shards would shadow the next run's state
        for s in frontier:
            ray.kill(s)
    return {"posts_dir": posts_dir, "fetch_log_dir": ckpt, "metrics": metrics}
