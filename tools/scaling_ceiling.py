"""Machine-ceiling control for the N->4N scaling measurement.

The engine's measured 8->32 efficiency (bench.py --scaling) has been
blamed on shared-silicon inflation (per-page CPU grows 1.4-1.5x with
active-worker count at >88% user time). This script BOUNDS that claim:
it runs a pure-compute, embarrassingly parallel kernel — the real parse
tokenizer over in-memory html blocks, as raw ``ray.remote`` tasks with
NO Ray Data, no actors, no shuffles, no I/O and no driver work in the
timed region — under the same interleaved best-of protocol at the same
two CPU levels. No workload can scale better than this on this box, so
its efficiency is the machine ceiling; the engine's efficiency divided
by it is the engine's algorithmic scaling quality.

Usage:
    python tools/scaling_ceiling.py            # interleaved 8 vs 32
    GRAFT_SCALING_LEVELS=4,16 python tools/scaling_ceiling.py
    python tools/scaling_ceiling.py --one-level 8   # (internal)

Prints one JSON line; record the result in BASELINE.md next to the
engine's bench.py --scaling numbers.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHUNKS = 256


def _corpus_dir() -> str:
    from bench import ensure_bench_corpus, sf_of

    sf = sf_of(os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    return ensure_bench_corpus(sf)


def _one_level(num_cpus: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")

    corpus = _corpus_dir()
    pages = pa.concat_tables([
        pq.read_table(f, columns=["url", "html"])
        for f in sorted(glob.glob(os.path.join(corpus, "pages-*.parquet")))])
    n = pages.num_rows
    per = (n + N_CHUNKS - 1) // N_CHUNKS
    refs = []
    for i in range(N_CHUNKS):
        c = pages.slice(i * per, per)
        if c.num_rows:
            refs.append(ray.put((c.column("url").to_pylist(),
                                 c.column("html").to_pylist())))
    del pages

    @ray.remote
    def parse_chunk(chunk) -> int:
        from game_review_crawler_ray.functions.parsers import (
            ParseFailure, ParserRegistry, parse_page,
        )
        urls, htmls = chunk
        reg = ParserRegistry()
        ok = 0
        for u, h in zip(urls, htmls):
            try:
                parse_page(h.decode("utf-8") if isinstance(h, bytes) else h,
                           u, registry=reg)
                ok += 1
            except ParseFailure:
                pass
        return ok

    def wave() -> float:
        t0 = time.perf_counter()
        ray.get([parse_chunk.remote(r) for r in refs])
        return time.perf_counter() - t0

    wave()                       # warmup: worker pool + imports
    best = min(wave() for _ in range(2))
    print(json.dumps({"num_cpus": num_cpus, "pages": n,
                      "pages_per_sec": round(n / best, 1),
                      "elapsed_s": round(best, 3)}))
    ray.shutdown()


def main() -> None:
    if "--one-level" in sys.argv:
        _one_level(int(sys.argv[sys.argv.index("--one-level") + 1]))
        return

    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    levels = tuple(int(x) for x in os.environ.get(
        "GRAFT_SCALING_LEVELS", "8,32").split(","))
    _corpus_dir()  # build the cache before timing anything
    series: dict[int, list[float]] = {levels[0]: [], levels[1]: []}
    for _ in range(reps):
        for cpus in levels:
            proc = subprocess.run(
                [sys.executable, __file__, "--one-level", str(cpus)],
                capture_output=True, text=True, timeout=3600,
                env=os.environ.copy(),
            )
            line = proc.stdout.strip().splitlines()[-1]
            series[cpus].append(json.loads(line)["pages_per_sec"])
    lo, hi = levels
    thr_lo, thr_hi = max(series[lo]), max(series[hi])
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(json.dumps({
        "metric": f"pure-compute parse kernel scaling {lo}->{hi} cpus "
                  "(machine ceiling)",
        "value": round(eff, 4), "unit": "efficiency",
        f"pages_per_sec_{lo}": round(thr_lo, 1),
        f"pages_per_sec_{hi}": round(thr_hi, 1),
        f"series_{lo}": series[lo], f"series_{hi}": series[hi],
    }))


if __name__ == "__main__":
    main()
