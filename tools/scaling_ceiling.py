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
    python tools/scaling_ceiling.py --with-sink  # augmented ceiling (below)
    GRAFT_SCALING_LEVELS=4,16 python tools/scaling_ceiling.py
    python tools/scaling_ceiling.py --one-level 8   # (internal)

Prints one JSON line; record the result in BASELINE.md next to the
engine's bench.py --scaling numbers.

``--with-sink`` (augmented ceiling): same raw-task kernel plus the
engine's per-page sink work — assemble the parsed records into an Arrow
table and write zstd parquet to tmpfs, exactly what the crawl's fused
operator does after parsing. Still no Ray Data, no shuffles, no driver
work. The delta between the pure ceiling and this variant bounds how
much of the engine-vs-ceiling gap is the workload's inherent byte
footprint (memory-bandwidth of row assembly + compression under 32
active cores) rather than engine orchestration.
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


def _one_level(num_cpus: int, with_sink: bool = False) -> None:
    import shutil

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

    sink_dir = "/dev/shm/grc_ceiling_sink"

    @ray.remote
    def parse_chunk(chunk, chunk_id: int, sink: str | None) -> int:
        from game_review_crawler_ray.functions.parsers import (
            ParseFailure, ParserRegistry, parse_page,
        )
        from game_review_crawler_ray.stages.parse import POST_COLUMNS

        urls, htmls = chunk
        reg = ParserRegistry()
        ok = 0
        records = [] if sink else None
        for u, h in zip(urls, htmls):
            try:
                rec = parse_page(h.decode("utf-8") if isinstance(h, bytes)
                                 else h, u, registry=reg)
                ok += 1
                if sink is not None:
                    records.append(rec)
            except ParseFailure:
                pass
        if sink is not None and records:
            # the same sink work the crawl's fused op does per task:
            # columnar assembly with the engine's own POST_COLUMNS types
            # (comments as list<struct>, created_at as timestamp) + zstd
            # parquet — byte-for-byte the posts sink's encoder workload
            names = ["url", "keyword"]
            arrays = [pa.array([r["url"] for r in records], pa.string()),
                      pa.array([r["keyword"] for r in records], pa.string())]
            for name, typ in POST_COLUMNS:
                names.append(name)
                arrays.append(pa.array([r[name] for r in records], typ))
            pq.write_table(pa.Table.from_arrays(arrays, names=names),
                           os.path.join(sink, f"part-{chunk_id:04d}.parquet"),
                           compression="zstd")
        return ok

    def wave() -> float:
        if with_sink:
            shutil.rmtree(sink_dir, ignore_errors=True)
            os.makedirs(sink_dir, exist_ok=True)
        t0 = time.perf_counter()
        ray.get([parse_chunk.remote(r, i, sink_dir if with_sink else None)
                 for i, r in enumerate(refs)])
        return time.perf_counter() - t0

    wave()                       # warmup: worker pool + imports
    best = min(wave() for _ in range(2))
    if with_sink:
        shutil.rmtree(sink_dir, ignore_errors=True)
    print(json.dumps({"num_cpus": num_cpus, "pages": n,
                      "pages_per_sec": round(n / best, 1),
                      "elapsed_s": round(best, 3)}))
    ray.shutdown()


def _run_one_level(cmd: list[str]) -> float:
    """Run one --one-level subprocess and extract its pages_per_sec.

    Ray occasionally emits warnings on stdout after (or instead of) the
    result line, which killed two measurement windows in round 5 — so scan
    stdout for the JSON result rather than trusting the last line, and
    retry a crashed subprocess once before giving up.
    """
    stderr_tail = ""
    for _ in range(2):
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600,
            env=os.environ.copy(),
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "pages_per_sec" in obj:
                return obj["pages_per_sec"]
        stderr_tail = (proc.stderr or "")[-2000:]
    raise RuntimeError(
        f"{' '.join(cmd)} produced no JSON result line in 2 attempts; "
        f"stderr tail:\n{stderr_tail}")


def main() -> None:
    with_sink = "--with-sink" in sys.argv
    if "--one-level" in sys.argv:
        _one_level(int(sys.argv[sys.argv.index("--one-level") + 1]),
                   with_sink=with_sink)
        return

    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    levels = tuple(int(x) for x in os.environ.get(
        "GRAFT_SCALING_LEVELS", "8,32").split(","))
    _corpus_dir()  # build the cache before timing anything
    series: dict[int, list[float]] = {levels[0]: [], levels[1]: []}
    for _ in range(reps):
        for cpus in levels:
            cmd = [sys.executable, __file__, "--one-level", str(cpus)]
            if with_sink:
                cmd.append("--with-sink")
            series[cpus].append(_run_one_level(cmd))
    lo, hi = levels
    thr_lo, thr_hi = max(series[lo]), max(series[hi])
    eff = (thr_hi / thr_lo) / (hi / lo)
    kind = ("parse+sink kernel scaling (augmented ceiling: adds the "
            "engine's row-assembly + zstd parquet sink work)") if with_sink \
        else "parse kernel scaling"
    print(json.dumps({
        "metric": f"pure-compute {kind} {lo}->{hi} cpus"
                  + ("" if with_sink else " (machine ceiling)"),
        "value": round(eff, 4), "unit": "efficiency",
        f"pages_per_sec_{lo}": round(thr_lo, 1),
        f"pages_per_sec_{hi}": round(thr_hi, 1),
        f"series_{lo}": series[lo], f"series_{hi}": series[hi],
    }))


if __name__ == "__main__":
    main()
