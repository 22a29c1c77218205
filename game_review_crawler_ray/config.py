"""Engine configuration.

``CrawlConfig`` mirrors the reference's ``CrawlerConfig`` politeness budget
(``crawler/models/data_models.py:149-197``) and adds the knobs a distributed
frontier needs (shard counts, batch sizes, rng seed for deterministic
jitter). Defaults equal the reference's defaults.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    # politeness budget (reference defaults, data_models.py:160-165)
    default_delay: float = 3.0
    max_retries: int = 3
    jitter_range: tuple[float, float] = (0.5, 2.0)
    relevance_threshold: float = 0.5
    max_comment_pages: int = 3
    cache_ttl: int = 3600

    # per-host delay overrides (rate_limiter.py:74-85)
    host_delays: dict[str, float] = field(default_factory=dict)

    # deterministic jitter / UA rotation seed — the reference uses an
    # unseeded ``random`` (rate_limiter.py:152, content_crawler.py:103);
    # we pin a seed so runs and the conformance simulator agree.
    rng_seed: int = 42

    # jitter on/off (rate_limiter.py:49)
    jitter_enabled: bool = True

    # --- distributed-engine knobs (new) ---
    num_frontier_shards: int = 8       # hash(host) % shards
    fetch_concurrency: int = 8         # fetch actor pool size
    parse_batch_size: int = 256
    seen_exact: bool = True            # exact seen-set (conformance) vs bloom
    # seed-prep strategy: "auto" picks by seed count; "driver" (two task
    # waves + from_arrow_refs; driver touches only fixed-width hash/shard
    # arrays — measured faster up to ~10^8 seeds) or "raydata"
    # (annotate/dedup/sort all as Ray Data operators — the >10^8 scale
    # path; see prep_seed_blocks_raydata)
    seed_prep: str = "auto"
    seed_prep_raydata_rows: int = 50_000_000
    # minimum seed blocks per CPU: small corpora (blocks ~ parallelism)
    # otherwise run as ONE task wave whose makespan is the SLOWEST block
    # (shard-size skew makes blocks uneven); ~3 waves lets the scheduler
    # pack around the skew. Large corpora ignore this (8k-row cap rules).
    min_blocks_per_cpu: int = 3
    # pre-offer all grants from the driver when the virtual clock makes
    # them deterministic (no actor RPC inside the fused pipeline). False
    # forces the streaming offer stage; outputs are identical (pinned by
    # tests/test_crawl_e2e.py equivalence test).
    pre_grant: bool = True
    bloom_capacity: int = 1 << 20      # per-shard expected insertions
    bloom_fpp: float = 1e-4
    # virtual politeness clock: grant times are simulated deterministically
    # instead of sleeping (corpus-backed fetch has no real remote to protect;
    # a live HTTP deployment sets this False to enforce wall-clock pacing).
    virtual_clock: bool = True
    # fetch stage: "corpus" (object-store lookup over the pages table) or
    # "http" (live requests.Session per worker; pages input is ignored).
    fetcher: str = "corpus"
    http_connect_timeout: float = 10.0   # content_crawler.py:79
    http_read_timeout: float = 30.0      # content_crawler.py:80
    # scale on the 2^retry-second inline 429 backoff sleep (1.0 = the
    # reference's 2,4,8 s; tests shrink it — the retry/suspension state
    # machine is unaffected)
    http_backoff_scale: float = 1.0

    def __post_init__(self) -> None:
        jmin, jmax = self.jitter_range
        if jmin < 0 or jmin > jmax:
            raise ValueError("invalid jitter_range")
