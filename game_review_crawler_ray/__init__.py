"""game_review_crawler_ray — a Ray-Data-native crawl + analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference crawler (``hcsung-aws/game-review-crawler``), re-expressed as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, with actor pools for the stateful URL-frontier / politeness /
seen-set stages.

Design (see SURVEY.md for the full blueprint):

- ``functions/``  pure, vectorizable per-batch kernels (url normalization,
  HTML extraction, sentiment, tokenization, scoring) — no Ray imports.
- ``state/``      stateful distributed components: sharded frontier actors
  (per-host politeness + bloom/exact URL-seen shards), bloom filter.
- ``sources/``    corpus generation (deterministic Common-Crawl-style pages
  table) and seed lists.
- ``stages/``     Ray Data stage wrappers (fetch, parse, sentiment, dedup,
  ANN, multimodal) — callable classes for ``map_batches`` actor pools.
- ``pipelines/``  end-to-end pipelines (crawl, analytics, text ops).
"""

__version__ = "0.1.0"
