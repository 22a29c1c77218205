"""Per-worker memoization for cheap-state map stages.

A ``map_batches`` stage whose setup is only a couple of dicts or a
seeded matrix does not need an actor pool: Ray reuses worker processes
across tasks, so memoizing the instance in module state gives the same
once-per-worker setup without the pool's spin-up (measured ~2s for a
(2,32) pool — dominant on 1-3s queries). Keep REAL actor pools for
genuinely expensive state (models, codecs): see stages/multimodal.py.
"""

from __future__ import annotations

from typing import Callable

_MEMO: dict = {}


def memoized_stage(key, factory: Callable):
    """Return a task-pool map fn that lazily builds ``factory()`` once per
    worker process under ``key`` and applies it to each batch."""

    def fn(batch):
        inst = _MEMO.get(key)
        if inst is None:
            if len(_MEMO) > 16:
                _MEMO.clear()
            inst = _MEMO[key] = factory()
        return inst(batch)

    return fn
