"""Bloom filter over 64-bit url hashes (numpy bit array, vectorized).

The scale path of the URL-seen set (SURVEY.md §2.7 D1): at 10^10-URL
frontier scale an exact set per shard does not fit; each frontier shard
holds one of these sized for its share. Double hashing (Kirsch–Mitzenmacher)
derives k probe positions from the high/low halves of the 64-bit key, so
membership tests are pure numpy over a whole batch.

The reference holds a single in-process ``set`` (url_deduplicator.py:53-62);
conformance runs use ``ExactSeen`` below to reproduce byte-identical
membership, bench/scale runs use ``BloomSeen`` (false-positive budget =
``fpp``; a false positive drops a page, never duplicates one).
"""

from __future__ import annotations

import math

import numpy as np


class BloomSeen:
    def __init__(self, capacity: int = 1 << 20, fpp: float = 1e-4):
        m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.n_bits = 1 << max(6, (m - 1).bit_length())  # power of two
        self.k = max(1, round(m / capacity * math.log(2)))
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)
        self.mask = np.uint64(self.n_bits - 1)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(len(hashes), k) probe positions via double hashing."""
        h1 = hashes & np.uint64(0xFFFFFFFF)
        h2 = (hashes >> np.uint64(32)) | np.uint64(1)  # odd step
        ks = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + ks * h2[:, None]) & self.mask

    def add_if_new(self, hashes: np.ndarray) -> np.ndarray:
        """Insert; return bool mask of keys that were NOT already present.

        First occurrence within the batch wins (duplicates later in the same
        batch report False). Fully vectorized: membership is tested against
        the pre-batch filter state, in-batch repeats are resolved with
        ``np.unique`` (first index per distinct hash), and all new keys' bits
        are set in one ``bitwise_or.at`` — no per-key Python loop.
        """
        hashes = np.asarray(hashes, dtype=np.uint64)
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)                    # (n, k)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        present = np.all((self.bits[word] >> bit) & np.uint64(1) == 1, axis=1)
        # in-batch dedup: only the FIRST occurrence of each distinct hash
        # may report fresh (later repeats must see it as present)
        _, first_idx = np.unique(hashes, return_index=True)
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        out = ~present & is_first
        if out.any():
            w = word[out].reshape(-1)
            b = bit[out].reshape(-1)
            np.bitwise_or.at(self.bits, w, np.uint64(1) << b)
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(hashes, dtype=np.uint64))
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        return np.all((self.bits[word] >> bit) & np.uint64(1) == 1, axis=1)

    def approx_len(self) -> int:
        ones = int(np.unpackbits(self.bits.view(np.uint8)).sum())
        if ones >= self.n_bits:
            return self.n_bits
        return int(-self.n_bits / self.k * math.log(1 - ones / self.n_bits))


class ExactSeen:
    """Exact seen-set shard (conformance path / small scale)."""

    def __init__(self, *_args, **_kwargs):
        self._seen: set[int] = set()

    def add_if_new(self, hashes: np.ndarray) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        seen = self._seen
        for i, h in enumerate(hashes.tolist()):
            if h not in seen:
                seen.add(h)
                out[i] = True
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        seen = self._seen
        return np.fromiter((h in seen for h in hashes.tolist()), dtype=bool, count=len(hashes))

    def approx_len(self) -> int:
        return len(self._seen)
