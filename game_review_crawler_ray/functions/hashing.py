"""Hashing kernels for near-duplicate detection: shingles, MinHash,
SimHash, rolling (Karp–Rabin) fingerprints. Pure numpy, vectorized per
document; no Ray imports.

These back the training-data dedup operators (MinHash+LSH banding,
SimHash hamming buckets, n-gram Jaccard verification) — new capabilities
beyond the reference (SURVEY.md §2.7 notes near-dedup is ABSENT there).
All hash seeds are fixed so runs are deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE61 = np.uint64((1 << 61) - 1)
_N_PERM = 64
_BANDS = 8
_ROWS_PER_BAND = _N_PERM // _BANDS

_rng = np.random.default_rng(0x5EED)
# a*x32 + b stays < 2^64 for a < 2^29, x32 < 2^32, b < 2^61
_A = _rng.integers(1, 1 << 29, _N_PERM, dtype=np.uint64)
_B = _rng.integers(0, 1 << 29, _N_PERM, dtype=np.uint64)


def stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """32-bit hashes of k-word shingles (lowercased whitespace tokens)."""
    words = text.lower().split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, sh in enumerate(shingles):
        out[i] = stable_hash64(sh) & 0xFFFFFFFF
    return out


def char_ngrams(text: str, n: int = 3) -> set[str]:
    t = text.lower()
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = char_ngrams(a, n), char_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """(64,) uint64 signature; empty doc -> all MERSENNE61."""
    if len(shingle_hashes) == 0:
        return np.full(_N_PERM, MERSENNE61, dtype=np.uint64)
    # (n_perm, n_shingles) universal hashes mod 2^61-1
    vals = (_A[:, None] * shingle_hashes[None, :] + _B[:, None]) % MERSENNE61
    return vals.min(axis=1)


def minhash_bands(sig: np.ndarray) -> list[int]:
    """LSH band keys: one 64-bit hash per band of the signature."""
    out = []
    for b in range(_BANDS):
        chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
        out.append(stable_hash64(chunk.tobytes().hex()) & 0x7FFFFFFFFFFFFFFF)
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (count-weighted bit votes)."""
    votes = np.zeros(64, dtype=np.int64)
    for w in text.lower().split():
        h = stable_hash64(w)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        votes += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_chunks(h: int, n_chunks: int = 4) -> list[int]:
    """16-bit chunk keys: two docs within hamming distance < n_chunks share
    at least one identical chunk (pigeonhole)."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return [(c << 60) | ((h >> (c * width)) & mask) for c in range(n_chunks)]


def rolling_fingerprint(text: str, base: int = 1_000_003,
                        mod: int = (1 << 61) - 1) -> int:
    """Karp–Rabin rolling hash over the whole document (order-sensitive)."""
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h
