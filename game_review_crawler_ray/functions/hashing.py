"""Hashing kernels for near-duplicate detection: shingles, MinHash,
SimHash, rolling (Karp–Rabin) fingerprints. Pure numpy + a vectorized
string-hash primitive; no Ray imports.

These back the training-data dedup operators (MinHash+LSH banding,
SimHash hamming buckets, n-gram Jaccard verification) — new capabilities
beyond the reference (SURVEY.md §2.7 notes near-dedup is ABSENT there).
All hash seeds are fixed so runs are deterministic.

Word hashing is the dominant dedup cost (round-2 bench: per-shingle
blake2 in a Python loop dominated ``dedup_minhash``), so the primitive is
polars' xxhash over a whole token column at once — deterministic across
processes for a fixed seed + polars version; the values are internal LSH
keys, never a persisted contract. Without polars the memoized-blake2
fallback produces a different (equally valid) LSH family.
"""

from __future__ import annotations

import hashlib

import numpy as np

import os as _os

# Each Ray worker runs one batch at a time on its own CPU slot; letting
# polars spawn its full thread pool in every worker oversubscribes the
# node (32 tasks x N threads). Must be set before the first polars import
# in the process — hashing.py is imported before any polars use.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

try:
    import polars as _pl
except ImportError:  # pragma: no cover - polars is baked into the image
    _pl = None

MERSENNE61 = np.uint64((1 << 61) - 1)
_N_PERM = 64
_BANDS = 8
_ROWS_PER_BAND = _N_PERM // _BANDS
_HASH_SEED = 0x5EED

_rng = np.random.default_rng(0x5EED)
# a*x32 + b stays < 2^64 for a < 2^29, x32 < 2^32, b < 2^61
_A = _rng.integers(1, 1 << 29, _N_PERM, dtype=np.uint64)
_B = _rng.integers(0, 1 << 29, _N_PERM, dtype=np.uint64)

# position multipliers for order-sensitive shingle folds (odd constants)
_POS_MULT = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5,
                      0x85EBCA77C2B2AE63, 0x2545F4914F6CDD1D,
                      0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53],
                     dtype=np.uint64)

_BIT_IDX = np.arange(64, dtype=np.uint64)


def stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


_word_memo: dict[str, int] = {}


def hash_words_u64(words: list[str]) -> np.ndarray:
    """Stable 64-bit hashes for a token list, one vectorized call."""
    if not words:
        return np.empty(0, dtype=np.uint64)
    if _pl is not None:
        return _pl.Series(words, dtype=_pl.String).hash(seed=_HASH_SEED).to_numpy()
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = _word_memo.get(w)
        if h is None:
            if len(_word_memo) > (1 << 20):  # bound the vocabulary cache
                _word_memo.clear()
            h = _word_memo[w] = stable_hash64(w)
        out[i] = h
    return out


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized; uint64 wraps by numpy semantics)."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def shingle_hashes(word_hashes: np.ndarray, k: int = 3) -> np.ndarray:
    """32-bit k-word shingle hashes from per-word hashes: position-keyed
    multiply-xor fold over sliding windows (views, no copies) + splitmix64
    finalizer. Order-sensitive ("a b c" != "c b a"); < k words collapse to
    one whole-document shingle (same contract as the string join did)."""
    wh = np.asarray(word_hashes, dtype=np.uint64)
    n = len(wh)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        acc = np.bitwise_xor.reduce(wh * _POS_MULT[:n])
        return _mix64(np.array([acc], dtype=np.uint64)) & np.uint64(0xFFFFFFFF)
    m = n - k + 1
    acc = wh[0:m] * _POS_MULT[0]
    for j in range(1, k):
        acc = acc ^ (wh[j:j + m] * _POS_MULT[j % len(_POS_MULT)])
    return _mix64(acc) & np.uint64(0xFFFFFFFF)


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """32-bit hashes of k-word shingles (lowercased whitespace tokens)."""
    return shingle_hashes(hash_words_u64(text.lower().split()), k)


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


_BAND_SALT = _mix64(np.arange(_BANDS, dtype=np.uint64) + np.uint64(1))


def minhash_bands(sig: np.ndarray) -> list[int]:
    """LSH band keys: one 63-bit key per band, vectorized (multiply-xor
    fold of the band's 8 signature values, salted by band index so equal
    chunk contents in different bands land in different buckets)."""
    chunks = np.asarray(sig, dtype=np.uint64).reshape(_BANDS, _ROWS_PER_BAND)
    acc = np.bitwise_xor.reduce(chunks * _POS_MULT[None, :_ROWS_PER_BAND],
                                axis=1) ^ _BAND_SALT
    keys = _mix64(acc) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return [int(x) for x in keys]


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def simhash64_from_hashes(word_hashes: np.ndarray) -> int:
    """64-bit SimHash from per-word hashes (count-weighted bit votes),
    vectorized: (n_words, 64) bit matrix -> column vote sums."""
    wh = np.asarray(word_hashes, dtype=np.uint64)
    if len(wh) == 0:
        return 0
    bits = ((wh[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)).astype(np.int64)
    votes = 2 * bits.sum(axis=0) - len(wh)
    return int(np.bitwise_or.reduce(
        (votes > 0).astype(np.uint64) << _BIT_IDX))


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (count-weighted bit votes)."""
    return simhash64_from_hashes(hash_words_u64(text.lower().split()))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_chunks(h: int, n_chunks: int = 4) -> list[int]:
    """16-bit chunk keys: two docs within hamming distance < n_chunks share
    at least one identical chunk (pigeonhole)."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return [(c << 60) | ((h >> (c * width)) & mask) for c in range(n_chunks)]


def _rolling_fingerprint_py(text: str, base: int = 1_000_003,
                            mod: int = (1 << 61) - 1) -> int:
    """Reference Karp–Rabin loop (kept as the equivalence oracle for the
    vectorized path; also serves arbitrary ``mod`` values)."""
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h


def _modmul61(a: np.ndarray, b) -> np.ndarray:
    """(a * b) mod 2^61-1 for uint64 inputs < 2^61, without 128-bit ints:
    split both operands into 31/30-bit halves and reduce the cross terms
    with 2^61 ≡ 1 (Mersenne). All intermediates stay < 2^64."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    lo31 = np.uint64((1 << 31) - 1)
    a_hi, a_lo = a >> np.uint64(31), a & lo31
    b_hi, b_lo = b >> np.uint64(31), b & lo31
    mid = a_hi * b_lo + a_lo * b_hi                      # < 2^62
    mid_hi, mid_lo = mid >> np.uint64(30), mid & np.uint64((1 << 30) - 1)
    # a*b = a_hi*b_hi*2^62 + mid*2^31 + a_lo*b_lo;  2^62 ≡ 2, 2^61 ≡ 1
    s = (np.uint64(2) * a_hi * b_hi + mid_hi
         + (mid_lo << np.uint64(31)) + a_lo * b_lo)      # < 2^64
    s = (s >> np.uint64(61)) + (s & MERSENNE61)
    return s - (s >= MERSENNE61).astype(np.uint64) * MERSENNE61


def rolling_fingerprint(text: str, base: int = 1_000_003,
                        mod: int = (1 << 61) - 1) -> int:
    """Karp–Rabin rolling hash over the whole document (order-sensitive).

    Vectorized as a numpy binary polynomial fold: the code-point array
    (zero-padded at the FRONT to a power of two — leading zero
    coefficients don't change the polynomial value) is halved each round
    with ``v[2i]*p + v[2i+1]`` under mod-2^61-1 arithmetic, squaring the
    base power ``p`` per round — O(n) work in ~log2(n) vectorized passes
    instead of a per-character Python loop (pinned to the loop's exact
    values by golden + property tests)."""
    # the no-mod level-1 fold below is only exact for small bases
    # (code points < 2^21, so v*base + v < 2^42 needs base < 2^20, and the
    # one-subtraction reduction per level needs level-1 values < 2 mod);
    # larger custom bases take the fully-reduced per-char path
    if mod != (1 << 61) - 1 or len(text) < 64 or (base % mod) >= (1 << 20):
        return _rolling_fingerprint_py(text, base, mod)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    n = len(codes)
    size = 1 << (n - 1).bit_length()
    v = np.zeros(size, dtype=np.uint64)
    v[size - n:] = codes
    # level 1 is exact WITHOUT modular arithmetic: code points < 2^21 and
    # base < 2^20, so v[2i]*base + v[2i+1] < 2^42 — this skips a _modmul61
    # pass over the largest array (half the total modular work)
    p = np.uint64(base % mod)
    v = v[0::2] * p + v[1::2]
    p = _modmul61(p, p)
    while len(v) > 1:
        v = _modmul61(v[0::2], p) + v[1::2]
        v -= (v >= MERSENNE61).astype(np.uint64) * MERSENNE61
        p = _modmul61(p, p)
    return int(v[0])
