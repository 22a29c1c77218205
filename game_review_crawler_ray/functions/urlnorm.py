"""URL normalization / host extraction — pure, per-batch vectorizable.

Semantics match the reference crawler's URL handling:

- ``normalize_url``: lowercase + strip, drop fragment, rstrip trailing "/"
  from the path, keep query/params (reference:
  ``crawler/utils/url_deduplicator.py:14-37``).
- ``extract_host``: ``urlparse(url).netloc`` (reference:
  ``crawler/utils/rate_limiter.py:60-72``, ``crawler/content_crawler.py:105-108``).
- ``url_hash64``: stable 64-bit hash used to shard the URL-seen set and to
  key lineage partitions (new capability; the reference keeps a single
  in-process ``set``).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlparse, urlunparse

import numpy as np
import pyarrow as pa


def normalize_url(url: str) -> str:
    """Normalize one URL exactly like the reference dedup helper."""
    try:
        parsed = urlparse(url.strip().lower())
        return urlunparse(
            (
                parsed.scheme,
                parsed.netloc,
                parsed.path.rstrip("/"),
                parsed.params,
                parsed.query,
                "",  # drop fragment
            )
        )
    except Exception:
        return url.strip().lower()


def extract_host(url: str) -> str:
    """Host (netloc) of a URL; the politeness / frontier shard key.

    Case-insensitive on the scheme (unlike rate_limiter.py:69-72, whose
    startswith check misses "HTTPS://"): the host is the engine's partition
    key, so mixed-case variants of one URL must map to one shard.
    """
    low = url.strip().lower()
    if low.startswith(("http://", "https://")):
        return urlparse(low).netloc
    return low


def url_hash64(url_norm: str) -> int:
    """Stable unsigned 64-bit hash of a normalized URL (seen-set key)."""
    return int.from_bytes(hashlib.blake2b(url_norm.encode("utf-8"), digest_size=8).digest(), "big")


_C0_SPACE = "".join(chr(c) for c in range(0x21))


def _normalize_fast(url: str) -> str:
    """Fast path of ``normalize_url`` for URLs without ';' (urlparse's
    params separator): identical output, ~10x cheaper than urlparse.

    Derivation: lower+strip, drop everything from '#', rstrip '/' from the
    part before '?' (the path), keep the query — which is exactly what
    urlunparse(scheme, netloc, path.rstrip('/'), params, query, '') yields
    when params is empty. Property-tested against ``normalize_url``.
    """
    s = url.strip().lower()
    if s and min(s) <= " ":
        # urlparse's WHATWG pre-cleanup: drop \t\n\r everywhere, lstrip C0
        # controls + space (observed CPython 3.11 urlsplit behavior)
        s = s.replace("\t", "").replace("\n", "").replace("\r", "")
        s = s.lstrip(_C0_SPACE)
    if ";" in s:
        return normalize_url(url)
    i = s.find("#")
    if i >= 0:
        s = s[:i]
    q = s.find("?")
    if q >= 0:
        query = s[q + 1:]
        left = s[:q].rstrip("/")
        # urlunparse emits '?' only for a non-empty query
        return left + ("?" + query if query else "")
    return s.rstrip("/")


def _host_fast(norm: str) -> str:
    """``extract_host`` on an already-normalized (lowercased) URL."""
    if norm.startswith("http://"):
        rest = norm[7:]
    elif norm.startswith("https://"):
        rest = norm[8:]
    else:
        return norm
    for sep in ("/", "?"):
        j = rest.find(sep)
        if j >= 0:
            rest = rest[:j]
    return rest


# ---------------------------------------------------------------------------
# Batch kernels (Arrow in / Arrow out)
# ---------------------------------------------------------------------------

def normalize_url_batch(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalize over an Arrow string array.

    Batch-level Python loop over the fast path (one loop per *block*, never
    per row on the driver) — the idiomatic Ray Data shape for string logic
    that has no SIMD kernel.
    """
    return pa.array([_normalize_fast(u) for u in urls.to_pylist()], type=pa.string())


def extract_host_batch(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pa.array([extract_host(u) for u in urls.to_pylist()], type=pa.string())


def url_hash64_batch(url_norms: pa.Array | pa.ChunkedArray) -> pa.Array:
    out = np.empty(len(url_norms), dtype=np.uint64)
    for i, u in enumerate(url_norms.to_pylist()):
        out[i] = url_hash64(u)
    return pa.array(out, type=pa.uint64())


def annotate_urls(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``url_norm``, ``host``, ``url_hash`` columns to a batch.

    host is derived from the *normalized* URL so mixed-case variants of one
    URL map to one frontier shard.
    """
    urls = batch.column(url_col).to_pylist()
    norms = [_normalize_fast(u) for u in urls]
    hosts = [_host_fast(n) for n in norms]
    out = np.empty(len(norms), dtype=np.uint64)
    for i, u in enumerate(norms):
        out[i] = url_hash64(u)
    return (
        batch.append_column("url_norm", pa.array(norms, pa.string()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("url_hash", pa.array(out, pa.uint64()))
    )
