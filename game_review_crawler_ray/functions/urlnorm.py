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


# ---------------------------------------------------------------------------
# Batch kernels (Arrow in / Arrow out)
# ---------------------------------------------------------------------------

def normalize_url_batch(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalize over an Arrow string array.

    urllib parsing is inherently per-string Python; we keep it batch-level
    (one Python loop per *block*, not per row in a driver loop) which is the
    idiomatic Ray Data shape for non-SIMD string logic.
    """
    return pa.array([normalize_url(u) for u in urls.to_pylist()], type=pa.string())


def extract_host_batch(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pa.array([extract_host(u) for u in urls.to_pylist()], type=pa.string())


def url_hash64_batch(url_norms: pa.Array | pa.ChunkedArray) -> pa.Array:
    out = np.empty(len(url_norms), dtype=np.uint64)
    for i, u in enumerate(url_norms.to_pylist()):
        out[i] = url_hash64(u)
    return pa.array(out, type=pa.uint64())


def annotate_urls(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``url_norm``, ``host``, ``url_hash`` columns to a batch."""
    urls = batch.column(url_col)
    norm = normalize_url_batch(urls)
    host = extract_host_batch(urls)
    h = url_hash64_batch(norm)
    return (
        batch.append_column("url_norm", norm)
        .append_column("host", host)
        .append_column("url_hash", h)
    )
