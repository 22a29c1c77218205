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
    """Stable unsigned 64-bit hash of a normalized URL — the seen-set /
    corpus-join / lineage key. Scalar form of ``url_hash64_batch`` (the
    polars-xxhash family; MUST stay the same function so per-host scalar
    call sites agree with the batch-annotated ``url_hash`` column).
    Synthetic non-URL keys (frontier jitter) use ``hashing.stable_hash64``
    instead — no family-consistency requirement, and blake2b is ~5x
    cheaper per single call than a 1-element polars Series."""
    from .hashing import hash_words_u64

    return int(hash_words_u64([url_norm])[0])


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
# Batch kernels (Arrow in / Arrow out) — vectorized: pyarrow RE2 kernels
# for normalize/host, the polars-xxhash word-hash primitive for the url
# hash (VERDICT r03 item 2: the per-row normalize/blake2b loops were the
# one sub-0.7-scaling seed-prep phase). Property-tested against the
# per-row reference implementations.
# ---------------------------------------------------------------------------

import pyarrow.compute as pc  # noqa: E402

# rows containing ';' (urlparse params), raw \t\n\r or C0 controls take the
# per-row reference path; everything else is 4 anchored RE2 passes
_WEIRD_RE = r"[;\x00-\x1f]"


def normalize_url_batch(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``normalize_url`` over an Arrow string array.

    Derivation (mirrors ``_normalize_fast``): trim+lower, drop everything
    from the first '#', then strip the trailing '/'s of the path — which
    sit either at end-of-string (no query) or immediately before the '?'
    — and drop a bare trailing '?' (urlunparse emits '?' only for a
    non-empty query). Rows with ';'/control characters fall back to the
    urlparse reference per row (rare by construction)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    s = pc.utf8_lower(pc.utf8_trim_whitespace(urls))
    out = pc.replace_substring_regex(s, r"(?s)#.*$", "")
    # strip the path's trailing '/'s, which sit immediately before the
    # FIRST '?': any match of /*\? ends at a '?', so the leftmost match
    # (max_replacements=1) is exactly the path/query boundary. NOTE all
    # passes here avoid RE2 capture groups + lazy quantifiers — the
    # anchored-capture forms used before round 5 measured ~10x slower
    # (2.0-2.6s vs 0.2-0.4s per pass on 3M urls)
    out = pc.replace_substring_regex(out, r"/*\?", "?", max_replacements=1)
    # a bare trailing '?' (empty query) is dropped ONLY when it is the
    # string's sole '?' — 'http://a/b?x=1?' keeps its query verbatim
    # (urlparse: query='x=1?'; the pre-r05 unanchored r"/*\?$" wrongly
    # stripped the final '?' of a non-empty query)
    only_q = pc.and_(pc.ends_with(out, "?"),
                     pc.equal(pc.count_substring(out, "?"), 1))
    out = pc.if_else(only_q,
                     pc.replace_substring_regex(out, r"\?$", ""), out)
    # no query at all -> the whole tail is path: strip trailing '/'s
    no_q = pc.equal(pc.count_substring(out, "?"), 0)
    out = pc.if_else(no_q,
                     pc.replace_substring_regex(out, r"/+$", ""), out)
    weird = pc.match_substring_regex(s, _WEIRD_RE)
    if pc.any(weird).as_py():
        vals = out.to_pylist()
        raw = urls.to_pylist()
        for i in np.flatnonzero(np.asarray(weird.to_numpy(zero_copy_only=False))):
            vals[i] = _normalize_fast(raw[i])
        return pa.array(vals, type=pa.string())
    return out


def extract_host_batch(norms: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``_host_fast`` over already-NORMALIZED urls: strip the
    scheme and cut at the first '/' or '?'; rows without an http(s) scheme
    pass through whole (RE2 leaves non-matching rows unchanged)."""
    if isinstance(norms, pa.ChunkedArray):
        norms = norms.combine_chunks()
    return pc.replace_substring_regex(
        norms, r"(?s)^https?://([^/?]*).*$", r"\1", max_replacements=1)


def url_hash64_batch(url_norms) -> pa.Array:
    """Stable 64-bit hashes for a url column, one vectorized call (the
    same polars-xxhash family as the dedup kernels; blake2b fallback
    without polars — see functions/hashing.py on determinism)."""
    from .hashing import hash_words_u64

    vals = url_norms if isinstance(url_norms, list) else url_norms.to_pylist()
    return pa.array(hash_words_u64(vals), type=pa.uint64())


def host_shard_ids(hosts: pa.Array | pa.ChunkedArray,
                   num_shards: int) -> np.ndarray:
    """Vectorized ``url_hash64(host) % num_shards`` over a host column:
    dictionary-encode (hosts repeat heavily), hash only the distinct
    values, gather through the indices."""
    enc = hosts.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dict_shards = (np.asarray(
        url_hash64_batch(enc.dictionary).to_numpy(zero_copy_only=False),
        dtype=np.uint64) % np.uint64(num_shards)).astype(np.int64)
    idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    return dict_shards[idx]


def annotate_urls(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``url_norm``, ``host``, ``url_hash`` columns to a batch.

    host is derived from the *normalized* URL so mixed-case variants of one
    URL map to one frontier shard.
    """
    urls = batch.column(url_col)
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    norms = normalize_url_batch(urls)
    hosts = extract_host_batch(norms)
    return (
        batch.append_column("url_norm", norms)
        .append_column("host", hosts)
        .append_column("url_hash", url_hash64_batch(norms))
    )
