"""Live-HTTP fetch path (S1/T6) against a loopback ``http.server``:

- full-crawl output byte-identical to the corpus-backed fetcher on the
  same pages,
- real HTTP 429 responses drive the frontier's exponential-backoff state
  machine (retry -> success resets the counter; max_retries consecutive
  429s suspend the host and skip its remaining URLs),
- 404 maps to the corpus fetcher's "not_found".

Reference semantics: content_crawler.py:60-178, rate_limiter.py:213-268.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow.parquet as pq

from game_review_crawler_ray.config import CrawlConfig
from game_review_crawler_ray.pipelines.crawl import load_fetch_log, run_crawl
from game_review_crawler_ray.sources.corpus import gen_pages
from game_review_crawler_ray.sources.seeds import gen_seeds


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"   # keep-alive (session reuse is real)

    def do_GET(self):  # noqa: N802 (stdlib API)
        srv = self.server
        with srv.lock:
            budget = srv.rate_429_budget
            if budget > 0:
                srv.rate_429_budget = budget - 1
                srv.n_429_served += 1
                body = b""
                self.send_response(429)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            body = srv.pages.get(self.path)
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


class _LoopbackServer:
    """ThreadingHTTPServer wrapper holding the page map + a global
    429 budget (consumed across ALL requests — one 'domain')."""

    def __init__(self, pages: dict[str, bytes], rate_429_budget: int = 0):
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self.httpd.pages = pages
        self.httpd.rate_429_budget = rate_429_budget
        self.httpd.n_429_served = 0
        self.httpd.lock = threading.Lock()
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()
        host, port = self.httpd.server_address
        self.base = f"http://{host}:{port}"

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def _loopback_corpus(n_pages: int, base: str | None = None, seed: int = 31):
    """gen_pages HTML re-keyed to loopback paths: (pages table with
    loopback urls, {path: html bytes})."""
    import pyarrow as pa

    pages, _expected = gen_pages(n_pages, n_hosts=4, seed=seed)
    htmls = pages.column("html").to_pylist()
    paths = [f"/p{i}" for i in range(len(htmls))]
    serve = dict(zip(paths, htmls))
    placeholder = "http://PLACEHOLDER"  # rewritten once the port is known
    tbl = pa.table({
        "url": pa.array([f"{base or placeholder}{p}" for p in paths],
                        pa.string()),
        "warc_ts": pages.column("warc_ts"),
        "html": pages.column("html"),
    })
    return tbl, serve


def test_http_crawl_byte_identical_to_corpus(tmp_path):
    pages0, serve = _loopback_corpus(60)
    srv = _LoopbackServer(serve)
    try:
        import pyarrow as pa

        urls = [u.replace("http://PLACEHOLDER", srv.base)
                for u in pages0.column("url").to_pylist()]
        pages = pages0.set_column(0, "url", pa.array(urls, pa.string()))
        seeds = gen_seeds(urls, seed=31)

        cfg_http = CrawlConfig(num_frontier_shards=2, fetcher="http",
                               http_backoff_scale=0.0)
        res_http = run_crawl(None, seeds, str(tmp_path / "http"), cfg_http)
        cfg_corp = CrawlConfig(num_frontier_shards=2)
        res_corp = run_crawl(pages, seeds, str(tmp_path / "corp"), cfg_corp)

        t_http = pq.read_table(res_http["posts_dir"])
        t_corp = pq.read_table(res_corp["posts_dir"])
        assert t_http.num_rows == t_corp.num_rows > 0
        # warc_ts differs by design (fetch time vs corpus timestamp)
        cols = [c for c in t_corp.column_names if c != "warc_ts"]
        a = t_http.select(cols).sort_by("url")
        b = t_corp.select(cols).sort_by("url")
        assert a.equals(b)   # html bytes AND parsed fields byte-identical
    finally:
        srv.stop()


def test_http_429_retry_then_success(tmp_path):
    pages0, serve = _loopback_corpus(8, seed=32)
    srv = _LoopbackServer(serve, rate_429_budget=2)   # two real 429s
    try:
        urls = [u.replace("http://PLACEHOLDER", srv.base)
                for u in pages0.column("url").to_pylist()]
        seeds = gen_seeds(urls, seed=32, dup_every=10**9)
        cfg = CrawlConfig(num_frontier_shards=2, max_retries=3,
                          fetcher="http", http_backoff_scale=0.01)
        res = run_crawl(None, seeds, str(tmp_path / "out"), cfg)
        assert srv.httpd.n_429_served == 2       # budget really consumed
        log = load_fetch_log(str(tmp_path / "out"))
        rows = log.to_pylist()
        # every URL recovered: fetch-level outcome is ok for all of them
        # (a handful may then be parse_failed — fetch succeeded regardless)
        assert all(r["status"] in ("ok", "parse_failed") for r in rows)
        assert len(rows) == len(urls)
        # the 2 rate-limit retries are visible in the attempt counts
        assert sum(r["attempt"] - 1 for r in rows) == 2
        assert max(r["attempt"] for r in rows) >= 2
    finally:
        srv.stop()


def test_http_429_suspension_skips_host(tmp_path):
    pages0, serve = _loopback_corpus(8, seed=33)
    srv = _LoopbackServer(serve, rate_429_budget=10**9)   # never recovers
    try:
        urls = [u.replace("http://PLACEHOLDER", srv.base)
                for u in pages0.column("url").to_pylist()]
        seeds = gen_seeds(urls, seed=33, dup_every=10**9)
        cfg = CrawlConfig(num_frontier_shards=2, max_retries=2,
                          fetcher="http", http_backoff_scale=0.0)
        res = run_crawl(None, seeds, str(tmp_path / "out"), cfg,
                        parallelism=1)
        import glob
        import os

        # the whole host suspended -> zero post files written
        files = glob.glob(os.path.join(res["posts_dir"], "*.parquet"))
        n_posts = sum(pq.read_table(f).num_rows for f in files)
        assert n_posts == 0
        # at least max_retries+1 real 429s were served before suspension
        # (parallel fetch tasks may each absorb one extra 429 in flight)
        assert srv.httpd.n_429_served >= cfg.max_retries + 1
        log = load_fetch_log(str(tmp_path / "out"))
        statuses = {r["status"] for r in log.to_pylist()}
        assert "suspended" in statuses
        assert "ok" not in statuses
    finally:
        srv.stop()


def test_http_404_maps_to_not_found(tmp_path):
    pages0, serve = _loopback_corpus(4, seed=34)
    srv = _LoopbackServer(serve)
    try:
        urls = [u.replace("http://PLACEHOLDER", srv.base)
                for u in pages0.column("url").to_pylist()]
        urls.append(f"{srv.base}/missing-page")
        seeds = gen_seeds(urls, seed=34, dup_every=10**9)
        cfg = CrawlConfig(num_frontier_shards=2, fetcher="http")
        run_crawl(None, seeds, str(tmp_path / "out"), cfg)
        log = load_fetch_log(str(tmp_path / "out"))
        by_url = {r["url"]: r["status"] for r in log.to_pylist()}
        assert by_url[f"{srv.base}/missing-page"] == "not_found"
        served = [s for u, s in by_url.items() if not u.endswith("missing-page")]
        assert len(served) == 4
        assert all(s in ("ok", "parse_failed") for s in served)
    finally:
        srv.stop()
