"""Loopback exercise of the live-HTTP fetch transport (the reference's
remote side-effect workers, `cmd/slack-worker/main.go:31-84`): a
forward-proxy-style local server serves the fixture corpus keyed by
canonical url, and the engine crawling THROUGH HTTP must equal the
single-threaded oracle byte-for-byte (seen set, crawl order, extracted
text).  This closes the one transport seam closable in-sandbox;
IndexFetcher stays the default fetcher everywhere else.

Marker-gated: `-m "not http_loopback"` skips the socket-bound tests.
"""

import json
import threading
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.http_loopback


def _corpus_from_pages(pages):
    """canonical url -> html, resolving recrawl duplicates to the
    LATEST capture by (warc_ts, html) — the same contract as
    IndexFetcher._load_part and the oracle's index."""
    from spider_ray.common.urlnorm import canonicalize

    best = {}
    for u, h, t in zip(pages["url"].to_pylist(),
                       pages["html"].to_pylist(),
                       pages["warc_ts"].to_pylist()):
        c = canonicalize(u)
        cur = best.get(c)
        if cur is None or (t, h) > cur[0]:
            best[c] = ((t, h), h)
    return {c: h for c, (_, h) in best.items()}


class _CorpusHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"  # keep-alive: exercises conn reuse

    def do_GET(self):  # proxy semantics: self.path is the absolute URI
        import time

        if self.path in self.server.slow_urls:
            time.sleep(self.server.slow_s)
        body = self.server.corpus.get(self.path)
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    def log_message(self, *args):  # keep pytest output clean
        pass


def _start_server(corpus, slow_urls=(), slow_s=0.0):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CorpusHandler)
    srv.corpus = corpus
    srv.slow_urls = set(slow_urls)
    srv.slow_s = slow_s
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


@pytest.mark.usefixtures("ray_session")
def test_engine_over_http_matches_oracle(smoke_fixture, tmp_path):
    from spider_ray.engine import CrawlEngine
    from spider_ray.oracle import crawl_oracle
    from spider_ray.stages.crawl import HttpFetcher

    pages = pq.read_table(smoke_fixture["pages"])
    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))
    oracle_res = crawl_oracle(pages, seeds, pol)

    srv = _start_server(_corpus_from_pages(pages))
    try:
        port = srv.server_address[1]
        eng = CrawlEngine(
            smoke_fixture["pages"], pol, str(tmp_path / "ckpt_http"),
            num_parts=8, seen_shards=4, fetch_concurrency=2,
            # tunnel_https=False: the loopback server is a
            # TLS-terminating lab proxy — it serves the corpus's https
            # urls as plaintext absolute-URI GETs (no certificates in
            # the sandbox); real proxies get the default CONNECT tunnel
            fetcher_factory=partial(HttpFetcher, timeout_s=10.0,
                                    proxy=("127.0.0.1", port),
                                    tunnel_https=False))
        manifest = eng.run(seeds=seeds)
        assert manifest["done"]
        assert eng.seen_table().equals(oracle_res.seen_table())
        assert eng.order_table().equals(oracle_res.order_table())
        assert eng.text_table().equals(oracle_res.text_table()), \
            "extracted text over HTTP must be byte-identical"
        # outcome-port parity: miss/robots counters match the oracle,
        # so 404s route to `miss` exactly like index lookups do
        for m_e, m_o in zip(manifest["epochs"], oracle_res.metrics):
            for k in ("selected", "ok", "miss", "robots", "admitted"):
                assert m_e[k] == m_o[k], f"epoch {m_e['epoch']} {k}"
    finally:
        srv.shutdown()


def test_http_fetcher_timeout_miss_and_reuse():
    """Transport failure modes: 404 -> None, timeout -> None (after one
    retry), 200 -> exact bytes, and the kept-alive connection serves a
    second request."""
    from spider_ray.stages.crawl import HttpFetcher

    ok_url = "http://host-a.example/page"
    slow_url = "http://host-a.example/slow"
    body = b"<html><body>hello</body></html>"
    srv = _start_server({ok_url: body}, slow_urls=[slow_url], slow_s=1.0)
    try:
        f = HttpFetcher(timeout_s=0.25,
                        proxy=("127.0.0.1", srv.server_address[1]))
        out = f.fetch_part(0, np.zeros(3, np.int64),
                           [ok_url, "http://host-a.example/missing",
                            slow_url])
        assert out[0] == body
        assert out[1] is None   # 404 -> miss
        assert out[2] is None   # timeout (x2 attempts) -> miss
        # connection reuse after the mixed outcomes above
        assert f.fetch_part(0, np.zeros(1, np.int64), [ok_url]) == [body]
    finally:
        srv.shutdown()


def test_bad_port_is_a_miss_not_a_crash():
    """Round-4 review fix: p.port raises ValueError on ':8a' or
    out-of-range ports AFTER urlsplit/hostname succeed — the fetcher
    contract maps every malformed url to a per-row miss (None), never
    a batch-killing exception."""
    from spider_ray.stages.crawl import HttpFetcher

    f = HttpFetcher()
    assert f._get("http://example.com:99999/") is None
    assert f._get("http://example.com:8a/") is None
