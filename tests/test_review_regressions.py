"""Regression tests for the round-1 code-review findings."""

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray.common.urlnorm import canonicalize, resolve
from spider_ray.oracle import crawl_oracle


class TestMalformedPorts:
    @pytest.mark.parametrize("bad", [
        "http://example.com:80port/x",
        "http://example.com:999999/x",
        "http://example.com:-1/x",
        "http://example.com:1e3/x",
    ])
    def test_canonicalize_returns_none(self, bad):
        assert canonicalize(bad) is None

    def test_resolve_drops_bad_port_href(self):
        assert resolve("http://a.example/p", "http://b.example:80port/x") is None

    @pytest.mark.usefixtures("ray_session")
    def test_bad_href_does_not_crash_crawl(self, tmp_path):
        from spider_ray.engine import CrawlEngine

        pages = pa.table({
            "url": ["http://a.example/"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([b'<a href="http://x.example:80port/y">bad</a>'
                              b'<a href="/ok">good</a>'], pa.binary()),
            "text": ["bad good"],
            "lang": ["en"],
        })
        p = str(tmp_path / "pages.parquet")
        pq.write_table(pages, p)
        seeds = pa.table({"url": ["http://a.example/"], "priority": [1.0]})
        pol = {"max_per_host_per_epoch": 5, "max_epochs": 2, "robots": {}}
        eng = CrawlEngine(p, pol, str(tmp_path / "ck"), num_parts=2,
                          seen_shards=1, fetch_concurrency=1)
        m = eng.run(seeds=seeds)
        assert m["done"]
        res = crawl_oracle(pages, seeds, pol)
        assert eng.seen_table().equals(res.seen_table())


@pytest.mark.usefixtures("ray_session")
def test_duplicate_canonical_urls_latest_capture_wins(tmp_path):
    """Recrawled url (two rows, same canonical form): both oracle and
    engine must serve the capture with the greatest (warc_ts, html)."""
    from spider_ray.engine import CrawlEngine

    pages = pa.table({
        "url": ["http://a.example/p", "HTTP://A.EXAMPLE:80/p#frag"],
        "warc_ts": pa.array([100, 200], pa.timestamp("us")),
        "html": pa.array([b"<p>old capture</p>", b"<p>new capture</p>"],
                         pa.binary()),
        "text": ["old capture", "new capture"],
        "lang": ["en", "en"],
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    seeds = pa.table({"url": ["http://a.example/p"], "priority": [1.0]})
    pol = {"max_per_host_per_epoch": 5, "max_epochs": 1, "robots": {}}

    res = crawl_oracle(pages, seeds, pol)
    assert res.texts == {"http://a.example/p": "new capture"}

    eng = CrawlEngine(p, pol, str(tmp_path / "ck"), num_parts=2,
                      seen_shards=1, fetch_concurrency=1)
    eng.run(seeds=seeds)
    assert eng.text_table().equals(res.text_table())


@pytest.mark.usefixtures("ray_session")
def test_stale_epoch_shards_cleared_on_rerun(smoke_fixture, tmp_path):
    """A rerun of an incomplete epoch must not inherit stale texts /
    admitted files (e.g. from a mid-epoch crash with a different pool)."""
    from spider_ray.engine import CrawlEngine

    seeds = pq.read_table(smoke_fixture["seeds"])
    pol = json.load(open(smoke_fixture["politeness"]))
    pol = {**pol, "max_epochs": 1}
    ck = str(tmp_path / "ck")
    eng = CrawlEngine(smoke_fixture["pages"], pol, ck, num_parts=4,
                      seen_shards=2)
    eng.run(seeds=seeds)
    clean_text = eng.text_table()

    # simulate a crash mid-epoch 1: manifest says epoch 1 incomplete, but
    # a stale texts shard from the interrupted attempt is on disk
    stale_dir = os.path.join(ck, "epoch_0001", "texts")
    os.makedirs(stale_dir, exist_ok=True)
    pq.write_table(pa.table({"url": ["http://stale.example/x"],
                             "text": ["phantom"]}),
                   os.path.join(stale_dir, "shard-0099.parquet"))

    pol2 = {**pol, "max_epochs": 2}
    eng2 = CrawlEngine(smoke_fixture["pages"], pol2, ck, num_parts=4,
                       seen_shards=2)
    eng2.run(resume=True)
    urls = eng2.text_table()["url"].to_pylist()
    assert "http://stale.example/x" not in urls
    assert set(clean_text["url"].to_pylist()) <= set(urls)


@pytest.mark.usefixtures("ray_session")
class TestFlowErrorPaths:
    def test_type_error_in_mapper_is_dropped_not_fatal(self):
        from spider_ray.flow import Action, FlowRuntime, FlowSpec, Mapper
        from spider_ray.flow.spec import Peer

        spec = FlowSpec(tenant_id="t", workflow_id="w")
        spec.actions["a"] = Action("a", "test-action-a")
        spec.actions["b"] = Action("b", "test-action-b", mapper={
            "v": Mapper("expression", "a.output.value + 1")})  # str + int
        spec.peers.append(Peer("a", "triggered", "b"))
        res = FlowRuntime(spec).run(
            [{"key": "a", "values": json.dumps({"value": "s"})}])
        leaf = json.loads(res["leaves"][0]["values"])
        assert "$error" in leaf and "TypeError" in leaf["$error"]

    def test_compile_error_is_per_edge_not_fatal(self):
        from spider_ray.flow import Action, FlowRuntime, FlowSpec, Mapper
        from spider_ray.flow.spec import Peer

        spec = FlowSpec(tenant_id="t", workflow_id="w")
        spec.actions["a"] = Action("a", "test-action-a")
        spec.actions["bad"] = Action("bad", "test-action-b", mapper={
            "v": Mapper("expression", "1 +")})  # syntax error
        spec.actions["good"] = Action("good", "test-action-b", mapper={
            "v": Mapper("fixed", "fine")})
        spec.peers += [Peer("a", "triggered", "bad"),
                       Peer("a", "triggered", "good")]
        res = FlowRuntime(spec).run([{"key": "a", "values": "{}"}])
        vals = [json.loads(r["values"]) for r in res["leaves"]]
        assert {"v": "fine"} in vals
        assert any("$error" in v for v in vals)

    def test_task_ids_are_creation_ordered(self):
        from spider_ray.flow import Action, FlowRuntime, FlowSpec
        from spider_ray.flow.spec import Peer

        spec = FlowSpec(tenant_id="t", workflow_id="w")
        spec.actions["a"] = Action("a", "test-action-a")
        spec.actions["fan"] = Action("fan", "fd-order-action")
        spec.peers.append(Peer("a", "triggered", "fan"))
        res = FlowRuntime(spec).run([{"key": "a", "values": "{}"}])
        # leaves sorted by task_id == emission order of the 1->10 fan-out
        orders = [json.loads(r["values"])["order_id"] for r in res["leaves"]]
        assert orders == [f"order@{i + 1}" for i in range(10)]


def test_flowstore_page_clamp():
    from spider_ray.flow import FlowSpec, FlowStore

    store = FlowStore()
    for i in range(5):
        store.create(FlowSpec(tenant_id="t", workflow_id=f"w{i}"))
    assert store.list("t", page=0) == store.list("t", page=1)
    assert store.list("t", page=-3) == store.list("t", page=1)


@pytest.mark.usefixtures("ray_session")
def test_skew_join_empty_right_side():
    """Round-4 review: the small-dim broadcast fast path crashed on a
    fully-empty right side (pa.concat_tables([]) raises); it must
    produce the correct EMPTY inner join instead, like the shuffle
    branch always did."""
    import pyarrow as pa
    import ray.data as rd

    from spider_ray.pipelines.relational import skew_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                                   "v": [1.0, 2.0, 3.0]}))
    right = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                    "w": pa.array([], pa.string())}))
    assert skew_join(left, right, "k", "k", 2).count() == 0


def test_http_fetcher_https_proxy_uses_connect_tunnel(monkeypatch):
    """Round-4 review: https through a forward proxy must CONNECT-
    tunnel (plaintext absolute-URI GETs are rejected by compliant
    proxies).  Pin the construction: HTTPSConnection to the PROXY with
    set_tunnel(target-host, 443)."""
    import http.client

    from spider_ray.stages import crawl as crawl_mod

    calls = {}

    class FakeHTTPS:
        def __init__(self, host, port, timeout=None):
            calls["conn"] = (host, port)

        def set_tunnel(self, host, port):
            calls["tunnel"] = (host, port)

        def request(self, *a, **k):
            raise OSError("stop here")  # end the attempt after setup

        def close(self):
            pass

    monkeypatch.setattr(http.client, "HTTPSConnection", FakeHTTPS)
    f = crawl_mod.HttpFetcher(proxy=("proxy.local", 3128), timeout_s=1.0)
    assert f._get("https://example.test/page") is None  # both attempts miss
    assert calls["conn"] == ("proxy.local", 3128)
    assert calls["tunnel"] == ("example.test", 443)


def test_http_fetcher_malformed_url_is_a_row_miss():
    """Round-4 review: a hostname-less url (mailto:, scheme garbage)
    must map to None, not raise out of fetch_part and kill the
    partition task."""
    import numpy as np

    from spider_ray.stages.crawl import HttpFetcher

    f = HttpFetcher(timeout_s=1.0)
    h = np.array([1, 2, 3], dtype=np.int64)
    out = f.fetch_part(0, h, ["mailto:x@y", "nonsense", "http:///nohost"])
    assert out == [None, None, None]


@pytest.mark.usefixtures("ray_session")
def test_daemon_survives_concurrent_flow_creation():
    """Round-4 review: FlowStore.find must run under the api lock — an
    unlocked iteration while HTTP handlers insert flows raced with
    'dict changed size during iteration' and silently killed the
    consumer thread.  Hammer creation while triggers drain."""
    import json as _json
    import threading
    import urllib.request

    from spider_ray.flow import FlowDaemon

    d = FlowDaemon(port=0, poll_interval=0.001,
                   reconcile_interval=9999).start()
    try:
        base = f"http://127.0.0.1:{d.address[1]}"

        def req(method, path, body):
            r = urllib.request.Request(
                base + path, data=_json.dumps(body).encode(), method=method)
            urllib.request.urlopen(r, timeout=30).read()

        # two nodes: the trigger node dispatches to children, so a
        # single-node flow settles nothing — the leaf comes from a2
        flow = {"name": "b", "id": "wa", "trigger_type": "event",
                "actions": [{"key": "a1", "action_id": "test-action-a"},
                            {"key": "a2", "action_id": "test-action-b"}],
                "peers": [{"parent_key": "a1", "meta_output": "triggered",
                           "child_key": "a2"}]}
        req("POST", "/tenants/t1/flows", flow)

        stop = threading.Event()

        def churn():
            i = 0
            while not stop.is_set():
                req("POST", "/tenants/t1/flows",
                    {**flow, "id": f"w{i}", "name": f"f{i}"})
                i += 1

        t = threading.Thread(target=churn, daemon=True)
        t.start()
        try:
            for i in range(8):
                req("POST", "/trigger",
                    {"workflow_id": "wa", "key": "a1", "value": f"e{i}"})
            deadline = time.time() + 60
            while time.time() < deadline:
                if len(d.results.get("wa", [])) == 8:
                    break
                time.sleep(0.02)
        finally:
            stop.set()
            t.join(timeout=10)
        assert len(d.results.get("wa", [])) == 8
        assert not any(e.get("workflow_id") is None for e in d.errors), \
            list(d.errors)
    finally:
        d.stop()
