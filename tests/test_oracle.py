"""Oracle crawler semantics tests (the conformance contract itself)."""

import pyarrow as pa

from spider_ray.common.urlnorm import canonicalize, host_of
from spider_ray.datagen import default_politeness, gen_pages, gen_seeds
from spider_ray.oracle import crawl_oracle


def _mini_pages():
    rows = [
        ("http://a.example/", b'<html><body>root <a href="/p1">1</a>'
                              b'<a href="/p2">2</a><a href="/p2">dup</a></body></html>'),
        ("http://a.example/p1", b"<html><body>one <a href='http://b.example/x'>b</a></body></html>"),
        ("http://a.example/p2", b"<html><body>two</body></html>"),
        ("http://b.example/x", b"<html><body>bx <a href='/denied/secret'>d</a></body></html>"),
        ("http://b.example/denied/secret", b"<html><body>no</body></html>"),
    ]
    return pa.table({
        "url": pa.array([r[0] for r in rows]),
        "html": pa.array([r[1] for r in rows], pa.binary()),
    })


def _pol(budget=10, epochs=5, robots=None):
    return {"max_per_host_per_epoch": budget, "max_epochs": epochs,
            "crawl_delay_default": 0.0, "robots": robots or {}}


def test_bfs_seen_and_order():
    pages = _mini_pages()
    seeds = pa.table({"url": ["HTTP://A.EXAMPLE:80/#x"], "priority": [5.0]})
    res = crawl_oracle(pages, seeds, _pol())
    assert res.seen == {
        "http://a.example/": 0,
        "http://a.example/p1": 1,
        "http://a.example/p2": 1,
        "http://b.example/x": 2,
        "http://b.example/denied/secret": 3,
    }
    assert [r[2] for r in res.order] == [
        "http://a.example/",
        "http://a.example/p1", "http://a.example/p2",
        "http://b.example/x",
        "http://b.example/denied/secret",
    ]
    assert [r[1] for r in res.order] == [0, 1, 2, 3, 4]  # global seq
    assert all(r[5] == "ok" for r in res.order)
    assert res.texts["http://a.example/p2"] == "two"


def test_robots_and_miss_and_budget():
    pages = _mini_pages()
    seeds = pa.table({
        "url": ["http://a.example/", "http://a.example/nope", "http://c.example/y"],
        "priority": [5.0, 9.0, 1.0],
    })
    robots = {"b.example": ["/denied"]}
    res = crawl_oracle(pages, seeds, _pol(budget=1, epochs=10, robots=robots))
    by_url = {r[2]: r for r in res.order}
    assert by_url["http://a.example/nope"][5] == "miss"
    assert by_url["http://c.example/y"][5] == "miss"
    assert by_url["http://b.example/denied/secret"][5] == "robots"
    assert "http://b.example/denied/secret" not in res.texts
    # budget=1: a.example/nope (prio 9) fetched before a.example/ (prio 5)
    epoch_of = {r[2]: r[0] for r in res.order}
    assert epoch_of["http://a.example/nope"] == 0
    assert epoch_of["http://a.example/"] == 1
    # c.example is its own host -> epoch 0 despite low priority
    assert epoch_of["http://c.example/y"] == 0


def test_duplicate_seed_max_priority():
    pages = _mini_pages()
    seeds = pa.table({
        "url": ["http://a.example/", "http://A.EXAMPLE/", "ftp://a.example/skip"],
        "priority": [1.0, 7.0, 9.0],
    })
    res = crawl_oracle(pages, seeds, _pol())
    assert res.order[0][4] == 7.0  # max priority wins
    assert len([r for r in res.order if r[0] == 0]) == 1


def test_max_epochs_bound():
    pages = _mini_pages()
    seeds = pa.table({"url": ["http://a.example/"], "priority": [5.0]})
    res = crawl_oracle(pages, seeds, _pol(epochs=1))
    assert max(r[0] for r in res.order) == 0
    assert len(res.order) == 1
    # discovered-but-never-fetched urls are still in seen (admission-time)
    assert res.seen["http://a.example/p1"] == 1


def test_synthetic_fixture_runs():
    pages = gen_pages(800, seed=42)
    seeds = gen_seeds(pages, seed=42)
    res = crawl_oracle(pages, seeds, default_politeness(max_per_host_per_epoch=5,
                                                        max_epochs=4))
    assert len(res.order) > 20
    outcomes = {r[5] for r in res.order}
    assert outcomes == {"ok", "miss", "robots"}  # all ports exercised
    # text invariant: fetched ok pages byte-identical to the pages table
    canon2text = {}
    for u, t in zip(pages["url"].to_pylist(), pages["text"].to_pylist()):
        canon2text[canonicalize(u)] = t
    for u, t in res.texts.items():
        assert canon2text[u] == t
    # order is deterministic and sorted by (epoch, host, -prio, url)
    keys = [(r[0], r[3], -r[4], r[2]) for r in res.order]
    assert keys == sorted(keys)
    # mega-host never exceeds budget per epoch
    from collections import Counter
    per = Counter((r[0], r[3]) for r in res.order)
    assert max(per.values()) <= 5
