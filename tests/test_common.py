"""Unit tests for the pure shared kernels (SURVEY.md §5 layer 1)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from spider_ray.common.extract import extract_hrefs, extract_text
from spider_ray.common.hashing import hash64, hash64_many, task_id
from spider_ray.common.urlnorm import canonicalize, host_of, path_of, resolve


class TestCanonicalize:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("HTTP://Host0.Example/p/1", "http://host0.example/p/1"),
            ("http://host0.example:80/p/1", "http://host0.example/p/1"),
            ("https://host0.example:443/p/1", "https://host0.example/p/1"),
            ("http://host0.example:8080/p/1", "http://host0.example:8080/p/1"),
            ("http://host0.example/p/1#frag", "http://host0.example/p/1"),
            ("http://h.example", "http://h.example/"),
            ("http://h.example//a//b", "http://h.example/a/b"),
            ("http://h.example/a/./b", "http://h.example/a/b"),
            ("http://h.example/a/x/../b", "http://h.example/a/b"),
            ("http://h.example/p?b=2&a=1", "http://h.example/p?a=1&b=2"),
            ("http://h.example/p?a=1&b=2", "http://h.example/p?a=1&b=2"),
            ("  http://h.example/p  ", "http://h.example/p"),
            ("ftp://h.example/p", None),
            ("mailto:x@y.z", None),
            ("", None),
            (None, None),
            ("http://", None),
        ],
    )
    def test_cases(self, raw, expected):
        assert canonicalize(raw) == expected

    def test_idempotent(self):
        u = canonicalize("HTTP://A.B:80//x/./y?q=2&p=1#f")
        assert canonicalize(u) == u

    @given(st.text(max_size=50))
    @settings(max_examples=200, deadline=None)
    def test_never_raises_and_idempotent(self, s):
        c = canonicalize(s)
        if c is not None:
            assert canonicalize(c) == c

    def test_host_path(self):
        u = "http://h.example:8080/a/b?x=1"
        assert host_of(u) == "h.example"
        assert path_of(u) == "/a/b"
        assert path_of("http://h.example/") == "/"

    def test_resolve(self):
        base = "http://h.example/dir/page"
        assert resolve(base, "/abs") == "http://h.example/abs"
        assert resolve(base, "rel") == "http://h.example/dir/rel"
        assert resolve(base, "http://o.example/x") == "http://o.example/x"
        assert resolve(base, "javascript:void(0)") is None
        assert resolve(base, "#frag") is None
        assert resolve(base, "mailto:a@b.c") is None


class TestExtract:
    HTML = (
        b"<html><head><title>T \xc3\xa9</title><style>p{x}</style></head>"
        b"<body><!-- c --><h1>H</h1><p>a &amp; b</p>"
        b'<a href="/x">x</a><a href=\'y\'>y</a><a href=z>z</a>'
        b"<script>var q=1;</script></body></html>"
    )

    def test_text(self):
        assert extract_text(self.HTML) == "T é H a & b x y z"

    def test_text_str_bytes_equal(self):
        assert extract_text(self.HTML) == extract_text(self.HTML.decode("utf-8"))

    def test_hrefs(self):
        assert extract_hrefs(self.HTML) == ["/x", "y", "z"]

    def test_deterministic(self):
        assert extract_text(self.HTML) == extract_text(self.HTML)

    @given(st.text(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_never_raises(self, s):
        extract_text(s)
        extract_hrefs(s)


class TestHashing:
    def test_stable(self):
        assert hash64("http://a.example/") == hash64("http://a.example/")
        assert hash64("a") != hash64("b")
        assert 0 <= hash64("x") < 2**63

    def test_many_matches_scalar(self):
        urls = [f"http://h{i}.example/p/{i}" for i in range(100)]
        arr = hash64_many(urls)
        assert arr.dtype.name == "int64"
        assert list(arr) == [hash64(u) for u in urls]

    def test_task_id_deterministic(self):
        assert task_id(1, 2, 3) == task_id(1, 2, 3)
        assert task_id(1, 2, 3) != task_id(1, 2, 4)


class TestDatagen:
    def test_pages_invariants(self):
        from spider_ray.datagen import gen_pages, gen_seeds, sanity_check

        pages = gen_pages(500, seed=42)
        assert pages.num_rows == 500
        assert pages.schema.names == ["url", "warc_ts", "html", "text", "lang"]
        assert pa.types.is_binary(pages.schema.field("html").type)
        assert pa.types.is_timestamp(pages.schema.field("warc_ts").type)
        sanity_check(pages)
        # deterministic
        again = gen_pages(500, seed=42)
        assert pages.equals(again)
        assert not pages.equals(gen_pages(500, seed=43))
        seeds = gen_seeds(pages, seed=42)
        assert seeds.num_rows >= 5
        assert gen_seeds(pages, seed=42).equals(seeds)

    def test_mega_host_skew(self):
        from spider_ray.common.urlnorm import canonicalize, host_of
        from spider_ray.datagen import gen_pages

        pages = gen_pages(2000, seed=42)
        hosts = [host_of(canonicalize(u)) for u in pages["url"].to_pylist()]
        top = max(set(hosts), key=hosts.count)
        assert hosts.count(top) / len(hosts) > 0.20  # mega-host for salting


class TestFetcherSeam:
    """The Fetcher seam: FetchWorker is transport-independent — robots,
    outcome routing and extraction behave identically over any fetcher
    implementation (IndexFetcher in the sandbox, HTTP in deployment)."""

    def test_fake_fetcher_drives_outcomes(self):
        import numpy as np
        import pyarrow as pa
        from spider_ray.stages.crawl import FetchWorker

        class FakeFetcher:
            def warm(self, part):
                return 0

            def fetch_part(self, part, url_hashes, urls):
                return [b"<html><body><p>hi</p>"
                        b"<a href='/child'>c</a></body></html>"
                        if u.endswith("/have") else None for u in urls]

        w = FetchWorker(index_dir="/nonexistent",
                        robots={"blocked.test": ["/"]},
                        fetcher=FakeFetcher())
        batch = pa.table({
            "canonical_url": pa.array([
                "http://a.test/have", "http://a.test/miss",
                "http://blocked.test/have"]),
            "host": pa.array(["a.test", "a.test", "blocked.test"]),
            "priority": pa.array([1.0, 1.0, 1.0]),
            "url_hash": pa.array(np.array([1, 2, 3], dtype=np.int64)),
            "part": pa.array(np.array([0, 0, 1], dtype=np.int32)),
        })
        out = w(batch)
        by_url = dict(zip(out["canonical_url"].to_pylist(),
                          out["outcome"].to_pylist()))
        assert by_url == {"http://a.test/have": "ok",
                          "http://a.test/miss": "miss",
                          "http://blocked.test/have": "robots"}
        ok = out.filter(pa.array([o == "ok" for o in
                                  out["outcome"].to_pylist()]))
        assert ok["links"][0].as_py() == ["http://a.test/child"]

    def test_http_fetcher_maps_failures_to_miss(self):
        """HttpFetcher is a real transport since round 4 (loopback
        conformance crawl in test_http_fetcher.py); its contract here
        is the FAILURE mapping — unreachable/refused/unresolvable all
        yield None so FetchWorker routes them to the `miss` port, never
        an exception into the epoch loop."""
        import numpy as np
        from spider_ray.stages.crawl import HttpFetcher

        f = HttpFetcher(timeout_s=2.0)
        assert f.warm(0) == 0  # nothing to preload; pools fill lazily
        h = np.array([1], dtype=np.int64)
        assert f.fetch_part(0, h, ["http://127.0.0.1:1/"]) == [None]
        assert f.fetch_part(0, h, ["http://x.invalid/"]) == [None]


class TestTokenHash:
    """hash_string_array must hash EVERY byte (round-2 advice: the
    16-byte-prefix variant made same-length tokens sharing a 16-byte
    prefix collide deterministically, corrupting shingle Jaccard)."""

    def test_long_token_suffix_differentiates(self):
        from spider_ray.common.tokens import hash_string_array

        a = pa.array(["internationalisedX", "internationalisedY",
                      "internationalisedX", "a" * 64, "a" * 63 + "b"])
        h = hash_string_array(a)
        assert h[0] != h[1]
        assert h[0] == h[2]
        assert h[3] != h[4]

    def test_prefix_and_length_still_mix(self):
        from spider_ray.common.tokens import hash_string_array

        a = pa.array(["", "a", "aa", "ab", "ba"])
        h = hash_string_array(a)
        assert len(set(h.tolist())) == 5

    @given(st.lists(st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=80), max_size=30))
    @settings(max_examples=40, deadline=None)
    def test_equal_strings_equal_hashes(self, xs):
        from spider_ray.common.tokens import hash_string_array

        if not xs:
            return
        h = hash_string_array(pa.array(xs, pa.string()))
        seen = {}
        for s, v in zip(xs, h.tolist()):
            if s in seen:
                assert seen[s] == v
            seen[s] = v


class TestBatchUrlKernels:
    """resolve_batch / host_of_batch must equal the per-row kernels
    EXACTLY (the conformance contract routes every crawl link through
    them — shared-kernel rule)."""

    def test_fast_paths_hit_and_match(self):
        from spider_ray.common.urlnorm import resolve, resolve_batch

        base = "http://host001.example/p/1"
        hrefs = [
            "/p/2", "/p/2/", "/", "/a/b.html", "/x%20y/z",
            "http://host002.example/p/3",
            "http://offsite3.invalid/x/44",
            "https://a.b-c.example/d/e.f",
            "/missing/9", "/priv/..hidden/ok", "/...",
        ]
        got = resolve_batch(hrefs, [base] * len(hrefs))
        exp = [resolve(base, h) for h in hrefs]
        assert got == exp
        # every one of these must have taken a fast path AND round-trip
        # exactly (already canonical / origin-concat)
        for g in got:
            assert g is not None

    def test_slow_paths_match(self):
        from spider_ray.common.urlnorm import resolve, resolve_batch

        base = "http://host001.example/p/1?b=2&a=1"
        hrefs = [
            "", "  ", "#frag", "mailto:x@y", "javascript:void(0)",
            "data:text/plain,x", "p/rel", "../up", "./here", "//proto.rel/x",
            "HTTP://UPPER.CASE/Path", "http://host:80/x", "http://host:8080/x",
            "/has space", "/q?b=2&a=1", "/dot/./seg", "/dotdot/../seg",
            "/double//slash", "/trail.", "/trail..", "http://tráiling.unicode/x",
            "/ends　", "http://h.example/p　", "?onlyquery=1",
            "http://h.example", "http://h.example./x", "http://-h.example/x",
        ]
        got = resolve_batch(hrefs, [base] * len(hrefs))
        exp = [resolve(base, h) for h in hrefs]
        assert got == exp

    @given(st.lists(st.text(min_size=0, max_size=40), max_size=40))
    @settings(max_examples=150, deadline=None)
    def test_resolve_batch_equals_per_row(self, hrefs):
        from spider_ray.common.urlnorm import resolve, resolve_batch

        base = "http://host001.example/p/1"
        got = resolve_batch(hrefs, [base] * len(hrefs))
        exp = [resolve(base, h) for h in hrefs]
        assert got == exp

    @given(st.lists(st.text(min_size=1, max_size=60), max_size=30))
    @settings(max_examples=150, deadline=None)
    def test_host_of_batch_equals_per_row(self, raws):
        from spider_ray.common.urlnorm import (canonicalize, host_of,
                                               host_of_batch)

        canon = [c for c in (canonicalize(r) for r in raws) if c is not None]
        canon += ["http://a.example/x", "https://b.example:8080/y?q=1"]
        got = host_of_batch(canon).to_pylist()
        assert got == [host_of(u) for u in canon]

    @given(st.lists(st.text(
        alphabet="abAB019./:?#&=%~ _-\t　" + "h{tp}s",
        min_size=0, max_size=50), max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_resolve_batch_urlish_alphabet(self, hrefs):
        from spider_ray.common.urlnorm import resolve, resolve_batch

        # bias toward strings that can reach the fast paths
        hrefs = hrefs + ["http://" + h.lstrip("/") for h in hrefs[:10]] \
            + ["/" + h for h in hrefs[:10]]
        base = "http://host001.example/p/1"
        got = resolve_batch(hrefs, [base] * len(hrefs))
        exp = [resolve(base, h) for h in hrefs]
        assert got == exp


def test_short_docs_have_no_word_shingles():
    """Docs with fewer than k tokens emit NO k-shingles (the SQL
    conformance oracles' generate_series semantics): two distinct short
    docs with equal token sequences must not become jaccard-1.0 dups."""
    from spider_ray.common.tokens import word_shingle_hashes

    sh, par = word_shingle_hashes(["The cat", "the cat", "", "one two three"])
    assert set(par.tolist()) == {3}, "only the 3-token doc shingles"
    assert len(sh) == 1


class TestPrefixChainHashes:
    """Property gate for the prefix-dedup identity kernel: hash equality
    must hold iff the first min(n, len) lowercase tokens AND the capped
    length agree — the exact grouping the SQL oracle's
    array_to_string(t[1:n]) performs on true strings."""

    @given(st.lists(st.lists(st.sampled_from(
        ["w0", "w1", "w2", "Cat", "DOG", "x9"]), min_size=0, max_size=20),
        min_size=1, max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_matches_string_prefix_grouping(self, token_lists):
        import numpy as np

        from spider_ray.common.tokens import prefix_chain_hashes

        n = 5
        texts = [" ".join(toks) for toks in token_lists]
        h = prefix_chain_hashes(texts, n_tokens=n)
        keys = [" ".join(t.lower() for t in toks[:n])
                for toks in token_lists]
        # equal string prefix <-> equal chain hash, pairwise
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                assert (h[i] == h[j]) == (keys[i] == keys[j]), \
                    (texts[i], texts[j])

    def test_length_is_part_of_identity(self):
        from spider_ray.common.tokens import prefix_chain_hashes

        h = prefix_chain_hashes(
            ["a b c", "a b c d", "a b c d e f g h i j k l m",
             "a b c d e f g h i j k l XX"], n_tokens=12)
        # 3-token proper prefix != 4-token doc; docs differing only
        # BEYOND the 12-token window collide by design
        assert h[0] != h[1]
        assert h[2] == h[3]
