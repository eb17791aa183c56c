"""Golden + property tests for URL canonicalization and admission filters.

GOLDEN_NORM / GOLDEN_FP values were captured by executing the reference's
lib/utils/url_utils.py (normalize_url / url_fingerprint) — bit-identical
parity is the #1 correctness target (SURVEY.md §5.1).
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_distributed_spark.functions import urls as U

GOLDEN_NORM = {
    "http://example.com": "http://example.com/.",
    "http://example.com/": "http://example.com/",
    "https://Example.COM:443/a/../b/./c?utm_source=x&b=2&a=1#frag": "https://example.com/b/c?a=1&b=2",
    "http://example.com:80/path/": "http://example.com/path",
    "http://example.com/a//b": "http://example.com/a/b",
    "HTTP://EXAMPLE.com/A/B": "http://example.com/A/B",
    "https://example.com/a;params?z=1&a=": "https://example.com/a;params?a=&z=1",
    "https://example.com/page?sort=asc&id=3": "https://example.com/page?id=3",
    "https://example.com/search?q=hello world&q=two": "https://example.com/search?q=hello+world&q=two",
    "https://www.example.co.uk/x": "https://www.example.co.uk/x",
    "https://example.com/a/b/c/../../d": "https://example.com/a/d",
    "http://example.com/?a=1&A=2": "http://example.com/?A=2&a=1",
    "https://example.com/ok?ref=here&keep=1": "https://example.com/ok?keep=1",
    "https://example.com/%7Euser/page?gclid=1": "https://example.com/%7Euser/page",
}

GOLDEN_FP = {
    "http://example.com": "96759e3f547da0f76c5376ce77de4ede54c3aea1d3ae9b459551241fbb4db300",
    "http://example.com/": "2a1b402420ef46577471cdc7409b0fa2c6a204db316e59ade2d805435489a067",
    "https://Example.COM:443/a/../b/./c?utm_source=x&b=2&a=1#frag": "c73b0d31d8259678227d181c6c44eebc624e942b3389d0840014a90922a03617",
    "http://example.com:80/path/": "7db5de67837e9b1d9b64416db779f447851c711519ad6985bc2d63207577cca0",
    "http://example.com/a//b": "649028aa54628de9cc4089da00b02c834875c6e987349bb5c20c6803d5fa2e05",
    "HTTP://EXAMPLE.com/A/B": "98de6e924750bbb6b473defc50a5bf5039c245ea06d644b17139883d6f9ba40f",
    "https://example.com/a;params?z=1&a=": "fda72c99aaeccd4b42a2cd0134c15cca4e11e2afc52c0f6f6c4b11514d884a5d",
    "https://example.com/page?sort=asc&id=3": "30f585c89712b00803d9afe2da5e695aeb1dba4051bd046b74044ffd1ff60071",
    "https://example.com/search?q=hello world&q=two": "14329c4b4c147d7925df182078905a2d1e22c0c52c13e7d74b8ad8f11a459fc3",
    "https://www.example.co.uk/x": "7e6ef9c5129cd046b48ad8da03e8067f1737490d52ef8bd70aebb4ec3bbf7848",
    "https://example.com/a/b/c/../../d": "bf6045dcc2e65b17134979e0d436c8c390312a0d06e27f9136b0d79db558f215",
    "http://example.com/?a=1&A=2": "d8827a9b0a91bdddda1d7acd36f270871843233ab4a9db1b4a670b64ac875e4d",
    "https://example.com/ok?ref=here&keep=1": "54e3007ce712013e2a5a68104ab55e567cec6e19267153e0231327a186abed60",
    "https://example.com/%7Euser/page?gclid=1": "bb3f33667b07f8a8c8d1682e89227283d8ac2c0e0e2aa0202f46cc900fa06a5e",
}


def test_golden_canonicalize():
    for url, want in GOLDEN_NORM.items():
        assert U.canonicalize_url(url) == want, url


def test_golden_fingerprint():
    for url, want in GOLDEN_FP.items():
        assert U.url_fingerprint(url) == want, url


def test_extension_filter():
    assert U.has_skipped_extension("https://x.com/a.pdf")
    assert U.has_skipped_extension("https://x.com/a.PDF?dl=1")
    assert U.has_skipped_extension("https://x.com/a.jpg#frag")
    assert not U.has_skipped_extension("https://x.com/a.pdf/page")
    assert not U.has_skipped_extension("https://x.com/dir/")
    assert not U.has_skipped_extension("https://x.com/page.html")


def test_media_filter():
    assert U.is_media_url("https://x.com/a.mp4")
    assert U.is_media_url("https://x.com/get?download=1")
    assert not U.is_media_url("https://x.com/get?download=")  # blank dropped
    assert not U.is_media_url("https://x.com/page")


def test_validity_and_deny():
    assert U.is_valid_url("https://example.com/a")
    assert not U.is_valid_url("javascript:void(0)")
    assert not U.is_valid_url("https:///nohost")
    assert U.is_denied("https://x.com/tag/foo")
    assert U.is_denied("https://x.com/p?page=3")
    assert not U.is_denied("https://x.com/pages")


def test_base_domain():
    assert U.base_domain("news.example.com") == "example.com"
    assert U.base_domain("https://a.b.example.co.uk/x") == "example.co.uk"
    assert U.base_domain("www.example.com") == "example.com"


def test_dedup_keep_order():
    urls = [
        "https://x.com/a?utm_source=1",
        "https://x.com/a",
        "https://x.com/b",
        "https://x.com/a#f",
    ]
    assert U.dedup_urls_keep_order(urls) == [
        "https://x.com/a?utm_source=1",
        "https://x.com/b",
    ]


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=80))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(s):
    url = "https://example.com/" + s
    once = U.canonicalize_url(url)
    assert U.canonicalize_url(once) == once


def test_fast_path_matches_slow_path():
    """The vectorized fast path must agree with the stdlib slow path."""
    urls = list(GOLDEN_NORM) + [
        "https://h000.example.com/p/5",
        "https://h000.example.com/",
        "https://h000.example.com/private/p/11",
        "https://h000.example.com/p/5.html",
        "https://h000.example.com/p/./5",
    ]
    s = pd.Series(urls)
    fast = U._canon_series(s)
    slow = s.map(U.canonicalize_url)
    assert list(fast) == list(slow)


def test_fingerprint_equals_sha256_of_canonical_on_crawl_space():
    """The loop computes url_fp = sha2(url_norm) JVM-side; verify it equals
    the reference fingerprint for every URL in the synthetic web (canonical
    URLs carry no path-;params, so the fingerprint string IS url_norm)."""
    import hashlib

    from crawler_distributed_spark import synth

    cfg = synth.SynthConfig(n_hosts=4, pages_base=20)
    for u in synth.all_urls(cfg):
        un = U.canonicalize_url(u)
        assert hashlib.sha256(un.encode()).hexdigest() == U.url_fingerprint(un)


@pytest.mark.usefixtures("spark")
def test_spark_column_filters_match_python(spark):
    """Column-expression filters (codegen path) == pure-Python filters."""
    urls = [
        "https://x.com/a.pdf",
        "https://x.com/a.pdf/page",
        "https://x.com/dir/",
        "https://x.com/page.html",
        "https://x.com/a.mp4",
        "https://x.com/get?download=1",
        "https://x.com/get?download=",
        "https://x.com/tag/foo",
        "https://x.com/p?page=3",
        "https://example.com/ok?keep=1",
        "javascript:void(0)",
        "HTTPS://UP.example.com/A",
        "https://x.com/a.JPG?x=1",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        U.skipped_extension_col(F.col("url")).alias("ext"),
        U.media_url_col(F.col("url")).alias("media"),
        U.valid_url_col(F.col("url")).alias("valid"),
        U.denied_col(F.col("url")).alias("deny"),
        U.host_col(F.col("url")).alias("host"),
    ).collect()
    for r in rows:
        assert r["ext"] == U.has_skipped_extension(r["url"]), ("ext", r["url"])
        assert r["media"] == U.is_media_url(r["url"]), ("media", r["url"])
        assert r["valid"] == U.is_valid_url(r["url"]), ("valid", r["url"])
        assert r["deny"] == U.is_denied(r["url"]), ("deny", r["url"])
        if r["valid"]:
            assert r["host"] == U.host_of(r["url"]), ("host", r["url"])


@pytest.mark.usefixtures("spark")
def test_canonicalize_udf_matches_python(spark):
    urls = list(GOLDEN_NORM)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", U.canonicalize_udf("url").alias("c")).collect()
    for r in rows:
        assert r["c"] == U.canonicalize_url(r["url"]), r["url"]
