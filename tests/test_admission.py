"""Admission pipeline: filters → canonicalize → dedup → seen → robots."""

from pyspark.sql import functions as F

from crawler_distributed_spark.operators.admission import admit

CAND_SCHEMA = (
    "crawl_id string, raw_url string, allowed_host_1 string, allowed_host_2 string, "
    "parent_seq long, link_idx int, depth int"
)


def _cand(crawl, url, seq, idx, depth=1, h1="x.com", h2="www.x.com"):
    return (crawl, url, h1, h2, seq, idx, depth)


def test_filters_and_scope(spark):
    cands = spark.createDataFrame(
        [
            _cand("c1", "https://x.com/ok", 0, 0),
            _cand("c1", "https://x.com/a.pdf", 0, 1),        # F1 extension
            _cand("c1", "https://x.com/tag/t/", 0, 2),       # F5 deny
            _cand("c1", "javascript:void(0)", 0, 3),         # F3 invalid
            _cand("c1", "https://other.com/x", 0, 4),        # F4 off-domain
            _cand("c1", "https://www.x.com/ok2", 0, 5),      # www variant passes
        ],
        CAND_SCHEMA,
    )
    seen = spark.createDataFrame([], "crawl_id string, url_norm string")
    robots = spark.createDataFrame(
        [("x.com", "/", True), ("www.x.com", "/", True)],
        "host string, path_prefix string, allow boolean",
    )
    got = {r.url_norm for r in admit(cands, seen, robots).collect()}
    assert got == {"https://x.com/ok", "https://www.x.com/ok2"}


def test_dedup_is_order_stable(spark):
    # same canonical target discovered twice; first (parent_seq, link_idx) wins
    cands = spark.createDataFrame(
        [
            _cand("c1", "https://x.com/a?utm_source=z", 5, 1),
            _cand("c1", "https://x.com/a", 2, 3),
            _cand("c1", "https://x.com/a#frag", 2, 1),
        ],
        CAND_SCHEMA,
    )
    seen = spark.createDataFrame([], "crawl_id string, url_norm string")
    robots = spark.createDataFrame(
        [("x.com", "/", True)], "host string, path_prefix string, allow boolean"
    )
    rows = admit(cands, seen, robots).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.url_norm == "https://x.com/a"
    assert (r.parent_seq, r.link_idx) == (2, 1)
    assert r.url == "https://x.com/a#frag"  # the winning raw href


def test_seen_anti_join_is_per_crawl(spark):
    cands = spark.createDataFrame(
        [
            _cand("c1", "https://x.com/a", 0, 0),
            _cand("c2", "https://x.com/a", 0, 0),
        ],
        CAND_SCHEMA,
    )
    seen = spark.createDataFrame(
        [("c1", "https://x.com/a")], "crawl_id string, url_norm string"
    )
    robots = spark.createDataFrame(
        [("x.com", "/", True)], "host string, path_prefix string, allow boolean"
    )
    rows = admit(cands, seen, robots).collect()
    assert [(r.crawl_id, r.url_norm) for r in rows] == [("c2", "https://x.com/a")]


def test_robots_longest_prefix_wins(spark):
    cands = spark.createDataFrame(
        [
            _cand("c1", "https://x.com/private/p", 0, 0),
            _cand("c1", "https://x.com/private/open/p", 0, 1),
            _cand("c1", "https://x.com/public/p", 0, 2),
            _cand("c1", "https://x.com/norules/p", 0, 3, h1="x.com"),
        ],
        CAND_SCHEMA,
    )
    seen = spark.createDataFrame([], "crawl_id string, url_norm string")
    robots = spark.createDataFrame(
        [
            ("x.com", "/private/", False),
            ("x.com", "/private/open/", True),
            ("x.com", "/", True),
        ],
        "host string, path_prefix string, allow boolean",
    )
    got = {r.url_norm: r.robots_ok for r in admit(cands, seen, robots).collect()}
    assert got == {
        "https://x.com/private/p": False,
        "https://x.com/private/open/p": True,
        "https://x.com/public/p": True,
        "https://x.com/norules/p": True,
    }
