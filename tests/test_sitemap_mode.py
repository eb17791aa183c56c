"""Sitemap-seeded crawl mode (use_sitemap=True): engine vs oracle.

Exercises S6 (in-loop XML parse), Q3 (frozen-clock scoring), Q4-adjacent
prioritization, and priority-ordered scheduling — the ordering trace now
depends on sitemap scores, so equality here proves the whole scored path.
"""

import pytest

from crawler_distributed_spark import synth
from crawler_distributed_spark.oracle import run_oracle
from crawler_distributed_spark.plans.frontier_loop import run_crawl
from crawler_distributed_spark.policy import CrawlPolicy

CFG = synth.SynthConfig(n_hosts=3, pages_base=15, hot_factor=2, branching=4)
SEEDS = synth.seed_rows(CFG, max_pages=8, use_sitemap=True)
POLICY = CrawlPolicy()


@pytest.fixture(scope="module")
def results(spark, tmp_path_factory):
    oracle = run_oracle(CFG, SEEDS, POLICY)
    robots = spark.createDataFrame(synth.robots_rule_rows(CFG))
    d = str(tmp_path_factory.mktemp("sm_ckpt"))
    engine = run_crawl(spark, CFG, SEEDS, robots, d, POLICY)
    return oracle, engine


def test_sitemap_trace_equality(spark, results):
    oracle, engine = results
    etrace = sorted(
        (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
        for r in engine.trace(spark).collect()
    )
    otrace = sorted(oracle.trace)
    assert etrace == otrace
    # the trace must actually start from sitemaps
    assert any(u.endswith("/sitemap.xml") for (_, _, _, u, _, _) in otrace)


def test_sitemap_seen_equality(spark, results):
    oracle, engine = results
    seen = {}
    for r in engine.seen(spark).collect():
        seen.setdefault(r.crawl_id, set()).add(r.url_norm)
    assert seen == oracle.seen


# --- sitemap-index recursion + robots Sitemap: discovery --------------------
# hosts 0-3 serve flat urlsets, hosts 4-5 serve <sitemapindex> roots;
# hosts 1 and 5 have no Sitemap: line in robots.txt (fallback path)

CFG6 = synth.SynthConfig(n_hosts=6, pages_base=12, hot_factor=2, branching=4)


def _run_pair(spark, tmp_path_factory, seeds, name):
    oracle = run_oracle(CFG6, seeds, POLICY)
    robots = spark.createDataFrame(synth.robots_rule_rows(CFG6))
    d = str(tmp_path_factory.mktemp(name))
    engine = run_crawl(spark, CFG6, seeds, robots, d, POLICY)
    return oracle, engine


@pytest.fixture(scope="module")
def results_index(spark, tmp_path_factory):
    return _run_pair(
        spark, tmp_path_factory,
        synth.seed_rows(CFG6, max_pages=6, use_sitemap=True), "smidx_ckpt",
    )


@pytest.fixture(scope="module")
def results_robots(spark, tmp_path_factory):
    return _run_pair(
        spark, tmp_path_factory,
        synth.seed_rows(CFG6, max_pages=6, use_sitemap=True, via_robots=True),
        "smrob_ckpt",
    )


def test_sitemap_index_trace_equality(spark, results_index):
    """An index-rooted sitemap crawl (Q4 child filtering + max_pages early
    break) must trace-match the pure-Python oracle exactly."""
    oracle, engine = results_index
    etrace = sorted(
        (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
        for r in engine.trace(spark).collect()
    )
    assert etrace == sorted(oracle.trace)
    # the index layout must actually be exercised
    assert any(synth.sitemap_layout(CFG6, j) == "index" for j in range(6))
    # index hosts still crawl content pages (entries came from children)
    idx_host = next(j for j in range(6) if synth.sitemap_layout(CFG6, j) == "index")
    assert any(
        h == synth.host_name(idx_host) and "/p/" in u
        for (_, _, _, u, h, _) in oracle.trace
    )


def test_robots_discovery_trace_equality(spark, results_robots):
    """Crawls seeded at robots.txt must discover the sitemap (Sitemap:
    directive, or common-location fallback) and trace-match the oracle."""
    oracle, engine = results_robots
    etrace = sorted(
        (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
        for r in engine.trace(spark).collect()
    )
    assert etrace == sorted(oracle.trace)
    urls = [u for (_, _, _, u, _, _) in oracle.trace]
    assert any(u.endswith("/robots.txt") for u in urls)
    assert any(u.endswith("/sitemap.xml") for u in urls)
    # the fallback host (no Sitemap: line) must still reach its sitemap
    fb = next(
        j for j in range(6) if synth._h(CFG6.seed, "smline", j) % 3 == 0
    )
    assert f"https://{synth.host_name(fb)}/sitemap.xml" in urls


def test_robots_discovery_seen_equality(spark, results_robots):
    oracle, engine = results_robots
    seen = {}
    for r in engine.seen(spark).collect():
        seen.setdefault(r.crawl_id, set()).add(r.url_norm)
    assert seen == oracle.seen


# --- wide <sitemapindex> fan-out: children are control frontier rows ------
# (VERDICT r2 #5: no serial in-task child loop; a 100-child index must not
# pin one fetch task, and the emission is capped at max_pages children)

CFGW = synth.SynthConfig(
    seed=1, n_hosts=1, pages_base=12, hot_factor=1, branching=4,
    extra_page_children=100,
)


def test_wide_index_trace_equality(spark, tmp_path_factory):
    """A 100-child index host: engine ≡ oracle, and the child fan-out is
    spread across batches by politeness instead of looping in one task."""
    assert synth.sitemap_layout(CFGW, 0) == "index"
    seeds = synth.seed_rows(CFGW, max_pages=8, use_sitemap=True)
    oracle = run_oracle(CFGW, seeds, POLICY)
    robots = spark.createDataFrame(synth.robots_rule_rows(CFGW))
    d = str(tmp_path_factory.mktemp("smwide_ckpt"))
    engine = run_crawl(spark, CFGW, seeds, robots, d, POLICY)
    etrace = sorted(
        (r.crawl_id, r.batch_id, r.seq_in_batch, r.url_norm, r.host, r.depth)
        for r in engine.trace(spark).collect()
    )
    assert etrace == sorted(oracle.trace)
    # children fetched as first-class frontier rows, capped at max_pages
    child_fetches = [t for t in oracle.trace if "sitemap-" in t[3]]
    assert len(child_fetches) == 8  # max_pages cap, not all 103 kept children
    # and politeness (quota 4/host/batch) spreads them over >1 batch —
    # impossible under the old serial in-task recursion
    assert len({b for (_, b, _, u, _, _) in child_fetches}) > 1


def test_index_fetch_task_is_bounded():
    """The index-root fetch itself must emit ONLY the Q4-filtered child
    list (bounded by max_pages) — no child entries parsed in-task."""
    from crawler_distributed_spark.functions.sitemaps import (
        filter_page_sitemaps,
        parse_sitemap_xml,
    )

    root = parse_sitemap_xml(synth.sitemap_xml(CFGW, 0))
    assert root["is_index"] and len(root["child_sitemaps"]) == 104
    children, _ = filter_page_sitemaps(root["child_sitemaps"])
    # the fetch stage forwards children[:max_pages] as `discovered` and
    # parses zero entries for an index root (operators/fetch.py)
    assert len(children) == 103  # news dropped
    assert root["entries"] == []


def test_sitemap_priority_actually_orders(spark, results):
    """Scheduled page order within a batch must follow score order, not
    page number — i.e. the priority column is load-bearing."""
    oracle, _ = results
    first_pages = [
        u for (c, b, s, u, h, d) in sorted(oracle.trace)
        if c == "crawl-000" and b == 1
    ]
    assert first_pages, "batch 1 should fetch sitemap-discovered pages"
    nums = [int(u.rsplit("/", 1)[1]) for u in first_pages if "/p/" in u]
    assert nums != sorted(nums), (
        "pages fetched in page-number order — sitemap scores had no effect"
    )
