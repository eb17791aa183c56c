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
