"""Single-URL crawl mode (SURVEY.md §3.2): degenerate frontier of size 1.

The reference's url_spider issues exactly one request and closes
(crawler/spider_project/spiders/url_spider.py:84-153). In the engine this
falls out of budget accounting: max_pages=1 consumes the budget at batch 0,
the crawl goes inactive, and no outlinks are admitted."""

from crawler_distributed_spark import synth
from crawler_distributed_spark.plans.frontier_loop import run_crawl
from crawler_distributed_spark.policy import CrawlPolicy

CFG = synth.SynthConfig(n_hosts=2, pages_base=10, hot_factor=1, branching=4)


def test_single_url_crawl(spark, tmp_path):
    target = synth.page_url(CFG, 0, 1)
    seeds = [
        {
            "crawl_id": "single-000",
            "domain": synth.host_name(0),
            "url": target,
            "max_pages": 1,
            "single_url": True,
            "use_sitemap": False,
            "priority": 0,
            "project_id": "t",
        }
    ]
    robots = spark.createDataFrame(synth.robots_rule_rows(CFG))
    res = run_crawl(spark, CFG, seeds, robots, str(tmp_path / "ck"), CrawlPolicy())
    trace = res.trace(spark).collect()
    # exactly one fetch (the target URL), nothing else ever scheduled
    assert len(trace) == 1
    assert trace[0].url_norm == target
    assert res.pages_dict(spark) == {"single-000": 1}
    # outlinks were seen-gated but not admitted (crawl went inactive)
    frontier = res.store.read_table(spark, res.last_batch, "frontier")
    assert frontier.count() == 0
