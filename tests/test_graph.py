"""Link-graph PageRank: recurrence equality vs a pure-Python oracle,
isolated-node semantics, priority composition, and plan shape."""

import pytest
from pyspark.sql import functions as F

from crawler_distributed_spark.pipelines import graph


def _py_pagerank(n_nodes, edges, n_iters=3, damping=0.85):
    """Independent pure-Python implementation of the module's documented
    recurrence (N-scaled, dangling mass not redistributed)."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1.0 for v in range(n_nodes)}
    for _ in range(n_iters):
        contrib = {v: 0.0 for v in range(n_nodes)}
        for s, d in edges:
            contrib[d] += pr[s] / outdeg[s]
        pr = {v: (1 - damping) + damping * contrib[v] for v in range(n_nodes)}
    return pr


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )


def test_pagerank_matches_python_oracle_on_synthetic_graph(spark, docs):
    edges_df = graph.synthetic_link_edges(docs)
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    assert edges, "synthetic graph should be non-empty"
    expected = _py_pagerank(40, edges)
    got = {
        r.id: r.pr
        for r in graph.pagerank(
            docs.select(F.col("doc_id").alias("id")), edges_df, n_iters=3
        ).collect()
    }
    assert set(got) == set(range(40))
    for v in range(40):
        assert got[v] == pytest.approx(expected[v], abs=1e-9)


def test_isolated_nodes_keep_floor_rank(spark):
    # node 9 has no in-edges and no out-edges; it must survive with the
    # (1 - damping) floor, not disappear from the output.
    nodes = spark.range(10).select(F.col("id"))
    edges = spark.createDataFrame(
        [(i, (i + 1) % 9) for i in range(9)], "src long, dst long"
    )
    got = {r.id: r.pr for r in graph.pagerank(nodes, edges, n_iters=2).collect()}
    assert len(got) == 10
    assert got[9] == pytest.approx(0.15, abs=1e-12)


def test_hub_outranks_spokes(spark):
    # star: every spoke points at node 0 -> node 0 must rank highest.
    nodes = spark.range(6).select(F.col("id"))
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long"
    )
    ranks = graph.pagerank(nodes, edges, n_iters=3).collect()
    top = max(ranks, key=lambda r: r.pr)
    assert top.id == 0
    # closed form after >=2 iterations: spokes settle at the 0.15 floor
    # (no in-edges), hub at 0.15 + 0.85 * 5 * 0.15 (its mass drains --
    # no out-edge and dangling mass is not redistributed, by contract)
    assert top.pr == pytest.approx(0.15 + 0.85 * 5 * 0.15, abs=1e-12)
    for r in ranks:
        if r.id != 0:
            assert r.pr == pytest.approx(0.15, abs=1e-12)


def test_pagerank_priority_composition(spark, docs):
    edges_df = graph.synthetic_link_edges(docs)
    ranks = graph.pagerank(docs.select(F.col("doc_id").alias("id")), edges_df)
    frontier = spark.createDataFrame(
        [(0, "a"), (7, "b"), (999, "unranked")], "doc_id long, url string"
    )
    got = {r.doc_id: r.priority for r in graph.pagerank_priority(frontier, ranks).collect()}
    assert set(got) == {0, 7, 999}
    assert got[999] == pytest.approx(0.15)  # floor keeps ordering total
    assert got[0] != got[999] or got[7] != got[999]


def test_host_pagerank_from_crawl_output(spark):
    """The crawl's own fetched table feeds the host-level link graph:
    every page on spoke hosts links to the hub host, so the hub must
    out-rank the spokes (the authority signal a scheduler feeds back
    into frontier priority)."""
    rows = [
        (f"https://spoke{s}.example/p/{i}", ["https://hub.example/"])
        for s in range(3)
        for i in range(2)
    ] + [("https://hub.example/", ["https://spoke0.example/p/0"])]
    fetched = spark.createDataFrame(rows, "url_norm string, outlinks array<string>")
    edges = graph.host_edges_from_fetched(fetched)
    got = {(r.src, r.dst) for r in edges.collect()}
    assert ("spoke0.example", "hub.example") in got
    assert all(s != d for s, d in got)
    ranks = {
        r.id: r.pr for r in graph.pagerank(graph.nodes_of(edges), edges).collect()
    }
    assert max(ranks, key=ranks.get) == "hub.example"
    assert ranks["hub.example"] > ranks["spoke1.example"]


def test_pagerank_plan_has_no_cartesian(spark, docs):
    # materialized edge list: the iterative operator's own plan must be
    # pure equi-joins + aggregations (no cartesian/BNLJ anywhere).
    edges_df = spark.createDataFrame(
        [(r.src, r.dst) for r in graph.synthetic_link_edges(docs).collect()],
        "src long, dst long",
    )
    plan = graph.pagerank(
        docs.select(F.col("doc_id").alias("id")), edges_df, n_iters=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # end-to-end (edge derivation included): the weighted edge list is
    # lineage-truncated once, so the per-iteration joins must NOT replay
    # the derivation (no nested-loop joins in the final plan at all --
    # the corpus-count scalar broadcast lives inside the one-time
    # checkpointed subtree).
    full = graph.pagerank(
        docs.select(F.col("doc_id").alias("id")),
        graph.synthetic_link_edges(docs),
        n_iters=3,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in full
    assert "BroadcastNestedLoopJoin" not in full
