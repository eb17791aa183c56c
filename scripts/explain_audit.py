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
    # radius>0 simhash: banded equality self-join, never a cross product
    "simhash_near_dup": ["HashAggregate", "!CartesianProduct",
                         "!BroadcastNestedLoopJoin"],
    # real decode: one Arrow python stage; the only hash exchange is the
    # explicit id-hash repartition ahead of the CPU-bound decode
    "multimodal_real_decode": ["<=1:hashpartitioning", "MapInPandas"],
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
    for name in names:
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
            else:
                ok = marker in plan
                print(f"  audit {marker}: {'OK' if ok else 'MISSING'}")
            failures += 0 if ok else 1
    print("\naudit failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
