"""Partitioned bloom URL-seen pre-filter: no false negatives, mergeable."""

from pyspark.sql import functions as F

from crawler_distributed_spark.operators.seen_filter import (
    bloom_split,
    build_bloom_delta,
    merge_blooms,
)

N_BUCKETS = 8
BITS = 1 << 12


def _urls(spark, prefix, n):
    return spark.createDataFrame(
        [(f"https://h{i % 5}.example.com/{prefix}/{i}",) for i in range(n)],
        "url_norm string",
    )


def test_no_false_negatives(spark):
    seen = _urls(spark, "seen", 500)
    bloom = build_bloom_delta(seen, n_buckets=N_BUCKETS, bits_per_bucket=BITS)
    tagged = bloom_split(seen, bloom, n_buckets=N_BUCKETS, bits_per_bucket=BITS)
    # every actually-seen URL must be flagged maybe_seen
    assert tagged.where(~F.col("maybe_seen")).count() == 0


def test_misses_are_mostly_clean(spark):
    seen = _urls(spark, "seen", 500)
    fresh = _urls(spark, "fresh", 500)
    bloom = build_bloom_delta(seen, n_buckets=N_BUCKETS, bits_per_bucket=BITS)
    tagged = bloom_split(fresh, bloom, n_buckets=N_BUCKETS, bits_per_bucket=BITS)
    hits = tagged.where(F.col("maybe_seen")).count()
    # false-positive rate at this sizing should be small, and misses are
    # the common case for novel URLs
    assert hits < 100


def test_merge_is_union(spark):
    a = _urls(spark, "a", 200)
    b = _urls(spark, "b", 200)
    bloom = merge_blooms(
        build_bloom_delta(a, n_buckets=N_BUCKETS, bits_per_bucket=BITS),
        build_bloom_delta(b, n_buckets=N_BUCKETS, bits_per_bucket=BITS),
    )
    both = a.unionByName(b)
    tagged = bloom_split(both, bloom, n_buckets=N_BUCKETS, bits_per_bucket=BITS)
    assert tagged.where(~F.col("maybe_seen")).count() == 0


def test_split_preserves_columns(spark):
    seen = _urls(spark, "seen", 50)
    cand = seen.withColumn("extra", F.lit(7)).withColumn("crawl_id", F.lit("c1"))
    bloom = build_bloom_delta(seen, n_buckets=N_BUCKETS, bits_per_bucket=BITS)
    out = bloom_split(cand, bloom, n_buckets=N_BUCKETS, bits_per_bucket=BITS)
    assert set(out.columns) == {"url_norm", "extra", "crawl_id", "maybe_seen"}
    assert out.count() == 50
