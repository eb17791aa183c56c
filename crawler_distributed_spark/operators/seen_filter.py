"""Partitioned bloom-filter URL-seen pre-filter (north rule C4).

The exact URL-seen test is the anti-join against the admitted deltas
(operators/admission.py:filter_unseen) — that stays, as the correctness
backstop. This module adds the scale path the north rule prescribes:
a **bucket-partitioned bloom filter** over `xxhash64(url_norm)` that
splits each candidate batch into

  definitely-unseen  (bloom miss → admitted directly, NO shuffle)
  maybe-seen         (bloom hit → exact anti-join on this subset only)

Bloom properties used: no false negatives (a miss is proof of novelty),
false positives only cost a trip through the exact join. At steady state
almost every discovered URL is already seen (re-discovered links), so the
anti-join probe side shrinks to the novelty rate × (1 + fp-rate).

Layout: bucket = pmod(xxhash64(url_norm), n_buckets); one bitmap row per
bucket (binary column). The k hash probes are computed JVM-side as
xxhash64(url_norm, seed_k) columns; Python only sets/tests bits on numpy
arrays, per Arrow batch. Build/merge/probe are all bucket-cogrouped, so no
single task ever holds more than one bucket's bitmap — this is what makes
the filter partition-local at 10^10 URLs (bitmaps total bits ≈ 10·|seen|,
spread across buckets; nothing is ever collected to the driver).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "bucket int, bitmap binary"


def _hash_cols(df: DataFrame, url_col: str, n_buckets: int, k: int) -> DataFrame:
    out = df.withColumn("_bucket", F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int"))
    for i in range(k):
        out = out.withColumn(f"_h{i}", F.xxhash64(F.col(url_col), F.lit(i)))
    return out


def build_bloom_delta(
    seen_delta: DataFrame,
    url_col: str = "url_norm",
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """(bucket, bitmap) rows for a batch of newly-seen URLs."""
    hashed = _hash_cols(seen_delta.select(url_col), url_col, n_buckets, k)
    h_names = [f"_h{i}" for i in range(k)]

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(bits_per_bucket // 8, dtype=np.uint8)
        for name in h_names:
            idx = (pdf[name].to_numpy(dtype=np.int64) % bits_per_bucket).astype(np.int64)
            np.bitwise_or.at(bitmap, idx // 8, (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [int(pdf["_bucket"].iloc[0])], "bitmap": [bitmap.tobytes()]}
        )

    return hashed.groupBy("_bucket").applyInPandas(
        lambda key, pdf: build(pdf), schema=BLOOM_SCHEMA
    )


def merge_blooms(a: DataFrame | None, b: DataFrame) -> DataFrame:
    """OR-merge two bloom tables (bucket-cogrouped, one bitmap per task)."""
    if a is None:
        return b

    def orr(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        maps = list(left["bitmap"]) + list(right["bitmap"])
        if not maps:
            return pd.DataFrame({"bucket": [], "bitmap": []})
        acc = np.frombuffer(maps[0], dtype=np.uint8).copy()
        for m in maps[1:]:
            acc |= np.frombuffer(m, dtype=np.uint8)
        bucket = (left if len(left) else right)["bucket"].iloc[0]
        return pd.DataFrame({"bucket": [int(bucket)], "bitmap": [acc.tobytes()]})

    return (
        a.groupBy("bucket")
        .cogroup(b.groupBy("bucket"))
        .applyInPandas(lambda key, l, r: orr(l, r), schema=BLOOM_SCHEMA)
    )


def bloom_split(
    candidates: DataFrame,
    bloom: DataFrame,
    url_col: str = "url_norm",
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Tag candidates with ``maybe_seen``: False = bloom miss = provably
    novel (skip the exact join); True = needs the anti-join. Implemented as
    a bucket cogroup so each task holds exactly one bucket's bitmap."""
    from pyspark.sql import types as T

    hashed = _hash_cols(candidates, url_col, n_buckets, k)
    h_names = [f"_h{i}" for i in range(k)]
    out_schema = T.StructType(
        [f for f in hashed.schema.fields if f.name != "_bucket"]
        + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def probe(cand: pd.DataFrame, blm: pd.DataFrame) -> pd.DataFrame:
        if not len(cand):
            return cand.drop(columns=["_bucket"]).assign(maybe_seen=pd.Series([], dtype=bool))
        if not len(blm):
            res = cand.drop(columns=["_bucket"]).copy()
            res["maybe_seen"] = False
            return res
        bitmap = np.frombuffer(blm["bitmap"].iloc[0], dtype=np.uint8)
        hit = np.ones(len(cand), dtype=bool)
        for name in h_names:
            idx = (cand[name].to_numpy(dtype=np.int64) % bits_per_bucket).astype(np.int64)
            hit &= (bitmap[idx // 8] >> (idx % 8) & 1).astype(bool)
        res = cand.drop(columns=["_bucket"]).copy()
        res["maybe_seen"] = hit
        return res

    return (
        hashed.groupBy("_bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(lambda key, c, b: probe(c, b), schema=out_schema)
        .drop(*h_names)
    )
