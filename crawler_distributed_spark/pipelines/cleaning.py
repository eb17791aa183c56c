"""Corpus-cleaning operators for LLM training-data pipelines:
decontamination, repetition scoring, PII scrubbing.

These are the standard pre-training hygiene stages (n-gram test-set
decontamination as in the GPT-3/Llama data recipes; repeated-n-gram
quality filters as in the Gopher/MassiveText rules; PII redaction) —
part of this repo's beyond-the-reference pipeline surface, alongside
pipelines/dedup.py and pipelines/text.py.

Scale shapes:
- decontamination is a shingle equi-join (docs-shingles ⋈
  contaminant-shingles) followed by a distinct + left-semi mark — the
  contaminant side (a test/benchmark suite) is tiny relative to the
  corpus, so Spark broadcasts its shingle set; the corpus is scanned
  once and never self-joined.
- repetition ratio is pure Column expressions (one projection, no
  shuffle, whole-stage codegen).
- PII scrubbing is a chain of JVM regexp_replace calls (no Python);
  patterns are written in the RE2 ∩ Java-regex common subset so the
  DuckDB oracle applies the literally-identical expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles

# PII patterns — kept inside the RE2 ∩ java.util.regex common subset so
# the same literal pattern runs on both engines (no lookaround, no \b
# ambiguity across engines' word-char sets).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    (r"\+\d[\d -]{7,}\d", "<PHONE>"),
)


def decontaminate_flags(
    docs: DataFrame,
    contaminants: DataFrame,
    n: int = 3,
    broadcast_max_docs: int | None = 100_000,
    skew_salts: int = 8,
) -> DataFrame:
    """Mark corpus docs sharing ANY word n-gram with the contaminant set
    (test-set decontamination). Returns (doc_id, contaminated).

    ``docs`` and ``contaminants`` both need (doc_id, text); n=13 is the
    published pre-training convention, n=3 at sandbox doc lengths.

    Plan shape is SIZE-GATED (VERDICT r4 #3 — the broadcast used to be
    unconditional, an OOM trap for large contaminant corpora):

    - contaminant docs <= ``broadcast_max_docs``: the distinct
      contaminant shingle set is BROADCAST into the corpus-shingle
      semi-join — the benchmark-suite-sized common case; the corpus is
      scanned once and never self-joined. The gate costs one count(*) of
      the contaminant table (count-star pushdown on columnar sources).
    - larger: a SHUFFLE semi-join on the shingle, skew-proofed by
      salting — each contaminant shingle is replicated into
      ``skew_salts`` buckets and the corpus side joins on
      (shingle, hash(doc_id) % skew_salts), so a hot shingle (stopword
      run) spreads over ``skew_salts`` partitions instead of one — the
      ``max_bucket`` move from the minhash path, semantics-preserving.
      The corpus still shuffles exactly once.

    ``broadcast_max_docs=None`` skips the gate count and always
    broadcasts (callers that KNOW the contaminant side is tiny)."""
    sh, _ = _shingles("text", n)
    doc_sh = docs.select("doc_id", F.explode(sh).alias("shingle"))
    bad_sh = (
        contaminants.select(F.explode(sh).alias("shingle")).distinct()
    )
    small = (
        broadcast_max_docs is None
        or contaminants.count() <= broadcast_max_docs
    )
    if small:
        hit = doc_sh.join(F.broadcast(bad_sh), "shingle", "left_semi")
    else:
        bad_salted = bad_sh.select(
            "shingle",
            F.explode(
                F.sequence(F.lit(0), F.lit(skew_salts - 1))
            ).alias("_salt"),
        )
        doc_salted = doc_sh.withColumn(
            "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(skew_salts)).cast("int")
        )
        hit = doc_salted.join(
            bad_salted, ["shingle", "_salt"], "left_semi"
        ).drop("_salt")
    hit = hit.select("doc_id").distinct().withColumn("_hit", F.lit(True))
    return docs.select("doc_id").join(hit, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("_hit"), F.lit(False)).alias("contaminated")
    )


def repetition_ratio(text_col: str, n: int = 3) -> Column:
    """Fraction of repeated word n-grams within the document:
    1 - distinct/total (0.0 = no repetition). The Gopher-style
    repeated-n-gram quality signal as one Column expression."""
    sh, _ = _shingles(text_col, n)
    total = F.size(sh)
    distinct = F.size(F.array_distinct(sh))
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - distinct.cast("double") / total.cast("double")
    )


def pii_scrub(text_col: str) -> Column:
    """Redact emails, IPv4s, and international-format phone numbers with
    typed placeholders — a chained JVM regexp_replace (no Python)."""
    col = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def pii_count(text_col: str) -> Column:
    """How many PII placeholders scrubbing would insert (cheap audit
    metric: count placeholder occurrences in the scrubbed text)."""
    scrubbed = pii_scrub(text_col)
    cnt = F.lit(0)
    for _, repl in PII_PATTERNS:
        cnt = cnt + (
            (F.length(scrubbed) - F.length(F.replace(scrubbed, F.lit(repl), F.lit(""))))
            / len(repl)
        ).cast("int")
    return cnt
