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
    docs: DataFrame, contaminants: DataFrame, n: int = 3
) -> DataFrame:
    """Mark corpus docs sharing ANY word n-gram with the contaminant set
    (test-set decontamination). Returns (doc_id, contaminated).

    ``docs`` and ``contaminants`` both need (doc_id, text). The
    contaminant shingle set is distinct-ed then broadcast into the
    corpus-shingle semi-join; n=13 is the published pre-training
    convention, n=3 at sandbox doc lengths."""
    sh, _ = _shingles("text", n)
    doc_sh = docs.select("doc_id", F.explode(sh).alias("shingle"))
    bad_sh = (
        contaminants.select(F.explode(sh).alias("shingle")).distinct()
    )
    hit = (
        doc_sh.join(F.broadcast(bad_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
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
