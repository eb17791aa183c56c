"""Real learned-BPE tokenization (VERDICT r4 #2).

A training-data pipeline budgets corpora in TOKENIZER tokens — the unit
of every data-mixing and pricing decision — so the engine carries a real
byte-pair-encoding tokenizer, not just the cheap regex proxy
(pipelines/text.bpe_ish_token_count, kept as the pre-pass: it needs no
merge table and no Python, so it remains the right first-cut filter at
100 TB; this module is the exact count for the docs that survive).

Model = the committed merges table ``data/bpe_merges.txt`` (learned
offline by scripts/learn_bpe.py, classic Sennrich-2016 BPE). Encoding
replays the merges greedily by rank: repeatedly merge the
LOWEST-RANKED adjacent pair present in the word until none applies —
the standard BPE inference loop (same scheme GPT-2/tiktoken use).

Scale shape: the encoder is an Arrow ``pandas_udf`` over a corpus
EXPLICITLY hash-repartitioned first (CLAUDE.md rule — AQE coalesces by
bytes and would serialize the CPU-bound Python stage otherwise). Per
Arrow batch the encoder memoizes word → token count, so cost is
O(distinct words per batch), not O(words); the merge table is loaded
once per executor (module-level lazy singleton) and is a few KB.

Oracle parity: __spark_entry__ ships a parquet computed by an
INDEPENDENT pure-Python encoder (priority-scan implementation, separate
code path) applying the same committed merges over the same
deterministic corpus — rows + schema + value-hash must match.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

END_OF_WORD = "</w>"

# shared pre-tokenizer contract (learner + both encoders): runs of
# alphanumerics are words, any other non-space char stands alone
_PRETOKEN_RE = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")

_MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "bpe_merges.txt",
)


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text)


def load_merge_ranks(path: str | None = None) -> dict[tuple[str, str], int]:
    """merges file → {(a, b): rank}; lower rank merges first."""
    ranks: dict[tuple[str, str], int] = {}
    with open(path or _MERGES_PATH) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, _, b = line.partition(" ")
            ranks[(a, b)] = len(ranks)
    return ranks


_RANKS: dict[tuple[str, str], int] | None = None


def _ranks() -> dict[tuple[str, str], int]:
    global _RANKS
    if _RANKS is None:
        _RANKS = load_merge_ranks()
    return _RANKS


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE inference: merge the lowest-ranked adjacent
    pair until no learned pair remains."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


@lru_cache(maxsize=1 << 16)
def _word_token_count(word: str) -> int:
    return len(encode_word(word, _ranks()))


def bpe_token_count_py(text: str) -> int:
    """Pure-driver helper (tests / small batches): exact BPE token count
    of one document."""
    return sum(_word_token_count(w) for w in pretokenize(text or ""))


def _bpe_count_batch(texts: pd.Series) -> pd.Series:
    ranks = _ranks()
    cache: dict[str, int] = {}

    def count(t: str | None) -> int:
        total = 0
        for w in pretokenize(t or ""):
            c = cache.get(w)
            if c is None:
                c = len(encode_word(w, ranks))
                cache[w] = c
            total += c
        return total

    return texts.map(count)


def bpe_token_count(text: Column) -> Column:
    """Column form of the exact learned-BPE token count (Arrow UDF;
    created lazily — pandas_udf needs an active session)."""
    from pyspark.sql.types import LongType

    return pandas_udf(_bpe_count_batch, LongType())(text)


def bpe_token_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs_hint: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens) exact learned-BPE counts; the corpus is
    explicitly hash-repartitioned before the CPU-bound Python stage so
    the UDF parallelizes by rows, not by AQE byte-coalesced splits.

    ``n_docs_hint`` (an upper bound on the doc count, when the caller
    knows it) caps the partition count at ~1k docs/task — the same
    scale-adaptive rule the fetch/canonicalize stages use — so tiny
    corpora don't pay (shuffle.partitions − needed) empty python tasks;
    partitioning never affects the per-doc counts."""
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if n_docs_hint is not None:
        n_part = max(1, min(n_part, -(-int(n_docs_hint) // 1024)))
    return (
        docs.repartition(n_part, id_col)
        .select(id_col, bpe_token_count(F.col(text_col)).alias("n_tokens"))
    )
