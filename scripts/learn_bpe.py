#!/usr/bin/env python
"""Learn a BPE merges table offline over the synthetic corpus and commit
it as package data (VERDICT r4 #2).

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public algorithm): start from characters
plus an end-of-word marker, repeatedly merge the most frequent adjacent
symbol pair across the (frequency-weighted) vocabulary, record each
merge in order. The committed table is the model; encoding replays the
merges greedily by rank (pipelines/bpe.py on the Spark side, an
independent scan encoder in __spark_entry__'s shipped oracle).

Determinism: ties on pair frequency break lexicographically, so the
learned table is reproducible bit-for-bit from the same corpus.

Usage:
    python scripts/learn_bpe.py [--corpus /root/testdata/sf0.01/documents.parquet]
                                [--merges 300] [--min-freq 2] [--out ...]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from crawler_distributed_spark.pipelines.bpe import END_OF_WORD, pretokenize


def learn_merges(
    word_freq: dict[str, int], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    # word -> symbol tuple (chars + end-of-word marker)
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freq.items():
        vocab[tuple(w) + (END_OF_WORD,)] = vocab.get(tuple(w) + (END_OF_WORD,), 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic: max frequency, lexicographic pair as tiebreaker
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--corpus", default="/root/testdata/sf0.01/documents.parquet"
    )
    ap.add_argument("--merges", type=int, default=300)
    ap.add_argument("--min-freq", type=int, default=2)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__),
            "..",
            "crawler_distributed_spark",
            "data",
            "bpe_merges.txt",
        ),
    )
    args = ap.parse_args()

    import duckdb

    texts = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT text FROM read_parquet('{args.corpus}')")
        .fetchall()
    ]
    wf: collections.Counter = collections.Counter()
    for t in texts:
        wf.update(pretokenize(t or ""))
    merges = learn_merges(dict(wf), args.merges, args.min_freq)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# BPE merges learned by scripts/learn_bpe.py over the synthetic\n"
            f"# corpus ({os.path.basename(os.path.dirname(args.corpus))}/documents"
            f".parquet, {len(texts)} docs, {len(wf)} distinct pretokens).\n"
            "# One merge per line, rank order; symbols are space-separated.\n"
        )
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges -> {args.out}")


if __name__ == "__main__":
    main()
