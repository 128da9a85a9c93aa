"""BPE vocabulary training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") as DataFrame iterations —
the merge-table learning pass a tokenizer build runs before any model
training.

Algorithm (the classic word-level variant): collapse the corpus to its
word-frequency table once; represent each word as a character symbol
sequence ending in the '</w>' terminator; each round, count adjacent
symbol pairs weighted by word frequency, pick the most frequent pair
(ties to the lexicographically smallest — deterministic), and merge its
occurrences LEFT-TO-RIGHT in every word. The merge table IS the learned
tokenizer.

Scale design (100 TB):
- The corpus is touched ONCE (word-count aggregation — one shuffle on
  the word). Training then iterates over the VOCABULARY table, which is
  orders of magnitude smaller than the corpus (the fastBPE observation);
  each round is one explode + one bounded partial aggregation.
- The per-round argmax pair is the only driver-side value (two short
  strings + a count — the kmeans-centroid pattern), re-entering the plan
  as literals.
- The merge application is a pure projection: a JVM aggregate fold over
  each word's symbol array (left-to-right, non-overlapping — exactly the
  sequential scan of the reference implementation), no UDF.

Determinism: integer counts, lexicographic tie-breaks, and a fold whose
step only inspects (previous symbol, current symbol) — replayable
bit-for-bit as SQL CTEs (DuckDB list_reduce with a list accumulator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word terminator so merges cannot cross word boundaries
EOW = "</w>"


def word_symbols(word: Column) -> Column:
    """Character symbol sequence of a word plus the '</w>' terminator."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(EOW)))


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Merge every LEFT-TO-RIGHT, non-overlapping adjacent (left, right)
    occurrence in the symbol array — a JVM fold: the accumulator list's
    last element merges with the incoming symbol when they form the
    pair. Equivalent to the reference scan because a just-merged symbol
    (left || right) can never equal `left` (right is non-empty)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for 1-symbol
    sequences)."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + F.lit(1)).alias("r"),
            ),
        )
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", rounds: int = 8
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Learn `rounds` BPE merges from the corpus. Returns (the final
    vocabulary DataFrame (word, cnt, syms), the merge table
    [(left, right, pair_count), ...] in learning order)."""
    from postgraph_spark.functions.text import tokens

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = words.select(
        "word", "cnt", word_symbols(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(rounds):
        top = (
            vocab.select("cnt", F.explode(adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, c))
        vocab = vocab.select(
            "word", "cnt", merge_pair(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    return vocab, merges
