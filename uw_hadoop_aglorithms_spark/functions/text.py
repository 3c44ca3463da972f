"""Canonical tokenizer + token-array helpers (SURVEY.md §2.2 P1).

The reference imports Bespin's `Tokenizer` everywhere (reference
MapReduce/Counting/WordCount.java:19,61; Spark/PMI/PairsPMI.scala:5,47):
lowercase, split on non-alphanumerics, drop empties. This module is the
engine's single equivalent definition, expressed as JVM-side column
expressions (no Python in the hot path), plus the matching DuckDB SQL
fragment so oracles tokenize identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Java-regex / RE2-compatible token separator: anything outside [a-z0-9'].
TOKEN_SEP = r"[^a-z0-9']+"


def tokens(col: Column | str) -> Column:
    """text → array<string> of lowercase tokens, empties removed.

    Stays inside whole-stage codegen: lower/split/filter are all Catalyst
    expressions, so tokenization is vectorized JVM work at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SEP), lambda t: t != F.lit(""))


def bigrams(tok: Column) -> Column:
    """array of tokens → array<struct<w1,w2>> of adjacent pairs.

    `greatest(size-1, 0)` guards the <2-token case (slice with negative
    length raises under ANSI mode); zip_with pairs each token with its
    successor — the declarative form of the reference's per-line loop
    (reference MapReduce/Bigram/ComputeBigramRelativeFrequency.java:60-68).
    """
    n = F.greatest(F.size(tok) - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(tok, 1, n),
        F.slice(tok, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


#: DuckDB fragment computing the same token array from a `text` column.
#: (two single-quotes = escaped quote inside a SQL string literal)
TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), t -> t <> '')"
)
