"""JVM-side k-shingle expressions (no Python, whole-stage codegen).

The distinct k-gram set of a pre-tokenized text column, as Catalyst array
expressions: split -> sequence -> slice -> concat_ws -> array_distinct.
Semantically identical to ``textnorm.shingle_strings`` (docs shorter than k
contribute one whole-doc shingle) and to the DuckDB oracle construction in
``__spark_entry__`` — all three produce the same string sets, which is what
makes the confirm stage's Jaccard EXACTLY equal to the oracle's.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def shingles_expr(text_col: str, k: int) -> Column:
    """array<string> of distinct k-shingles of a space-separated text column.

    Empty text -> empty array.
    """
    toks = F.split(F.col(text_col), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    return F.when(F.col(text_col) == "", F.array().cast("array<string>")).otherwise(sh)


def jaccard_expr(a_col: str, b_col: str) -> Column:
    """Exact Jaccard of two distinct-element array columns (JVM built-ins)."""
    inter = F.size(F.array_intersect(F.col(a_col), F.col(b_col)))
    union = F.size(F.array_union(F.col(a_col), F.col(b_col)))
    return F.when(
        union > 0, inter.cast("double") / union.cast("double")
    ).otherwise(F.lit(0.0))
