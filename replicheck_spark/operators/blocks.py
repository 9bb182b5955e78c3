"""Sub-document BLOCK granularity: one document -> N fixed-token-window units.

The reference's core record is a block WITHIN a file (its parser emits one
unit per function/class via the tree-sitter capture loop,
/root/reference/replicheck/parser.py:42-61,63-151 — one file -> N units);
web text has no AST, so the analog is fixed non-overlapping token windows.
Everything here is JVM expressions (sequence/slice/concat_ws/posexplode —
one corpus scan, no Python), and the unit table then feeds the SAME dedup
operators the document table does: unit-level dedup catches a shared
paragraph between two long pages whose whole-document Jaccard is far below
any LSH curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from replicheck_spark.config import DedupConfig


def explode_blocks(docs: DataFrame, block_tokens: int = 100) -> DataFrame:
    """docs(doc_id, text) -> units(doc_id, block_idx, unit_id, block_text,
    n_block_tokens): non-overlapping ``block_tokens``-token windows, partial
    tail window included. unit_id = xxhash64("<doc_id>#<block_idx>")."""
    toks = F.split(F.col("text"), " ")
    n_blocks = F.ceil(F.size(toks) / F.lit(block_tokens)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_blocks - 1, F.lit(0)))
    blocks = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * block_tokens + 1, block_tokens)
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(blocks).alias("block_idx", "block_text"))
        .withColumn(
            "unit_id",
            F.xxhash64(F.concat_ws("#", F.col("doc_id"), F.col("block_idx"))),
        )
        .withColumn(
            "n_block_tokens",
            F.when(F.col("block_text") == "", F.lit(0)).otherwise(
                F.size(F.split("block_text", " "))
            ),
        )
    )


def _substantial(units: DataFrame, block_tokens: int,
                 min_block_tokens: int | None) -> DataFrame:
    """Drop sub-threshold tail windows. Without this, a doc's final partial
    window can be arbitrarily small — two docs whose lengths are ≡1 (mod
    block_tokens) and end in the same common word would share a '1-token
    block', reported to users as a block_tokens-token duplicate; empty docs
    all share the '' block. Default threshold: half a block."""
    if min_block_tokens is None:
        min_block_tokens = block_tokens // 2
    return units.filter(F.col("n_block_tokens") >= min_block_tokens)


def block_exact_dups(
    docs: DataFrame, block_tokens: int = 100,
    min_block_tokens: int | None = None,
) -> DataFrame:
    """Blocks duplicated ACROSS documents: (block_sha, n_blocks, n_docs) for
    every block text appearing in >= 2 distinct docs. Hash agg with map-side
    combine; SQL-expressible (DuckDB oracle). Tail windows below
    ``min_block_tokens`` (default block_tokens//2) are excluded — see
    _substantial."""
    units = _substantial(
        explode_blocks(docs, block_tokens), block_tokens, min_block_tokens
    )
    return (
        units.groupBy(F.sha2("block_text", 256).alias("block_sha"))
        .agg(
            F.count("*").alias("n_blocks"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def block_near_doc_pairs(
    docs: DataFrame, cfg: DedupConfig, block_tokens: int = 100,
    min_block_tokens: int | None = None,
) -> DataFrame:
    """Document pairs linked by a NEAR-duplicate block: explode to units, run
    the standard MinHash-LSH pair operator on the unit table, map unit pairs
    back to distinct doc pairs (a < b, self-pairs dropped).

    This is the doc->units->cluster path the reference's block scanner
    implements for code (one file's block matching another file's block);
    whole-document LSH cannot see these pairs.
    """
    from replicheck_spark.operators.dedup_ops import minhash_lsh_pairs

    units = _substantial(
        explode_blocks(docs, block_tokens), block_tokens, min_block_tokens
    )
    unit_docs = units.select(
        F.col("unit_id").alias("doc_id"), F.col("block_text").alias("text")
    )
    unit_pairs = minhash_lsh_pairs(unit_docs, cfg)
    m = units.select("unit_id", F.col("doc_id").alias("owner"))
    return (
        unit_pairs.join(m.withColumnRenamed("unit_id", "a").withColumnRenamed("owner", "doc_a"), "a")
        .join(m.withColumnRenamed("unit_id", "b").withColumnRenamed("owner", "doc_b"), "b")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
        )
        .distinct()
    )
