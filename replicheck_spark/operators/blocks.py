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


def boilerplate_strip(
    docs: DataFrame, block_tokens: int = 100, min_docs: int = 2,
    min_block_tokens: int | None = None,
) -> DataFrame:
    """CCNet-style boilerplate REMOVAL at block granularity: a substantial
    block (>= min_block_tokens tokens, see _substantial) whose text occurs in
    >= ``min_docs`` distinct documents is boilerplate; every document is
    rewritten without its boilerplate blocks (CCNet dedups paragraphs by
    corpus-wide hash frequency — fixed token windows are this engine's
    paragraph analog, same convention as the rest of this module).

    Output, one row per input doc: (doc_id, n_blocks, n_boilerplate,
    clean_text). clean_text re-joins the surviving blocks in order with
    single spaces — an exact round trip of the original text when nothing is
    removed (block boundaries split the token array exactly; empty tokens
    from repeated separators survive the re-join).

    Scale design: the boilerplate key set is the HEAD of the block-frequency
    distribution, small at any sane threshold, so it is BROADCAST; the
    affected-doc id set (docs holding >= 1 boilerplate block) is likewise
    small and broadcast, so the overwhelming majority of the corpus — the
    untouched docs — is passed through with in-row column math and NO
    per-doc shuffle. Only affected docs pay the groupBy rebuild, and only
    their blocks are re-shuffled.
    """
    units = explode_blocks(docs, block_tokens).withColumn(
        "block_sha", F.sha2("block_text", 256)
    )
    # both frames feed two consumers each -> cut the plan once (same
    # multi-consumer lazy-checkpoint discipline as _expand_exact_members)
    boiler = (
        _substantial(units, block_tokens, min_block_tokens)
        .groupBy("block_sha")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("block_sha")
        .localCheckpoint(eager=False)
    )
    affected_ids = (
        units.join(F.broadcast(boiler), "block_sha")
        .select("doc_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    marked = (
        units.join(F.broadcast(affected_ids), "doc_id", "left_semi")
        .join(
            F.broadcast(boiler.withColumn("is_boiler", F.lit(True))),
            "block_sha", "left",
        )
        .withColumn("is_boiler", F.coalesce("is_boiler", F.lit(False)))
    )
    rebuilt = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.col("is_boiler").cast("long")).alias("n_boilerplate"),
        F.concat_ws(
            " ",
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct("block_idx", "is_boiler", "block_text")
                        )
                    ),
                    lambda s: ~s["is_boiler"],
                ),
                lambda s: s["block_text"],
            ),
        ).alias("clean_text"),
    )
    toks = F.split(F.col("text"), " ")
    untouched = docs.join(F.broadcast(affected_ids), "doc_id", "left_anti").select(
        "doc_id",
        F.greatest(
            F.ceil(F.size(toks) / F.lit(block_tokens)), F.lit(1)
        ).cast("long").alias("n_blocks"),
        F.lit(0).cast("long").alias("n_boilerplate"),
        F.col("text").alias("clean_text"),
    )
    return rebuilt.unionByName(untouched)


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
