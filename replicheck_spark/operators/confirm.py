"""Stage CONFIRM: candidate pairs -> confirmed edges.

Exact Jaccard over the stored distinct shingle-HASH arrays, entirely
JVM-side: ``size(array_intersect)/size(array_union)``. A semi-join prune
runs first so only docs that appear in a candidate pair shuffle their
shingle arrays. SimHash Hamming distance (``bit_count(xor)``) rides along as
the fast-path metric.

Hash-set Jaccard equals string-shingle Jaccard up to 32-bit collisions
(stored shingles are the low 32 bits of the 64-bit hash — see
``signature_schema``): collisions perturb J by O(|A||B|/2^32) ~ 1e-4 for
kilotoken docs, in either direction (cross-doc collisions raise it, a
collision between two shared shingles lowers it slightly), so only a pair
within ~1e-4 of the threshold can flip. The hash-array form is ~20x faster
than rebuilding string shingles at confirm time with interpreted
higher-order expressions (measured 2.5s vs 49.5s on a 20k-doc corpus), and
the 32-bit width halves the dominant column of the confirm shuffle.

Threshold semantics = the reference's documented-but-unshipped pairwise
Jaccard at min_similarity (/root/reference/Project.md:50,66; default 0.8 at
main.py:24-28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from replicheck_spark.config import DedupConfig


def _pair_ids(cand: DataFrame) -> DataFrame:
    return (
        cand.select(F.col("a").alias("doc_id"))
        .unionByName(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )


def confirm_pairs(
    cand: DataFrame,
    signatures: DataFrame,
    cfg: DedupConfig,
    signatures_b: DataFrame | None = None,
) -> DataFrame:
    """-> edges(a, b, a_url, b_url, a_sha, b_sha, jaccard, hamming,
    kind='near').

    Keeps pairs with jaccard >= min_similarity, excluding exact duplicates
    (identical sha256 — those carry kind='exact' from the exact stage).
    a_sha/b_sha ride along so callers can expand representative-level edges
    back to every member of each exact-duplicate text group.

    ``signatures_b``: for TWO-CORPUS candidates (cross_corpus_*), the b side
    resolves against its own signature table, each side pruned to its own
    candidate ids. Required whenever the two corpora's doc_id spaces may
    overlap (doc_id = xxhash64(url), so a re-crawled url carries the SAME id
    in both corpora): resolving both sides through one unioned frame would
    match an overlapping id against both corpora's signatures and emit
    duplicate/crossed edges.
    """
    if signatures_b is not None:
        pruned_a = signatures.select(
            "doc_id", "url", "sha256", "shingles", "simhash"
        ).join(cand.select(F.col("a").alias("doc_id")).distinct(),
               "doc_id", "left_semi")
        pruned_b = signatures_b.select(
            "doc_id", "url", "sha256", "shingles", "simhash"
        ).join(cand.select(F.col("b").alias("doc_id")).distinct(),
               "doc_id", "left_semi")
    else:
        pruned_a = pruned_b = signatures.select(
            "doc_id", "url", "sha256", "shingles", "simhash"
        ).join(_pair_ids(cand), "doc_id", "left_semi")
    pruned = pruned_a
    a_side = pruned.select(
        F.col("doc_id").alias("a"),
        F.col("url").alias("a_url"),
        F.col("sha256").alias("a_sha"),
        F.col("shingles").alias("a_sh"),
        F.col("simhash").alias("a_sim"),
    )
    b_side = pruned_b.select(
        F.col("doc_id").alias("b"),
        F.col("url").alias("b_url"),
        F.col("sha256").alias("b_sha"),
        F.col("shingles").alias("b_sh"),
        F.col("simhash").alias("b_sim"),
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    return (
        cand.join(a_side, "a")
        .join(b_side, "b")
        .filter(F.col("a_sha") != F.col("b_sha"))
        .withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union.cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("hamming", F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))))
        .filter(F.col("jaccard") >= F.lit(cfg.min_similarity))
        .select("a", "b", "a_url", "b_url", "a_sha", "b_sha", "jaccard",
                "hamming", F.lit("near").alias("kind"))
    )


def simhash_edges(
    cand: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Alternative confirm path: SimHash Hamming <= hamming_max (fast, no
    shingle rebuild). Exposed as its own operator; the main pipeline uses
    Jaccard for the recall guarantee."""
    sig = signatures.select("doc_id", "url", "simhash")
    a_side = sig.select(F.col("doc_id").alias("a"), F.col("url").alias("a_url"),
                        F.col("simhash").alias("a_sim"))
    b_side = sig.select(F.col("doc_id").alias("b"), F.col("url").alias("b_url"),
                        F.col("simhash").alias("b_sim"))
    return (
        cand.join(a_side, "a")
        .join(b_side, "b")
        .withColumn("hamming", F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))))
        .filter(F.col("hamming") <= cfg.hamming_max)
        .select("a", "b", "a_url", "b_url", "hamming", F.lit("simhash").alias("kind"))
    )
