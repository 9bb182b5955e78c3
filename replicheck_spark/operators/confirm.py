"""Stage CONFIRM: candidate pairs -> confirmed edges.

Exact Jaccard over k-shingle STRING sets, entirely JVM-side: the shingle
arrays are (re)built with Catalyst expressions (functions/shingles_sql.py)
ONLY for the docs that appear in a candidate pair — a semi-join prune first,
so the corpus-sized tables never shuffle shingles. SimHash Hamming distance
(``bit_count(xor)``) rides along as the fast-path metric.

Using string shingles (not the signature UDF's internal 64-bit hashes) makes
the confirmed Jaccard EXACTLY the oracle's value — same strings, same integer
division — not merely equal w.h.p.

Threshold semantics = the reference's documented-but-unshipped pairwise
Jaccard at min_similarity (/root/reference/Project.md:50,66; default 0.8 at
main.py:24-28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from replicheck_spark.config import DedupConfig
from replicheck_spark.functions.shingles_sql import jaccard_expr, shingles_expr


def _pair_ids(cand: DataFrame) -> DataFrame:
    return (
        cand.select(F.col("a").alias("doc_id"))
        .unionByName(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )


def confirm_pairs(
    cand: DataFrame,
    signatures: DataFrame,
    docs: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """-> edges(a, b, a_url, b_url, jaccard, hamming, kind='near').

    Keeps pairs with jaccard >= min_similarity, excluding exact duplicates
    (identical sha256 — those carry kind='exact' from the exact stage).
    `docs` supplies norm_text for the JVM shingle rebuild; `signatures`
    supplies simhash.
    """
    pruned = (
        docs.select("doc_id", "url", "sha256", "norm_text")
        .join(_pair_ids(cand), "doc_id", "left_semi")
        .withColumn("sh", shingles_expr("norm_text", cfg.shingle_k))
        .join(signatures.select("doc_id", "simhash"), "doc_id")
        .select("doc_id", "url", "sha256", "sh", "simhash")
    )
    a_side = pruned.select(
        F.col("doc_id").alias("a"),
        F.col("url").alias("a_url"),
        F.col("sha256").alias("a_sha"),
        F.col("sh").alias("a_sh"),
        F.col("simhash").alias("a_sim"),
    )
    b_side = pruned.select(
        F.col("doc_id").alias("b"),
        F.col("url").alias("b_url"),
        F.col("sha256").alias("b_sha"),
        F.col("sh").alias("b_sh"),
        F.col("simhash").alias("b_sim"),
    )
    return (
        cand.join(a_side, "a")
        .join(b_side, "b")
        .filter(F.col("a_sha") != F.col("b_sha"))
        .withColumn("jaccard", jaccard_expr("a_sh", "b_sh"))
        .withColumn("hamming", F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))))
        .filter(F.col("jaccard") >= F.lit(cfg.min_similarity))
        .select("a", "b", "a_url", "b_url", "jaccard", "hamming",
                F.lit("near").alias("kind"))
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
