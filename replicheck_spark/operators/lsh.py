"""Stage CANDS: LSH band explode -> salted groupBy -> candidate pairs.

Dataflow (all DataFrame ops; the north_rule's "salted repartition + groupBy"):

1. ``posexplode(bands)`` -> one row per (doc_id, band_id, band_hash).
2. Exact-duplicate suppression: within a band, docs with identical sha256
   would pairwise-collide in EVERY band and are already linked by the exact
   stage — keep one doc per (band, hash, sha256) via min aggregation. This is
   what makes giant identical clusters (the classic web-dedup skew source)
   cost O(cluster) instead of O(cluster^2) here.
3. Salting: ``salt = pmod(xxhash64(doc_id), S)`` splits every bucket into S
   chunks; ``groupBy(band_id, band_hash, salt)`` collects bounded chunks in
   parallel — no single task ever owns a giant bucket.
4. Bucket cap: chunks are truncated at ``bucket_cap`` members (sorted by
   doc_id, deterministic); the overflow COUNT is emitted via
   ``capped_buckets`` for the metrics table — capped work is logged, never
   silently dropped (SURVEY.md §4.2 rule 1).
5. Pairs = intra-chunk pairs + inter-chunk (chunk_i x chunk_j, i<j) pairs from
   a self-join on (band_id, band_hash); AQE skew-join splitting covers
   residual imbalance. Pair dedup is a hash agg on (a, b).

The pair explosion uses JVM array expressions (transform/flatten/filter), not
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from replicheck_spark.config import DedupConfig


def explode_bands(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures -> (doc_id, sha256, band_id, band_hash, salt), exact-dup
    suppressed to one representative per (band, hash, sha256)."""
    b = signatures.select(
        "doc_id",
        "sha256",
        F.posexplode("bands").alias("band_id", "band_hash"),
    )
    # one representative per identical-content group per bucket (step 2)
    b = b.groupBy("band_id", "band_hash", "sha256").agg(
        F.min("doc_id").alias("doc_id")
    )
    return b.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.salt_buckets))
    )


def _chunked(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Salted chunks: (band_id, band_hash, salt, ids array<long> sorted+capped,
    overflow int)."""
    return (
        bands.groupBy("band_id", "band_hash", "salt")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("all_ids"))
        .withColumn("overflow", F.greatest(F.size("all_ids") - cfg.bucket_cap, F.lit(0)))
        .withColumn("ids", F.slice("all_ids", 1, cfg.bucket_cap))
        .drop("all_ids")
    )


def _pairs_from_two_arrays(a_col: str, b_col: str):
    """All (x, y) with x from a_col, y from b_col, emitted as a<b structs."""
    return F.filter(
        F.flatten(
            F.transform(
                F.col(a_col),
                lambda x: F.transform(
                    F.col(b_col),
                    lambda y: F.struct(
                        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                    ),
                ),
            )
        ),
        lambda p: p["a"] != p["b"],
    )


def candidate_pairs(bands: DataFrame, cfg: DedupConfig) -> tuple[DataFrame, DataFrame]:
    """-> (cand_pairs(a, b), capped_buckets(band_id, band_hash, salt, overflow)).

    a < b (doc_id order), globally deduplicated.
    """
    chunks = _chunked(bands, cfg)
    capped = chunks.filter(F.col("overflow") > 0).select(
        "band_id", "band_hash", "salt", "overflow"
    )

    # intra-chunk pairs: ids x ids, i<j realized by a<b on distinct elements
    intra = (
        chunks.filter(F.size("ids") >= 2)
        .select(F.explode(_pairs_from_two_arrays("ids", "ids")).alias("p"))
        .select("p.a", "p.b")
    )

    # inter-chunk pairs: self-join chunks of the same bucket, salt_a < salt_b
    left = chunks.select(
        "band_id", "band_hash",
        F.col("salt").alias("salt_a"), F.col("ids").alias("ids_a"),
    )
    right = chunks.select(
        "band_id", "band_hash",
        F.col("salt").alias("salt_b"), F.col("ids").alias("ids_b"),
    )
    inter = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("salt_a") < F.col("salt_b"))
        .select(F.explode(_pairs_from_two_arrays("ids_a", "ids_b")).alias("p"))
        .select("p.a", "p.b")
    )

    pairs = intra.unionByName(inter).dropDuplicates(["a", "b"])
    return pairs, capped
