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
4. Bucket caps at both levels (per salt chunk, then per merged bucket), each
   truncation counted into ``capped_buckets`` for the metrics table — capped
   work is logged, never silently dropped (SURVEY.md §4.2 rule 1).
5. Pairs explode from the merged bucket arrays with JVM expressions
   (transform/flatten/filter — no Python); pair dedup is a hash agg on (a, b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from replicheck_spark.config import DedupConfig


def explode_bands(
    signatures: DataFrame, cfg: DedupConfig, rep_by: str = "doc_id"
) -> DataFrame:
    """signatures -> (doc_id, band_id, band_hash, salt), exact-dup suppressed
    to one representative per identical-text (sha256) group.

    Suppression happens BEFORE the explode: identical texts have identical
    band vectors, so the global per-sha representative (min doc_id) is
    exactly the per-(band, hash, sha) min the semantics require — one
    map-side-combined hash agg over doc rows, instead of a bands-times-larger
    post-explode groupBy keyed on 64-char sha strings (measured: the
    post-explode version ANTI-scaled 8->32 cores at 400k docs; the string key
    dominated the shuffle).

    ``rep_by="url"`` picks the min-URL member as the representative instead of
    min doc_id (requires a ``url`` column). The streaming incremental path
    needs this so the band representative IS the exact-stage canonical: with
    doc_id = xxhash64(url) the two orderings diverge, and a min-url member
    that is not the min-doc_id member would carry no near edges and escape
    flagging (its rep is already exact-flagged) — survivors could still
    contain near-duplicate pairs. Batch clustering is agnostic (star edges
    attach the rep to its component either way).
    """
    if rep_by == "url":
        reps = signatures.select("sha256", "doc_id", "url", "bands").groupBy(
            "sha256"
        ).agg(
            F.min_by("doc_id", "url").alias("doc_id"),
            F.first("bands").alias("bands"),  # identical within a sha group
        )
    else:
        reps = signatures.select("sha256", "doc_id", "bands").groupBy("sha256").agg(
            F.min("doc_id").alias("doc_id"),
            F.first("bands").alias("bands"),  # identical within a sha group
        )
    b = reps.select(
        "doc_id",
        F.posexplode("bands").alias("band_id", "band_hash"),
    )
    return b.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.salt_buckets))
    )


def intra_array_pairs(col: str):
    """All unordered pairs {x, y} within one sorted id array, as a<b structs.

    The SHARED bucket-to-pairs expansion for every bucketed candidate
    generator (LSH bands here, substring anchors, embedding LSH buckets) —
    one JVM expression, no join. The a<b filter emits each pair once
    (the earlier least/greatest form emitted every pair twice and leaned on
    dropDuplicates to clean up)."""
    return F.filter(
        F.flatten(
            F.transform(
                F.col(col),
                lambda x: F.transform(
                    F.col(col),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        ),
        lambda p: p["a"] < p["b"],
    )


def capped_id_buckets(
    rows: DataFrame, keys: list[str], cap: int, id_col: str = "doc_id"
) -> DataFrame:
    """Two-level salted capped aggregation: (keys..., salt, id) rows ->
    (keys..., ids array<=cap sorted, overflow count).

    THE skew pattern for every bucketed candidate generator (LSH bands,
    embedding buckets, the streaming store-side band join): level 1 hash-aggs
    on (keys, salt) so a hot bucket's members land on ``salt_buckets``
    different reducers and no task ever materializes the whole bucket; level 2
    merges the bounded chunks and re-caps. Both levels are partial+final hash
    aggs (map-side combine). Every truncation at either level is counted into
    ``overflow`` — metered, never silent. Requires a ``salt`` column
    (``explode_bands`` adds one)."""
    chunks = (
        rows.groupBy(*keys, "salt")
        .agg(F.sort_array(F.collect_list(id_col)).alias("chunk_ids"))
        .withColumn(
            "chunk_over", F.greatest(F.size("chunk_ids") - cap, F.lit(0))
        )
        .withColumn("chunk_ids", F.slice("chunk_ids", 1, cap))
    )
    return (
        chunks.groupBy(*keys)
        .agg(
            F.sort_array(F.flatten(F.collect_list("chunk_ids"))).alias("all_ids"),
            F.sum("chunk_over").alias("chunk_over"),
        )
        .withColumn(
            "overflow",
            F.col("chunk_over") + F.greatest(F.size("all_ids") - cap, F.lit(0)),
        )
        .withColumn("ids", F.slice("all_ids", 1, cap))
        .drop("all_ids", "chunk_over")
    )


def candidate_pairs(
    bands: DataFrame, cfg: DedupConfig
) -> tuple[DataFrame, DataFrame]:
    """-> (cand_pairs(a, b), capped_buckets(band_id, band_hash, overflow)).

    a < b (doc_id order), globally deduplicated.

    Two-level capped aggregation (the salted-repartition skew design, no joins
    or windows):

    1. hash agg on (band, hash, SALT): each salt chunk collects at most
       ``bucket_cap`` sorted doc_ids — a giant bucket's members land on
       ``salt_buckets`` different reducers, so no task ever materializes the
       whole bucket;
    2. hash agg on (band, hash): merge the (already bounded) chunks, re-cap at
       ``bucket_cap`` — per-row memory is bounded by salt_buckets*bucket_cap;
    3. explode intra-bucket pairs from the merged array (JVM expressions);
       every truncation is counted into ``capped`` — logged, never silent.

    Both aggs are partial+final hash aggregations (map-side combine), so the
    shuffled volume after level 1 is proportional to distinct buckets, not
    band rows.

    Truncation metering: ``capped`` derives from the lazily-checkpointed
    bucket table, so once any consumer of ``pairs`` has run, an aggregate
    over ``capped`` (e.g. ``sum(overflow)``) is a cheap job over the cached
    partitions — the pattern the pipeline uses to record ``cands_capped``
    AFTER its final stage. A ``df.observe`` metric is NOT usable here: a
    lazy ``localCheckpoint`` anywhere downstream of the observe node fires a
    build-time QueryExecutionListener event with empty accumulators that
    resolves the Observation to zero forever (measured on Spark 4.1.2; the
    r3 pipeline silently recorded dropped=0 unconditionally because of it).
    """
    buckets = capped_id_buckets(
        bands, ["band_id", "band_hash"], cfg.bucket_cap
    )
    # lazy: materialized once at first consumption, reused by capped + pairs;
    # no dedicated barrier job (capped often goes unconsumed in bench mode)
    buckets = buckets.localCheckpoint(eager=False)

    capped = buckets.filter(F.col("overflow") > 0).select(
        "band_id", "band_hash", "overflow"
    )
    pairs = (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(intra_array_pairs("ids")).alias("p"))
        .select("p.a", "p.b")
        .dropDuplicates(["a", "b"])
    )
    return pairs, capped
