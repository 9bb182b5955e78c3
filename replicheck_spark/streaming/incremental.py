"""Incremental (micro-batch) dedup over a pages stream.

``readStream`` -> extract/normalize (same pandas UDF as batch) -> per-batch
``foreachBatch`` merge into a persistent signature store:

* exact hits: new docs whose sha256 already exists in the store;
* near hits: LSH band match between the new batch's bands and the store's
  bands, confirmed by exact Jaccard — i.e. the batch operators reused
  verbatim on (delta x state) instead of (corpus x corpus).

State lives in a parquet (prod: Iceberg) directory, so the stream restarts
idempotently from its own checkpoint + the store — the streaming face of the
batch pipeline's resume contract. Watermarking is not required: dedup state is
append-only by design (late data simply dedups against a larger store), which
is why this stays foreachBatch instead of applyInPandasWithState.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from replicheck_spark.config import DedupConfig
from replicheck_spark.operators.confirm import confirm_pairs
from replicheck_spark.operators.extract import eligible_docs, extract_docs
from replicheck_spark.operators.lsh import explode_bands
from replicheck_spark.operators.signatures import compute_signatures


class IncrementalDedup:
    """foreachBatch handler owning the signature store."""

    def __init__(self, spark: SparkSession, store_dir: str, cfg: DedupConfig,
                 hits_dir: str):
        self.spark = spark
        self.store_dir = store_dir
        self.hits_dir = hits_dir
        self.cfg = cfg

    def _store_exists(self) -> bool:
        return os.path.exists(os.path.join(self.store_dir, "_SUCCESS"))

    def process_batch(self, pages_batch: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        docs_new = eligible_docs(extract_docs(pages_batch), cfg.min_size)
        sigs_new = compute_signatures(docs_new, cfg).localCheckpoint()
        if self._store_exists():
            store = self.spark.read.parquet(self.store_dir)
            # exact hits: sha already present
            exact_hits = (
                sigs_new.select("doc_id", "url", "sha256")
                .join(
                    store.select(F.col("sha256"), F.col("url").alias("dup_of")),
                    "sha256",
                )
                .select("doc_id", "url", "dup_of", F.lit("exact").alias("kind"),
                        F.lit(batch_id).alias("batch_id"))
            )
            # near hits: band collision new x store, Jaccard-confirmed
            new_bands = explode_bands(sigs_new, cfg).select(
                "band_id", "band_hash", F.col("doc_id").alias("a")
            )
            store_bands = explode_bands(store, cfg).select(
                "band_id", "band_hash", F.col("doc_id").alias("b")
            )
            # orientation matters: a = the NEW doc, b = the store doc
            cands = (
                new_bands.join(store_bands, ["band_id", "band_hash"])
                .filter(F.col("a") != F.col("b"))
                .select("a", "b")
                .dropDuplicates(["a", "b"])
            )
            both = store.unionByName(sigs_new)
            near = confirm_pairs(cands, both, cfg).select(
                F.col("a").alias("doc_id"), F.col("a_url").alias("url"),
                F.col("b_url").alias("dup_of"), F.col("kind"),
                F.lit(batch_id).alias("batch_id"),
            )
            hits = exact_hits.unionByName(near)
            hits.write.mode("append").parquet(self.hits_dir)
            sigs_new.write.mode("append").parquet(self.store_dir)
        else:
            sigs_new.write.mode("overwrite").parquet(self.store_dir)

    def hits(self) -> DataFrame:
        return self.spark.read.parquet(self.hits_dir)


def start_incremental_dedup(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    hits_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
):
    """File-source stream of pages parquet -> incremental dedup query."""
    cfg = cfg or DedupConfig()
    pages_schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    stream = spark.readStream.schema(pages_schema).parquet(source_dir)
    handler = IncrementalDedup(spark, store_dir, cfg, hits_dir)
    return (
        stream.writeStream.foreachBatch(handler.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
