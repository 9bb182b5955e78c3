"""Incremental (micro-batch) dedup over a pages stream.

``readStream`` -> extract/normalize (same pandas UDF as batch) -> per-batch
``foreachBatch`` merge into a persistent signature store:

* within-batch hits: exact and LSH-near duplicates arriving in the SAME
  micro-batch (including the entire first batch) — new x new, the later
  doc_id flagged as the duplicate;
* exact hits vs store: new docs whose sha256 already exists in the store;
* near hits vs store: LSH band match between the new batch's bands and the
  store's bands, confirmed by exact Jaccard — i.e. the batch operators reused
  verbatim on (delta x state) instead of (corpus x corpus).

Idempotency: Structured Streaming ``foreachBatch`` is at-least-once, so a
failure after the sink writes but before the checkpoint commit REPLAYS the
batch. Both sinks are therefore batch_id-keyed partition directories written
with ``mode=overwrite`` (``.../batch_id=N/``), and the store is always read
filtered to ``batch_id < current`` — a replay overwrites its own partition
byte-identically and never matches a doc against its own failed attempt.

State lives in a parquet (prod: Iceberg) directory, so the stream restarts
idempotently from its own checkpoint + the store — the streaming face of the
batch pipeline's resume contract. The store is read latest-per-doc_id (a url
re-delivered in ANY later batch supersedes its older rows, not just same-batch
re-delivery) and periodically compacted: every ``compact_every`` batches the
current batch's partition absorbs the whole live row set and the subsumed
partitions are reclaimed one batch later (replay-safe), so store size is
O(live urls), not O(deliveries). The store schema is the signature schema
verbatim; a store written before the 32-bit shingle change (array<long>
shingles, no anchors column) cannot be unioned with new batches — restart
such a stream with a fresh store (signatures are derivable from the pages
source, nothing is lost). Watermarking is not required: dedup state is
append-only by design (late data simply dedups against a larger store), which
is why this stays foreachBatch instead of applyInPandasWithState.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from replicheck_spark.config import DedupConfig
from replicheck_spark.operators.confirm import confirm_pairs
from replicheck_spark.operators.extract import eligible_docs, extract_docs
from replicheck_spark.operators.lsh import (
    candidate_pairs,
    capped_id_buckets,
    explode_bands,
)
from replicheck_spark.operators.signatures import compute_signatures

HIT_COLS = ["doc_id", "url", "dup_of", "kind"]

_log = __import__("logging").getLogger(__name__)


def _log_capped(capped: DataFrame, where: str) -> None:
    """Surface bucket-cap truncation per micro-batch (SURVEY §4.2: capped
    work is metered, never silent). One tiny agg job per batch — foreachBatch
    is job-driven anyway, and the frames derive from lazily-checkpointed
    bucket tables shared with the candidate consumers."""
    total = capped.agg(
        F.coalesce(F.sum("overflow"), F.lit(0)).alias("t")
    ).first()["t"]
    if total:
        _log.warning(
            "incremental dedup: %s candidate buckets truncated %d doc slots "
            "(bucket_cap) — possible recall loss this batch", where, int(total)
        )


class IncrementalDedup:
    """foreachBatch handler owning the signature store."""

    def __init__(self, spark: SparkSession, store_dir: str, cfg: DedupConfig,
                 hits_dir: str, compact_every: int = 8):
        self.spark = spark
        self.store_dir = store_dir
        self.hits_dir = hits_dir
        self.cfg = cfg
        # Once the store spans this many batch partitions, the compaction
        # batch folds the whole LIVE row set into its own partition and the
        # subsumed partitions are reclaimed next batch — bounding store size
        # at O(live urls), not O(deliveries). <= 1 disables compaction.
        self.compact_every = compact_every

    def _prior_batch_dirs(self, batch_id: int) -> list[str]:
        if not os.path.isdir(self.store_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.store_dir)):
            if not name.startswith("batch_id="):
                continue
            bid = int(name.split("=", 1)[1])
            if bid < batch_id and os.path.exists(
                os.path.join(self.store_dir, name, "_SUCCESS")
            ):
                out.append(os.path.join(self.store_dir, name))
        return out

    def _reclaim_subsumed(self, batch_id: int) -> None:
        """Delete store partitions subsumed by a COMMITTED compaction.

        Deferred to the next batch on purpose: at compaction batch B the
        ``batch_id=B`` partition holds every live row, but B is not
        checkpoint-committed until ``process_batch`` returns — deleting the
        subsumed dirs inside batch B would leave a replay of B with an empty
        prior store (missed store hits). Once a batch > B is running, B is
        committed, and the old partitions are pure space overhead (the
        latest-per-doc_id read dedupe already ignores their superseded
        rows), so dropping them changes no result."""
        marker = os.path.join(self.store_dir, "_compacted_at")
        if not os.path.exists(marker):
            return
        try:
            with open(marker) as f:
                compacted_at = int(f.read().strip())
        except ValueError:
            return
        if batch_id <= compacted_at:
            return  # the compaction batch itself may be replaying
        import shutil

        for name in os.listdir(self.store_dir):
            if not name.startswith("batch_id="):
                continue
            if int(name.split("=", 1)[1]) < compacted_at:
                shutil.rmtree(
                    os.path.join(self.store_dir, name), ignore_errors=True
                )

    def _within_batch_hits(self, sigs_new: DataFrame) -> DataFrame:
        """new x new duplicates; there is no arrival order INSIDE a micro-batch
        (doc_id is xxhash64(url), not a sequence), so the canonical original of
        a within-batch dup pair is the lexicographically smallest url — same
        deterministic-tiebreak discipline as clusters_from_labels.

        Exact: min-url member of each sha256 group is the original. Near: the
        batch LSH+confirm operators with ``rep_by="url"`` so the band
        representative IS the exact-stage canonical (min url); the greater-url
        side of each confirmed edge is the duplicate. The rep keying matters:
        doc_id is xxhash64(url), so a min-doc_id representative need not be
        the min-url member — near edges would then touch only an
        already-exact-flagged doc while the unflagged min-url canonical
        escaped, leaving near-duplicate pairs in the survivor set. With
        url-keyed reps, every non-representative member is exact-flagged and
        every representative carries its group's near edges, so the survivor
        set (unflagged docs) is near-duplicate-free.
        """
        cfg = self.cfg
        reps = (
            sigs_new.groupBy("sha256")
            .agg(
                F.min_by(F.struct("url", "doc_id"), "url").alias("rep"),
                F.count("*").alias("n"),
            )
            .filter(F.col("n") >= 2)
            .select(
                "sha256",
                F.col("rep.doc_id").alias("rep_id"),
                F.col("rep.url").alias("dup_of"),
            )
        )
        exact_in = (
            sigs_new.join(reps, "sha256")
            .filter(F.col("doc_id") != F.col("rep_id"))
            .select("doc_id", "url", "dup_of", F.lit("exact").alias("kind"))
        )
        cands, capped = candidate_pairs(
            explode_bands(sigs_new, cfg, rep_by="url"), cfg
        )
        _log_capped(capped, "within-batch")
        edges = confirm_pairs(cands, sigs_new, cfg)
        dup_is_b = F.col("b_url") > F.col("a_url")
        near_in = edges.select(
            F.when(dup_is_b, F.col("b")).otherwise(F.col("a")).alias("doc_id"),
            F.when(dup_is_b, F.col("b_url")).otherwise(F.col("a_url")).alias("url"),
            F.when(dup_is_b, F.col("a_url")).otherwise(F.col("b_url")).alias("dup_of"),
            F.col("kind"),
        )
        return exact_in.unionByName(near_in)

    def process_batch(self, pages_batch: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        self._reclaim_subsumed(batch_id)
        docs_new = eligible_docs(extract_docs(pages_batch), cfg.min_size)
        sigs_new = compute_signatures(docs_new, cfg).localCheckpoint()

        hits = self._within_batch_hits(sigs_new)

        prior = self._prior_batch_dirs(batch_id)
        store = None
        if prior:
            # basePath recovers batch_id from the partition dir names — it is
            # the supersede ordering below.
            store = self.spark.read.option("basePath", self.store_dir).parquet(
                *prior
            )
            # A url re-delivered in ANY later batch supersedes its earlier
            # store rows: keeping a stale signature would (a) flag the doc as
            # an exact duplicate of ITSELF and (b) give confirm_pairs two
            # conflicting signature rows for one doc_id (wrong jaccard,
            # duplicate/contradictory edges) when the re-crawl's content
            # changed. The current batch's anti-join alone only covers
            # re-delivery in THIS batch — a url delivered in batch 1 and
            # re-delivered in batch 3 would otherwise sit in the store twice
            # from batch 4 on, so latest-per-doc_id wins first:
            sig_cols = [
                c for c in store.columns if c not in ("doc_id", "batch_id")
            ]
            store = (
                store.groupBy("doc_id")
                .agg(F.max_by(F.struct(*sig_cols), "batch_id").alias("s"))
                .select("doc_id", "s.*")
            )
            # ... then drop rows superseded by THIS batch.
            store = store.join(
                sigs_new.select("doc_id"), "doc_id", "left_anti"
            )
            # exact hits: sha already present. ONE canonical (min url) per
            # stored sha — joining every store row with the sha would emit k
            # duplicate hit rows per new doc when the store already holds k
            # identical texts.
            store_reps = store.groupBy("sha256").agg(
                F.min("url").alias("dup_of")
            )
            exact_hits = (
                sigs_new.select("doc_id", "url", "sha256")
                .join(store_reps, "sha256")
                .filter(F.col("url") != F.col("dup_of"))
                .select("doc_id", "url", "dup_of", F.lit("exact").alias("kind"))
            )
            # near hits: band collision new x store, Jaccard-confirmed
            # rep_by="url" on the NEW side: the min-url canonical of each
            # within-batch exact group must be the doc that receives the
            # store-near flag (its other members are already exact-flagged)
            new_bands = explode_bands(sigs_new, cfg, rep_by="url").select(
                "band_id", "band_hash", F.col("doc_id").alias("a")
            )
            # Cap the store side per band bucket with the SAME salted
            # two-level aggregation as the batch path (capped_id_buckets): a
            # hot band shared by m store docs and n new docs would otherwise
            # fan out m*n rows unbounded, and a single-level collect_list
            # would materialize the hot band's full store-side id list in one
            # aggregation buffer before any cap applied. Truncation is
            # metered, never silent.
            store_buckets = capped_id_buckets(
                explode_bands(store, cfg), ["band_id", "band_hash"],
                cfg.bucket_cap,
            ).localCheckpoint(eager=False)
            _log_capped(
                store_buckets.filter(F.col("overflow") > 0).select("overflow"),
                "new-vs-store",
            )
            # orientation matters: a = the NEW doc, b = the store doc
            cands = (
                new_bands.join(store_buckets, ["band_id", "band_hash"])
                .select("a", F.explode("ids").alias("b"))
                .filter(F.col("a") != F.col("b"))
                .dropDuplicates(["a", "b"])
            )
            both = store.unionByName(sigs_new)
            near = confirm_pairs(cands, both, cfg).select(
                F.col("a").alias("doc_id"), F.col("a_url").alias("url"),
                F.col("b_url").alias("dup_of"), F.col("kind"),
            )
            hits = hits.unionByName(exact_hits).unionByName(near)

        # batch_id-keyed overwrite => replay-idempotent (see module docstring)
        hits.select(HIT_COLS).write.mode("overwrite").parquet(
            f"{self.hits_dir}/batch_id={batch_id}"
        )
        # Compaction: once the store spans compact_every partitions, this
        # batch's partition absorbs the whole LIVE row set (``store`` is
        # already latest-per-doc_id deduped and anti-joined against this
        # batch, so superseded rows are dropped here — the store converges to
        # O(live urls) rows, not O(deliveries)). The subsumed partitions are
        # reclaimed at the NEXT batch (see _reclaim_subsumed); until then the
        # read-side dedupe makes their presence harmless, and a replay of
        # this batch recomputes the identical compacted partition.
        compacting = store is not None and len(prior) + 1 >= self.compact_every > 1
        store_out = sigs_new.unionByName(store) if compacting else sigs_new
        store_out.write.mode("overwrite").parquet(
            f"{self.store_dir}/batch_id={batch_id}"
        )
        if compacting:
            with open(os.path.join(self.store_dir, "_compacted_at"), "w") as f:
                f.write(str(batch_id))

    def hits(self) -> DataFrame:
        # partition discovery restores batch_id from the directory names
        return self.spark.read.parquet(self.hits_dir)


def start_incremental_dedup(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    hits_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    compact_every: int = 8,
):
    """File-source stream of pages parquet -> incremental dedup query."""
    cfg = cfg or DedupConfig()
    pages_schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    stream = spark.readStream.schema(pages_schema).parquet(source_dir)
    handler = IncrementalDedup(spark, store_dir, cfg, hits_dir,
                               compact_every=compact_every)
    return (
        stream.writeStream.foreachBatch(handler.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
