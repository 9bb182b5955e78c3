"""Stage CLUSTER: iterative DataFrame connected components.

Hash-min label propagation (the standard large-star/small-star simplification
for these cluster shapes): every node starts labeled with its own doc_id; each
round every node takes the min of its label and its neighbors' labels; stop at
fixpoint. Converges in O(diameter) rounds — dedup clusters are near-cliques or
short chains, so single-digit rounds in practice.

Per round: one join (labels x edges) + one hash agg (min per node) + one join
back — all shuffles on the node id. ``localCheckpoint`` every round truncates
the lineage so plan size stays constant (SURVEY.md §4.2 rule 2), and the
convergence counter rides that same action as a ``df.observe`` metric — ONE
Spark job per round, no separate driver-side count job.

The reference needs no transitivity step because its key is total content
(Duplication.py:44-46); approximate edges make closure explicit here.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation, functions as F

logger = logging.getLogger(__name__)


class ConvergenceError(RuntimeError):
    """Connected components exhausted max_iter with labels still changing."""


def connected_components(
    edges: DataFrame, max_iter: int = 50, on_nonconverged: str = "warn"
) -> DataFrame:
    """edges(a, b) [doc_id longs] -> labels(doc_id, cluster_id).

    cluster_id = min doc_id reachable; only nodes that appear in an edge are
    labeled (singletons are not clusters). Converges in O(diameter) rounds.

    If ``max_iter`` is exhausted while labels are still changing (e.g. a
    pathological chain of length > max_iter), the result would silently split
    one true cluster — so this never stays silent: ``on_nonconverged='warn'``
    logs the residual change count, ``'raise'`` raises ConvergenceError.
    """
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )

    n_changed = 0
    for it in range(max_iter):
        # candidate label for each dst = min over incoming neighbor labels
        prop = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                    < F.col("cluster_id")
                ).alias("changed"),
            )
        )
        # the checkpoint materialization IS the action that fills the metric
        obs = Observation(f"cc_round_{it}")
        labels = (
            new_labels.observe(
                obs, F.sum(F.col("changed").cast("long")).alias("n_changed")
            )
            .drop("changed")
            .localCheckpoint()
        )
        n_changed = int(obs.get["n_changed"] or 0)
        if n_changed == 0:
            break
    if n_changed > 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({n_changed} labels still changing) — clusters may be split"
        )
        if on_nonconverged == "raise":
            raise ConvergenceError(msg)
        logger.warning(msg)
    return labels


def clusters_from_labels(
    labels: DataFrame, docs: DataFrame, members_cap: int = 128
) -> DataFrame:
    """labels + docs -> clusters(cluster_id, size, cross_host, member_urls,
    canonical_url).

    canonical = earliest capture, tie-broken by url (min_by over
    (warc_ts, url) — reference keeps deterministic ordering in reports,
    SURVEY.md §2.5 T3). Member lists are capped with a BOUNDED agg buffer
    (row_number pre-mark + null-skipping collect_list, exact.py
    capped_members_agg); `size` is exact.
    """
    from replicheck_spark.operators.exact import capped_members_agg

    d = docs.select("doc_id", "url", "host", "warc_ts")
    rn, members = capped_members_agg("url", "cluster_id", members_cap)
    return (
        labels.join(d, "doc_id")
        .withColumn("_member_rn", rn)
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("size"),
            (F.countDistinct("host") > 1).alias("cross_host"),
            members.alias("member_urls"),
            F.min_by("url", F.struct("warc_ts", "url")).alias("canonical_url"),
        )
    )
