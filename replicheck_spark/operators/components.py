"""Stage CLUSTER: iterative DataFrame connected components.

Hash-min label propagation (the standard large-star/small-star simplification
for these cluster shapes): every node starts labeled with its own doc_id; each
round every node takes the min of its label and its neighbors' labels; stop at
fixpoint. Converges in O(diameter) rounds — dedup clusters are near-cliques or
short chains, so single-digit rounds in practice.

Per round: one join (labels x edges) + one hash agg (min per node) + one join
back — all shuffles on the node id. ``localCheckpoint`` every round truncates
the lineage so plan size stays constant (SURVEY.md §4.2 rule 2). The only
driver-side data touch is the convergence counter.

The reference needs no transitivity step because its key is total content
(Duplication.py:44-46); approximate edges make closure explicit here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 50, checkpoint_every: int = 1
) -> DataFrame:
    """edges(a, b) [doc_id longs] -> labels(doc_id, cluster_id).

    cluster_id = min doc_id reachable; only nodes that appear in an edge are
    labeled (singletons are not clusters).
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
        if it % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels


def clusters_from_labels(
    labels: DataFrame, docs: DataFrame, members_cap: int = 128
) -> DataFrame:
    """labels + docs -> clusters(cluster_id, size, cross_host, member_urls,
    canonical_url).

    canonical = earliest capture, tie-broken by url (min_by over
    (warc_ts, url) — reference keeps deterministic ordering in reports,
    SURVEY.md §2.5 T3). Member lists are capped; `size` is exact.
    """
    d = docs.select("doc_id", "url", "host", "warc_ts")
    return (
        labels.join(d, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("size"),
            (F.countDistinct("host") > 1).alias("cross_host"),
            F.slice(F.sort_array(F.collect_list("url")), 1, members_cap).alias(
                "member_urls"
            ),
            F.min_by("url", F.struct("warc_ts", "url")).alias("canonical_url"),
        )
    )
