"""Stage EXACT: byte-identical duplicate grouping — the reference's shipped
semantics (tuple(tokens) grouping with >=2 members, similarity hard-coded 1.0,
cross-file flag; /root/reference/replicheck/tools/Duplication/
Duplication.py:34-49) re-expressed as a Catalyst hash aggregation.

Key = sha256(norm_text). Since norm_text is the space-joined token sequence,
equality of sha256 == equality of the token tuple (modulo a 2^-256 collision).

Scale notes (10^12 docs):
* the groupBy is a partial+final hash agg — giant identical clusters combine
  map-side, so skew is absorbed before the shuffle;
* edges are STAR edges (representative = min doc_id) computed with min_by /
  join-back, NOT collect_list — no task ever materializes a whole cluster;
* member lists in the report are capped (`members_cap`) with the true size
  kept alongside, so a 10^8-member cluster cannot blow the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def capped_members_agg(member_col: str, key_col: str, cap: int):
    """(pre-agg ranking column spec) Bounded member-list aggregation: a
    row_number window over (key, member order) marks the first ``cap`` members
    BEFORE the aggregation, and ``collect_list`` skips the nulls the marker
    leaves on the rest — so the agg buffer holds at most ``cap`` entries even
    for a 10^8-member boilerplate group (collect_list-then-slice materializes
    the whole list in one task's buffer first). Same output as
    slice(sort_array(collect_list(member)), 1, cap): row_number follows member
    order, so the kept members are exactly the cap smallest.

    Returns (ranked_column, agg_expression) given the window-ranked column
    name '_member_rn'.
    """
    w = Window.partitionBy(key_col).orderBy(member_col)
    rn = F.row_number().over(w)
    agg = F.sort_array(
        F.collect_list(F.when(F.col("_member_rn") <= cap, F.col(member_col)))
    )
    return rn, agg


def exact_groups(
    elig: DataFrame, members_cap: int = 128, with_rep: bool = False
) -> DataFrame:
    """Groups of byte-identical docs: one row per group with >= 2 members.

    Columns: sha256, size (token count), num_duplicates, cross_host,
    member_urls (sorted, capped — bounded agg buffer, see capped_members_agg),
    similarity (1.0). ``with_rep`` adds rep_id/rep_url (min (doc_id, url)
    member) so star edges derive from this ONE aggregation via
    ``exact_edges_from_groups`` instead of re-aggregating elig — the pipeline
    previously ran two full groupBy passes over the same input for groups and
    edges (one serial-floor stage job each).
    """
    rn, members = capped_members_agg("url", "sha256", members_cap)
    aggs = [
        F.count("*").alias("num_duplicates"),
        F.first("n_tokens").alias("size"),
        (F.countDistinct("host") > 1).alias("cross_host"),
        members.alias("member_urls"),
    ]
    if with_rep:
        aggs.append(
            F.min_by(
                F.struct("doc_id", "url"), F.struct("doc_id", "url")
            ).alias("rep")
        )
    out = (
        elig.withColumn("_member_rn", rn)
        .groupBy("sha256")
        .agg(*aggs)
        .filter(F.col("num_duplicates") >= 2)
        .withColumn("similarity", F.lit(1.0))
    )
    if with_rep:
        out = out.withColumn("rep_id", F.col("rep.doc_id")).withColumn(
            "rep_url", F.col("rep.url")
        ).drop("rep")
    return out


def exact_edges_from_groups(elig: DataFrame, groups: DataFrame) -> DataFrame:
    """Star edges derived from ``exact_groups(..., with_rep=True)`` output:
    join the (small, dup-groups-only) rep table back to elig members — the
    groupBy over elig is NOT repeated. Same output contract as exact_edges."""
    reps = groups.select(
        "sha256", F.col("rep_id").alias("a"), F.col("rep_url").alias("a_url")
    )
    return (
        elig.join(reps, "sha256")
        .filter(F.col("doc_id") != F.col("a"))
        .select(
            "a",
            F.col("doc_id").alias("b"),
            "a_url",
            F.col("url").alias("b_url"),
            F.lit("exact").alias("kind"),
            F.lit(1.0).alias("jaccard"),
        )
    )


def exact_edges(elig: DataFrame) -> DataFrame:
    """Star edges (a=group representative, b=member) for every exact group.

    Connectivity-equivalent to all O(m^2) pairs but linear in group size.
    Columns: a, b (doc_id, a < b by construction of min), a_url, b_url, kind.
    """
    reps = (
        elig.groupBy("sha256")
        .agg(
            F.min_by(F.struct("doc_id", "url"), F.struct("doc_id", "url")).alias("rep"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 2)
        .select("sha256", F.col("rep.doc_id").alias("a"), F.col("rep.url").alias("a_url"))
    )
    return (
        elig.join(reps, "sha256")
        .filter(F.col("doc_id") != F.col("a"))
        .select(
            "a",
            F.col("doc_id").alias("b"),
            "a_url",
            F.col("url").alias("b_url"),
            F.lit("exact").alias("kind"),
            F.lit(1.0).alias("jaccard"),
        )
    )
