"""Skew hardening: member-list aggregations must hold a BOUNDED buffer even
when one group is enormous (the 10^8-member boilerplate cluster case), and the
connected-components loop must never silently return split clusters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from replicheck_spark.operators.components import (
    ConvergenceError,
    clusters_from_labels,
    connected_components,
)
from replicheck_spark.operators.exact import exact_groups

N_BIG = 10_000
CAP = 16


def test_exact_groups_bounded_members(spark):
    elig = spark.range(N_BIG).select(
        F.col("id").alias("doc_id"),
        F.format_string("https://h%d.example/p/%05d", F.pmod("id", F.lit(7)), "id").alias("url"),
        F.format_string("h%d.example", F.pmod("id", F.lit(7))).alias("host"),
        F.lit("samesha").alias("sha256"),
        F.lit(100).alias("n_tokens"),
    )
    rows = exact_groups(elig, members_cap=CAP).collect()
    assert len(rows) == 1
    g = rows[0]
    assert g["num_duplicates"] == N_BIG          # size is exact
    assert len(g["member_urls"]) == CAP          # list is capped
    assert g["cross_host"]
    # capped list == the CAP lexicographically smallest urls (slice-of-sorted
    # semantics preserved)
    all_urls = sorted(r["url"] for r in elig.select("url").collect())
    assert list(g["member_urls"]) == all_urls[:CAP]


def test_exact_dup_groups_capped_listing_face(spark):
    """The query/listing face (dedup_ops.exact_dup_groups) must offer the same
    bounded-buffer option as the pipeline face: a planted 10^4-member
    identical-text group with members_cap set yields a capped doc_ids list,
    the TRUE size in n_dups (so truncation = n_dups - size(doc_ids) is
    nonzero and in-band), and cap=None keeps the oracle-exact full listing."""
    from replicheck_spark.operators.dedup_ops import exact_dup_groups

    docs = spark.range(N_BIG).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text").alias("text"),
        F.format_string("s%d", F.pmod("id", F.lit(3))).alias("source"),
    )
    g = exact_dup_groups(docs, members_cap=CAP).collect()
    assert len(g) == 1
    assert g[0]["n_dups"] == N_BIG                      # true size kept
    assert len(g[0]["doc_ids"]) == CAP                  # buffer bounded
    assert g[0]["n_dups"] - len(g[0]["doc_ids"]) > 0    # truncation metered
    assert list(g[0]["doc_ids"]) == list(range(CAP))    # cap smallest kept
    assert g[0]["cross_source"]
    # default stays oracle-exact (full member list)
    full = exact_dup_groups(docs).collect()
    assert len(full[0]["doc_ids"]) == N_BIG


def test_clusters_bounded_members(spark):
    import datetime

    ts = datetime.datetime(2025, 1, 1)
    docs = spark.range(N_BIG).select(
        F.col("id").alias("doc_id"),
        F.format_string("https://h.example/p/%05d", "id").alias("url"),
        F.lit("h.example").alias("host"),
        F.lit(ts).alias("warc_ts"),
    )
    labels = docs.select("doc_id", F.lit(0).alias("cluster_id"))
    rows = clusters_from_labels(labels, docs, members_cap=CAP).collect()
    assert len(rows) == 1
    c = rows[0]
    assert c["size"] == N_BIG
    assert len(c["member_urls"]) == CAP
    assert c["canonical_url"] == "https://h.example/p/00000"


def test_cc_nonconvergence_raises(spark):
    # a chain of 40 nodes needs ~40 hash-min rounds; max_iter=3 must not
    # silently return split clusters
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a long, b long"
    )
    with pytest.raises(ConvergenceError):
        connected_components(edges, max_iter=3, on_nonconverged="raise")


def test_cc_chain_converges_fully(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a long, b long"
    )
    labels = connected_components(edges, max_iter=50)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert set(got.values()) == {0}
    assert len(got) == 41
