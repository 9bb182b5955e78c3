"""Stage REPORT: driver-side summary rendering.

The reference's Reporter renders sections + computed summary lines to
text/json/markdown (/root/reference/replicheck/reporter.py:186-229, 285-319,
372-412). Here the heavy aggregation happens in Spark (small DataFrames), and
only bounded results are collected for rendering. Top-k ordering is
deterministic: desc(size), asc(cluster_id) (reference leaves dict order
unspecified, Duplication.py:44 — we pin it, SURVEY.md §2.5 T3).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F


def cluster_summary(clusters: DataFrame, top_k: int = 10) -> dict:
    """Bounded summary dict: counts, cross-host breakdown, top-k clusters."""
    agg = clusters.agg(
        F.count("*").alias("n_clusters"),
        F.sum("size").alias("n_member_docs"),
        F.sum(F.when(F.col("cross_host"), 1).otherwise(0)).alias("n_cross_host"),
        F.max("size").alias("max_size"),
    ).collect()[0]
    top = (
        clusters.orderBy(F.desc("size"), F.asc("cluster_id"))
        .limit(top_k)
        .select("cluster_id", "size", "cross_host", "canonical_url")
        .collect()
    )
    return {
        "n_clusters": agg["n_clusters"],
        "n_member_docs": agg["n_member_docs"] or 0,
        "n_cross_host": agg["n_cross_host"] or 0,
        "max_size": agg["max_size"] or 0,
        "top_clusters": [r.asDict() for r in top],
    }


def edge_summary(edges: DataFrame) -> dict:
    rows = edges.groupBy("kind").count().collect()
    return {r["kind"]: r["count"] for r in rows}


def render_text(summary: dict, edge_counts: dict) -> str:
    """Reference-flavored text report (reporter.py:121-131 duplicate section)."""
    lines = [
        "=== replicheck_spark dedup report ===",
        f"Duplicate clusters: {summary['n_clusters']} "
        f"({summary['n_cross_host']} cross-host)",
        f"Docs in clusters: {summary['n_member_docs']}",
        f"Largest cluster: {summary['max_size']} docs",
        "Edges by kind: "
        + ", ".join(f"{k}={v}" for k, v in sorted(edge_counts.items())),
    ]
    for i, c in enumerate(summary["top_clusters"], 1):
        flag = " (cross-host)" if c["cross_host"] else ""
        lines.append(
            f"Cluster #{i}: size={c['size']} docs{flag} canonical={c['canonical_url']}"
        )
    return "\n".join(lines)


def render_json(summary: dict, edge_counts: dict) -> str:
    return json.dumps({"summary": summary, "edges_by_kind": edge_counts}, indent=2)
