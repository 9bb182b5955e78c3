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


def _osc8(url: str) -> str:
    """OSC-8 terminal hyperlink (reference _format_path terminal mode,
    reporter.py:171-177): clickable in supporting terminals, plain text
    elsewhere."""
    return f"\033]8;;{url}\033\\{url}\033]8;;\033\\"


def render_text(summary: dict, edge_counts: dict, hyperlinks: bool = False) -> str:
    """Reference-flavored text report (reporter.py:121-131 duplicate section);
    ``hyperlinks=True`` wraps canonicals in OSC-8 escapes for terminals."""
    link = _osc8 if hyperlinks else (lambda u: u)
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
            f"Cluster #{i}: size={c['size']} docs{flag} "
            f"canonical={link(c['canonical_url'])}"
        )
    return "\n".join(lines)


def render_json(summary: dict, edge_counts: dict) -> str:
    return json.dumps({"summary": summary, "edges_by_kind": edge_counts}, indent=2)


def write_report(rendered: str, path: str | None) -> bool:
    """Deliver the rendered report: to ``path`` when given, else stdout —
    with console fallback if the file write fails (reference
    reporter.py:372-412: save_report falls back to printing rather than
    losing the report). Returns True iff the file write succeeded."""
    import logging

    if path:
        try:
            with open(path, "w", encoding="utf-8") as f:
                f.write(rendered)
                if not rendered.endswith("\n"):
                    f.write("\n")
            return True
        except OSError as exc:
            logging.getLogger(__name__).warning(
                "could not write report to %s (%s); printing to console",
                path, exc,
            )
    print(rendered)
    return False


SEVERITY_ORDER = ["Critical", "High", "Medium", "Low", "None"]


def severity_counts(docs: DataFrame, threshold: int = 100) -> dict:
    """Per-severity doc counts (textops ladder) for the report's severity
    breakdown — the analog of the reference's per-section severity summaries
    (reporter.py:29-93 summary lambdas)."""
    from replicheck_spark.operators.textops import severity_buckets

    rows = severity_buckets(docs.select(F.col("norm_text").alias("text")),
                            threshold=threshold).collect()
    return {r["severity"]: r["n_docs"] for r in rows}


def _severity_suffix(counts: dict) -> str:
    parts = [
        f"{counts[sev]} {sev}" for sev in SEVERITY_ORDER
        if counts.get(sev) and sev != "None"
    ]
    return f" ({', '.join(parts)})" if parts else ""


def _md_link(url: str) -> str:
    """Markdown-linked location (reference _format_path markdown mode,
    reporter.py:166-171)."""
    return f"[{url}]({url})"


def render_markdown(
    summary: dict, edge_counts: dict, sev_counts: dict | None = None
) -> str:
    """Markdown report (reference _generate_markdown_report,
    reporter.py:321-370): a `## Summary` of per-section counts with severity
    breakdowns, then one section per result family, linked canonicals,
    bolded empty-state messages."""
    md = ["# replicheck_spark dedup report", "", "## Summary"]
    n = summary["n_clusters"]
    md.append(
        f"- {n} duplicate clusters ({summary['n_cross_host']} cross-host)"
        if n else "- 0 duplicate clusters ✅"
    )
    md.append(f"- {summary['n_member_docs']} docs in clusters")
    if sev_counts:
        total = sum(v for k, v in sev_counts.items() if k != "None")
        md.append(f"- {total} docs at or above Low severity"
                  + _severity_suffix(sev_counts))
    md.append(
        "- edges: "
        + ", ".join(f"{v} {k}" for k, v in sorted(edge_counts.items()))
        if edge_counts else "- 0 edges ✅"
    )
    md.append("")
    md.append("## Duplicate clusters")
    if summary["top_clusters"]:
        for i, c in enumerate(summary["top_clusters"], 1):
            cross = " (cross-host)" if c["cross_host"] else ""
            md.append(
                f"- Cluster #{i}: size={c['size']} docs{cross} — canonical "
                + _md_link(c["canonical_url"])
            )
    else:
        md.append("**No duplicate clusters found.**")
    md.append("")
    if sev_counts is not None:
        md.append("## Severity breakdown")
        for sev in SEVERITY_ORDER:
            if sev_counts.get(sev):
                md.append(f"- {sev}: {sev_counts[sev]} docs")
        md.append("")
    return "\n".join(md)
