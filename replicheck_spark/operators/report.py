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


def complexity_summary(
    docs: DataFrame, threshold: float = 10.0, top_k: int = 5
) -> dict:
    """Reading-complexity section data (the reference reports every
    analyzer's findings, reporter.py:20-145 — this is the complexity
    analyzer's section for the dedup job report): severity counts over the
    flagged docs plus the top-k worst, both bounded collects."""
    from replicheck_spark.operators.textops import reading_complexity

    # lazy checkpoint: the severity agg and the top-k collect below would
    # otherwise each recompute the full fog scan (regex sentence/word pass
    # over every doc) — one materialization shared by both jobs
    flagged = reading_complexity(
        docs.select("doc_id", F.col("norm_text").alias("text")),
        threshold=threshold,
    ).localCheckpoint(eager=False)
    by_sev = {
        r["severity"]: r["n"]
        for r in flagged.groupBy("severity").agg(F.count("*").alias("n")).collect()
    }
    top = flagged.limit(top_k).select("doc_id", "fog", "severity").collect()
    return {
        "threshold": threshold,
        "n_flagged": sum(by_sev.values()),
        "by_severity": by_sev,
        "top": [
            {"doc_id": r["doc_id"], "fog": round(r["fog"], 1),
             "severity": r["severity"]}
            for r in top
        ],
    }


def block_dup_summary(docs: DataFrame, block_tokens: int = 100) -> dict:
    """Duplicated-block section data: one hash-agg pass over the exploded
    unit table (operators/blocks.py), collected as a single summary row."""
    from replicheck_spark.operators.blocks import block_exact_dups

    row = block_exact_dups(
        docs.select("doc_id", F.col("norm_text").alias("text")),
        block_tokens=block_tokens,
    ).agg(
        F.count("*").alias("n_dup_blocks"),
        F.coalesce(F.sum("n_blocks"), F.lit(0)).alias("n_copies"),
        F.coalesce(F.max("n_docs"), F.lit(0)).alias("max_docs"),
    ).collect()[0]
    return {
        "block_tokens": block_tokens,
        "n_dup_blocks": int(row["n_dup_blocks"]),
        "n_copies": int(row["n_copies"]),
        "max_docs": int(row["max_docs"]),
    }


def _osc8(url: str) -> str:
    """OSC-8 terminal hyperlink (reference _format_path terminal mode,
    reporter.py:171-177): clickable in supporting terminals, plain text
    elsewhere."""
    return f"\033]8;;{url}\033\\{url}\033]8;;\033\\"


def render_text(
    summary: dict, edge_counts: dict, hyperlinks: bool = False,
    complexity: dict | None = None, blocks: dict | None = None,
) -> str:
    """Reference-flavored text report (reporter.py:121-131 duplicate section);
    ``hyperlinks=True`` wraps canonicals in OSC-8 escapes for terminals.
    ``complexity``/``blocks`` (from complexity_summary / block_dup_summary)
    add the analyzer sections the reference prints for every tool."""
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
    if blocks is not None:
        lines.append(
            f"Duplicated blocks ({blocks['block_tokens']} tokens): "
            f"{blocks['n_dup_blocks']} distinct shared blocks, "
            f"{blocks['n_copies']} copies, widest spread "
            f"{blocks['max_docs']} docs"
        )
    if complexity is not None:
        lines.append(
            f"High reading complexity (fog >= {complexity['threshold']:g}): "
            f"{complexity['n_flagged']} docs"
            + _severity_suffix(complexity["by_severity"])
        )
        for d in complexity["top"]:
            lines.append(
                f"  doc {d['doc_id']}: fog={d['fog']} [{d['severity']}]"
            )
    for i, c in enumerate(summary["top_clusters"], 1):
        flag = " (cross-host)" if c["cross_host"] else ""
        lines.append(
            f"Cluster #{i}: size={c['size']} docs{flag} "
            f"canonical={link(c['canonical_url'])}"
        )
    return "\n".join(lines)


def render_json(
    summary: dict, edge_counts: dict, complexity: dict | None = None,
    blocks: dict | None = None,
) -> str:
    doc = {"summary": summary, "edges_by_kind": edge_counts}
    if complexity is not None:
        doc["reading_complexity"] = complexity
    if blocks is not None:
        doc["duplicated_blocks"] = blocks
    return json.dumps(doc, indent=2)


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
    summary: dict, edge_counts: dict, sev_counts: dict | None = None,
    complexity: dict | None = None, blocks: dict | None = None,
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
    if blocks is not None:
        md.append(f"## Duplicated blocks ({blocks['block_tokens']} tokens)")
        if blocks["n_dup_blocks"]:
            md.append(
                f"- {blocks['n_dup_blocks']} distinct blocks shared across "
                f"documents ({blocks['n_copies']} copies; widest spread "
                f"{blocks['max_docs']} docs)"
            )
        else:
            md.append("**No duplicated blocks found.**")
        md.append("")
    if complexity is not None:
        md.append("## Reading complexity")
        if complexity["n_flagged"]:
            md.append(
                f"- {complexity['n_flagged']} docs at or above fog "
                f"{complexity['threshold']:g}"
                + _severity_suffix(complexity["by_severity"])
            )
            for d in complexity["top"]:
                md.append(
                    f"- doc {d['doc_id']}: fog={d['fog']} [{d['severity']}]"
                )
        else:
            md.append("**No high-complexity docs found.**")
        md.append("")
    return "\n".join(md)
