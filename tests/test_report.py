"""Golden-substring report tests (reference reporter style,
/root/reference/tests/test_reporter.py:68-76 analog): exact expected lines in
the rendered text, JSON round-trip, deterministic top-k ordering."""

import json

import pytest

from replicheck_spark.config import DedupConfig
from replicheck_spark.operators.report import (
    block_dup_summary,
    cluster_summary,
    complexity_summary,
    edge_summary,
    render_json,
    render_markdown,
    render_text,
    severity_counts,
)
from replicheck_spark.plans.pipeline import run_dedup


@pytest.fixture(scope="module")
def small_result(spark, pages_small, tmp_path_factory):
    pages, _, _ = pages_small
    ckpt = str(tmp_path_factory.mktemp("rep_ckpt"))
    return run_dedup(spark, pages, DedupConfig(), ckpt, run_id="rep",
                     collect_metrics=False, checkpoint="min")


def test_text_report_golden_lines(small_result):
    summary = cluster_summary(small_result.clusters, top_k=3)
    edges = edge_summary(small_result.edges)
    text = render_text(summary, edges)
    assert "=== replicheck_spark dedup report ===" in text
    assert f"Duplicate clusters: {summary['n_clusters']}" in text
    assert "Largest cluster:" in text
    assert "Cluster #1: size=" in text
    # deterministic: re-render identical
    assert text == render_text(cluster_summary(small_result.clusters, top_k=3), edges)


def test_json_report_roundtrip(small_result):
    summary = cluster_summary(small_result.clusters, top_k=3)
    edges = edge_summary(small_result.edges)
    doc = json.loads(render_json(summary, edges))
    assert doc["summary"]["n_clusters"] == summary["n_clusters"]
    assert set(doc["edges_by_kind"]) <= {"exact", "near", "substr"}
    assert len(doc["summary"]["top_clusters"]) <= 3


def test_text_report_osc8_hyperlinks(small_result):
    summary = cluster_summary(small_result.clusters, top_k=3)
    edges = edge_summary(small_result.edges)
    text = render_text(summary, edges, hyperlinks=True)
    url = summary["top_clusters"][0]["canonical_url"]
    assert f"\033]8;;{url}\033\\{url}\033]8;;\033\\" in text
    # default stays plain (machine-readable logs)
    assert "\033]8" not in render_text(summary, edges)


def test_markdown_report_golden_lines(small_result):
    summary = cluster_summary(small_result.clusters, top_k=3)
    edges = edge_summary(small_result.edges)
    sev = severity_counts(small_result.docs)
    md = render_markdown(summary, edges, sev)
    assert md.startswith("# replicheck_spark dedup report")
    assert "## Summary" in md
    assert f"- {summary['n_clusters']} duplicate clusters" in md
    assert "## Duplicate clusters" in md
    # canonicals rendered as markdown links (reference _format_path md mode)
    top = summary["top_clusters"][0]["canonical_url"]
    assert f"[{top}]({top})" in md
    assert "## Severity breakdown" in md
    # severity parenthetical in the summary (reference summary-lambda shape)
    assert "docs at or above Low severity" in md
    # deterministic re-render
    assert md == render_markdown(summary, edges, sev)


def test_markdown_empty_sections(spark):
    empty = {"n_clusters": 0, "n_member_docs": 0, "n_cross_host": 0,
             "max_size": 0, "top_clusters": []}
    md = render_markdown(empty, {})
    assert "- 0 duplicate clusters ✅" in md
    assert "**No duplicate clusters found.**" in md


def test_topk_ordering_deterministic(small_result):
    summary = cluster_summary(small_result.clusters, top_k=10)
    sizes = [c["size"] for c in summary["top_clusters"]]
    assert sizes == sorted(sizes, reverse=True)
    ids = [c["cluster_id"] for c in summary["top_clusters"]]
    # ties broken by ascending cluster_id
    for a, b in zip(summary["top_clusters"], summary["top_clusters"][1:]):
        if a["size"] == b["size"]:
            assert a["cluster_id"] < b["cluster_id"]


class TestAnalyzerSections:
    """reading_complexity + duplicated-block sections (VERDICT r3 item 6):
    every analyzer's findings surface in the report, reference style."""

    def test_complexity_section_text_and_md(self, small_result):
        summary = cluster_summary(small_result.clusters, top_k=3)
        edges = edge_summary(small_result.edges)
        # threshold 0 flags every doc deterministically
        comp = complexity_summary(small_result.docs, threshold=0.1, top_k=2)
        assert comp["n_flagged"] > 0
        assert sum(comp["by_severity"].values()) == comp["n_flagged"]
        assert len(comp["top"]) == 2

        text = render_text(summary, edges, complexity=comp)
        assert "High reading complexity (fog >= 0.1):" in text
        assert f"{comp['n_flagged']} docs" in text
        assert f"doc {comp['top'][0]['doc_id']}: fog=" in text

        md = render_markdown(summary, edges, complexity=comp)
        assert "## Reading complexity" in md
        assert "docs at or above fog 0.1" in md

    def test_block_section_text_and_md(self, small_result):
        summary = cluster_summary(small_result.clusters, top_k=3)
        edges = edge_summary(small_result.edges)
        blocks = block_dup_summary(small_result.docs, block_tokens=50)
        # the planted corpus has exact-dup docs -> their blocks repeat
        assert blocks["n_dup_blocks"] > 0
        assert blocks["n_copies"] >= 2 * blocks["n_dup_blocks"]
        assert blocks["max_docs"] >= 2

        text = render_text(summary, edges, blocks=blocks)
        assert "Duplicated blocks (50 tokens):" in text
        assert f"{blocks['n_dup_blocks']} distinct shared blocks" in text

        md = render_markdown(summary, edges, blocks=blocks)
        assert "## Duplicated blocks (50 tokens)" in md
        assert "distinct blocks shared across" in md

    def test_json_sections_roundtrip(self, small_result):
        summary = cluster_summary(small_result.clusters, top_k=3)
        edges = edge_summary(small_result.edges)
        comp = complexity_summary(small_result.docs, threshold=0.1, top_k=1)
        blocks = block_dup_summary(small_result.docs, block_tokens=50)
        doc = json.loads(render_json(summary, edges, comp, blocks))
        assert doc["reading_complexity"]["n_flagged"] == comp["n_flagged"]
        assert doc["duplicated_blocks"] == blocks
        # omitted sections stay absent (backward-compatible shape)
        bare = json.loads(render_json(summary, edges))
        assert "reading_complexity" not in bare

    def test_empty_sections_render_empty_state(self):
        empty = {"n_clusters": 0, "n_member_docs": 0, "n_cross_host": 0,
                 "max_size": 0, "top_clusters": []}
        md = render_markdown(
            empty, {},
            complexity={"threshold": 10.0, "n_flagged": 0,
                        "by_severity": {}, "top": []},
            blocks={"block_tokens": 100, "n_dup_blocks": 0, "n_copies": 0,
                    "max_docs": 0},
        )
        assert "**No duplicated blocks found.**" in md
        assert "**No high-complexity docs found.**" in md


class TestWriteReport:
    def test_writes_all_formats_to_file(self, tmp_path):
        from replicheck_spark.operators.report import (
            render_json, render_markdown, render_text, write_report,
        )

        summary = {
            "n_clusters": 1, "n_member_docs": 2, "n_cross_host": 1,
            "max_size": 2,
            "top_clusters": [{
                "cluster_id": 7, "size": 2, "cross_host": True,
                "canonical_url": "https://a.example/1",
            }],
        }
        edges = {"exact": 1}
        for name, rendered in [
            ("r.txt", render_text(summary, edges)),
            ("r.json", render_json(summary, edges)),
            ("r.md", render_markdown(summary, edges, {"Low": 1})),
        ]:
            path = str(tmp_path / name)
            assert write_report(rendered, path) is True
            body = open(path, encoding="utf-8").read()
            want = rendered if rendered.endswith("\n") else rendered + "\n"
            assert body == want
            assert "https://a.example/1" in body

    def test_falls_back_to_console_on_write_error(self, tmp_path, capsys, caplog):
        import logging

        from replicheck_spark.operators.report import write_report

        bad = str(tmp_path / "no_such_dir" / "r.txt")
        with caplog.at_level(logging.WARNING):
            ok = write_report("the report body", bad)
        assert ok is False
        assert "the report body" in capsys.readouterr().out
        assert any("printing to console" in r.message for r in caplog.records)

    def test_none_path_prints(self, capsys):
        from replicheck_spark.operators.report import write_report

        assert write_report("plain body", None) is False
        assert "plain body" in capsys.readouterr().out
