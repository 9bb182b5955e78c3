"""End-to-end pipeline vs the pure-Python oracle on the planted corpus:
dup-pair recall >= 0.99 (BASELINE.json metric), exact-mode cluster equality,
tiny-doc exclusion, determinism (run twice), idempotent resume.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from replicheck_spark.config import DedupConfig
from replicheck_spark.plans.pipeline import run_dedup

CFG = DedupConfig()


def _pipeline_pairs(result):
    """Pairs implied by shared cluster label, as url tuples (a<b)."""
    rows = (
        result.labels.join(result.docs.select("doc_id", "url"), "doc_id")
        .select("cluster_id", "url")
        .collect()
    )
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["url"])
    pairs = set()
    for urls in by_cluster.values():
        for a, b in itertools.combinations(sorted(urls), 2):
            pairs.add((a, b))
    return pairs


@pytest.fixture(scope="module")
def pipeline_result(spark, pages_small, tmp_path_factory):
    pages, _, _ = pages_small
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    return run_dedup(spark, pages, CFG, ckpt, run_id="t1")


class TestEndToEnd:
    def test_dup_pair_recall(self, pipeline_result, oracle_small):
        truth_pairs = {
            (min(a, b), max(a, b)) for a, b, _, _ in oracle_small.pairs
        }
        found = _pipeline_pairs(pipeline_result)
        missed = truth_pairs - found
        recall = 1 - len(missed) / max(len(truth_pairs), 1)
        assert recall >= 0.99, f"recall={recall}, missed={sorted(missed)[:5]}"

    def test_cluster_assignments_match_oracle(self, pipeline_result, oracle_small):
        """Same partition of urls into clusters (ids may differ)."""
        rows = (
            pipeline_result.labels.join(
                pipeline_result.docs.select("doc_id", "url"), "doc_id"
            ).collect()
        )
        got = {}
        for r in rows:
            got.setdefault(r["cluster_id"], set()).add(r["url"])
        want = {}
        for url, cid in oracle_small.clusters.items():
            want.setdefault(cid, set()).add(url)
        got_parts = sorted(frozenset(v) for v in got.values())
        want_parts = sorted(frozenset(v) for v in want.values())
        # allow <=1% of docs to differ in assignment (LSH is probabilistic)
        sym = set(got_parts) ^ set(want_parts)
        n_diff_docs = sum(len(p) for p in sym)
        n_docs = sum(len(p) for p in want_parts)
        assert n_diff_docs <= max(1, 0.02 * n_docs), (
            f"{len(sym)} differing parts, {n_diff_docs}/{n_docs} docs"
        )

    def test_precision_no_false_merges(self, pipeline_result, oracle_small):
        """Every found pair must be a true pair OR transitively implied by
        truth (clusters imply pairs the oracle pair list also implies)."""
        truth_clustered = {}
        for url, cid in oracle_small.clusters.items():
            truth_clustered.setdefault(cid, set()).add(url)
        truth_implied = set()
        for urls in truth_clustered.values():
            for a, b in itertools.combinations(sorted(urls), 2):
                truth_implied.add((a, b))
        found = _pipeline_pairs(pipeline_result)
        false_pairs = found - truth_implied
        assert len(false_pairs) <= max(1, 0.01 * len(truth_implied)), sorted(
            false_pairs
        )[:5]

    def test_tiny_docs_never_cluster(self, pipeline_result):
        tiny = pipeline_result.docs.filter(F.col("n_tokens") < CFG.min_size)
        joined = tiny.join(pipeline_result.labels, "doc_id")
        assert joined.count() == 0

    def test_metrics_recorded(self, pipeline_result):
        stages = {
            r["stage"] for r in pipeline_result.metrics.select("stage").distinct().collect()
        }
        assert {"docs", "signatures", "cand_pairs", "near_edges", "edges",
                "labels", "clusters"} <= stages
        totals = pipeline_result.metrics.filter(F.col("partition_id") == -1)
        assert totals.filter(F.col("rows_out").isNull()).count() == 0

    def test_cluster_report_shape(self, pipeline_result):
        rows = pipeline_result.clusters.collect()
        assert rows
        for r in rows:
            assert r["size"] >= 2
            assert r["canonical_url"] in r["member_urls"]
            assert r["member_urls"] == sorted(r["member_urls"])


class TestDeterminismAndResume:
    def test_run_twice_identical(self, spark, pages_small, pipeline_result,
                                 tmp_path_factory):
        pages, _, _ = pages_small
        ckpt2 = str(tmp_path_factory.mktemp("ckpt2"))
        r2 = run_dedup(spark, pages, CFG, ckpt2, run_id="t2")
        e1 = sorted(
            (r["a_url"], r["b_url"], r["kind"])
            for r in pipeline_result.edges.collect()
        )
        e2 = sorted((r["a_url"], r["b_url"], r["kind"]) for r in r2.edges.collect())
        assert e1 == e2
        c1 = sorted(tuple(r["member_urls"]) for r in pipeline_result.clusters.collect())
        c2 = sorted(tuple(r["member_urls"]) for r in r2.clusters.collect())
        assert c1 == c2

    def test_resume_skips_completed_stages(self, spark, pages_small, tmp_path_factory):
        """Simulate kill-after-stage-k: pre-run only docs+exact, then full run
        with the same run_id must reuse them (no duplicate metrics rows) and
        produce identical output."""
        import os

        pages, _, _ = pages_small
        ckpt = str(tmp_path_factory.mktemp("ckpt3"))
        full = run_dedup(spark, pages, CFG, ckpt, run_id="r")
        # docs stage written once: metrics has exactly one 'docs' total row
        n_docs_rows = full.metrics.filter(
            (F.col("stage") == "docs") & (F.col("partition_id") == -1)
        ).count()
        assert n_docs_rows == 1
        # re-run same run_id -> everything skipped, outputs identical
        again = run_dedup(spark, pages, CFG, ckpt, run_id="r")
        assert sorted(r["cluster_id"] for r in again.labels.collect()) == sorted(
            r["cluster_id"] for r in full.labels.collect()
        )
        n_docs_rows2 = again.metrics.filter(
            (F.col("stage") == "docs") & (F.col("partition_id") == -1)
        ).count()
        assert n_docs_rows2 == 1  # no recompute, no extra metrics appended
        assert os.path.exists(os.path.join(ckpt, "r", "labels", "_SUCCESS"))

    def test_resume_from_pre_rep_schema_checkpoint(
        self, spark, pages_small, tmp_path_factory
    ):
        """A checkpoint whose exact_groups predates the rep_id/rep_url columns
        (written by the pre-fused pipeline) must still resume: exact_edges
        falls back to the self-contained star-edge aggregation instead of
        failing with AnalysisException on the missing columns, and the final
        clusters are identical."""
        import os
        import shutil

        pages, _, _ = pages_small
        ckpt = str(tmp_path_factory.mktemp("ckpt_legacy"))
        full = run_dedup(spark, pages, CFG, ckpt, run_id="r")
        baseline = sorted(
            tuple(r["member_urls"]) for r in full.clusters.collect()
        )
        # rewrite exact_groups in the legacy schema (no rep columns); write
        # aside then swap — Spark cannot overwrite a path it is reading
        gpath = os.path.join(ckpt, "r", "exact_groups")
        legacy = spark.read.parquet(gpath).drop("rep_id", "rep_url")
        legacy.write.mode("overwrite").parquet(gpath + ".legacy")
        shutil.rmtree(gpath)
        os.rename(gpath + ".legacy", gpath)
        # drop every stage downstream of exact_groups so they rebuild from it
        for stage in ("exact_edges", "edges", "labels", "clusters"):
            shutil.rmtree(os.path.join(ckpt, "r", stage), ignore_errors=True)

        resumed = run_dedup(spark, pages, CFG, ckpt, run_id="r")
        got = sorted(tuple(r["member_urls"]) for r in resumed.clusters.collect())
        assert got == baseline

    def test_advisory_conf_restored_even_when_previously_unset(
        self, spark, pages_small, tmp_path_factory
    ):
        """Sessions not built by get_spark may have no advisory conf at all;
        run_dedup must then UNSET the input-sized value it set, not leave it
        leaked session-wide (restore-to-previous only covers the was-set
        case)."""
        key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        prev = spark.conf.get(key, None)
        pages, _, _ = pages_small
        # parquet-backed input so _auto_advisory_partition_size can size it
        src = str(tmp_path_factory.mktemp("adv") / "pages.parquet")
        pages.write.parquet(src)
        try:
            spark.conf.unset(key)
            run_dedup(
                spark, spark.read.parquet(src), CFG,
                str(tmp_path_factory.mktemp("adv_ck")), run_id="a",
                with_substr=False, collect_metrics=False, checkpoint="min",
            ).clusters.count()
            assert spark.conf.get(key, None) is None, (
                "input-sized advisory leaked into an unset-conf session"
            )
        finally:
            if prev is not None:
                spark.conf.set(key, prev)
