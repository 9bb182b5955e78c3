"""Regression tests for capped-work metering (SURVEY.md §4.2 rule 1).

Round-3 shipped a silent-metric bug: a lazy ``localCheckpoint`` anywhere
downstream of an unresolved ``df.observe`` fires a build-time listener event
with empty accumulators that resolves the Observation to zero forever
(measured on Spark 4.1.2), so the pipeline recorded cands_capped dropped=0
unconditionally and the similarity operators' truncation warning could never
fire. These tests PLANT overflow and assert the recorded numbers are nonzero
in every mode, so the bug class cannot return unnoticed.
"""

import threading

import pytest
from pyspark.sql import Observation, functions as F

from replicheck_spark.config import DedupConfig
from replicheck_spark.operators import similarity
from replicheck_spark.plans.pipeline import run_dedup


def _overflow_pages(spark, n_docs: int = 8):
    """n_docs distinct near-identical docs -> one giant LSH bucket."""
    base = [f"t{i}" for i in range(100)]
    rows = []
    for i in range(n_docs):
        v = list(base)
        v[0] = f"v{i}"
        rows.append((f"https://h{i}.example/{i}", None, None, " ".join(v), "en"))
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def _total(metrics, stage: str, col: str) -> int:
    rows = metrics.filter(
        (F.col("stage") == stage) & (F.col("partition_id") == -1)
    ).collect()
    assert rows, f"no {stage} total row recorded"
    return sum(int(r[col]) for r in rows)


@pytest.mark.parametrize("mode", ["full", "min"])
def test_planted_overflow_is_recorded(spark, tmp_path, mode):
    cfg = DedupConfig(bucket_cap=2, salt_buckets=1)
    pages = _overflow_pages(spark)
    res = run_dedup(
        spark, pages, cfg, str(tmp_path / mode), run_id=f"ovf_{mode}",
        checkpoint=mode,
    )
    assert _total(res.metrics, "cands_capped", "dropped") > 0
    # anchor index volume is real data (not the clobbered 0)
    assert _total(res.metrics, "substr_anchors", "rows_out") > 0


def _planted_emb(spark, n: int = 12, dim: int = 4):
    # identical vectors -> one bucket per table, overflowing any small cap
    rows = [(i, [1.0] * dim) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_similarity_observation_param_no_thread_real_value(spark):
    emb = _planted_emb(spark)
    obs = Observation()
    before = threading.active_count()
    pairs, capped = similarity.lsh_bucket_candidates(
        emb, dim=4, n_planes=4, bucket_cap=2, observation=obs,
        meter="must-not-spawn",
    )
    # observation path: plan building spawns no logger thread
    assert threading.active_count() == before
    pairs.count()
    assert int(obs.get["overflow_total"]) > 0


def test_similarity_meter_logs_without_threads(spark, caplog):
    """The bare-operator API (meter label, no caller Observation) must log
    planted truncation AND spawn no background thread at any point: build,
    action, or drain (the r4 fallback parked one daemon thread per build)."""
    import logging

    emb = _planted_emb(spark)
    before = threading.active_count()
    with caplog.at_level(logging.WARNING, logger="replicheck_spark.operators.similarity"):
        pairs, _ = similarity.lsh_bucket_candidates(
            emb, dim=4, n_planes=4, bucket_cap=2, meter="knn_lsh_test"
        )
        assert threading.active_count() == before  # build spawns nothing
        pairs.count()
        # non-blocking flush: the observation resolved at the action above
        assert similarity.drain_overflow_logs() >= 1
    assert threading.active_count() == before      # drain spawns nothing
    assert any(
        "knn_lsh_test" in r.message and "truncated" in r.message
        for r in caplog.records
    ), "bucket truncation warning never fired (silent capped work)"


def test_meter_pending_until_action_then_flushed_by_next_operator_call(spark, caplog):
    """An unexecuted metered plan stays pending (drain must not block on it);
    once its action runs, the NEXT operator invocation flushes its warning —
    the long-lived-driver flow, with zero threads."""
    import logging

    emb = _planted_emb(spark)
    with caplog.at_level(logging.WARNING, logger="replicheck_spark.operators.similarity"):
        pairs, _ = similarity.lsh_bucket_candidates(
            emb, dim=4, n_planes=4, bucket_cap=2, meter="first_op"
        )
        assert similarity.drain_overflow_logs() == 0  # no action yet: pending
        assert not any("first_op" in r.message for r in caplog.records)
        pairs.count()
        # entry of a subsequent operator call flushes the resolved pending
        pairs2, _ = similarity.lsh_bucket_candidates(
            emb, dim=4, n_planes=4, bucket_cap=2, observation=None, meter=None
        )
    assert any(
        "first_op" in r.message and "truncated" in r.message
        for r in caplog.records
    )


def test_embedding_dup_pairs_observation_resolves_on_broadcast_path(spark):
    """The broadcast (small-corpus) branch has no buckets, but a caller that
    passed an Observation still drains it after the action — it must resolve
    to overflow_total=0 instead of blocking forever on a plan it was never
    attached to."""
    emb = _planted_emb(spark)
    obs = Observation()
    pairs = similarity.embedding_dup_pairs(
        emb, threshold=0.95, observation=obs
    )  # tiny corpus -> broadcast path
    pairs.count()
    assert int(obs.get["overflow_total"]) == 0
