"""External-tool-per-batch operator: one subprocess per Arrow batch (never per
row), JSONL protocol, loud failure."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F, types as T

from replicheck_spark.operators.exttool import pipe_tool

FAKE_TOOL = """\
import json, os, sys
for line in sys.stdin:
    r = json.loads(line)
    if "todo" in r["text"]:
        print(json.dumps(
            {"doc_id": r["doc_id"], "finding": "todo", "pid": os.getpid()}
        ))
"""

OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("finding", T.StringType()),
        T.StructField("pid", T.LongType()),
    ]
)


def test_pipe_tool_batched_subprocess(spark, tmp_path):
    tool = tmp_path / "tool.py"
    tool.write_text(FAKE_TOOL)
    df = (
        spark.range(100)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("text "),
                F.when(F.pmod("id", F.lit(10)) == 0, "todo").otherwise("ok"),
            ).alias("text"),
        )
        .repartition(4)
    )
    rows = pipe_tool(
        df, [sys.executable, str(tool)], ["doc_id", "text"], OUT_SCHEMA
    ).collect()
    assert {r["doc_id"] for r in rows} == {i for i in range(100) if i % 10 == 0}
    assert all(r["finding"] == "todo" for r in rows)
    # ONE subprocess per Arrow batch: 4 partitions x 1 batch -> at most 4
    # distinct PIDs for 10 findings (a per-row tool would show 10)
    assert 1 <= len({r["pid"] for r in rows}) <= 4


def test_pipe_tool_failure_is_loud(spark, tmp_path):
    tool = tmp_path / "bad.py"
    tool.write_text("import sys; sys.stderr.write('boom'); sys.exit(3)\n")
    df = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    out = pipe_tool(df, [sys.executable, str(tool)], ["doc_id", "text"], OUT_SCHEMA)
    with pytest.raises(Exception, match="exited 3|boom"):
        out.collect()


STRICT_TOOL = """\
import json, sys
for line in sys.stdin:
    r = json.loads(line)  # bare NaN would raise here (strict JSON)
    assert r["maybe"] is None or isinstance(r["maybe"], int), r
    print(json.dumps({"doc_id": r["doc_id"],
                      "finding": "null" if r["maybe"] is None else "int",
                      "pid": 0}))
"""


def test_pipe_tool_nulls_are_valid_json_and_ints_stay_ints(spark, tmp_path):
    """Null values must serialize as JSON null (bare NaN is not JSON and
    kills strict consumers), and an int column containing nulls must not be
    float-coerced (1 -> 1.0) on the non-null rows."""
    tool = tmp_path / "strict.py"
    tool.write_text(STRICT_TOOL)
    df = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.col("id") * 10).alias("maybe"),
    )
    out = pipe_tool(
        df, [sys.executable, str(tool)], ["doc_id", "maybe"], OUT_SCHEMA
    ).collect()
    kinds = sorted(r["finding"] for r in out)
    assert kinds == ["int"] * 3 + ["null"] * 3


NONFINITE_TOOL = """\
import json, sys
for line in sys.stdin:
    r = json.loads(line)  # strict JSON: Infinity/NaN tokens would raise here
    print(json.dumps({"doc_id": r["doc_id"],
                      "finding": "null" if r["score"] is None else "num",
                      "pid": 0}))
"""


def test_pipe_tool_nonfinite_floats_become_null_not_task_death(spark, tmp_path):
    """inf/-inf/NaN in a float column must serialize as JSON null: with
    allow_nan=False a single non-finite value would otherwise raise
    ValueError in json.dumps and kill the whole task instead of producing a
    line the tool can reject per-row."""
    tool = tmp_path / "nonfinite.py"
    tool.write_text(NONFINITE_TOOL)
    df = spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, float("inf"))
        .when(F.col("id") == 1, float("-inf"))
        .when(F.col("id") == 2, float("nan"))
        .otherwise(1.5)
        .alias("score"),
    )
    out = pipe_tool(
        df, [sys.executable, str(tool)], ["doc_id", "score"], OUT_SCHEMA
    ).collect()
    kinds = sorted(r["finding"] for r in out)
    assert kinds == ["null"] * 3 + ["num"]
