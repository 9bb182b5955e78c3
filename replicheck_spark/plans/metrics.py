"""Per-stage / per-partition lineage counters -> metrics table.

Schema (FIXTURES.md §3): run_id, stage, partition_id, rows_in, rows_out,
dropped, wall_ms. Per-partition row counts come from a
``groupBy(spark_partition_id())`` over the stage OUTPUT (cheap: re-read of the
just-written parquet, pruned to zero data columns). The reference's analog is
its tqdm progress + silent per-file error suppression (cli.py:99,
runner.py:90-92) — here nothing is silent: caps and drops land in this table.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_out", T.LongType()),
        T.StructField("dropped", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
    ]
)


class MetricsSink:
    def __init__(self, spark: SparkSession, path: str, run_id: str):
        self.spark = spark
        self.path = path
        self.run_id = run_id

    def record_stage(
        self,
        stage: str,
        out_df: DataFrame,
        rows_in: int,
        wall_ms: int,
        dropped: int = 0,
    ) -> None:
        """Append per-partition output counts + a stage-total row."""
        per_part = (
            out_df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows_out"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                "partition_id",
                F.lit(int(rows_in)).cast("long").alias("rows_in"),
                F.col("rows_out").cast("long"),
                F.lit(int(dropped)).cast("long").alias("dropped"),
                F.lit(int(wall_ms)).cast("long").alias("wall_ms"),
            )
        )
        total = self.spark.createDataFrame(
            [
                (
                    self.run_id,
                    stage,
                    -1,
                    int(rows_in),
                    None,
                    int(dropped),
                    int(wall_ms),
                )
            ],
            schema=METRICS_SCHEMA,
        )
        rows_out = per_part.agg(F.sum("rows_out")).collect()[0][0] or 0
        total = total.withColumn("rows_out", F.lit(int(rows_out)).cast("long"))
        per_part.unionByName(total).write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.schema(METRICS_SCHEMA).parquet(self.path)


class StageTimer:
    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        self.wall_ms = int((time.monotonic() - self.t0) * 1000)
        return False
