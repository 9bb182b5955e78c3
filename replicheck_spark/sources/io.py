"""Checkpoint/table IO layer.

Sandbox backend: Parquet directories under a checkpoint root, keyed by
``run_id/stage``; a stage output "exists" iff its ``_SUCCESS`` marker does —
Spark writes the marker last, so a killed write never looks complete. That is
the whole idempotent-resume contract (BASELINE.json north_rule "resumable from
checkpoint"): on restart with the same run_id, finished stages are read back,
unfinished ones recompute.

Production backend: Iceberg tables (``spark.jars.packages`` +
``spark.sql.catalog.*`` at submit time — the runtime jar is not in this
sandbox, see SURVEY.md §4.2 rule 5). `TableIO` keeps that switch behind one
class so no operator code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, root: str, run_id: str,
                 iceberg_catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        self.iceberg_catalog = iceberg_catalog

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, self.run_id, stage)

    def exists(self, stage: str) -> bool:
        if self.iceberg_catalog:
            return self.spark.catalog.tableExists(
                f"{self.iceberg_catalog}.{self.run_id}_{stage}"
            )
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def write(self, stage: str, df: DataFrame, partitions: int | None = None) -> None:
        if partitions:
            df = df.repartition(partitions)
        if self.iceberg_catalog:
            df.writeTo(f"{self.iceberg_catalog}.{self.run_id}_{stage}").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(stage))

    def read(self, stage: str) -> DataFrame:
        if self.iceberg_catalog:
            return self.spark.read.table(
                f"{self.iceberg_catalog}.{self.run_id}_{stage}"
            )
        return self.spark.read.parquet(self._path(stage))
