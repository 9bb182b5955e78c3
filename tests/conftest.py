"""Shared Spark fixtures: one local session for the whole test run.

local[4], tiny pinned shuffle partitions, Arrow on — the determinism config
from SURVEY.md §4.2 rule 3.
"""

from __future__ import annotations

import pytest

from replicheck_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="replicheck_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(spark, tmp_path_factory):
    """~300-doc planted corpus as a Spark DataFrame + its truth + raw rows."""
    from replicheck_spark.corpus import generate_pages, pages_to_pandas

    rows, truth = generate_pages(n_docs=300, seed=42)
    pdf = pages_to_pandas(rows)
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), path)
    df = spark.read.parquet(path)
    return df, truth, rows


@pytest.fixture(scope="session")
def oracle_small(pages_small):
    from replicheck_spark.oracle import run_oracle

    _, _, rows = pages_small
    return run_oracle(rows, min_similarity=0.8, min_size=50, shingle_k=5,
                      substr_min_tokens=50)
