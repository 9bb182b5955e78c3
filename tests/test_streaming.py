"""Incremental (Structured Streaming) dedup: two micro-batches of pages files;
second batch's exact and near duplicates of first-batch docs are emitted."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from replicheck_spark.config import DedupConfig
from replicheck_spark.corpus import pages_to_pandas
from replicheck_spark.streaming.incremental import start_incremental_dedup

SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _write(rows, path):
    pdf = pages_to_pandas(rows)
    pq.write_table(pa.Table.from_pandas(pdf, schema=SCHEMA, preserve_index=False), path)


def _row(url, text):
    from datetime import datetime, timezone

    return {
        "url": url,
        "warc_ts": datetime(2025, 1, 1, tzinfo=timezone.utc),
        "html": f"<html><body>{text}</body></html>".encode(),
        "text": text,
        "lang": "en",
    }


@pytest.mark.slow
def test_incremental_dedup(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    base = " ".join(f"t{i}" for i in range(120))
    near = " ".join((["x"] + [f"t{i}" for i in range(1, 120)]))
    other = " ".join(f"z{i}" for i in range(120))

    # batch 1: two originals
    _write([_row("https://a.example/1", base), _row("https://b.example/2", other)],
           str(src / "b1.parquet"))
    q = start_incremental_dedup(
        spark, str(src), str(tmp_path / "store"), str(tmp_path / "hits"),
        str(tmp_path / "ckpt"), DedupConfig(),
    )
    q.awaitTermination(120)

    # batch 2: one exact copy + one near copy + one fresh doc
    _write(
        [
            _row("https://c.example/3", base),
            _row("https://d.example/4", near),
            _row("https://e.example/5", " ".join(f"q{i}" for i in range(120))),
        ],
        str(src / "b2.parquet"),
    )
    q2 = start_incremental_dedup(
        spark, str(src), str(tmp_path / "store"), str(tmp_path / "hits"),
        str(tmp_path / "ckpt"), DedupConfig(),
    )
    q2.awaitTermination(120)

    assert os.path.exists(str(tmp_path / "hits"))
    hits = spark.read.parquet(str(tmp_path / "hits")).collect()
    kinds = {(r["url"], r["kind"]) for r in hits}
    assert ("https://c.example/3", "exact") in kinds
    assert ("https://d.example/4", "near") in kinds
    assert all(r["url"] != "https://e.example/5" for r in hits)
