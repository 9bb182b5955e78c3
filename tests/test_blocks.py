"""Sub-document block granularity: doc -> fixed-token-window units feeding the
standard dedup operators — the web-text analog of the reference's
block-within-file record (parser.py:42-61)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from replicheck_spark.config import DedupConfig
from replicheck_spark.operators import blocks
from replicheck_spark.operators.dedup_ops import minhash_lsh_pairs


def _docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in sorted(texts.items())], "doc_id long, text string"
    )


def test_explode_blocks_shape(spark):
    text = " ".join(f"w{i}" for i in range(120))
    units = blocks.explode_blocks(_docs(spark, {7: text}), block_tokens=50).collect()
    assert [u["block_idx"] for u in units] == [0, 1, 2]
    assert [u["n_block_tokens"] for u in units] == [50, 50, 20]
    # units reassemble the document exactly, in order
    assert " ".join(u["block_text"] for u in units) == text
    assert len({u["unit_id"] for u in units}) == 3


def test_block_exact_dups_cross_doc(spark):
    shared = " ".join(f"s{i}" for i in range(50))
    a = shared + " " + " ".join(f"a{i}" for i in range(50))
    b = shared + " " + " ".join(f"b{i}" for i in range(50))
    rows = blocks.block_exact_dups(
        _docs(spark, {1: a, 2: b, 3: " ".join(f"c{i}" for i in range(100))}),
        block_tokens=50,
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2 and rows[0]["n_blocks"] == 2


def test_block_near_pairs_catch_low_whole_doc_jaccard(spark):
    """Two long pages sharing one near-identical paragraph: whole-document
    Jaccard ~0.3 is invisible to document-level LSH at threshold 0.8; the
    doc->units path finds the pair."""
    para = " ".join(f"p{i}" for i in range(100))
    near_para = " ".join(f"p{i}" for i in range(99)) + " EDIT"
    doc1 = " ".join(f"a{i}" for i in range(100)) + " " + para
    doc2 = " ".join(f"b{i}" for i in range(100)) + " " + near_para
    docs = _docs(spark, {1: doc1, 2: doc2})
    cfg = DedupConfig()

    whole = minhash_lsh_pairs(docs, cfg).collect()
    assert whole == []  # document-level LSH cannot see the shared paragraph

    got = blocks.block_near_doc_pairs(docs, cfg, block_tokens=100).collect()
    assert {(r["a"], r["b"]) for r in got} == {(1, 2)}
