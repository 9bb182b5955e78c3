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


def test_boilerplate_strip_shuffle_branch_parity(spark):
    """The broadcast hints on boiler/affected are size-gated (VERDICT r5 #2:
    a hard hint on a data-dependent frame is a driver OOM at min_docs=2 on a
    web corpus). broadcast_bytes_limit=0 forces the shuffle-join branch; its
    output must be row-identical to the broadcast branch."""
    shared = " ".join(f"s{i}" for i in range(50))
    a = shared + " " + " ".join(f"a{i}" for i in range(50))
    b = shared + " " + " ".join(f"b{i}" for i in range(50))
    docs = _docs(spark, {1: a, 2: b, 3: " ".join(f"c{i}" for i in range(100))})
    bc = sorted(
        map(tuple, blocks.boilerplate_strip(docs, block_tokens=50).collect())
    )
    sh = sorted(
        map(
            tuple,
            blocks.boilerplate_strip(
                docs, block_tokens=50, broadcast_bytes_limit=0
            ).collect(),
        )
    )
    assert sh == bc
    by_id = {t[0]: t for t in bc}
    assert by_id[1][2] == 1  # n_boilerplate: the shared block stripped
    assert by_id[3][2] == 0 and by_id[3][3] == docs.filter(
        "doc_id = 3"
    ).first()["text"]  # untouched round trip


class TestLineCorpusDedup:
    def test_planted_strip_and_round_trip(self, spark):
        """C4-style corpus-frequency line removal: lines (trim-keyed) in >=2
        distinct docs are stripped everywhere; untouched docs round-trip
        exactly (empty lines and within-doc repeats preserved)."""
        docs = _docs(
            spark,
            {
                1: "HEADER\nunique a\nFOOTER",
                2: "  HEADER  \nunique b\nFOOTER",  # trim-matched variant
                3: "solo text",
                4: "dup\n\ndup",  # within-doc repeat only: NOT corpus boiler
            },
        )
        out = {r["doc_id"]: r for r in blocks.line_corpus_dedup(docs).collect()}
        assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
        assert out[1]["clean_text"] == "unique a"
        assert out[2]["n_removed"] == 2 and out[2]["clean_text"] == "unique b"
        assert out[3]["n_removed"] == 0 and out[3]["clean_text"] == "solo text"
        # within-doc repeats are repetition_stats' turf, not corpus dedup's
        assert out[4]["n_lines"] == 3 and out[4]["n_removed"] == 0
        assert out[4]["clean_text"] == "dup\n\ndup"  # exact round trip

    def test_shuffle_branch_parity(self, spark):
        docs = _docs(
            spark,
            {
                1: "HEADER\nunique a\nFOOTER",
                2: "HEADER\nunique b\nFOOTER",
                3: "solo text",
            },
        )
        bc = sorted(map(tuple, blocks.line_corpus_dedup(docs).collect()))
        sh = sorted(
            map(
                tuple,
                blocks.line_corpus_dedup(docs, broadcast_bytes_limit=0).collect(),
            )
        )
        assert sh == bc

    def test_all_lines_removed_yields_empty_clean_text(self, spark):
        docs = _docs(spark, {1: "X\nY", 2: "X\nY"})
        out = {r["doc_id"]: r for r in blocks.line_corpus_dedup(docs).collect()}
        assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 2
