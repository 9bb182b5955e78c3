"""Regression for the exact-dup representative-suppression bug: LSH bands keep
one representative per identical-text group (operators/lsh.py explode_bands),
so a pair-LISTING operator must expand confirmed representative edges back to
every member — otherwise near-dup pairs involving a non-representative member
of an exact-dup group are structurally impossible in the output while the
declared oracle (exact Jaccard over all distinct-text pairs) contains them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from replicheck_spark.config import DedupConfig
from replicheck_spark.operators import dedup_ops


def _docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in sorted(texts.items())], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def planted(spark):
    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99)) + " CHANGED"
    other = " ".join(f"zzz{i}" for i in range(100))
    # 1 and 2 are byte-identical; 3 is a near-dup of that text; 4 unrelated.
    return _docs(spark, {1: base, 2: base, 3: near, 4: other})


def test_minhash_pairs_expand_to_all_exact_members(planted):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup_ops.minhash_lsh_pairs(planted, DedupConfig()).collect()
    }
    # both members of the identical-text group pair with the near-dup;
    # the within-group pair (1,2) is exact, not near, and must NOT appear.
    assert set(got) == {(1, 3), (2, 3)}
    assert got[(1, 3)] == got[(2, 3)] >= 0.8


def test_minhash_matches_exact_ngram_join_with_dup_members(planted):
    """The declared oracle contract: minhash_lsh_pairs == exact shingle-join
    Jaccard pairs among distinct-text pairs, exact-dup members included."""
    lsh = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in dedup_ops.minhash_lsh_pairs(planted, DedupConfig()).collect()
    }
    exact = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in dedup_ops.ngram_jaccard_pairs(planted, k=5, threshold=0.8).collect()
    }
    # ngram join includes identical-text pairs (jaccard 1.0); the minhash
    # listing excludes them by contract (they are exact, not near).
    exact = {t for t in exact if t[2] < 1.0}
    assert lsh == exact


def test_simhash_pairs_expand_to_all_exact_members(planted):
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup_ops.simhash_pairs(planted, DedupConfig()).collect()
    }
    assert set(got) == {(1, 3), (2, 3)}
    assert got[(1, 3)] == got[(2, 3)]


def test_minhash_signature_udf_evaluated_once(planted):
    """The signature UDF is the dominant cost; both the band branch and the
    confirm branch consume it. localCheckpoint inside the operator means the
    final plan reads the materialized signatures — zero ArrowEvalPython nodes
    (vs 2 before the fix)."""
    plan = dedup_ops.minhash_lsh_pairs(planted, DedupConfig())._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan


def test_near_dedup_survivors_keeps_canonical_and_singletons(spark):
    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99)) + " CHANGED"
    other = " ".join(f"zzz{i}" for i in range(100))
    docs = spark.createDataFrame(
        [
            (1, base, "en", "crawl-a", len(base)),
            (2, base, "en", "crawl-b", len(base)),
            (3, near, "en", "crawl-a", len(near)),
            (4, other, "de", "crawl-a", len(other)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = dedup_ops.near_dedup_survivors(docs, k=5, threshold=0.8)
    assert out.columns == ["doc_id", "lang", "source", "n_chars"]
    rows = {r["doc_id"]: r for r in out.collect()}
    # cluster {1,2,3} (1=2 exact, 3 near both) keeps min doc_id 1 only;
    # unrelated 4 survives untouched.
    assert set(rows) == {1, 4}
    assert rows[1]["source"] == "crawl-a" and rows[4]["lang"] == "de"
