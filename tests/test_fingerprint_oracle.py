"""Semantic oracle for the winnowing fingerprint (Schleimer et al. '03 §2):
a deliberately naive pure-Python winnow — per-token blake2b, k-gram
polynomial combine, min of every sliding window, distinct — must reproduce
the vectorized Spark operator's fingerprint SET exactly, per doc.

(The driver's check for doc_fingerprint is rows-only; this is the values
gate. Schleimer's rightmost-min tie-break affects which *position* is
selected, never which hash *values* — so set equality against plain
window-minima is the full §2 contract.)
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
_PRIME = 0x100000001B3
_SM_C1 = 0xBF58476D1CE4E5B9
_SM_C2 = 0x94D049BB133111EB
_SM_GAMMA = 0x9E3779B97F4A7C15


def _splitmix64(x: int) -> int:
    x = (x + _SM_GAMMA) & MASK64
    x = ((x ^ (x >> 30)) * _SM_C1) & MASK64
    x = ((x ^ (x >> 27)) * _SM_C2) & MASK64
    return x ^ (x >> 31)


def naive_winnow(text: str, k: int = 5, window: int = 8) -> set[int]:
    """Textbook winnow: k-gram rolling hashes over per-token hashes, the min
    of every `window`-length window of grams, distinct, as signed int64."""
    from replicheck_spark.functions.hashing import token_hash64

    toks = (text or "").split(" ")
    if len(toks) < k:
        return set()
    hs = [token_hash64(t) for t in toks]
    grams = []
    for i in range(len(toks) - k + 1):
        acc = hs[i]
        for j in range(1, k):
            acc = (acc * _PRIME + hs[i + j]) & MASK64
        grams.append(_splitmix64(acc))
    if len(grams) <= window:
        sel = {min(grams)}
    else:
        sel = {
            min(grams[i : i + window]) for i in range(len(grams) - window + 1)
        }
    return {v - (1 << 64) if v >= (1 << 63) else v for v in sel}


def test_fingerprint_matches_naive_winnow_on_testdata(spark):
    """Exact fingerprint-set equality per doc on the sf0.001 documents table
    (500 real fixture docs, 10-99 tokens: covers <k, <=window and >window)."""
    from pyspark.sql import functions as F

    from replicheck_spark.operators.textops import fingerprint

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got_rows = (
        fingerprint(docs, k=5, window=8)
        .groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fps"))
        .collect()
    )
    got = {r["doc_id"]: {v for v in r["fps"] if v is not None} for r in got_rows}

    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    assert set(got) == set(texts)
    mismatches = [
        d for d in texts if got[d] != naive_winnow(texts[d], k=5, window=8)
    ]
    assert not mismatches, f"fingerprint set mismatch for docs {mismatches[:5]}"


def test_fingerprint_short_doc_emits_null_row(spark):
    from replicheck_spark.operators.textops import fingerprint

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = fingerprint(df, k=5, window=8).collect()
    assert len(rows) == 1 and rows[0]["fp"] is None
