"""Stage SUBSTR: long verbatim substring overlap — the web-scale analog of the
reference's identical-block detector (grouping whole token tuples,
/root/reference/replicheck/tools/Duplication/Duplication.py:40-41, generalized
to partial overlap between otherwise-different documents).

Candidate generation CANNOT reuse MinHash bands: a 60-token verbatim run inside
two 600-token documents gives overall Jaccard ~0.05, far below any LSH curve.
Instead, deterministic anchor sampling: a shared run of >= L tokens contains
>= L-k+1 consecutive k-shingles, so selecting shingles whose hash ≡ 0
(mod q) with q = max(1, (L-k+1)//8) leaves an expected >= 8 anchors inside any
qualifying run (miss probability ~ e^-8). Anchors explode -> hash-agg buckets
-> bounded intra-bucket pairs — the same salted/capped discipline as the LSH
stage, with capped-bucket counts surfaced for metrics.

Verification computes the exact longest common token run per candidate pair
with an O(n log n) binary search over rolling-hash window sets. This is the
one genuinely-custom operator Spark lacks, so it runs as ``mapInPandas``
(Arrow-batched; SURVEY.md §2.9 allows mapInArrow-class work here). Token
hashes are recomputed from norm_text only for the docs that appear in a
candidate pair — the signatures table never carries ordered token arrays.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from replicheck_spark.config import DedupConfig
from replicheck_spark.functions.hashing import token_hash64
from replicheck_spark.functions.textnorm import tokenize

_P = (1 << 61) - 1
_B = 0x100000001B3


def _prefix_hashes(hs: list[int]) -> tuple[list[int], list[int]]:
    pre = [0] * (len(hs) + 1)
    pw = [1] * (len(hs) + 1)
    for i, h in enumerate(hs):
        pre[i + 1] = (pre[i] * _B + h) % _P
        pw[i + 1] = (pw[i] * _B) % _P
    return pre, pw


def _windows(pre: list[int], pw: list[int], m: int) -> set[int]:
    n = len(pre) - 1
    return {(pre[i + m] - pre[i] * pw[m]) % _P for i in range(n - m + 1)}


def longest_common_run_hashed(a: list[int], b: list[int]) -> int:
    """Longest common contiguous run of two int sequences (rolling-hash
    binary search; collision probability ~2^-61 per comparison, accepted)."""
    if not a or not b:
        return 0
    pre_a, pw = _prefix_hashes(a)
    pre_b, _ = _prefix_hashes(b)
    lo, hi, best = 1, min(len(a), len(b)), 0
    while lo <= hi:
        mid = (lo + hi) // 2
        if _windows(pre_a, pw, mid) & _windows(pre_b, pw, mid):
            best = mid
            lo = mid + 1
        else:
            hi = mid - 1
    return best


def anchor_pairs(
    signatures: DataFrame, cfg: DedupConfig, bucket_cap: int = 64
) -> tuple[DataFrame, DataFrame]:
    """-> (cand(a, b), capped(anchor, overflow)) via deterministic anchor
    sampling over the stored distinct shingle hashes."""
    need = cfg.substr_min_tokens - cfg.shingle_k + 1
    q = max(1, need // 8)
    anchors = signatures.select(
        "doc_id",
        "sha256",
        F.explode(
            F.filter(F.col("shingles"), lambda s: F.pmod(s, F.lit(q)) == 0)
        ).alias("anchor"),
    )
    # identical docs already linked by the exact stage: one rep per sha256
    anchors = anchors.groupBy("anchor", "sha256").agg(F.min("doc_id").alias("doc_id"))
    buckets = (
        anchors.groupBy("anchor")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("all_ids"))
        .withColumn("overflow", F.greatest(F.size("all_ids") - bucket_cap, F.lit(0)))
        .withColumn("ids", F.slice("all_ids", 1, bucket_cap))
    )
    capped = buckets.filter(F.col("overflow") > 0).select("anchor", "overflow")
    pairs = (
        buckets.filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x: F.transform(
                                F.col("ids"),
                                lambda y: F.struct(x.alias("a"), y.alias("b")),
                            ),
                        )
                    ),
                    lambda p: p["a"] < p["b"],
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .dropDuplicates(["a", "b"])
    )
    return pairs, capped


_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("a_url", T.StringType()),
        T.StructField("b_url", T.StringType()),
        T.StructField("run_tokens", T.IntegerType()),
    ]
)


def substr_edges(
    cand: DataFrame, docs: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Verify candidate pairs; keep runs >= substr_min_tokens.

    -> edges(a, b, a_url, b_url, jaccard=null, hamming=null, kind='substr',
    run_tokens).
    """
    d = docs.select("doc_id", "url", "norm_text")
    joined = (
        cand.join(
            d.select(
                F.col("doc_id").alias("a"),
                F.col("url").alias("a_url"),
                F.col("norm_text").alias("a_text"),
            ),
            "a",
        )
        .join(
            d.select(
                F.col("doc_id").alias("b"),
                F.col("url").alias("b_url"),
                F.col("norm_text").alias("b_text"),
            ),
            "b",
        )
        .select("a", "b", "a_url", "b_url", "a_text", "b_text")
    )

    min_run = cfg.substr_min_tokens

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict[str, list[int]] = {}

            def tok_hashes(text: str) -> list[int]:
                hs = cache.get(text)
                if hs is None:
                    hs = [token_hash64(t) % _P for t in tokenize(text)]
                    cache[text] = hs
                return hs

            out = {"a": [], "b": [], "a_url": [], "b_url": [], "run_tokens": []}
            for row in pdf.itertuples(index=False):
                run = longest_common_run_hashed(
                    tok_hashes(row.a_text), tok_hashes(row.b_text)
                )
                if run >= min_run:
                    out["a"].append(row.a)
                    out["b"].append(row.b)
                    out["a_url"].append(row.a_url)
                    out["b_url"].append(row.b_url)
                    out["run_tokens"].append(run)
            yield pd.DataFrame(out)

    verified = joined.mapInPandas(verify, schema=_VERIFY_SCHEMA)
    return verified.select(
        "a", "b", "a_url", "b_url",
        F.lit(None).cast("double").alias("jaccard"),
        F.lit(None).cast("int").alias("hamming"),
        F.lit("substr").alias("kind"),
        "run_tokens",
    )
