"""Stage EXTRACT: pages -> docs.

pages(url, warc_ts, html, text, lang)
  -> docs(url, host, doc_id, warc_ts, lang, norm_text, n_tokens, sha256)

The only Python crossing is the extraction/normalization pandas UDF; token
counting, hashing and host parsing are JVM built-ins so the whole projection
stays inside whole-stage codegen around one Arrow exchange.

Reference parity: file read + parse (parser.py:25-40) + token projection
(parser.py:181-188) + file sha256 (utils.py:10-24), re-expressed columnar.

Identity: ``doc_id = xxhash64(url)``. At 10^12 docs a 64-bit key has expected
~3e4 colliding pairs (n^2/2^65) — a precision, not recall, risk of order 1e-8;
``audit_doc_id_collisions`` surfaces the count to metrics so production runs
can escalate to a 128-bit key scheme if nonzero matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from replicheck_spark.functions.udfs import extract_normalize

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)"


def extract_docs(pages: DataFrame, dedupe_captures: bool = True) -> DataFrame:
    """Project pages to the normalized docs table.

    ``dedupe_captures``: WARC-style inputs carry multiple captures of the
    same url (that is why ``warc_ts`` exists); without collapsing them, every
    downstream doc_id join multiplies rows (conflicting signatures for one
    doc_id in confirm, re-crawls counted as "duplicates" in exact groups,
    double-counted cluster members) — and ``audit_doc_id_collisions`` cannot
    see it because the urls are equal. The LATEST capture wins
    (``max_by`` on (warc_ts, sha256); the sha256 tiebreak keeps equal-ts
    duplicates deterministic). The dedup runs AFTER the extraction UDF so
    the one added exchange carries normalized text, not raw html (~10x
    narrower at web scale); map-side partial aggregation makes it cheap when
    captures are unique. Pass False only for inputs guaranteed one row per
    url."""
    docs = (
        pages.select(
            "url",
            "warc_ts",
            "lang",
            extract_normalize(F.col("html"), F.col("text")).alias("norm_text"),
        )
        .withColumn("host", F.lower(F.regexp_extract("url", _HOST_RE, 1)))
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn(
            "n_tokens",
            F.when(F.col("norm_text") == "", F.lit(0)).otherwise(
                F.size(F.split("norm_text", " "))
            ),
        )
        .withColumn("sha256", F.sha2("norm_text", 256))
    )
    if not dedupe_captures:
        return docs
    others = [c for c in docs.columns if c != "url"]
    order_key = F.struct(
        F.coalesce(F.col("warc_ts"), F.lit("1970-01-01").cast("timestamp")),
        F.col("sha256"),
    )
    return (
        docs.groupBy("url")
        .agg(F.max_by(F.struct(*others), order_key).alias("r"))
        .select("url", *[F.col(f"r.{c}").alias(c) for c in others])
    )


def eligible_docs(docs: DataFrame, min_size: int) -> DataFrame:
    """min-token-size filter (reference Duplication.py:38-39, default 50)."""
    return docs.filter(F.col("n_tokens") >= min_size)


def audit_doc_id_collisions(docs: DataFrame) -> int:
    """Number of doc_id values shared by >1 distinct url (should be 0)."""
    return (
        docs.groupBy("doc_id")
        .agg(F.countDistinct("url").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
