"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata.

The decode step is STUBBED (no codec libraries in this container — clearly
marked below); everything Spark-side is real and tested: schema, batch shape,
Arrow transfer, partitioning, and deterministic byte-level feature extraction
(length, sha256, shannon entropy, magic-byte sniffing) over ``mapInPandas``.

A production deployment swaps `_decode_image` for a real decoder (PIL/ffmpeg)
without touching the Spark plumbing.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("sniffed", T.StringType()),
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"ID3": "mp3",
}


def _decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decoding requires a codec library not present in this
    container. The Spark plumbing (schema/batching/partitioning) around it is
    real; production swaps this function for PIL/turbojpeg."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/libjpeg); "
        "not available in this environment"
    )


def _sniff(payload: bytes) -> str:
    for magic, name in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


def _entropy(payload: bytes) -> float:
    if not payload:
        return 0.0
    counts: dict[int, int] = {}
    for ch in payload:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(payload)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents (no external
    data): payload = utf-8 bytes of text, kind round-robins by doc_id."""
    kind = (
        F.when(F.pmod("doc_id", F.lit(3)) == 0, "image")
        .when(F.pmod("doc_id", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "kind": [], "n_bytes": [], "sha256": [],
                "entropy": [], "sniffed": [],
            }
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                rows["media_id"].append(r.media_id)
                rows["kind"].append(r.kind)
                rows["n_bytes"].append(len(payload))
                rows["sha256"].append(hashlib.sha256(payload).hexdigest())
                rows["entropy"].append(_entropy(payload))
                rows["sniffed"].append(_sniff(payload))
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind byte accounting — SQL-expressible (DuckDB oracle)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.min(F.length("payload")).alias("min_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )
