"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata.

Everything Spark-side is real and tested: schema, batch shape, Arrow
transfer, partitioning, and deterministic byte-level feature extraction
(length, sha256, shannon entropy, magic-byte sniffing, and header-parsed
image dimensions for PNG/JPEG/GIF — no codec library needed) over
``mapInPandas``. Full PIXEL decode (the part that genuinely requires a codec
like PIL/libjpeg, absent in this container) stays out of scope; a production
deployment adds it inside the same ``extract_features`` batch loop without
touching the Spark plumbing. Header dimensions already cover the metadata a
training-data pipeline filters on (min-resolution gates, aspect buckets).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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
        T.StructField("img_width", T.IntegerType()),   # null: not an image
        T.StructField("img_height", T.IntegerType()),  # or corrupt header
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"ID3": "mp3",
}

# JPEG start-of-frame markers carry dimensions; C4/C8/CC look like SOFn but
# are Huffman/arithmetic tables (no frame header)
_JPEG_NON_SOF = frozenset((0xC4, 0xC8, 0xCC))


def _image_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) parsed from PNG / JPEG / GIF header bytes only — no
    codec dependency; None for non-image or truncated/corrupt payloads.

    * PNG: the IHDR chunk is mandated first, so width/height are big-endian
      u32 at fixed offsets 16/20.
    * JPEG: walk the segment chain until a SOFn marker; height/width are
      big-endian u16 at offsets 5/7 inside that segment.
    * GIF: logical screen descriptor right after the 6-byte signature,
      little-endian u16 pair.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            return (
                int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"),
            )
        return None
    if payload[:3] == b"\xff\xd8\xff":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:  # out of sync: not a marker — bail
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                if i + 9 <= n:
                    return (
                        int.from_bytes(payload[i + 7 : i + 9], "big"),
                        int.from_bytes(payload[i + 5 : i + 7], "big"),
                    )
                return None
            if marker == 0xDA:  # entropy-coded data follows; no SOF seen
                return None
            i += 2 + seg_len
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return (
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    return None


def _sniff(payload: bytes) -> str:
    for magic, name in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


def _entropy(payload: bytes) -> float:
    if not payload:
        return 0.0
    # vectorized histogram: a per-byte Python loop costs ~5M dict ops on a
    # 5 MB payload — bincount is the same histogram in one numpy pass
    counts = np.bincount(
        np.frombuffer(payload, dtype=np.uint8), minlength=256
    )
    p = counts[counts > 0] / len(payload)
    return float(-(p * np.log2(p)).sum())


def media_from_documents(
    docs: DataFrame, prefix_chars: int | None = None
) -> DataFrame:
    """Deterministic fake media table derived from documents (no external
    data): payload = utf-8 bytes of text, kind round-robins by doc_id.

    ``prefix_chars`` truncates the payload to the first N characters — the
    deterministic 'thumbnail decode' stand-in that makes byte-identical
    payloads EXIST in the fixture corpus (full texts are near-unique at
    every SF; 40-char prefixes collide ~23 times at sf0.01), so the exact
    media dedup face has real duplicate groups to find and the DuckDB
    oracle real rows to check."""
    kind = (
        F.when(F.pmod("doc_id", F.lit(3)) == 0, "image")
        .when(F.pmod("doc_id", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    payload_src = (
        F.substring("text", 1, prefix_chars) if prefix_chars else F.col("text")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(payload_src, "utf-8").alias("payload"),
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
                "entropy": [], "sniffed": [], "img_width": [], "img_height": [],
            }
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                dims = _image_dims(payload)
                rows["media_id"].append(r.media_id)
                rows["kind"].append(r.kind)
                rows["n_bytes"].append(len(payload))
                rows["sha256"].append(hashlib.sha256(payload).hexdigest())
                rows["entropy"].append(_entropy(payload))
                rows["sniffed"].append(_sniff(payload))
                rows["img_width"].append(dims[0] if dims else None)
                rows["img_height"].append(dims[1] if dims else None)
            yield pd.DataFrame(
                rows,
            ).astype({"img_width": "Int32", "img_height": "Int32"})

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


def media_exact_dups(media: DataFrame, min_items: int = 2) -> DataFrame:
    """EXACT media dedup — the most common multimodal curation query ("which
    images are byte-identical?"): one row per payload-identical group
    appearing >= ``min_items`` times, (media_sha, n_items, n_sources,
    cross_source). cross_source marks groups spanning >= 2 distinct
    ``meta['source']`` values — the re-hosted-asset signal.

    Scale design: identical to the document exact stage (dedup_ops
    exact_dup_groups) applied to the binary column — one hash agg with
    map-side combine, shuffling only (sha, partial counts); the payload
    bytes never leave the scan stage because sha2 reduces them in the map
    task. SQL-expressible (DuckDB sha256 group) and driver-checked on the
    thumbnail-payload media table (media_from_documents(prefix_chars=40)).
    """
    return (
        media.groupBy(F.sha2("payload", 256).alias("media_sha"))
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct(F.col("meta").getItem("source")).alias(
                "n_sources"
            ),
        )
        .withColumn("cross_source", F.col("n_sources") >= 2)
        .filter(F.col("n_items") >= F.lit(min_items))
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _gray_pixels(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic grayscale 'decode' for the perceptual hash.

    Raw 8-bit frames pass through exactly: when ``meta['pix_w']/['pix_h']``
    are set and ``w*h == len(payload)``, the payload IS the pixel matrix —
    the shape a production codec decode (PIL/libjpeg, absent in this
    container) would emit into this same batch loop; that codec call is the
    single swap-in point (module docstring). Every other payload folds the
    raw BYTE STREAM into a 64x64 grid by tiling — a clearly-marked
    deterministic fake that keeps the Spark plumbing, batch shape, and hash
    math real and testable without a codec library."""
    w, h = meta.get("pix_w"), meta.get("pix_h")
    if w and h and int(w) * int(h) == len(payload):
        return (
            np.frombuffer(payload, np.uint8)
            .reshape(int(h), int(w))
            .astype(np.float64)
        )
    buf = np.frombuffer(payload or b"\x00", np.uint8)
    need = 64 * 64
    reps = -(-need // len(buf))
    return np.tile(buf, reps)[:need].reshape(64, 64).astype(np.float64)


def _resize_block_mean(a: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Block-average resize to (oh, ow) via two reduceat passes — the
    classic perceptual-hash downsample, no interpolation library. Inputs
    smaller than the target degrade to nearest-neighbor (reduceat semantics
    for repeated edges), counts clamped to avoid zero division."""
    H, W = a.shape
    re_ = (np.arange(oh) * H) // oh
    ce = (np.arange(ow) * W) // ow
    s = np.add.reduceat(np.add.reduceat(a, re_, axis=0), ce, axis=1)
    rc = np.maximum(np.diff(np.r_[re_, H]), 1)[:, None]
    cc = np.maximum(np.diff(np.r_[ce, W]), 1)[None, :]
    return s / (rc * cc)


def _dhash64(gray: np.ndarray) -> int:
    """64-bit difference hash: block-average to 8x9, one bit per horizontal
    gradient sign. Near-identical images differ in few bits (Hamming), the
    property the banded near-dup join below exploits — the image-domain
    sibling of the text simhash."""
    g = _resize_block_mean(gray, 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def media_dhash(media: DataFrame) -> DataFrame:
    """(media_id, dhash): Arrow-batched perceptual hashing over mapInPandas —
    one corpus scan, no shuffle; the hash is 8 bytes/item regardless of
    payload size, so everything downstream is narrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "dhash": []}
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                meta = dict(r.meta) if r.meta is not None else {}
                out["media_id"].append(r.media_id)
                out["dhash"].append(_dhash64(_gray_pixels(payload, meta)))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "meta").mapInPandas(
        run, schema=DHASH_SCHEMA
    )


def media_near_dup_pairs(
    media: DataFrame, max_hamming: int = 6,
    salt_buckets: int = 8, bucket_cap: int = 1000,
) -> DataFrame:
    """PERCEPTUAL media near-dup pairs: (a, b, hamming) with dhash Hamming
    distance <= ``max_hamming`` — re-encoded/slightly-edited image detection,
    the multimodal sibling of simhash_pairs.

    Dataflow is the engine's standard bucket discipline, reusing the LSH
    primitives verbatim: the 64-bit dhash splits into 4x16-bit bands
    (pigeonhole: any pair within Hamming <= 3 shares at least one exact
    band; 4-6 is probabilistic — the declared LSH recall contract, same as
    the text side), band rows get the salted two-level capped aggregation
    (lsh.capped_id_buckets — no task ever owns a hot bucket; truncation
    metered in the bucket frame, never silent), pairs explode JVM-side
    (lsh.intra_array_pairs), and only then does the 8-byte hash join back
    for the exact Hamming filter. Identical payloads share all 4 bands and
    surface at hamming 0; route byte-exact groups to media_exact_dups.
    Pytest-gated on planted near-identical raw bitmaps (no SQL oracle —
    perceptual hashing is not SQL-expressible; same posture as
    simhash_pairs)."""
    from replicheck_spark.operators.lsh import (
        capped_id_buckets,
        intra_array_pairs,
    )

    hashes = media_dhash(media).localCheckpoint(eager=False)
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("dhash"), 16 * i).bitwiseAND(
                F.lit(0xFFFF)
            )
            for i in range(4)
        ]
    )
    rows = hashes.select(
        "media_id", F.posexplode(band_vals).alias("band_id", "band_hash")
    ).withColumn("salt", F.pmod(F.xxhash64("media_id"), F.lit(salt_buckets)))
    buckets = capped_id_buckets(
        rows, ["band_id", "band_hash"], bucket_cap, id_col="media_id"
    )
    pairs = (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(intra_array_pairs("ids")).alias("p"))
        .select("p.a", "p.b")
        .dropDuplicates(["a", "b"])
    )
    a = hashes.select(F.col("media_id").alias("a"), F.col("dhash").alias("a_h"))
    b = hashes.select(F.col("media_id").alias("b"), F.col("dhash").alias("b_h"))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .withColumn(
            "hamming", F.bit_count(F.col("a_h").bitwiseXOR(F.col("b_h")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
