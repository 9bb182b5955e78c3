"""Multimodal feature extraction: header-parsed image dimensions (pure byte
parsing, no codec library) plus the byte-level features, end-to-end through
the mapInPandas plumbing on planted payloads.
"""

import pytest
from pyspark.sql import functions as F

from replicheck_spark.operators.multimodal import (
    _image_dims,
    extract_features,
    media_from_documents,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    )


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xda\x00\x02" + b"\x00" * 8


def _gif(w: int, h: int) -> bytes:
    return (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00" * 6
    )


class TestImageDims:
    @pytest.mark.parametrize(
        "payload,dims",
        [
            (_png(640, 480), (640, 480)),
            (_png(1, 100000), (1, 100000)),
            (_jpeg(1920, 1080), (1920, 1080)),
            (_gif(320, 200), (320, 200)),
        ],
    )
    def test_planted_headers(self, payload, dims):
        assert _image_dims(payload) == dims

    def test_non_images_and_corrupt(self):
        assert _image_dims(b"") is None
        assert _image_dims(b"plain text payload") is None
        assert _image_dims(b"\x89PNG\r\n\x1a\n\x00\x00") is None  # truncated
        assert _image_dims(_png(640, 480)[:20]) is None
        assert _image_dims(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") is None  # no SOF
        assert _image_dims(b"RIFF....WAVE") is None
        # JPEG with junk where a marker should be: bail, don't mis-parse
        assert _image_dims(b"\xff\xd8\xff\xe0\x00\x04\x00\x00" + b"junk") is None

    def test_jpeg_tables_before_sof(self):
        """DHT (C4) segments must be skipped, not read as a frame header."""
        dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"\x00" * 3
        sof = (
            b"\xff\xc2" + (17).to_bytes(2, "big") + b"\x08"  # progressive SOF2
            + (33).to_bytes(2, "big") + (44).to_bytes(2, "big")
            + b"\x03" + b"\x00" * 9
        )
        assert _image_dims(b"\xff\xd8" + dht + sof) == (44, 33)


def test_extract_features_emits_dims_through_spark(spark):
    rows = [
        (1, "image", _png(640, 480), {}),
        (2, "image", _jpeg(800, 600), {}),
        (3, "image", _gif(32, 32), {}),
        (4, "audio", b"ID3\x04plain", {}),
        (5, "image", None, {}),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta map<string,string>",
    )
    got = {
        r["media_id"]: (r["sniffed"], r["img_width"], r["img_height"])
        for r in extract_features(media).collect()
    }
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("jpeg", 800, 600)
    assert got[3] == ("gif", 32, 32)
    assert got[4] == ("mp3", None, None)
    assert got[5] == ("unknown", None, None)


def test_no_stub_left():
    """The NotImplementedError decode stub is gone (VERDICT r3 item 4)."""
    import inspect

    from replicheck_spark.operators import multimodal

    src = inspect.getsource(multimodal)
    assert "NotImplementedError" not in src


def test_fake_media_features_have_null_dims(spark, pages_small):
    pages, _, _ = pages_small
    from replicheck_spark.operators.extract import extract_docs

    # media_from_documents expects documents-table columns
    docs = (
        extract_docs(pages).limit(5)
        .select("doc_id", "norm_text", "lang")
        .withColumnRenamed("norm_text", "text")
        .withColumn("source", F.col("lang"))
    )
    feats = extract_features(media_from_documents(docs)).collect()
    assert feats
    assert all(r["img_width"] is None for r in feats)


class TestMediaDedup:
    def test_media_exact_dups_planted_groups(self, spark):
        """Byte-identical payloads group by sha; cross_source marks groups
        spanning >= 2 distinct meta['source'] values (the re-hosted-asset
        signal); singletons are excluded."""
        from replicheck_spark.operators.multimodal import media_exact_dups

        rows = [
            (1, "image", b"SAME BYTES", {"source": "crawl-a"}),
            (2, "image", b"SAME BYTES", {"source": "crawl-b"}),
            (3, "audio", b"OTHER", {"source": "crawl-a"}),
            (4, "audio", b"OTHER", {"source": "crawl-a"}),  # same-source dup
            (5, "video", b"UNIQUE", {"source": "crawl-c"}),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, kind string, payload binary, "
            "meta map<string,string>",
        )
        out = {r["media_sha"]: r for r in media_exact_dups(media).collect()}
        assert len(out) == 2
        import hashlib

        same = hashlib.sha256(b"SAME BYTES").hexdigest()
        other = hashlib.sha256(b"OTHER").hexdigest()
        assert out[same]["n_items"] == 2 and out[same]["cross_source"]
        assert out[other]["n_items"] == 2 and not out[other]["cross_source"]

    def test_media_near_dup_pairs_planted_bitmaps(self, spark):
        """Perceptual gate on planted raw 64x64 grayscale frames: a copy
        with one nudged corner block pairs with its original at small
        Hamming; an unrelated random frame pairs with nothing. Exercises the
        raw-frame decode path (meta pix_w/pix_h), the 4x16-bit banding, and
        the salted capped buckets end to end."""
        import numpy as np

        from replicheck_spark.operators.multimodal import media_near_dup_pairs

        rng = np.random.default_rng(42)
        base = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        near = base.copy()
        near[:4, :4] = np.clip(
            near[:4, :4].astype(int) + 25, 0, 255
        ).astype(np.uint8)
        other = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        meta = {"pix_w": "64", "pix_h": "64"}
        rows = [
            (1, "image", base.tobytes(), meta),
            (2, "image", near.tobytes(), meta),
            (3, "image", other.tobytes(), meta),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, kind string, payload binary, "
            "meta map<string,string>",
        )
        got = media_near_dup_pairs(media, max_hamming=6).collect()
        assert {(r["a"], r["b"]) for r in got} == {(1, 2)}
        assert all(r["hamming"] <= 6 for r in got)

    def test_media_near_dup_identical_payloads_hamming_zero(self, spark):
        """Byte-identical payloads share every band and surface at hamming
        0 — the contract that routes exact groups to media_exact_dups but
        never silently loses them here."""
        from replicheck_spark.operators.multimodal import media_near_dup_pairs

        rows = [
            (1, "image", b"PAYLOAD BYTES HERE", {}),
            (2, "image", b"PAYLOAD BYTES HERE", {}),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, kind string, payload binary, "
            "meta map<string,string>",
        )
        got = media_near_dup_pairs(media).collect()
        assert [(r["a"], r["b"], r["hamming"]) for r in got] == [(1, 2, 0)]
