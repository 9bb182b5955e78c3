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


@pytest.mark.slow
def test_within_batch_duplicates_detected(spark, tmp_path):
    """Exact and near duplicates arriving in the SAME micro-batch (here: the
    very first batch) are emitted as hits, later-arrival (greater doc_id /
    later url) flagged as the duplicate of the earlier one."""
    src = tmp_path / "src"
    src.mkdir()
    base = " ".join(f"t{i}" for i in range(120))
    near = " ".join((["x"] + [f"t{i}" for i in range(1, 120)]))
    _write(
        [
            _row("https://a.example/1", base),
            _row("https://b.example/2", base),   # exact dup, same batch
            _row("https://c.example/3", near),   # near dup, same batch
        ],
        str(src / "b1.parquet"),
    )
    q = start_incremental_dedup(
        spark, str(src), str(tmp_path / "store"), str(tmp_path / "hits"),
        str(tmp_path / "ckpt"), DedupConfig(),
    )
    q.awaitTermination(120)
    hits = spark.read.parquet(str(tmp_path / "hits")).collect()
    by_url = {r["url"]: r for r in hits}
    assert by_url["https://b.example/2"]["kind"] == "exact"
    assert by_url["https://b.example/2"]["dup_of"] == "https://a.example/1"
    assert by_url["https://c.example/3"]["kind"] == "near"
    # one of the two identical originals is the near match's counterpart
    assert by_url["https://c.example/3"]["dup_of"] in {
        "https://a.example/1", "https://b.example/2"
    }
    # originals themselves are not hits
    assert "https://a.example/1" not in by_url


@pytest.mark.slow
def test_replay_same_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: reprocessing the same batch_id (crash
    after sink write, before checkpoint commit) must not duplicate hit rows or
    store signatures."""
    from replicheck_spark.streaming.incremental import IncrementalDedup

    base = " ".join(f"t{i}" for i in range(120))
    handler = IncrementalDedup(
        spark, str(tmp_path / "store"), DedupConfig(), str(tmp_path / "hits")
    )
    import pandas as pd

    def batch_df(rows):
        return spark.createDataFrame(pages_to_pandas(rows))

    b0 = [_row("https://a.example/1", base), _row("https://b.example/2", base)]
    handler.process_batch(batch_df(b0), 0)
    b1 = [_row("https://c.example/3", base)]
    handler.process_batch(batch_df(b1), 1)
    hits_once = sorted(
        (r["url"], r["kind"], r["batch_id"]) for r in handler.hits().collect()
    )
    store_once = spark.read.parquet(str(tmp_path / "store")).count()

    # replay both batches (same ids) — e.g. restart after a lost commit
    handler.process_batch(batch_df(b0), 0)
    handler.process_batch(batch_df(b1), 1)
    hits_twice = sorted(
        (r["url"], r["kind"], r["batch_id"]) for r in handler.hits().collect()
    )
    assert hits_twice == hits_once
    assert spark.read.parquet(str(tmp_path / "store")).count() == store_once
    # the replayed store batch never matched the doc against its own
    # prior attempt: /3 is a dup of an earlier batch's doc, not of itself
    dup_of = {r["url"]: r["dup_of"] for r in handler.hits().collect()}
    assert dup_of["https://c.example/3"] != "https://c.example/3"


def test_within_batch_near_canonical_is_min_url(spark, tmp_path):
    """Regression (r3 review): the band representative must be keyed by min
    URL, matching the exact-stage canonical. doc_id = xxhash64(url), so with
    a min-doc_id rep a within-batch exact group whose min-url member is NOT
    its min-doc_id member carried near edges only on an already-exact-flagged
    doc — the unflagged min-url canonical escaped near flagging and the
    survivor set could retain near-duplicate pairs.

    Construct exactly that ordering: urls p < q (strings) with
    xxhash64(p) > xxhash64(q), identical text at both, plus a near-dup at
    url w < p. Correct flags: q exact (dup_of p), p near (dup_of w),
    w unflagged."""
    from pyspark.sql import functions as F

    from replicheck_spark.streaming.incremental import IncrementalDedup

    cands = [f"https://h.example/a{i:02d}" for i in range(64)]
    hashed = dict(
        spark.createDataFrame([(u,) for u in cands], "url string")
        .select("url", F.xxhash64("url").alias("h"))
        .collect()
    )
    w_url, rest = cands[0], cands[1:]
    p_url = q_url = None
    for i in range(len(rest)):
        for j in range(i + 1, len(rest)):
            if hashed[rest[i]] > hashed[rest[j]]:
                p_url, q_url = rest[i], rest[j]
                break
        if p_url:
            break
    assert p_url is not None, "no hash-inverted url pair in 64 candidates"

    base = " ".join(f"t{i}" for i in range(120))
    near = " ".join(["x"] + [f"t{i}" for i in range(1, 120)])
    batch = spark.createDataFrame(
        pages_to_pandas([_row(w_url, near), _row(p_url, base), _row(q_url, base)])
    )
    handler = IncrementalDedup(
        spark, str(tmp_path / "store"), DedupConfig(), str(tmp_path / "hits")
    )
    handler.process_batch(batch, 0)

    hits = spark.read.parquet(str(tmp_path / "hits")).collect()
    flagged = {r["url"]: (r["kind"], r["dup_of"]) for r in hits}
    assert flagged.get(q_url) == ("exact", p_url)
    assert flagged.get(p_url) == ("near", w_url), (
        f"min-url canonical {p_url} must be near-flagged against {w_url}; "
        f"hits={flagged}"
    )
    assert w_url not in flagged


def test_survivor_set_has_no_near_dup_pairs(spark, tmp_path):
    """The end-to-end guarantee behind the rep_by="url" fix (VERDICT r3 item
    7): after a batch with several exact groups in ADVERSARIAL hash order
    (min-url member is not the min-doc_id member) plus near partners, the
    survivor set (docs never flagged) must contain no near-duplicate pair at
    all — checked independently with the pure-Python shingle Jaccard, not
    with the engine's own operators."""
    import itertools

    from pyspark.sql import functions as F

    from replicheck_spark.functions.textnorm import (
        normalize_text, shingle_strings, tokenize,
    )
    from replicheck_spark.oracle import jaccard
    from replicheck_spark.streaming.incremental import IncrementalDedup

    cands = [f"https://s.example/d{i:03d}" for i in range(200)]
    hashed = dict(
        spark.createDataFrame([(u,) for u in cands], "url string")
        .select("url", F.xxhash64("url").alias("h"))
        .collect()
    )
    # three exact groups, each with urls sorted ascending but doc_id order
    # INVERTED (min url has the larger hash), each with one near partner
    groups = []
    used = set()
    for u, v in itertools.combinations(cands, 2):
        if u in used or v in used:
            continue
        if u < v and hashed[u] > hashed[v]:
            groups.append((u, v))
            used.update((u, v))
            if len(groups) == 3:
                break
    assert len(groups) == 3
    partners = [c for c in cands if c not in used][:3]

    rows, texts = [], {}
    for g, (u, v) in enumerate(groups):
        base = " ".join(f"g{g}w{i}" for i in range(120))
        near = " ".join([f"edit{g}"] + [f"g{g}w{i}" for i in range(1, 120)])
        for url, text in [(u, base), (v, base), (partners[g], near)]:
            rows.append(_row(url, text))
            texts[url] = text

    handler = IncrementalDedup(
        spark, str(tmp_path / "store"), DedupConfig(), str(tmp_path / "hits")
    )
    handler.process_batch(spark.createDataFrame(pages_to_pandas(rows)), 0)

    flagged = {r["url"] for r in spark.read.parquet(str(tmp_path / "hits")).collect()}
    survivors = sorted(set(texts) - flagged)
    # exactly one survivor per (exact group + near partner) family
    assert len(survivors) == 3, (survivors, flagged)
    sh = {
        u: shingle_strings(tokenize(normalize_text(texts[u])), 5)
        for u in survivors
    }
    for a, b in itertools.combinations(survivors, 2):
        assert jaccard(sh[a], sh[b]) < 0.8, (
            f"survivors {a} and {b} are near-duplicates — a canonical "
            f"escaped flagging"
        )


def test_redelivered_url_not_flagged_as_its_own_duplicate(spark, tmp_path):
    """A url re-arriving in a later batch (at-least-once delivery upstream of
    the stream, or a re-crawl) supersedes its store row: it must not be
    flagged as an exact duplicate of ITSELF, and a changed re-crawl must not
    be confirmed against its own stale signature."""
    from replicheck_spark.streaming.incremental import IncrementalDedup

    base = " ".join(f"t{i}" for i in range(120))
    changed = " ".join(f"c{i}" for i in range(120))
    handler = IncrementalDedup(
        spark, str(tmp_path / "store"), DedupConfig(), str(tmp_path / "hits")
    )

    def batch_df(rows):
        return spark.createDataFrame(pages_to_pandas(rows))

    handler.process_batch(
        batch_df([_row("https://a.example/1", base),
                  _row("https://b.example/2", changed)]), 0)
    # batch 1 re-delivers /1 byte-identical and /2 with NEW content
    handler.process_batch(
        batch_df([_row("https://a.example/1", base),
                  _row("https://b.example/2", " ".join(f"z{i}" for i in range(120)))]),
        1)
    hits = spark.read.parquet(str(tmp_path / "hits")).collect()
    for r in hits:
        assert r["dup_of"] != r["url"], f"self-duplicate hit: {r}"
    # neither doc has a genuine duplicate -> no hits at all
    assert hits == []


def test_store_exact_hit_is_single_canonical_row(spark, tmp_path):
    """k identical texts in the store must yield ONE exact hit per new doc
    (canonical = min url), not k duplicate hit rows."""
    from replicheck_spark.streaming.incremental import IncrementalDedup

    base = " ".join(f"t{i}" for i in range(120))
    handler = IncrementalDedup(
        spark, str(tmp_path / "store"), DedupConfig(), str(tmp_path / "hits")
    )

    def batch_df(rows):
        return spark.createDataFrame(pages_to_pandas(rows))

    handler.process_batch(
        batch_df([_row("https://a.example/1", base),
                  _row("https://b.example/2", base)]), 0)
    handler.process_batch(batch_df([_row("https://c.example/3", base)]), 1)
    hits = [r for r in spark.read.parquet(str(tmp_path / "hits")).collect()
            if r["url"] == "https://c.example/3" and r["kind"] == "exact"]
    assert len(hits) == 1, hits
    assert hits[0]["dup_of"] == "https://a.example/1"


def test_stale_signature_superseded_across_nonadjacent_batches(spark, tmp_path):
    """Regression (r4 review): the current batch's anti-join only removes
    store rows re-delivered in THIS batch. A url delivered in batch 0 and
    re-delivered with CHANGED content in batch 1 left both rows in the store
    (two batch_id partitions, one doc_id); from batch 2 on, a new doc
    matching the url's OLD content was flagged as an exact dup of content
    the url no longer has. Latest-per-doc_id on store read must win."""
    from replicheck_spark.streaming.incremental import IncrementalDedup

    old = " ".join(f"t{i}" for i in range(120))
    new = " ".join(f"n{i}" for i in range(120))
    handler = IncrementalDedup(
        spark, str(tmp_path / "store"), DedupConfig(), str(tmp_path / "hits")
    )

    def batch_df(rows):
        return spark.createDataFrame(pages_to_pandas(rows))

    handler.process_batch(batch_df([_row("https://a.example/1", old)]), 0)
    # re-crawl: /1's content CHANGED
    handler.process_batch(batch_df([_row("https://a.example/1", new)]), 1)
    # batch 2: /b matches /1's STALE content, /c matches its LIVE content
    handler.process_batch(
        batch_df([_row("https://b.example/2", old),
                  _row("https://c.example/3", new)]), 2)
    hits = spark.read.parquet(str(tmp_path / "hits")).collect()
    by_url = {r["url"]: r for r in hits}
    # live content match IS a dup of /1 ...
    assert by_url["https://c.example/3"]["kind"] == "exact"
    assert by_url["https://c.example/3"]["dup_of"] == "https://a.example/1"
    # ... but nothing in the corpus currently holds `old`, so /b is fresh
    assert "https://b.example/2" not in by_url, (
        "stale store signature resurrected: /b flagged as dup of content "
        "/1 no longer has"
    )


def test_store_compaction_bounds_rows_to_live_urls(spark, tmp_path):
    """With compact_every=3 and repeated re-deliveries, the store must
    converge to one row per LIVE url (not one per delivery), subsumed
    partitions must be reclaimed one batch after the compaction commits, and
    dedup results must be unaffected."""
    import os

    from replicheck_spark.streaming.incremental import IncrementalDedup

    texts = {u: " ".join(f"{u}w{i}" for i in range(120)) for u in "abc"}
    handler = IncrementalDedup(
        spark, str(tmp_path / "store"), DedupConfig(), str(tmp_path / "hits"),
        compact_every=3,
    )

    def batch_df(rows):
        return spark.createDataFrame(pages_to_pandas(rows))

    def url(u):
        return f"https://{u}.example/{u}"

    handler.process_batch(batch_df([_row(url("a"), texts["a"])]), 0)
    handler.process_batch(batch_df([_row(url("b"), texts["b"])]), 1)
    # batch 2 re-delivers both and adds c -> triggers compaction (3 dirs)
    handler.process_batch(
        batch_df([_row(url("a"), texts["a"]), _row(url("b"), texts["b"]),
                  _row(url("c"), texts["c"])]), 2)
    assert os.path.exists(str(tmp_path / "store" / "_compacted_at"))
    # batch 3 (post-compaction): reclaim happens, dedup vs store still works
    handler.process_batch(batch_df([_row("https://d.example/d", texts["a"])]), 3)

    dirs = sorted(
        d for d in os.listdir(str(tmp_path / "store"))
        if d.startswith("batch_id=")
    )
    assert dirs == ["batch_id=2", "batch_id=3"], dirs  # 0 and 1 reclaimed
    store = spark.read.parquet(str(tmp_path / "store"))
    # 3 deliveries of a, 2 of b, 1 of c, 1 of d -> exactly 4 live rows
    assert store.count() == 4
    assert store.select("doc_id").distinct().count() == 4
    # /d is an exact copy of a's live content -> still detected vs store
    hits = {(r["url"], r["dup_of"], r["kind"])
            for r in spark.read.parquet(str(tmp_path / "hits")).collect()}
    assert ("https://d.example/d", url("a"), "exact") in hits
