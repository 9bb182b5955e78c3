"""Deterministic synthetic Common-Crawl-style `pages` corpus with planted truth.

Implements the FIXTURES.md planted-cluster plan exactly (the input_hint schema
``url, warc_ts, html, text, lang``): uniq / exact / near / substr / boiler /
tiny / nasty groups, all randomness from one seeded ``random.Random``. The
oracle (``replicheck_spark.oracle``) computes truth pairs/clusters FROM the
generated text, so targeting of near-dup Jaccard only needs to straddle the
threshold, not hit it exactly.

The reference's analogous fixtures are tmp_path mini-corpora with planted
duplicate files (/root/reference/tests/test_runner.py:13-70,
tests/test_detector.py:8-33); this is the web-text version at parameterizable
scale. No external data; everything synthesized.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

# Fixed vocabulary: large enough that random docs don't collide on shingles.
_VOCAB = [f"w{i:03d}" for i in range(600)] + [
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with",
    "data", "page", "web", "crawl", "dedup", "spark", "cluster", "shingle",
]

_HOSTS = (
    ["hub.example"] * 6  # zipf head: most docs on one host
    + [f"host{i}.example" for i in range(1, 20)]
)

_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


@dataclass
class PlantedTruth:
    """What the generator planted (group memberships, not measured Jaccard)."""

    pairs: list[tuple[str, str, str]] = field(default_factory=list)  # a_url,b_url,kind
    groups: dict[str, list[str]] = field(default_factory=dict)       # gid -> urls


def _words(rng: random.Random, n: int) -> list[str]:
    return [rng.choice(_VOCAB) for _ in range(n)]


def _edit(rng: random.Random, tokens: list[str], n_edits: int) -> list[str]:
    """Substitute n_edits tokens at random positions (near-dup construction)."""
    out = list(tokens)
    for _ in range(n_edits):
        pos = rng.randrange(len(out))
        out[pos] = rng.choice(_VOCAB)
    return out


def generate_pages(
    n_docs: int = 2000, seed: int = 42, min_size: int = 50
) -> tuple[list[dict], PlantedTruth]:
    """Return (rows, truth). Row keys: url, warc_ts, html, text, lang."""
    rng = random.Random(seed)
    rows: list[dict] = []
    truth = PlantedTruth()
    doc_no = 0

    def add(text: str, lang: str = "en", host: str | None = None) -> str:
        nonlocal doc_no
        h = host or rng.choice(_HOSTS)
        url = f"https://{h}/p/{doc_no:07d}"
        ts = _BASE_TS + timedelta(seconds=doc_no * 17 + rng.randrange(11))
        html = f"<html><body>{text}</body></html>".encode("utf-8")
        rows.append(
            {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}
        )
        doc_no += 1
        return url

    n_uniq = int(n_docs * 0.50)
    n_exact = int(n_docs * 0.15)
    n_near = int(n_docs * 0.20)
    n_substr = int(n_docs * 0.05)
    n_boiler = int(n_docs * 0.05)
    n_tiny = max(n_docs - (n_uniq + n_exact + n_near + n_substr + n_boiler) - 7, 4)

    # uniq: independent random docs, 60-600 tokens
    for _ in range(n_uniq):
        add(" ".join(_words(rng, rng.randint(60, 600))))

    # exact: clusters of 2-5 byte-identical copies on different hosts
    gid = 0
    made = 0
    while made < n_exact:
        size = min(rng.randint(2, 5), n_exact - made)
        if size < 2:
            break
        text = " ".join(_words(rng, rng.randint(60, 400)))
        urls = [add(text, host=rng.choice(_HOSTS)) for _ in range(size)]
        truth.groups[f"exact{gid}"] = urls
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                truth.pairs.append((urls[i], urls[j], "exact"))
        gid += 1
        made += size

    # near: clusters of 2-4 with token substitutions targeting Jaccard around
    # {0.95, 0.85, 0.82} (straddling 0.8). With k=5 shingles, e substitutions
    # in an n-token doc kill ~e*k shingles per side: j ~ (n-ek)/(n+ek).
    made = 0
    targets = [0.95, 0.85, 0.82]
    while made < n_near:
        size = min(rng.randint(2, 4), n_near - made)
        if size < 2:
            break
        n = rng.randint(120, 500)
        base = _words(rng, n)
        tgt = targets[gid % len(targets)]
        # solve (n-ek)/(n+ek) = tgt  ->  e = n(1-tgt)/(k(1+tgt))
        e = max(1, round(n * (1 - tgt) / (5 * (1 + tgt))))
        urls = [add(" ".join(base))]
        for _ in range(size - 1):
            urls.append(add(" ".join(_edit(rng, base, e))))
        truth.groups[f"near{gid}"] = urls
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                truth.pairs.append((urls[i], urls[j], "near"))
        gid += 1
        made += size

    # substr: pairs sharing one verbatim run of >= 60 tokens in different
    # surroundings (suffix-array stage target; overall Jaccard is LOW).
    made = 0
    while made < n_substr:
        shared = _words(rng, rng.randint(60, 120))
        a_toks = _words(rng, rng.randint(150, 300)) + shared + _words(rng, rng.randint(150, 300))
        b_toks = _words(rng, rng.randint(150, 300)) + shared + _words(rng, rng.randint(150, 300))
        ua = add(" ".join(a_toks))
        ub = add(" ".join(b_toks))
        truth.pairs.append((ua, ub, "substr"))
        truth.groups[f"substr{gid}"] = [ua, ub]
        gid += 1
        made += 2

    # boiler: one boilerplate block prepended to many otherwise-unique docs
    # (LSH bucket skew; pairwise Jaccard stays below threshold)
    boiler = _words(rng, 40)
    for _ in range(n_boiler):
        add(" ".join(boiler + _words(rng, rng.randint(200, 400))))

    # tiny: below min_size, including duplicated tiny docs (must NOT cluster)
    tiny_text = " ".join(_words(rng, max(min_size - 10, 5)))
    for i in range(n_tiny):
        if i % 2 == 0:
            add(tiny_text)
        else:
            add(" ".join(_words(rng, rng.randint(3, max(min_size - 5, 4)))))

    # nasty: adversarial rows (extraction invariant + error lineage)
    add("")  # empty text
    add("   \t\n  ")  # whitespace-only
    add("café résumé " + " ".join(_words(rng, 80)))  # combining chars
    add("日本語 中文 한국어 " + " ".join(_words(rng, 80)))  # CJK
    add("emoji 🎉🎊 test nbsp " + " ".join(_words(rng, 80)))  # emoji + NBSP
    add(" ".join(_words(rng, 3000)))  # very long doc
    add("null\x01adjacent " + " ".join(_words(rng, 80)))  # control chars

    return rows, truth


def pages_to_pandas(rows: list[dict]):
    """Rows -> pandas DataFrame with the exact input_hint dtypes."""
    import pandas as pd

    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    return df


def write_pages_parquet(path: str, n_docs: int = 2000, seed: int = 42) -> PlantedTruth:
    """Generate and write the pages table as one parquet file; return truth."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows, truth = generate_pages(n_docs=n_docs, seed=seed)
    pdf = pages_to_pandas(rows)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    # bounded row groups: a single-row-group file is ONE unsplittable scan
    # task no matter what maxPartitionBytes says — the read serializes and
    # the extract stage stops scaling with cores (measured: flat 37s at both
    # local[8] and local[32] on a 400k-doc single-group file)
    pq.write_table(table, path, row_group_size=10_000)
    return truth


def synth_pages_tempdir(n_docs: int, seed: int = 42) -> str:
    """Synthesize a planted pages corpus into a fresh temp dir and return
    the parquet path — the shared ``--synth`` implementation of the job
    CLIs (jobs/dedup.py, jobs/curate.py)."""
    import tempfile

    path = tempfile.mkdtemp(prefix="pages_") + "/pages.parquet"
    write_pages_parquet(path, n_docs=n_docs, seed=seed)
    print(f"[synth] wrote {n_docs}-doc planted corpus to {path}")
    return path
