"""Value-level tests for the two corpus-curation operators added in round 5:

* ``decontaminate`` — GPT-3-style train/eval n-gram overlap flagging
  (dedup_ops.decontaminate)
* ``boilerplate_strip`` — CCNet-style corpus-frequency block removal
  (blocks.boilerplate_strip)

Each is checked two ways on a PLANTED corpus with known positives:
hand-computed expected rows, and the driver's own protocol (the
``__spark_entry__`` query callable vs its ``oracle_sql`` DuckDB string,
side-by-side on the same parquet) — the sf fixtures contain positives for
these ops too, but planting makes the expected values auditable by eye.
"""

import pytest

import __spark_entry__ as entry_mod

duckdb = pytest.importorskip("duckdb")


def _w(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


BENCH_TEXT = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
SHARED_BLOCK = _w("b", 50)


@pytest.fixture(scope="module")
def curation_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("curation_sf")
    rows = [
        # decontamination plant: doc 0 is the benchmark (doc_id % 20 == 0);
        # doc 1 embeds its full text -> shares all three of its 8-grams
        (0, BENCH_TEXT, "en", "s0", len(BENCH_TEXT)),
        (1, BENCH_TEXT + " extra trailing", "en", "s0", 0),
        (2, _w("z", 12), "en", "s1", 0),
        # boilerplate plant: docs 10/11 share an identical leading 50-token
        # block, then diverge; doc 12 is a unique 40-token doc (one
        # substantial block, no duplicates -> untouched)
        (10, SHARED_BLOCK + " " + _w("c", 30), "en", "s0", 0),
        (11, SHARED_BLOCK + " " + _w("d", 30), "en", "s1", 0),
        (12, _w("e", 40), "en", "s2", 0),
    ]
    rows = [(i, t, l, s, len(t)) for (i, t, l, s, _) in rows]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _run(spark, curation_dir, name):
    df = entry_mod.queries()[name](spark, curation_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def _oracle(curation_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{curation_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(sql)
    return [c[0] for c in cur.description], cur.fetchall()


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(tuple(r[i] for i in order) for r in rows)


def test_decontaminate_planted_values(spark, curation_dir):
    cols, rows = _run(spark, curation_dir, "decontaminate")
    assert cols == ["doc_id", "n_grams", "n_contaminated", "contaminated"]
    got = {r[0]: r[1:] for r in rows}
    assert got == {
        # 12 tokens -> 5 distinct 8-grams, 3 of them lifted from the bench doc
        1: (5, 3, True),
        2: (5, 0, False),
        10: (73, 0, False),
        11: (73, 0, False),
        12: (33, 0, False),
    }


def test_boilerplate_strip_planted_values(spark, curation_dir):
    cols, rows = _run(spark, curation_dir, "boilerplate_strip")
    assert cols == ["doc_id", "n_blocks", "n_boilerplate", "clean_text"]
    got = {r[0]: r[1:] for r in rows}
    # untouched docs round-trip their text exactly
    assert got[0] == (1, 0, BENCH_TEXT)
    assert got[1] == (1, 0, BENCH_TEXT + " extra trailing")
    assert got[2] == (1, 0, _w("z", 12))
    assert got[12] == (1, 0, _w("e", 40))
    # the shared 50-token block is stripped; the distinct tails survive
    assert got[10] == (2, 1, _w("c", 30))
    assert got[11] == (2, 1, _w("d", 30))


def test_unigram_freq_stats_planted_values(spark):
    from replicheck_spark.operators.textops import unigram_freq_stats

    d = spark.createDataFrame(
        [(0, "a a b"), (1, "a b c"), (2, "x y")], "doc_id long, text string"
    )
    # corpus counts: a=3 b=2 c=1 x=1 y=1 -> top-2 vocab {a:3, b:2}
    rows = {r[0]: r[1:] for r in unigram_freq_stats(d, vocab_k=2).collect()}
    assert rows == {
        0: (3, 8, 0),   # a+a+b = 3+3+2
        1: (3, 5, 1),   # a+b, c is OOV
        2: (2, 0, 2),   # all OOV
    }


def test_unigram_freq_stats_vocab_tiebreak(spark):
    from replicheck_spark.operators.textops import unigram_freq_stats

    # all tokens tie at freq=1 -> the (count desc, token asc) tie-break must
    # pick the lexicographically smallest two, deterministically
    d = spark.createDataFrame([(0, "d c"), (1, "b a")], "doc_id long, text string")
    rows = {r[0]: r[1:] for r in unigram_freq_stats(d, vocab_k=2).collect()}
    assert rows == {0: (2, 0, 2), 1: (2, 2, 0)}


def test_source_dup_summary_planted_values(spark):
    from replicheck_spark.operators.dedup_ops import source_dup_summary

    dup = "alpha beta gamma delta epsilon zeta " * 10  # J=1.0 clique
    d = spark.createDataFrame(
        [
            (1, dup, "s0"),
            (2, dup, "s0"),
            (3, dup, "s1"),
            (4, "totally unrelated words " * 15, "s1"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r[0]: r[1:] for r in source_dup_summary(d).collect()}
    # cluster {1,2,3} with canonical min id 1 -> docs 2 and 3 get dropped
    assert rows == {"s0": (2, 2, 1), "s1": (2, 1, 1)}


@pytest.mark.parametrize(
    "name",
    [
        "decontaminate",
        "boilerplate_strip",
        "unigram_freq_stats",
        "source_dup_summary",
    ],
)
def test_curation_duckdb_parity(spark, curation_dir, name):
    scols, srows = _run(spark, curation_dir, name)
    ocols, orows = _oracle(curation_dir, entry_mod.oracle_sql()[name])
    assert srows, f"{name} must be non-vacuous on the planted corpus"
    ns, no = _normalize(scols, srows), _normalize(ocols, orows)
    assert ns[0] == no[0], f"column mismatch: {ns[0]} vs {no[0]}"
    assert ns[1] == no[1]


@pytest.fixture(scope="module")
def newline_dir(spark, tmp_path_factory):
    """Adversarial newline shapes for line_corpus_dedup: the sf fixtures are
    single-line docs, so the driver's oracle row never exercises split/trim
    edge behavior — this planted corpus does, against the same DuckDB SQL."""
    d = tmp_path_factory.mktemp("newline_sf")
    rows = [
        (1, "HEADER\nunique one\nFOOTER"),
        (2, "  HEADER  \nunique two\nFOOTER\n"),      # pad + trailing \n
        (3, "\nHEADER"),                               # leading empty line
        (4, "a4\n\n\nb4"),                             # consecutive empties
        (5, "a5\n   \nb5"),                            # whitespace-only line
        (6, "HEADER\r\nunique six"),                   # \r survives trim (CR
        (7, ""),                                       #  is not a space)
        (8, "solo\nsolo\nsolo"),                       # within-doc repeat only
    ]
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for (i, t) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_line_corpus_dedup_duckdb_parity_on_newline_shapes(spark, newline_dir):
    scols, srows = _run(spark, newline_dir, "line_corpus_dedup")
    ocols, orows = _oracle(
        newline_dir, entry_mod.oracle_sql()["line_corpus_dedup"]
    )
    ns, no = _normalize(scols, srows), _normalize(ocols, orows)
    assert ns[0] == no[0], f"column mismatch: {ns[0]} vs {no[0]}"
    assert ns[1] == no[1]
    by_id = {r[0]: r for r in srows}
    cols = scols
    clean = {i: by_id[i][cols.index("clean_text")] for i in by_id}
    removed = {i: by_id[i][cols.index("n_removed")] for i in by_id}
    # HEADER occurs (trim-keyed) in docs 1, 2, 3 -> stripped everywhere;
    # "HEADER\r" (doc 6) does NOT trim-match: \r is not a space
    assert removed[1] == 2 and clean[1] == "unique one"   # FOOTER too (1, 2)
    assert removed[2] == 2 and clean[2] == "unique two\n" # trailing empty kept
    assert removed[3] == 1 and clean[3] == ""             # leading empty kept
    assert removed[6] == 0 and clean[6] == "HEADER\r\nunique six"
    # untouched docs round-trip byte-exactly, empties and repeats included
    for i in (4, 5, 7, 8):
        assert removed[i] == 0
        assert clean[i] == {4: "a4\n\n\nb4", 5: "a5\n   \nb5", 7: "",
                            8: "solo\nsolo\nsolo"}[i]


def test_line_corpus_dedup_keepfirst_parity_and_semantics(spark, newline_dir):
    scols, srows = _run(spark, newline_dir, "line_corpus_dedup_keepfirst")
    ocols, orows = _oracle(
        newline_dir, entry_mod.oracle_sql()["line_corpus_dedup_keepfirst"]
    )
    ns, no = _normalize(scols, srows), _normalize(ocols, orows)
    assert ns[0] == no[0] and ns[1] == no[1]
    by_id = {r[0]: r for r in srows}
    clean = {i: by_id[i][scols.index("clean_text")] for i in by_id}
    removed = {i: by_id[i][scols.index("n_removed")] for i in by_id}
    # C4 semantics: the globally FIRST occurrence survives. HEADER's keeper
    # is (doc 1, idx 0) -> doc 1 keeps HEADER, docs 2/3 lose it; FOOTER's
    # keeper is (doc 1, idx 2) -> doc 2 loses its copy.
    assert removed[1] == 0 and clean[1] == "HEADER\nunique one\nFOOTER"
    assert removed[2] == 2 and clean[2] == "unique two\n"
    assert removed[3] == 1 and clean[3] == ""
    # within-doc repeats of a non-corpus-repeated line are untouched either way
    assert removed[8] == 0 and clean[8] == "solo\nsolo\nsolo"


def test_line_corpus_dedup_keepfirst_within_doc_repeats(spark):
    """A line repeated in >=2 docs AND multiple times within the keeper doc:
    only the keeper's FIRST occurrence survives ('all but one' globally)."""
    from replicheck_spark.operators.blocks import line_corpus_dedup

    docs = spark.createDataFrame(
        [(1, "X\nmid\nX"), (2, "X\nother")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in line_corpus_dedup(docs, keep_first=True).collect()
    }
    assert out[1]["n_removed"] == 1 and out[1]["clean_text"] == "X\nmid"
    assert out[2]["n_removed"] == 1 and out[2]["clean_text"] == "other"


class TestMixtureSample:
    def test_exact_rates_and_determinism(self, spark):
        """rate 1.0 keeps every doc of a source, 0.0 drops all; membership
        is a pure function of (doc_id, salt): identical across repeated
        runs and across different partition layouts."""
        from replicheck_spark.operators.textops import mixture_sample

        rows = [
            (i, f"text {i}", "en", f"src{i % 4}", 10) for i in range(400)
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        rates = {"src0": 1.0, "src1": 0.0, "src2": 0.5}
        a = sorted(
            tuple(r)
            for r in mixture_sample(docs, rates, default_rate=0.5).collect()
        )
        b = sorted(
            tuple(r)
            for r in mixture_sample(
                docs.repartition(17), rates, default_rate=0.5
            ).collect()
        )
        assert a == b  # partition-layout independent
        by_src = {}
        for _, _, s in a:
            by_src[s] = by_src.get(s, 0) + 1
        assert by_src.get("src0") == 100       # rate 1.0: all kept
        assert "src1" not in by_src            # rate 0.0: none kept
        assert 25 <= by_src.get("src2", 0) <= 75   # ~0.5 of 100
        assert 30 <= by_src.get("src3", 0) <= 70   # default 0.5

    def test_lower_rate_sample_is_subset(self, spark):
        """Threshold comparison on one fixed hash => the 0.25 sample of a
        source is a strict subset of its 0.75 sample (nested samples, the
        property that makes mixture re-weighting reproducible without
        re-shuffling membership)."""
        from replicheck_spark.operators.textops import mixture_sample

        rows = [(i, "t", "en", "web", 1) for i in range(300)]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        lo = {r["doc_id"] for r in mixture_sample(docs, {"web": 0.25}).collect()}
        hi = {r["doc_id"] for r in mixture_sample(docs, {"web": 0.75}).collect()}
        assert lo < hi

    def test_rate_validation(self, spark):
        from replicheck_spark.operators.textops import mixture_sample

        docs = spark.createDataFrame(
            [(1, "t", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        with pytest.raises(ValueError):
            mixture_sample(docs, {"s": 1.5})
        with pytest.raises(ValueError):
            mixture_sample(docs, {}, default_rate=-0.1)

    def test_driver_oracle_parity_at_sf(self, spark):
        """The driver protocol itself (queries() vs oracle_sql() on the same
        parquet) at sf0.001 — the same comparison CORRECTNESS_r07 records."""
        sf = "/root/testdata/sf0.001"
        cols, rows = _run(spark, sf, "mixture_sample")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        cur = con.execute(entry_mod.oracle_sql()["mixture_sample"])
        ocols, orows = [c[0] for c in cur.description], cur.fetchall()
        assert rows, "must be non-vacuous at sf0.001"
        assert _normalize(cols, rows) == _normalize(ocols, orows)
