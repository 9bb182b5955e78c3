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


def test_simhash_confirmed_pairs_share_the_minhash_contract(planted):
    """simhash_confirmed_pairs (Hamming prefilter + exact-Jaccard confirm) has
    the SAME output contract as minhash_lsh_pairs — that is what makes it the
    SimHash family's oracle-checkable face."""
    sim = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in dedup_ops.simhash_confirmed_pairs(
            planted, DedupConfig()
        ).collect()
    }
    mh = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in dedup_ops.minhash_lsh_pairs(planted, DedupConfig()).collect()
    }
    assert sim == mh and sim  # non-empty: the planted near pair is present


def test_ngram_df_cap_drops_hot_shingles_metered(spark):
    """A shingle present in >df_cap docs is dropped from the inverted index
    BEFORE the self-join (the pair count is quadratic in shingle df), the
    drop is surfaced via return_dropped, and the default cap leaves small
    corpora untouched. Dropped shingles still count toward the union, never
    the intersection — Jaccard can only be underestimated."""
    common = "c1 c2 c3 c4 c5"
    docs = _docs(
        spark,
        {i: f"{common} u{i}a u{i}b u{i}c u{i}d" for i in range(10)},
    )
    # each doc: 9 tokens -> 5 shingles, exactly one shared by all 10 docs;
    # pairwise jaccard = 1/9 ~ 0.111
    base = dedup_ops.ngram_jaccard_pairs(docs, k=5, threshold=0.1)
    assert base.count() == 45  # default df_cap far above df=10
    pairs, dropped = dedup_ops.ngram_jaccard_pairs(
        docs, k=5, threshold=0.1, df_cap=5, return_dropped=True
    )
    assert pairs.count() == 0  # the only intersection came from the hot key
    d = dropped.collect()
    assert len(d) == 1 and d[0]["df"] == 10  # metered, never silent
    # cap off entirely
    assert dedup_ops.ngram_jaccard_pairs(
        docs, k=5, threshold=0.1, df_cap=None
    ).count() == 45


def test_closure_faces_lsh_edges_equal_exact_path(spark):
    """cluster_labels / near_dedup_survivors / source_dup_summary with
    method='lsh' (the 100x path: LSH near edges + exact star edges) produce
    EXACTLY the labels of the driver-checked exact-join default on a corpus
    with an exact-dup clique, a near-dup attached to it, a pure exact pair
    with no near edge, and singletons (band miss ~5e-8 at jaccard 0.8)."""
    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99)) + " CHANGED"
    pure = " ".join(f"yyy{i}" for i in range(100))
    other = " ".join(f"zzz{i}" for i in range(100))
    rows = [
        (1, base, "en", "srcA", len(base)),
        (2, base, "en", "srcB", len(base)),
        (3, near, "en", "srcA", len(near)),
        (4, other, "en", "srcC", len(other)),
        (5, pure, "en", "srcA", len(pure)),   # exact pair, no near edge:
        (6, pure, "en", "srcB", len(pure)),   # invisible without star edges
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    for face in (
        dedup_ops.cluster_labels,
        dedup_ops.near_dedup_survivors,
        dedup_ops.source_dup_summary,
    ):
        exact = sorted(map(tuple, face(docs).collect()))
        lsh = sorted(map(tuple, face(docs, method="lsh").collect()))
        assert lsh == exact, face.__name__
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_ops.cluster_labels(docs, method="lsh").collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_decontaminate_sub_n_docs_have_zero_grams(spark):
    """GPT-3 semantics: a doc with fewer than n tokens yields NO n-grams —
    a short train doc byte-equal to a short bench doc is NOT flagged via a
    truncated whole-text pseudo-gram (ADVICE r5 #2)."""
    long_a = " ".join(f"w{i}" for i in range(20))
    train = _docs(spark, {1: "a b c", 2: long_a})
    bench = _docs(spark, {100: "a b c", 101: " ".join(f"w{i}" for i in range(8))})
    out = {
        r["doc_id"]: r
        for r in dedup_ops.decontaminate(train, bench, n=8).collect()
    }
    assert out[1]["n_grams"] == 0
    assert out[1]["n_contaminated"] == 0 and not out[1]["contaminated"]
    # the normal-length hit path still works: bench doc 101 == train grams
    assert out[2]["n_grams"] == 13  # 20 - 8 + 1
    assert out[2]["n_contaminated"] == 1 and out[2]["contaminated"]


def test_decontaminate_shuffle_branch_parity(spark):
    """The bench-gram broadcast hint is size-gated (VERDICT r6 #1: a hard
    hint on the data-dependent distinct-gram frame is a driver OOM on a
    realistic eval-suite union — 10^8-10^9 gram hashes).
    broadcast_bytes_limit=0 forces the shuffle-join branch; its output must
    be row-identical to the broadcast branch."""
    long_a = " ".join(f"w{i}" for i in range(20))
    clean = " ".join(f"z{i}" for i in range(20))
    train = _docs(spark, {1: long_a, 2: clean, 3: "a b c"})
    bench = _docs(spark, {100: " ".join(f"w{i}" for i in range(8))})
    bc = sorted(
        map(tuple, dedup_ops.decontaminate(train, bench, n=8).collect())
    )
    sh = sorted(
        map(
            tuple,
            dedup_ops.decontaminate(
                train, bench, n=8, broadcast_bytes_limit=0
            ).collect(),
        )
    )
    assert sh == bc
    by_id = {t[0]: t for t in bc}
    assert by_id[1][2] == 1 and by_id[1][3]  # contaminated via bench 100
    assert by_id[2][2] == 0 and not by_id[2][3]
    assert by_id[3][1] == 0  # sub-n doc: zero grams either branch


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


def test_cross_corpus_pairs_exact_and_near_with_member_expansion(spark):
    """Batch delta-vs-base dedup: identical texts across corpora list at
    jaccard 1.0 (every holder x every holder), near texts at their exact
    jaccard; within-side duplicates expand through the per-side rep
    suppression; orientation is (new_id, base_id), never reordered."""
    base_text = " ".join(f"tok{i}" for i in range(100))
    near_text = " ".join(f"tok{i}" for i in range(99)) + " CHANGED"
    other = " ".join(f"zzz{i}" for i in range(100))
    base = _docs(spark, {2: base_text, 4: base_text, 6: other})
    new = _docs(spark, {1: base_text, 3: near_text, 5: " ".join(f"qqq{i}" for i in range(100))})
    got = {
        (r["new_id"], r["base_id"]): round(r["jaccard"], 6)
        for r in dedup_ops.cross_corpus_pairs(new, base, DedupConfig()).collect()
    }
    # new 1 is byte-identical to base 2 AND 4 (jaccard 1.0); new 3 is near
    # both; new 5 and base 6 match nothing
    assert set(got) == {(1, 2), (1, 4), (3, 2), (3, 4)}
    assert got[(1, 2)] == got[(1, 4)] == 1.0
    assert got[(3, 2)] == got[(3, 4)] >= 0.8 and got[(3, 2)] < 1.0


def test_minhash_scope_col_restricts_pairs_to_same_scope(spark):
    """scope_col partitions pairing: a near pair split across languages is
    NOT emitted; the same pair within one language is. Identical texts in
    different scopes must neither pair nor leak through rep suppression
    (scope is folded into both the sha key and the band hashes)."""
    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99)) + " CHANGED"
    rows = [
        (1, base, "en"), (2, near, "en"),   # same-lang near pair -> emitted
        (3, base, "de"),                    # near 1/2 but cross-lang -> not
        (4, base, "fr"),                    # identical to 1/3, cross-lang
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["a"], r["b"])
        for r in dedup_ops.minhash_lsh_pairs(
            docs, DedupConfig(), scope_col="lang"
        ).collect()
    }
    assert got == {(1, 2)}
    # unscoped, the same corpus yields every cross-lang near pair too
    unscoped = {
        (r["a"], r["b"])
        for r in dedup_ops.minhash_lsh_pairs(docs, DedupConfig()).collect()
    }
    assert unscoped == {(1, 2), (2, 3), (2, 4)}


def test_new_pair_operators_evaluate_signature_udf_once(planted, spark):
    """Same single-evaluation discipline as minhash_lsh_pairs: the lazily
    checkpointed signature frame means the executed plan contains ZERO
    ArrowEvalPython nodes for every new pair operator (the UDF runs inside
    the checkpoint materialization, once)."""
    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "ArrowEvalPython" not in plan_of(
        dedup_ops.simhash_confirmed_pairs(planted, DedupConfig())
    )
    assert "ArrowEvalPython" not in plan_of(
        dedup_ops.minhash_lsh_pairs(planted, DedupConfig())
    )
    base = " ".join(f"tok{i}" for i in range(100))
    other = _docs(spark, {10: base})
    assert "ArrowEvalPython" not in plan_of(
        dedup_ops.cross_corpus_pairs(planted, other, DedupConfig())
    )
    langd = spark.createDataFrame(
        [(1, base, "en"), (2, base, "de")], "doc_id long, text string, lang string"
    )
    assert "ArrowEvalPython" not in plan_of(
        dedup_ops.minhash_lsh_pairs(langd, DedupConfig(), scope_col="lang")
    )


def test_cross_corpus_matches_rollup_equals_grouped_pairs(spark):
    """The linear rollup == the pair listing grouped by new_id, on a corpus
    with an exact group spanning sides (counted via group size, not pair
    materialization), a near match, and within-new duplicates."""
    base_text = " ".join(f"tok{i}" for i in range(100))
    near_text = " ".join(f"tok{i}" for i in range(99)) + " CHANGED"
    base = _docs(spark, {2: base_text, 4: base_text, 6: near_text})
    new = _docs(spark, {1: base_text, 3: base_text, 5: near_text})
    cfg = DedupConfig()
    pairs = dedup_ops.cross_corpus_pairs(new, base, cfg).toPandas()
    grouped = {
        nid: (len(g), round(g["jaccard"].max(), 9))
        for nid, g in pairs.groupby("new_id")
    }
    rolled = {
        r["new_id"]: (r["n_base_matches"], round(r["max_jaccard"], 9))
        for r in dedup_ops.cross_corpus_matches(new, base, cfg).collect()
    }
    assert rolled == grouped
    # every new doc matches all 3 base docs (2 exact-or-near + 1 near/exact)
    assert {nid: c for nid, (c, _) in rolled.items()} == {1: 3, 3: 3, 5: 3}
    assert all(mj == 1.0 for _, (c, mj) in rolled.items())


def test_cross_corpus_pairs_with_overlapping_doc_ids(spark):
    """doc_id = xxhash64(url), so a re-crawled url carries the SAME id in
    both corpora — the confirm must resolve each candidate side against its
    OWN signature table (review r6: a unioned lookup emitted duplicate and
    crossed edges for overlapping ids)."""
    t = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99)) + " CHANGED"
    new = _docs(spark, {7: t})
    base = _docs(spark, {7: t, 8: near})
    got = sorted(
        (r["new_id"], r["base_id"], round(r["jaccard"], 6))
        for r in dedup_ops.cross_corpus_pairs(new, base, DedupConfig()).collect()
    )
    assert got == [(7, 7, 1.0), (7, 8, got[1][2])] and got[1][2] >= 0.8
    rolled = dedup_ops.cross_corpus_matches(new, base, DedupConfig()).collect()
    assert len(rolled) == 1
    assert rolled[0]["n_base_matches"] == 2  # two DISTINCT base docs
    assert rolled[0]["max_jaccard"] == 1.0


def test_minhash_scope_col_null_scope_pairs_with_nothing(spark):
    """SQL equality semantics (the oracle's x.lang = y.lang): NULL-scope
    docs never pair — they must not silently merge into one shared scope
    through concat_ws/xxhash64 NULL handling (review r6)."""
    t = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99)) + " CHANGED"
    docs = spark.createDataFrame(
        [(1, t, None), (2, near, None), (3, t, "en"), (4, near, "en")],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["a"], r["b"])
        for r in dedup_ops.minhash_lsh_pairs(
            docs, DedupConfig(), scope_col="lang"
        ).collect()
    }
    assert got == {(3, 4)}  # the NULL-lang near pair (1, 2) is NOT emitted


def test_cross_corpus_empty_and_no_match_edges(spark):
    """Degenerate inputs: an empty base produces empty outputs with the
    right schemas; disjoint corpora produce no rows."""
    t = " ".join(f"tok{i}" for i in range(100))
    new = _docs(spark, {1: t})
    empty = spark.createDataFrame([], "doc_id long, text string")
    cfg = DedupConfig()
    assert dedup_ops.cross_corpus_pairs(new, empty, cfg).count() == 0
    assert dedup_ops.cross_corpus_matches(new, empty, cfg).count() == 0
    other = _docs(spark, {9: " ".join(f"zzz{i}" for i in range(100))})
    assert dedup_ops.cross_corpus_pairs(new, other, cfg).count() == 0
    assert dedup_ops.cross_corpus_matches(new, other, cfg).columns == [
        "new_id", "n_base_matches", "max_jaccard"
    ]
