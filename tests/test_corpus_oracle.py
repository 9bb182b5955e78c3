"""Corpus generator determinism + oracle truth extraction (no Spark).

The oracle is the recall denominator for everything downstream, so these tests
pin its behavior on a small planted corpus: exact groups recovered, near pairs
straddle the threshold correctly, tiny docs never cluster, substring pairs
found (mirrors the reference's planted-fixture strategy,
/root/reference/tests/test_runner.py:13-70).
"""

from replicheck_spark.corpus import generate_pages
from replicheck_spark.oracle import jaccard, longest_common_run, run_oracle


def test_corpus_deterministic():
    rows1, t1 = generate_pages(n_docs=200, seed=42)
    rows2, t2 = generate_pages(n_docs=200, seed=42)
    assert [r["url"] for r in rows1] == [r["url"] for r in rows2]
    assert [r["text"] for r in rows1] == [r["text"] for r in rows2]
    assert t1.pairs == t2.pairs
    rows3, _ = generate_pages(n_docs=200, seed=7)
    assert [r["text"] for r in rows3] != [r["text"] for r in rows1]


def test_corpus_schema_and_groups():
    rows, truth = generate_pages(n_docs=300, seed=42)
    assert abs(len(rows) - 300) <= 15  # group-size rounding jitter
    for r in rows[:5]:
        assert set(r) == {"url", "warc_ts", "html", "text", "lang"}
        assert isinstance(r["html"], bytes)
    kinds = {k for _, _, k in truth.pairs}
    assert kinds == {"exact", "near", "substr"}


def test_longest_common_run():
    assert longest_common_run(list("abcxyz"), list("qqabcpp")) == 3
    assert longest_common_run([], ["a"]) == 0
    assert longest_common_run(["a", "b"], ["a", "b"]) == 2


def test_jaccard():
    assert jaccard({1, 2}, {1, 2}) == 1.0
    assert jaccard({1, 2}, {3, 4}) == 0.0
    assert jaccard(set(), set()) == 1.0
    assert jaccard({1, 2, 3, 4}, {3, 4, 5, 6}) == 2 / 6


class TestOracle:
    def setup_method(self):
        self.rows, self.truth = generate_pages(n_docs=300, seed=42)
        self.res = run_oracle(self.rows, min_similarity=0.8, min_size=50,
                              shingle_k=5, substr_min_tokens=50)

    def test_exact_groups_recovered(self):
        planted_exact = {
            tuple(sorted(urls))
            for gid, urls in self.truth.groups.items()
            if gid.startswith("exact")
        }
        found = {tuple(g["urls"]) for g in self.res.exact_groups}
        # every planted exact group is found (possibly merged if generator
        # coincidentally duplicated — with 600-word vocab it won't)
        assert planted_exact <= found
        for g in self.res.exact_groups:
            assert g["similarity"] == 1.0
            assert g["num_duplicates"] >= 2

    def test_near_pairs_match_measured_truth(self):
        from replicheck_spark.functions.textnorm import (
            normalize_text, shingle_strings, tokenize,
        )
        from replicheck_spark.oracle import jaccard as jac

        oracle_near = {(a, b) for a, b, k, _ in self.res.pairs if k == "near"}
        planted_near = {
            (min(a, b), max(a, b)) for a, b, k in self.truth.pairs if k == "near"
        }
        texts = {r["url"]: r["text"] for r in self.rows}
        # the planted set straddles the threshold by design; the subset whose
        # MEASURED jaccard >= 0.8 must be found exactly
        expected = set()
        for a, b in planted_near:
            sa = shingle_strings(tokenize(normalize_text(texts[a])), 5)
            sb = shingle_strings(tokenize(normalize_text(texts[b])), 5)
            if jac(sa, sb) >= 0.8:
                expected.add((a, b))
        assert expected, "generator should plant some pairs above threshold"
        assert expected <= oracle_near
        assert planted_near - expected <= planted_near - oracle_near  # below-threshold stay out
        for a, b, k, j in self.res.pairs:
            if k == "near":
                assert j >= 0.8

    def test_substr_pairs_found(self):
        oracle_sub = {(a, b) for a, b, k, _ in self.res.pairs if k == "substr"}
        planted_sub = {
            (min(a, b), max(a, b)) for a, b, k in self.truth.pairs if k == "substr"
        }
        assert len(oracle_sub & planted_sub) >= 0.9 * len(planted_sub)

    def test_tiny_docs_never_cluster(self):
        tiny_urls = {
            r["url"] for r in self.rows
            if len(self.res.docs[r["url"]]) < 50
        }
        clustered = set(self.res.clusters)
        assert not (tiny_urls & clustered)

    def test_clusters_are_transitive_closure(self):
        # every pair is in the same cluster
        for a, b, _, _ in self.res.pairs:
            assert self.res.clusters[a] == self.res.clusters[b]

    def test_extraction_byte_identical(self):
        # html wrapper extraction == text column, post-normalization
        from replicheck_spark.functions.textnorm import extract_text, normalize_text
        for r in self.rows:
            via_html = normalize_text(extract_text(r["html"], None))
            via_text = normalize_text(extract_text(None, r["text"]))
            assert via_html == via_text, r["url"]
