"""Unit tests for the pure/numpy core (no Spark).

Mirrors the reference's single-operator contract tests
(/root/reference/tests/test_detector.py:8-33 style): tiny inline inputs,
structural assertions, plus determinism and statistical sanity for MinHash.
"""

import numpy as np
import pytest

from replicheck_spark.config import DedupConfig
from replicheck_spark.functions import hashing, minhash
from replicheck_spark.functions.textnorm import (
    extract_text,
    host_of,
    normalize_text,
    shingle_strings,
    tokenize,
)


class TestTextNorm:
    def test_normalize_collapses_whitespace_and_case(self):
        assert normalize_text("  Hello\t\nWORLD  ") == "hello world"

    def test_normalize_empty_and_none(self):
        assert normalize_text("") == ""
        assert normalize_text(None) == ""
        assert normalize_text("   \t\n ") == ""

    def test_normalize_unicode_nfc(self):
        # e + combining acute == precomposed é after NFC
        assert normalize_text("café") == normalize_text("café")

    def test_tokenize(self):
        assert tokenize("a b c") == ["a", "b", "c"]
        assert tokenize("") == []

    def test_extract_text_prefers_text_column(self):
        assert extract_text(b"<html><body>X</body></html>", "the text") == "the text"

    def test_extract_text_from_html(self):
        html = "<html><head><script>var x=1;</script></head><body>Hello &amp; bye</body></html>"
        assert extract_text(html.encode(), None) == "Hello & bye"

    def test_extract_text_roundtrip_corpus_wrapper(self):
        # the corpus generator wraps text as <html><body>{text}</body></html>;
        # extraction must recover it byte-identically after normalization
        text = "café résumé w001 w002"
        html = f"<html><body>{text}</body></html>".encode()
        assert normalize_text(extract_text(html, None)) == normalize_text(text)

    def test_shingle_strings(self):
        toks = ["a", "b", "c", "d"]
        assert shingle_strings(toks, 3) == {"a b c", "b c d"}
        assert shingle_strings(["a", "b"], 5) == {"a b"}  # short doc: one shingle
        assert shingle_strings([], 5) == set()

    def test_host_of(self):
        assert host_of("https://Host1.Example/p/1") == "host1.example"
        assert host_of(None) == ""


class TestHashing:
    def test_token_hash_stable(self):
        assert hashing.token_hash64("hello") == hashing.token_hash64("hello")
        assert hashing.token_hash64("hello") != hashing.token_hash64("hellp")

    def test_hash_token_lists_flat_layout(self):
        flat, off = hashing.hash_token_lists([["a", "b"], [], ["c"]])
        assert list(off) == [0, 2, 2, 3]
        assert flat[0] == hashing.token_hash64("a")
        assert flat[2] == hashing.token_hash64("c")

    def test_shingle_hashes_match_single_doc(self):
        toks = [f"t{i}" for i in range(20)]
        batch_flat, batch_off = hashing.hash_token_lists([toks, toks[:3], []])
        sh, off = hashing.shingle_hashes_flat(batch_flat, batch_off, 5)
        # doc 0: 16 distinct shingles; doc 1 (3 < k): 1; doc 2: 0
        assert list(np.diff(off)) == [16, 1, 0]
        solo = hashing.shingle_hash_set(toks, 5)
        assert set(solo.tolist()) == set(sh[:16].tolist())

    def test_shingle_hashes_no_cross_doc_contamination(self):
        a = [f"a{i}" for i in range(10)]
        b = [f"b{i}" for i in range(10)]
        flat, off = hashing.hash_token_lists([a, b])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        sa = set(sh[shoff[0]:shoff[1]].tolist())
        sb = set(sh[shoff[1]:shoff[2]].tolist())
        assert sa == set(hashing.shingle_hash_set(a, 5).tolist())
        assert sb == set(hashing.shingle_hash_set(b, 5).tolist())
        assert not (sa & sb)

    def test_trailing_empty_doc_does_not_corrupt_previous(self):
        toks = [f"t{i}" for i in range(8)]
        flat, off = hashing.hash_token_lists([toks, []])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        assert list(np.diff(shoff)) == [4, 0]
        assert set(sh.tolist()) == set(hashing.shingle_hash_set(toks, 5).tolist())


class TestMinHash:
    def _sh(self, tokens):
        return hashing.shingle_hash_set(tokens, 5)

    def test_deterministic_across_calls(self):
        coeffs = minhash.make_coeffs(128, 42)
        coeffs2 = minhash.make_coeffs(128, 42)
        assert np.array_equal(coeffs[0], coeffs2[0])
        toks = [f"x{i}" for i in range(100)]
        flat, off = hashing.hash_token_lists([toks])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        m1 = minhash.minhash_flat(sh, shoff, coeffs)
        m2 = minhash.minhash_flat(sh, shoff, coeffs)
        assert np.array_equal(m1, m2)

    def test_identical_docs_identical_signatures(self):
        coeffs = minhash.make_coeffs(128, 42)
        toks = [f"x{i}" for i in range(100)]
        flat, off = hashing.hash_token_lists([toks, toks])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        m = minhash.minhash_flat(sh, shoff, coeffs)
        assert np.array_equal(m[0], m[1])

    def test_minhash_estimates_jaccard(self):
        # two sets with known Jaccard ~0.8: matching fraction of 128 minima
        # should land within ~3 sigma (sigma = sqrt(j(1-j)/128) ~ 0.035)
        rng = np.random.RandomState(7)
        base = [f"w{i}" for i in range(500)]
        a = base[:450]
        b = base[50:500]  # |A∩B|=400, |A∪B|=500 -> true token overlap
        coeffs = minhash.make_coeffs(128, 42)
        sa = np.unique(np.array([hashing.token_hash64(t) for t in a], dtype=np.uint64))
        sb = np.unique(np.array([hashing.token_hash64(t) for t in b], dtype=np.uint64))
        true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
        flat = np.concatenate([sa, sb])
        off = np.array([0, len(sa), len(sa) + len(sb)])
        m = minhash.minhash_flat(flat, off, coeffs)
        est = float(np.mean(m[0] == m[1]))
        assert abs(est - true_j) < 0.12

    def test_empty_and_mixed_batch(self):
        coeffs = minhash.make_coeffs(16, 42)
        toks = [f"x{i}" for i in range(30)]
        flat, off = hashing.hash_token_lists([[], toks, []])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        m = minhash.minhash_flat(sh, shoff, coeffs)
        assert m.shape == (3, 16)
        assert (m[0] == minhash._EMPTY_SENTINEL).all()
        assert (m[2] == minhash._EMPTY_SENTINEL).all()
        assert not (m[1] == minhash._EMPTY_SENTINEL).all()

    def test_minhash_matches_scalar_reference(self):
        """Vectorized batch result == naive per-doc scalar computation."""
        coeffs = minhash.make_coeffs(16, 1)
        a, b = coeffs
        toks = [f"y{i}" for i in range(64)]
        flat, off = hashing.hash_token_lists([toks])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        m = minhash.minhash_flat(sh, shoff, coeffs)
        mask = (1 << 64) - 1
        for i in range(16):
            want = min(((int(a[i]) * int(x) + int(b[i])) & mask) for x in sh.tolist())
            assert int(m[0, i]) == want

    def test_coeff_multipliers_odd(self):
        a, _ = minhash.make_coeffs(64, 42)
        assert (a % np.uint64(2) == 1).all()


class TestSimHash:
    def test_identical_docs_zero_hamming(self):
        toks = [f"x{i}" for i in range(100)]
        flat, off = hashing.hash_token_lists([toks, toks])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        s = minhash.simhash_flat(sh, shoff)
        assert minhash.hamming64(s[0], s[1]) == 0

    def test_similar_docs_small_hamming_dissimilar_large(self):
        base = [f"x{i}" for i in range(300)]
        near = base[:295] + [f"z{i}" for i in range(5)]
        far = [f"q{i}" for i in range(300)]
        flat, off = hashing.hash_token_lists([base, near, far])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        s = minhash.simhash_flat(sh, shoff)
        assert minhash.hamming64(s[0], s[1]) < minhash.hamming64(s[0], s[2])
        assert minhash.hamming64(s[0], s[1]) <= 10

    def test_empty_doc_simhash_zero(self):
        flat, off = hashing.hash_token_lists([[]])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        assert minhash.simhash_flat(sh, shoff)[0] == 0


class TestBandHashes:
    def test_shape_and_determinism(self):
        coeffs = minhash.make_coeffs(128, 42)
        toks = [f"x{i}" for i in range(100)]
        flat, off = hashing.hash_token_lists([toks, toks[:50]])
        sh, shoff = hashing.shingle_hashes_flat(flat, off, 5)
        m = minhash.minhash_flat(sh, shoff, coeffs)
        b1 = minhash.band_hashes(m, 32, 4)
        b2 = minhash.band_hashes(m, 32, 4)
        assert b1.shape == (2, 32)
        assert np.array_equal(b1, b2)

    def test_identical_band_values_differ_by_band_index(self):
        # same minhash values in every band -> band hashes must still differ
        m = np.full((1, 8), 7, dtype=np.uint64)
        b = minhash.band_hashes(m, 4, 2)
        assert len(set(b[0].tolist())) == 4


class TestConfig:
    def test_validation(self):
        with pytest.raises(ValueError):
            DedupConfig(min_similarity=1.5)
        with pytest.raises(ValueError):
            DedupConfig(lsh_bands=10, lsh_rows=10, num_perm=128)
        c = DedupConfig()
        assert c.lsh_bands * c.lsh_rows == c.num_perm
