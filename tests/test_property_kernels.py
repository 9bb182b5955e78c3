"""Hypothesis property tests for the pure-numpy kernels.

These are the functions where a vectorization bug would corrupt results
silently (wraparound arithmetic, off-by-one window math), so they are fuzzed
against independent pure-Python oracles:

* ``_prefix_hashes`` (closed-form vectorized, r5) vs the naive sequential
  recurrence it replaced;
* ``longest_common_run_hashed`` (rolling-hash + binary search) vs the O(n*m)
  DP ``oracle.longest_common_run``;
* minhash signatures: permutation/multiplicity invariance (depends only on
  the shingle SET) — the property LSH banding correctness rests on.

No Spark session needed; everything here is driver-side numpy.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from replicheck_spark.functions import minhash as mh
from replicheck_spark.functions.hashing import MASK64, U64, hash_token_lists
from replicheck_spark.operators.substr import (
    _B,
    _prefix_hashes,
    longest_common_run_hashed,
)
from replicheck_spark.oracle import longest_common_run

# small alphabet so random lists actually share runs
_tok = st.sampled_from([f"w{i}" for i in range(8)])
_toklist = st.lists(_tok, min_size=0, max_size=60)


def _loop_prefix_hashes(hs: np.ndarray) -> np.ndarray:
    pre = np.empty(len(hs) + 1, dtype=np.uint64)
    pre[0] = 0
    acc = U64(0)
    with np.errstate(over="ignore"):
        for i, h in enumerate(hs):
            acc = (acc * _B + U64(h)) & MASK64
            pre[i + 1] = acc
    return pre


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=0, max_size=300))
def test_prefix_hashes_match_sequential_recurrence(vals):
    hs = np.array(vals, dtype=np.uint64)
    assert np.array_equal(_prefix_hashes(hs), _loop_prefix_hashes(hs))


@settings(max_examples=60, deadline=None)
@given(_toklist, _toklist, st.integers(min_value=1, max_value=6))
def test_longest_common_run_matches_dp_oracle(a, b, min_run):
    flat, off = hash_token_lists([a, b])
    ha, hb = flat[off[0]:off[1]], flat[off[1]:off[2]]
    truth = longest_common_run(a, b)
    got = longest_common_run_hashed(ha, hb, min_run=min_run, exact=True)
    assert got == (truth if truth >= min_run else 0)


@settings(max_examples=40, deadline=None)
@given(_toklist, _toklist, st.integers(min_value=1, max_value=6))
def test_longest_common_run_lower_bound_mode(a, b, min_run):
    flat, off = hash_token_lists([a, b])
    ha, hb = flat[off[0]:off[1]], flat[off[1]:off[2]]
    truth = longest_common_run(a, b)
    got = longest_common_run_hashed(ha, hb, min_run=min_run, exact=False)
    # exact=False contract: min_run iff a qualifying run exists, else 0
    assert got == (min_run if truth >= min_run else 0)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=80, unique=True),
       st.randoms(use_true_random=False))
def test_minhash_is_set_invariant(shingles, rnd):
    """The signature must depend only on the shingle SET: shuffling the
    order and duplicating elements changes nothing."""
    coeffs = mh.make_coeffs(32, seed=7)
    base = np.array(shingles, dtype=np.uint64)
    shuffled = list(shingles)
    rnd.shuffle(shuffled)
    dup = np.array(shuffled + shuffled[: len(shuffled) // 2 + 1],
                   dtype=np.uint64)

    def sig(arr):
        off = np.array([0, len(arr)], dtype=np.int64)
        return mh.minhash_flat(arr, off, coeffs)

    assert np.array_equal(sig(base), sig(dup))
