"""Batched MinHash-128 / SimHash-64 / LSH band hashes — numpy over flat batches.

MinHash uses the classic universal hash family h_i(x) = (a_i*x + b_i) mod p
with p = 2^61 - 1 (Broder '97 resemblance sketches); coefficients come from a
seed-derived RandomState so every executor builds the identical matrix with no
runtime RNG (SURVEY.md §4.2). SimHash is Charikar '02: per-bit +/-1 vote over
member hashes. Band hashes fold ``rows`` consecutive MinHash values per band
through the same polynomial+splitmix combine used for shingles, salted by band
index so identical value-tuples in different bands never collide.
"""

from __future__ import annotations

import numpy as np

from replicheck_spark.functions.hashing import (
    MASK64,
    MERSENNE61,
    U64,
    splitmix64,
)

_POLY = U64(0x100000001B3)


def make_coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) permutation coefficients; a in [1, p), b in [0, p)."""
    rs = np.random.RandomState(seed)
    p = int(MERSENNE61)
    a = rs.randint(1, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_EMPTY_SENTINEL = int(MERSENNE61) - 1  # minhash value for empty shingle sets


def minhash_flat(
    flat_sh: np.ndarray,
    offsets: np.ndarray,
    coeffs: tuple[np.ndarray, np.ndarray],
    perm_chunk: int = 32,
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash matrix for a flattened shingle batch.

    Vectorized across the whole batch: for each chunk of permutations, one
    (chunk, total_shingles) multiply-add-mod, then ``np.minimum.reduceat`` on
    the doc offsets. Memory is bounded by perm_chunk * total_shingles * 8B.
    """
    a, b = coeffs
    num_perm = len(a)
    n_docs = len(offsets) - 1
    out = np.full((n_docs, num_perm), _EMPTY_SENTINEL, dtype=np.uint64)
    total = int(offsets[-1])
    if total == 0 or n_docs == 0:
        return out

    x = flat_sh % MERSENNE61  # into the field once
    # reduceat only over nonempty docs: their starts are strictly increasing
    # and consecutive nonempty starts bound each segment exactly (empty docs
    # in between contribute zero-width and would otherwise corrupt bounds).
    ne_idx = np.flatnonzero(np.diff(offsets) > 0)
    red_idx = offsets[ne_idx].astype(np.int64)

    # Python 64x64->128 bit multiply would overflow uint64; split x into
    # hi/lo 31/30-bit halves so every product fits in 64 bits mod p.
    x_hi = x >> U64(31)
    x_lo = x & U64(0x7FFFFFFF)
    for c0 in range(0, num_perm, perm_chunk):
        ac = a[c0 : c0 + perm_chunk, None]
        bc = b[c0 : c0 + perm_chunk, None]
        # (a*x) mod p with p=2^61-1: a*x = a*(x_hi<<31) + a*x_lo
        # a < 2^61, x_hi < 2^30 -> a*x_hi < 2^91: still overflows. Reduce a too.
        a_hi = ac >> U64(31)
        a_lo = ac & U64(0x7FFFFFFF)
        # x = x_hi*2^31 + x_lo ; a = a_hi*2^31 + a_lo
        # a*x mod p = (a_hi*x_hi*2^62 + (a_hi*x_lo + a_lo*x_hi)*2^31 + a_lo*x_lo) mod p
        # 2^61 ≡ 1 (mod p)  =>  2^62 ≡ 2, and t*2^31 mod p computed via shift-fold.
        hh = (a_hi * x_hi) % MERSENNE61          # < p
        mid = (a_hi * x_lo + a_lo * x_hi) % MERSENNE61
        ll = (a_lo * x_lo) % MERSENNE61
        y = (hh * U64(2)) % MERSENNE61
        # mid * 2^31 mod p: mid < 2^61; split again
        y = (y + _mul_pow2_mod(mid, 31)) % MERSENNE61
        y = (y + ll) % MERSENNE61
        y = (y + bc) % MERSENNE61
        mins = np.minimum.reduceat(y, red_idx, axis=1)  # (chunk, n_nonempty)
        out[ne_idx, c0 : c0 + perm_chunk] = mins.T
    return out


def _mul_pow2_mod(t: np.ndarray, s: int) -> np.ndarray:
    """(t * 2^s) mod (2^61 - 1) without 64-bit overflow, for s < 61.

    Split t = t_hi * 2^(61-s) + t_lo; then t*2^s ≡ t_lo*2^s + t_hi (mod p)
    because 2^61 ≡ 1, and t_lo << s stays below 2^61.
    """
    t = t % MERSENNE61
    lo_bits = U64(61 - s)
    t_hi = t >> lo_bits
    t_lo = t & ((U64(1) << lo_bits) - U64(1))
    return ((t_lo << U64(s)) + t_hi) % MERSENNE61


def simhash_flat(flat_sh: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc 64-bit SimHash (uint64 array of n_docs).

    bit_j(doc) = 1 iff more than half of the doc's shingle hashes have bit j
    set. Empty docs get simhash 0.
    """
    n_docs = len(offsets) - 1
    total = int(offsets[-1])
    out = np.zeros(n_docs, dtype=np.uint64)
    if total == 0 or n_docs == 0:
        return out
    bits = ((flat_sh[:, None] >> np.arange(64, dtype=np.uint64)) & U64(1)).astype(
        np.int64
    )  # (total, 64)
    ne_idx = np.flatnonzero(np.diff(offsets) > 0)
    red_idx = offsets[ne_idx].astype(np.int64)
    ones = np.add.reduceat(bits, red_idx, axis=0)  # (n_nonempty, 64)
    counts = np.diff(offsets)[ne_idx, None]
    votes = (2 * ones) > counts  # strict majority
    weights = (U64(1) << np.arange(64, dtype=np.uint64))[None, :]
    out[ne_idx] = (votes.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    return out


def band_hashes(mh: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n_docs, bands) uint64 LSH band keys from an (n_docs, num_perm) matrix."""
    n_docs = mh.shape[0]
    out = np.empty((n_docs, bands), dtype=np.uint64)
    for band in range(bands):
        seg = mh[:, band * rows : (band + 1) * rows]
        acc = np.full(n_docs, U64(band + 1), dtype=np.uint64)
        for j in range(rows):
            acc = (acc * _POLY + seg[:, j]) & MASK64
        out[:, band] = splitmix64(acc)
    return out


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two 64-bit SimHash values (scalar helper)."""
    return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")
