"""Batched MinHash-128 / SimHash-64 / LSH band hashes — numpy over flat batches.

MinHash uses the affine family h_i(x) = (a_i * x + b_i) mod 2^64 with a_i odd:
with an odd multiplier this is an exact BIJECTION of the 64-bit space (a true
permutation, the property MinHash needs), and on numpy it costs one wraparound
multiply + add per element — no modular division, which on uint64 is a scalar
CPU loop ~50x slower (measured: 98s -> ~1s for a 600k-shingle batch).
Coefficients come from a seed-derived RandomState so every executor builds the
identical matrix with no runtime RNG (SURVEY.md §4.2). SimHash is Charikar
'02: per-bit +/-1 vote over member hashes. Band hashes fold ``rows``
consecutive MinHash values per band through the same polynomial+splitmix
combine used for shingles, salted by band index so identical value-tuples in
different bands never collide.
"""

from __future__ import annotations

import numpy as np

from replicheck_spark.functions.hashing import MASK64, U64, splitmix64

_POLY = U64(0x100000001B3)


def make_coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b): a odd uint64 (bijection multiplier), b uint64."""
    rs = np.random.RandomState(seed)

    def draw64(n: int) -> np.ndarray:
        hi = rs.randint(0, 1 << 32, size=n, dtype=np.uint64)
        lo = rs.randint(0, 1 << 32, size=n, dtype=np.uint64)
        return (hi << U64(32)) | lo

    a = draw64(num_perm) | U64(1)  # force odd
    b = draw64(num_perm)
    return a, b


_EMPTY_SENTINEL = (1 << 64) - 1  # minhash value for empty shingle sets


def minhash_flat(
    flat_sh: np.ndarray,
    offsets: np.ndarray,
    coeffs: tuple[np.ndarray, np.ndarray],
    perm_chunk: int = 32,
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash matrix for a flattened shingle batch.

    Vectorized across the whole batch: per permutation one wraparound
    multiply-add over the flat array, then ``np.minimum.reduceat`` on the doc
    offsets. Memory is bounded by O(total_shingles) temporaries.
    """
    a, b = coeffs
    num_perm = len(a)
    n_docs = len(offsets) - 1
    out = np.full((n_docs, num_perm), _EMPTY_SENTINEL, dtype=np.uint64)
    total = int(offsets[-1])
    if total == 0 or n_docs == 0:
        return out

    # reduceat only over nonempty docs: their starts are strictly increasing
    # and consecutive nonempty starts bound each segment exactly (empty docs
    # in between contribute zero-width and would otherwise corrupt bounds).
    ne_idx = np.flatnonzero(np.diff(offsets) > 0)
    red_idx = offsets[ne_idx].astype(np.int64)

    # one reused buffer: fresh multi-MB allocations per permutation measured
    # several times slower under 32 concurrent worker processes
    y = np.empty(total, dtype=np.uint64)
    for i in range(num_perm):
        np.multiply(a[i], flat_sh, out=y)  # affine bijection mod 2^64
        np.add(y, b[i], out=y)
        out[ne_idx, i] = np.minimum.reduceat(y, red_idx)
    return out


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
    # Per-doc unpackbits+sum: each doc's bit matrix (~n_shingles x 64 uint8)
    # stays cache-resident. The "fully batched" alternatives — a giant int64
    # bit matrix, or add.reduceat over a uint8 matrix — were measured 20-600x
    # slower once 32 worker processes ran concurrently (memory-bandwidth and
    # reduceat casting pathologies); small per-doc numpy ops win decisively.
    weights = U64(1) << np.arange(64, dtype=np.uint64)
    for d in range(n_docs):
        s0, e0 = int(offsets[d]), int(offsets[d + 1])
        if e0 == s0:
            continue
        seg = flat_sh[s0:e0]
        bits = np.unpackbits(
            seg.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        ones = bits.sum(axis=0, dtype=np.int32)
        votes = (2 * ones) > (e0 - s0)  # strict majority
        out[d] = (votes.astype(np.uint64) * weights).sum(dtype=np.uint64)
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
