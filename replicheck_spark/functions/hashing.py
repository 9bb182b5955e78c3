"""Deterministic 64-bit hashing, vectorized over flattened Arrow batches.

No RNG at runtime: all seeds flow from DedupConfig.seed through
``numpy.random.RandomState`` at coefficient-construction time (SURVEY.md §4.2
determinism rule). All arithmetic is uint64 with wraparound; constants are
explicit ``np.uint64`` so numpy never upcasts to float.

The flattened-batch layout: a batch of N docs with token/shingle counts
``c_0..c_{N-1}`` is one contiguous uint64 array plus an offsets array
``[0, c_0, c_0+c_1, ...]`` (len N+1). Everything downstream (shingling,
MinHash, SimHash) is a single numpy pass over the flat array + ``reduceat``
on the offsets — no per-row Python in the hot path (BASELINE.json north_rule).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
MASK64 = U64(0xFFFFFFFFFFFFFFFF)
# Mersenne prime 2^61 - 1: universal-hash modulus for MinHash permutations.
MERSENNE61 = U64((1 << 61) - 1)
_POLY_PRIME = U64(0x100000001B3)  # FNV-1a 64-bit prime, used as polynomial base

_SM_C1 = U64(0xBF58476D1CE4E5B9)
_SM_C2 = U64(0x94D049BB133111EB)
_SM_GAMMA = U64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public-domain constant set); array-in array-out."""
    x = (x + _SM_GAMMA) & MASK64
    x = ((x ^ (x >> U64(30))) * _SM_C1) & MASK64
    x = ((x ^ (x >> U64(27))) * _SM_C2) & MASK64
    return x ^ (x >> U64(31))


def token_hash64(token: str) -> int:
    """Stable 64-bit hash of one token (blake2b-8; process/run independent)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
    )


def hash_token_lists(token_lists: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
    """Batch of token lists -> (flat uint64 token hashes, offsets).

    blake2b runs once per DISTINCT token in the batch: ``pandas.factorize``
    (a C hash table) maps every token to a code, then a gather expands the
    per-unique hash array. This replaces a per-token Python dict loop that
    dominated the signature UDF (analogous in spirit to the reference's
    parser-instance cache, parser.py:19-23: amortize heavy init, vectorize
    the rest).
    """
    import itertools

    counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                         count=len(token_lists))
    offsets = np.zeros(len(token_lists) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), offsets
    try:
        import pandas as pd

        all_tokens = np.fromiter(
            itertools.chain.from_iterable(token_lists), dtype=object, count=total
        )
        codes, uniques = pd.factorize(all_tokens, sort=False)
        uh = np.fromiter(
            (token_hash64(t) for t in uniques), dtype=np.uint64, count=len(uniques)
        )
        return uh[codes], offsets
    except ImportError:  # pandas-free fallback (same result, slower)
        cache: dict[str, int] = {}
        flat = np.empty(total, dtype=np.uint64)
        pos = 0
        for toks in token_lists:
            for tok in toks:
                h = cache.get(tok)
                if h is None:
                    h = token_hash64(tok)
                    cache[tok] = h
                flat[pos] = h
                pos += 1
        return flat, offsets


def kgram_hashes_global(flat_tokens: np.ndarray, k: int) -> np.ndarray:
    """``out[i] = splitmix64(poly-combine(flat_tokens[i : i+k]))`` for every
    global position ``i`` of a flattened batch — THE k-gram hash definition,
    shared by the shingle path (below) and the winnowing fingerprint
    (operators/textops.py). Positions whose window crosses a doc boundary
    are still computed; callers slice ``out[s : e-k+1]`` per doc to exclude
    them. One vectorized pass, O(total) temporaries."""
    total = len(flat_tokens)
    if total < k:
        return np.empty(0, dtype=np.uint64)
    acc = flat_tokens[: total - k + 1].copy()
    for j in range(1, k):
        np.multiply(acc, _POLY_PRIME, out=acc)
        np.add(acc, flat_tokens[j : total - k + 1 + j], out=acc)
    return splitmix64(acc)


def shingle_hashes_flat(
    flat_tokens: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-shingle hashes for a flattened batch, one vectorized pass.

    A shingle hash is the splitmix64 finalization of the degree-(k-1)
    polynomial combine of its k token hashes. Docs with 0 < n < k tokens get
    one shingle over all n tokens (matches textnorm.shingle_strings).
    Returns (flat distinct-per-doc shingle hashes, offsets).
    """
    n_docs = len(offsets) - 1
    acc = kgram_hashes_global(flat_tokens, k)

    out_chunks: list[np.ndarray] = []
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    for d in range(n_docs):
        s, e = int(offsets[d]), int(offsets[d + 1])
        n = e - s
        if n == 0:
            sh = np.empty(0, dtype=np.uint64)
        elif n < k:
            # one shingle over the whole short doc
            short = flat_tokens[s:e]
            h = short[0:1].copy()
            for j in range(1, n):
                h = (h * _POLY_PRIME + short[j : j + 1]) & MASK64
            sh = splitmix64(h)
        else:
            sh = np.unique(acc[s : e - k + 1])
        out_chunks.append(sh)
        out_offsets[d + 1] = out_offsets[d] + len(sh)
    flat_sh = (
        np.concatenate(out_chunks) if out_chunks else np.empty(0, dtype=np.uint64)
    )
    return flat_sh, out_offsets


def shingle_hash_set(tokens: list[str], k: int) -> np.ndarray:
    """Single-doc convenience wrapper (tests / oracle cross-checks)."""
    flat, off = hash_token_lists([tokens])
    sh, _ = shingle_hashes_flat(flat, off, k)
    return sh
