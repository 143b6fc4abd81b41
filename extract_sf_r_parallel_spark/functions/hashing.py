"""Hashing primitives for dedup/similarity (NumPy, Arrow-batched):
shingling, MinHash, SimHash, rolling-polynomial fingerprints. All
deterministic (fixed seeds), all vectorized over document batches.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "shingle_hashes", "minhash_signature", "simhash64",
    "rolling_fingerprint", "jaccard", "MINHASH_PRIME",
]

MINHASH_PRIME = np.uint64((1 << 31) - 1)  # Mersenne prime 2^31-1


def _token_hashes(text: str) -> np.ndarray:
    """Stable per-token FNV-1a 64 hashes (wraparound is the algorithm;
    errstate keeps the intentional overflow from masking real bugs)."""
    toks = text.split()
    out = np.empty(len(toks), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            h = np.uint64(0xCBF29CE484222325)
            for b in t.encode():
                h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
            out[i] = h
    return out


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (combined from token hashes — avoids
    re-hashing overlapping strings)."""
    with np.errstate(over="ignore"):
        th = _token_hashes(text)
        if len(th) < k:
            return np.unique(th)  # set semantics even for short docs
        # combine k consecutive token hashes with distinct multipliers
        acc = np.zeros(len(th) - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = acc * np.uint64(0x9E3779B97F4A7C15) + th[j:len(th) - k + 1 + j]
        return np.unique(acc)


def _minhash_params(n_hashes: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MINHASH_PRIME) - 1, n_hashes, dtype=np.uint64)
    b = rng.integers(0, int(MINHASH_PRIME) - 1, n_hashes, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, n_hashes: int = 64,
                      seed: int = 7) -> np.ndarray:
    """MinHash signature: min over shingles of (a·x + b) mod p per hash
    function, the exact Carter–Wegman universal family over Z_p with
    p = 2^31−1: a, b < p and x reduced mod p, so a·x + b < 2^62 — every
    intermediate is uint64-exact (no overflow, no folding tricks) and
    the identical integer arithmetic is expressible in ANSI SQL BIGINT
    for the driver's DuckDB oracle (plans/textops.py)."""
    a, b = _minhash_params(n_hashes, seed)
    if len(shingles) == 0:
        return np.full(n_hashes, int(MINHASH_PRIME), dtype=np.uint64)
    x = (shingles % MINHASH_PRIME).astype(np.uint64)
    # broadcast (n_hashes, n_shingles): exact in uint64 since a,x < 2^31
    v = (a[:, None] * x[None, :] + b[:, None]) % MINHASH_PRIME
    return v.min(axis=1)


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (near-dup detection by hamming
    distance)."""
    th = _token_hashes(text)
    if len(th) == 0:
        return 0
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    val = np.uint64(0)
    for j in range(64):
        if score[j] > 0:
            val |= np.uint64(1) << np.uint64(j)
    return int(np.int64(val.astype(np.int64)))


def rolling_fingerprint(text: str, base: int = 1_000_003,
                        mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash of the whole document (document
    fingerprinting)."""
    h = 0
    for b in text.encode():
        h = (h * base + b) % mod
    return h


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over shingle-hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
