"""Deterministic vectorized hashing primitives shared by the dedup stages.

All hashing is seed-deterministic numpy uint64 arithmetic (splitmix64 /
multiply-shift universal hashing) — no Python `hash()`, no runtime entropy —
so signatures are reproducible across executors, sessions, and cluster
sizes (north_rule: deterministic seeds for all hashing)."""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 arrays (public-domain constant mix)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
        return x ^ (x >> np.uint64(31))


def hash_shingles(data: np.ndarray, k: int) -> np.ndarray:
    """Rolling char k-shingle hashes of a uint8 byte array.

    Returns uint64 hashes of every k-byte window (len-k+1 values) via a
    polynomial rolling base then splitmix64 finalization; empty when the
    text is shorter than k."""
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    base = np.uint64(0x100000001B3)  # FNV prime as polynomial base
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            acc = (acc * base + data[i : n - k + 1 + i].astype(np.uint64)) & _MASK64
    return splitmix64(acc)


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) multiply-shift parameters for `num_perm` permutations."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
    a |= np.uint64(1)  # odd multipliers
    b = rng.randint(0, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min over multiply-shift-permuted shingle hashes: (num_perm,) uint64.

    An empty shingle set hashes to all-max (never collides with real docs)."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MASK64, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (num_perm, n_shingles) permuted values; min along shingles
        permuted = (a[:, None] * shingle_hashes[None, :] + b[:, None]) & _MASK64
    return permuted.min(axis=1)


def band_hashes(signature: np.ndarray, num_bands: int) -> np.ndarray:
    """Hash each band (contiguous rows) of a signature into one uint64."""
    rows = len(signature) // num_bands
    bands = signature[: num_bands * rows].reshape(num_bands, rows)
    with np.errstate(over="ignore"):
        acc = np.zeros(num_bands, dtype=np.uint64)
        for r in range(rows):
            acc = splitmix64(acc ^ (bands[:, r] + np.uint64(r) * np.uint64(0x9E3779B97F4A7C15)))
    return acc


def simhash64(shingle_hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash sign-sum over shingle hashes."""
    if len(shingle_hashes) == 0:
        return np.uint64(0)
    bits = (
        (shingle_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    sums = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if sums[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out
