"""Shared text-analysis primitives used by the training-data pipelines.

All functions are deterministic and, where an oracle exists, pinned to
DuckDB's observable semantics (verified empirically in tests):

- ``md5_hex``            == DuckDB ``md5(text)``
- token counting         == ``len(string_split(text, ' '))`` (single-space
                            split keeping empties: n_separators + 1)
- ``byte_set_mask``      drives a Jaccard identical to DuckDB's
                            ``jaccard(a, b)`` (similarity of the *byte*
                            sets of the UTF-8 encodings, case-sensitive)
"""

from __future__ import annotations

import hashlib

import numpy as np


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def token_count(s: str) -> int:
    """== DuckDB len(string_split(s, ' '))."""
    return s.count(" ") + 1


def distinct_token_count(s: str) -> int:
    """== DuckDB len(list_distinct(string_split(s, ' ')))."""
    return len(set(s.split(" ")))


def byte_set_mask(s: str) -> np.ndarray:
    """256-bit membership mask of the UTF-8 bytes of ``s`` as 4 uint64
    words. Two masks give DuckDB-compatible Jaccard via popcounts."""
    mask = np.zeros(4, dtype=np.uint64)
    for b in set(s.encode("utf-8")):
        mask[b >> 6] |= np.uint64(1) << np.uint64(b & 63)
    return mask


def masks_for(texts) -> np.ndarray:
    """(n, 4) uint64 matrix of byte-set masks."""
    out = np.zeros((len(texts), 4), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = byte_set_mask(t)
    return out


_POPCNT = np.array([bin(i).count("1") for i in range(65536)], dtype=np.uint16)


def popcount64(arr: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (16-bit table lookups)."""
    a = arr.view(np.uint16).reshape(*arr.shape, 4) if arr.dtype == np.uint64 else None
    assert a is not None
    return _POPCNT[a].sum(axis=-1).astype(np.int64)


def pairwise_byteset_jaccard(masks: np.ndarray) -> np.ndarray:
    """(n, n) Jaccard matrix over byte-set masks (DuckDB semantics).
    O(n²) by design — the oracle-checkable exact variant; the scale path
    is MinHash-LSH (pd3f_ray.pipelines.dedup)."""
    n = masks.shape[0]
    sizes = popcount64(masks).sum(axis=1)  # |set| per row
    sim = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        inter = popcount64(masks[i] & masks).sum(axis=1)
        union = sizes[i] + sizes - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            sim[i] = np.where(union > 0, inter / union, 0.0)
    return sim


# --- word shingles / MinHash -------------------------------------------------

_MERSENNE = (1 << 61) - 1


def word_shingles(s: str, k: int = 3) -> set[int]:
    """Hashed k-word shingles of a text (single-space tokenization)."""
    toks = s.split(" ")
    if len(toks) < k:
        return {hash_bytes(" ".join(toks).encode())}
    out = set()
    for i in range(len(toks) - k + 1):
        out.add(hash_bytes(" ".join(toks[i : i + k]).encode()))
    return out


def hash_bytes(b: bytes) -> int:
    """Stable 64-bit hash (blake2b-8); never use Python hash() — it is
    salted per process and would break cross-actor determinism."""
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        rng = np.random.RandomState(seed)
        a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        _PERM_CACHE[key] = (a, b)
    return _PERM_CACHE[key]


def minhash_signature(shingles: set[int], num_perm: int = 64,
                      seed: int = 1) -> np.ndarray:
    """num_perm-wide MinHash signature via universal hashing a*x+b mod p
    (p = 2^61-1), vectorized with wrap-around uint64 arithmetic (the
    standard datasketch-style construction: overflow wraps, the result is
    still a deterministic uniform-ish permutation hash)."""
    a, b = _permutations(num_perm, seed)
    if not shingles:
        return np.full(num_perm, _MERSENNE, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    hv = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return hv.min(axis=1)
