"""Hashing kernels for dedup/similarity: shingles, MinHash, SimHash.

No reference equivalent (GeoCore has no text dedup); these implement the
standard public algorithms (Broder 1997 MinHash; Charikar 2002 SimHash)
as numpy kernels wrapped in Arrow-batched pandas UDFs, plus pure-Column
variants where Spark built-ins suffice.

Determinism contract: every hash is a fixed-parameter universal hash over
xxhash/md5-derived 64-bit shingle ids — same output on every run, any
partitioning, any cluster size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1
_N_PERM_DEFAULT = 64


def _perm_params(n_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


def shingle_ids(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle 64-bit ids (polynomial rolling hash, base 257).

    Rolling-hash fingerprinting per the classic Rabin-Karp scheme; operates
    on the whitespace-normalized lowercased text.
    """
    norm = " ".join(text.lower().split())
    if len(norm) < k:
        norm = norm.ljust(k, "\x00")
    data = np.frombuffer(norm.encode("utf-8", "replace"), dtype=np.uint8).astype(
        np.uint64
    )
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    base = np.uint64(257)
    mod = np.uint64((1 << 61) - 1)
    powers = np.empty(k, dtype=np.uint64)
    powers[k - 1] = np.uint64(1)
    for i in range(k - 2, -1, -1):
        powers[i] = (powers[i + 1] * base) % mod
    n = len(data) - k + 1
    # windowed dot product under the modulus, vectorized over windows
    idx = np.arange(n)[:, None] + np.arange(k)[None, :]
    windows = data[idx]
    h = (windows * powers[None, :] % mod).sum(axis=1) % mod
    return np.unique(h.astype(np.int64))


def minhash_signature(text: str, n_perm: int = _N_PERM_DEFAULT, k: int = 5) -> np.ndarray:
    """MinHash signature: min over shingles of (a*x + b) mod p, per perm."""
    a, b = _PERMS[n_perm]
    ids = shingle_ids(text, k).astype(np.uint64)
    vals = (
        ids[:, None] * a.astype(np.uint64)[None, :] + b.astype(np.uint64)[None, :]
    ) % np.uint64(_MERSENNE)
    return vals.min(axis=0).astype(np.int64)


_PERMS: dict[int, tuple[np.ndarray, np.ndarray]] = {
    _N_PERM_DEFAULT: _perm_params(_N_PERM_DEFAULT)
}


def minhash_udf(n_perm: int = _N_PERM_DEFAULT, k: int = 5):
    if n_perm not in _PERMS:
        _PERMS[n_perm] = _perm_params(n_perm)

    @F.pandas_udf("array<long>")
    def _mh(text: pd.Series) -> pd.Series:
        return text.map(lambda t: minhash_signature(t or "", n_perm, k).tolist())

    return _mh


def simhash64(text: str, k: int = 4) -> int:
    """64-bit SimHash over character k-shingles (Charikar scheme)."""
    ids = shingle_ids(text, k).astype(np.uint64)
    if len(ids) == 0:
        return 0
    # spread each shingle id to 64 bits via splitmix-style mix
    z = ids + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    bits = ((z[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash_udf(k: int = 4):
    @F.pandas_udf("long")
    def _sh(text: pd.Series) -> pd.Series:
        return text.map(lambda t: simhash64(t or "", k))

    return _sh


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 columns — pure Column expr
    (bit_count is a Spark built-in; stays in codegen)."""
    return F.bit_count(a.bitwiseXOR(b))


def ngram_array(text: Column, n: int = 3) -> Column:
    """Word n-grams as an array column (pure Column: split + transform)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    sz = F.size(toks)
    return F.when(sz < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), sz - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array columns — array_intersect/union
    built-ins, fully JVM-side."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, 0.0).otherwise(inter.cast("double") / union.cast("double"))
