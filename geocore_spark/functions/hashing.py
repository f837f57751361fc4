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


def _normalize_encode_batch(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Normalize + utf-8-encode a batch of docs into one concatenated byte
    buffer. Returns (bytes as uint64 array, per-doc byte lengths).

    Per-doc work is C-level string ops only (lower/split/join/encode);
    everything numeric downstream is one vectorized pass over the batch.
    Normalization is byte-identical to ``shingle_ids``.
    """
    bufs = []
    for t in texts:
        norm = " ".join((t or "").lower().split())
        if len(norm) < k:
            norm = norm.ljust(k, "\x00")
        e = norm.encode("utf-8", "replace")
        if len(e) < k:
            e += b"\x00" * (k - len(e))
        bufs.append(e)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    return data, lens


_M61 = np.uint64(_MERSENNE)
_S61 = np.uint64(61)


def _mod61_inplace(x: np.ndarray, hi: np.ndarray, cmp: np.ndarray) -> np.ndarray:
    """x %= 2^61-1, exactly, allocation-free (hi/cmp are workspaces).

    Shift-and-fold: x = q*2^61 + r ≡ q + r (mod M) since 2^61 ≡ 1; one
    conditional subtract suffices because q + r < 2M for any uint64 x.
    Equals ``x % _MERSENNE`` for every uint64 input, including values that
    wrapped mod 2^64 upstream — so batch hashes match the per-doc kernel.
    """
    np.right_shift(x, _S61, out=hi)
    np.bitwise_and(x, _M61, out=x)
    np.add(x, hi, out=x)
    np.greater_equal(x, _M61, out=cmp)
    np.subtract(x, _M61, out=x, where=cmp)
    return x


def _batch_shingles(
    data: np.ndarray, lens: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All k-shingle rolling hashes for a concatenated doc buffer.

    Returns (shingle hashes compacted doc-by-doc, per-doc segment start
    offsets into that array, doc index per shingle). Arithmetic is
    term-by-term identical to ``shingle_ids`` (same uint64 wraparound, same
    per-term + final modulus), so hash values match the per-doc kernel
    exactly. All hot loops are in-place on preallocated workspaces — numpy
    temp allocation (fresh zeroed pages) costs more than the arithmetic at
    this size.
    """
    # the inner accumulation adds k terms each < 2^61 WITHOUT intermediate
    # folds; k <= 7 keeps the sum below 2^64 (8 * 2^61 == 2^64 wraps).
    # Current callers use k=4/5; a larger shingle width needs a fold per
    # term, so fail loudly instead of silently wrapping hashes.
    if k > 7:
        raise ValueError(f"_batch_shingles supports k <= 7, got {k}")
    mod = _M61
    base = np.uint64(257)
    powers = np.empty(k, dtype=np.uint64)
    powers[k - 1] = np.uint64(1)
    for i in range(k - 2, -1, -1):
        powers[i] = (powers[i + 1] * base) % mod
    n_total = len(data) - k + 1
    h = np.empty(n_total, dtype=np.uint64)
    # Window-chunked passes: the k multiply-mod-add sweeps re-stream the
    # whole buffer from DRAM when done full-length (data + tmp + h + hi =
    # ~32 B/window x k passes); at 32 concurrent workers that saturates
    # this box's single memory bus (the 8->32 scaling wall). A 16k-window
    # block keeps the per-pass working set (~0.6 MB) L2-resident so the
    # k inner passes hit cache. Identical arithmetic term-by-term ->
    # bit-identical hashes (pinned by test_batch_kernels_match_per_doc).
    blk = 1 << 14
    bn = min(blk, n_total)
    tmp = np.empty(bn, dtype=np.uint64)
    hi = np.empty(bn, dtype=np.uint64)
    cmp = np.empty(bn, dtype=bool)
    for w0 in range(0, n_total, blk):
        w1 = min(w0 + blk, n_total)
        nw = w1 - w0
        hb = h[w0:w1]
        hb[:] = 0
        t, hi_, cmp_ = tmp[:nw], hi[:nw], cmp[:nw]
        for j in range(k):
            np.multiply(data[w0 + j : w0 + j + nw], powers[j], out=t)
            _mod61_inplace(t, hi_, cmp_)
            np.add(hb, t, out=hb)  # k terms < 2^61 each: no wrap for k <= 7
        _mod61_inplace(hb, hi_, cmp_)
    # windows crossing a doc boundary are invalid: k-1 per boundary
    ends = np.cumsum(lens)
    valid = np.ones(n_total, dtype=bool)
    for j in range(1, k):
        bad = ends[:-1] - j
        valid[bad[bad < n_total]] = False
    shingles = h[valid]
    win_per_doc = lens - k + 1  # >= 1 for every doc (padding guarantees)
    seg = np.concatenate(([0], np.cumsum(win_per_doc)))[:-1]
    doc_of_win = np.repeat(np.arange(len(lens)), win_per_doc)
    return shingles, seg, doc_of_win


def _dedup_per_doc(
    shingles: np.ndarray, doc_of_win: np.ndarray, ndocs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct (doc, shingle) pairs, doc-major sorted.

    Returns (shingle values, per-doc counts >= 1, per-doc segment starts).
    """
    order = np.lexsort((shingles, doc_of_win))
    s_sorted = shingles[order]
    d_sorted = doc_of_win[order]
    keep = np.ones(len(s_sorted), dtype=bool)
    keep[1:] = (s_sorted[1:] != s_sorted[:-1]) | (d_sorted[1:] != d_sorted[:-1])
    s_u = s_sorted[keep]
    counts = np.bincount(d_sorted[keep], minlength=ndocs)
    seg = np.concatenate(([0], np.cumsum(counts)))[:-1]
    return s_u, counts, seg


def minhash_batch(texts, n_perm: int = _N_PERM_DEFAULT, k: int = 5) -> np.ndarray:
    """Batched MinHash: (n_docs, n_perm) int64 signatures, value-identical
    to ``minhash_signature`` per doc.

    The expensive part (one multiply-add-mod per shingle per permutation)
    runs only over GLOBALLY distinct shingle ids in the batch — web corpora
    (and near-dup corpora especially) share most shingles across docs, so
    this is typically 5-50x less arithmetic than per-doc evaluation. Per-doc
    mins are then a gather + segmented min. Duplicate shingles can't change
    a min, so dedup preserves exact signature values.
    """
    if n_perm not in _PERMS:
        _PERMS[n_perm] = _perm_params(n_perm)
    a, b = _PERMS[n_perm]
    a = a.astype(np.uint64)
    b = b.astype(np.uint64)
    ndocs = len(texts)
    if ndocs == 0:
        return np.empty((0, n_perm), dtype=np.int64)
    data, lens = _normalize_encode_batch(texts, k)
    shingles, seg, _ = _batch_shingles(data, lens, k)
    # permute only globally-distinct shingles; duplicates can't change a
    # min. pd.factorize is hash-based O(n) — ~25x cheaper than np.unique's
    # sort at this size, and min doesn't care that uniq is unsorted.
    inv, uniq = pd.factorize(shingles)
    inv = np.ascontiguousarray(inv)
    uniq = np.ascontiguousarray(uniq, dtype=np.uint64)
    nu = len(uniq)
    # all permuted values of the distinct shingles, once per batch
    vals_all = np.empty((n_perm, nu), dtype=np.uint64)
    hi = np.empty(nu, dtype=np.uint64)
    cmp = np.empty(nu, dtype=bool)
    for i in range(n_perm):
        v = vals_all[i]
        np.multiply(uniq, a[i], out=v)
        np.add(v, b[i], out=v)
        _mod61_inplace(v, hi, cmp)
    # Doc-chunked min pass: the naive loop streams a windows-sized gather
    # through DRAM 64 times (~4.5 GB per 8k-doc batch) — fine alone,
    # catastrophic when 32 executor-side workers share one memory bus
    # (measured 6.5x per-batch slowdown at 32-way). Chunking by doc keeps
    # the gather buffer + inverse indices L2-resident across the 64
    # perms, cutting DRAM traffic ~{windows/chunk}x.
    out = np.empty((ndocs, n_perm), dtype=np.uint64)
    target_windows = 1 << 16
    gbuf = np.empty(min(len(inv), 2 * target_windows + 1024), dtype=np.uint64)
    d0 = 0
    while d0 < ndocs:
        d1 = d0 + 1
        w0 = seg[d0]
        limit = w0 + target_windows
        while d1 < ndocs and seg[d1] < limit:
            d1 += 1
        w1 = seg[d1] if d1 < ndocs else len(inv)
        nwc = w1 - w0
        if nwc > len(gbuf):
            gbuf = np.empty(nwc, dtype=np.uint64)
        inv_c = inv[w0:w1]
        seg_c = seg[d0:d1] - w0
        gc = gbuf[:nwc]
        for i in range(n_perm):
            np.take(vals_all[i], inv_c, out=gc)
            out[d0:d1, i] = np.minimum.reduceat(gc, seg_c)
        d0 = d1
    return out.astype(np.int64)


def simhash_batch(texts, k: int = 4) -> np.ndarray:
    """Batched SimHash: (n_docs,) int64 fingerprints, value-identical to
    ``simhash64`` per doc (per-doc shingle dedup preserved — SimHash votes
    count each distinct shingle once)."""
    ndocs = len(texts)
    if ndocs == 0:
        return np.empty(0, dtype=np.int64)
    data, lens = _normalize_encode_batch(texts, k)
    shingles, _, doc_of_win = _batch_shingles(data, lens, k)
    s_u, counts, seg = _dedup_per_doc(shingles, doc_of_win, ndocs)
    z = s_u + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    out = np.zeros(ndocs, dtype=np.uint64)
    # doc-chunked bit voting — same memory-bus rationale as minhash_batch:
    # keep the 64-pass loop's working set L2-resident per chunk
    target = 1 << 16
    d0 = 0
    while d0 < ndocs:
        d1 = d0 + 1
        w0 = seg[d0]
        limit = w0 + target
        while d1 < ndocs and seg[d1] < limit:
            d1 += 1
        w1 = seg[d1] if d1 < ndocs else len(s_u)
        zc = z[w0:w1]
        seg_c = seg[d0:d1] - w0
        counts_c = counts[d0:d1]
        oc = out[d0:d1]
        for i in range(64):
            bits = (zc >> np.uint64(i)) & np.uint64(1)
            ones = np.add.reduceat(bits, seg_c).astype(np.int64)
            votes = 2 * ones - counts_c
            oc |= (votes > 0).astype(np.uint64) << np.uint64(i)
        d0 = d1
    return out.astype(np.int64)


def minhash_udf(n_perm: int = _N_PERM_DEFAULT, k: int = 5):
    if n_perm not in _PERMS:
        _PERMS[n_perm] = _perm_params(n_perm)

    @F.pandas_udf("array<long>")
    def _mh(text: pd.Series) -> pd.Series:
        sigs = minhash_batch(text.tolist(), n_perm, k)
        return pd.Series(list(sigs), index=text.index)

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
        return pd.Series(simhash_batch(text.tolist(), k), index=text.index)

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
