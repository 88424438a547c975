"""Mergeable sketches — associative per-batch partials for streaming
aggregation (SURVEY.md §2.4, §4): HyperLogLog for distinct counts,
fixed-bin histograms for distributions/drift, MinHash signatures for
near-duplicate detection.  All are numpy-vectorized and serialize to plain
bytes/lists so they ride through Ray object store + groupby merges.

Public-knowledge algorithms: HyperLogLog (Flajolet et al. 2007), MinHash
(Broder 1997), two-sample KS statistic / PSI from standard references.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------------------
# 64-bit hashing (splitmix64 — public domain algorithm)
# ----------------------------------------------------------------------

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= _M1
        x ^= x >> np.uint64(27)
        x *= _M2
        x ^= x >> np.uint64(31)
    return x


import os as _os

# polars reads this at import: one Rust thread per process — the hash
# kernel runs inside Ray workers that each own ONE scheduled CPU, and a
# default-size polars pool per worker oversubscribes the node 32x
_os.environ.setdefault("POLARS_MAX_THREADS", "1")
try:  # polars: Rust xxhash lane, ~10x faster than hashlib.md5 per byte
    import polars as _pl
except ImportError:  # pragma: no cover - polars is baked into this env
    _pl = None


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hashes of a string sequence.

    polars' seeded-xxhash kernel when available (measured 11x faster than
    a hashlib.md5 loop and ~25x faster than
    ``pd.util.hash_pandas_object`` at 1M strings — BASELINE.md r3
    microbench), else the pandas hash.  The lane is chosen ONCE per
    environment, never per call — every call site must map equal strings
    to equal hashes (per-batch dedup partials are merged across batches
    of different sizes).  Deterministic across processes (seeded xxhash);
    NOT guaranteed stable across polars versions — engine-internal use
    only (the cross-engine-verifiable mode is md5 where an oracle
    recomputes the value).
    """
    if _pl is not None:
        s = _pl.Series(values if isinstance(values, list) else list(values),
                       dtype=_pl.Utf8)
        return s.hash(seed=seed & 0xFFFFFFFFFFFFFFFF).to_numpy().astype(np.uint64)
    import pandas as pd

    s = pd.Series(values, dtype="object")
    h = pd.util.hash_pandas_object(s, index=False).to_numpy().astype(np.uint64)
    if seed:
        with np.errstate(over="ignore"):
            h ^= np.uint64(seed) * _M1
        h = splitmix64(h)
    return h


def pack_hex128(h0: np.ndarray, h1: np.ndarray) -> np.ndarray:
    """Two uint64 lanes → 32-char hex keys ('S32'), one buffer pass."""
    packed = np.empty((len(h0), 2), dtype=">u8")
    packed[:, 0] = h0
    packed[:, 1] = h1
    hex_all = packed.tobytes().hex().encode("ascii")
    return np.frombuffer(hex_all, dtype="S32")


def hex16(h: np.ndarray) -> np.ndarray:
    """uint64 array → 16-char lowercase hex ('U16'), one buffer pass —
    the vectorized replacement for per-row ``f"{x:016x}"`` loops,
    shared by the fingerprint and deterministic-shuffle stages
    (code-review r5s3: the two inline copies cross-referenced each
    other)."""
    hx = np.ascontiguousarray(h.astype(">u8")).tobytes().hex() \
        .encode("ascii")
    return np.frombuffer(hx, dtype="S16").astype("U16")


def hash_strings_hex128(values) -> np.ndarray:
    """Vectorized 128-bit content digests as 32-char hex keys.

    Two independent 64-bit lanes (seeded ``hash_strings``) packed and
    hex-encoded in one buffer pass — the engine-default replacement for
    per-row ``hashlib.md5`` (round-2 verdict "What's wrong" #2): same key
    width (collision-safe at 10^12 rows), no Python loop.  Returns an
    ``(n,)`` numpy ``S32`` array (ASCII hex) ready for ``pa.array``.
    """
    return pack_hex128(hash_strings(values, seed=0),
                       hash_strings(values, seed=0x9E3779B9))


def hash_int_list_rows(list_col, seed: int = 0) -> np.ndarray:
    """Order-sensitive 64-bit hash of each row of a ``list<int>`` column,
    fully vectorized (no per-row ``tobytes()``/md5).

    Each element is mixed with its in-row position (splitmix64 of
    ``value ^ rot(position)``) and summed per row with
    ``np.add.reduceat`` — order-sensitive because position is folded in
    before the sum; the row length is mixed into the final value so
    prefixes don't collide.  Accepts a ``pa.ListArray``/``ChunkedArray``;
    null rows hash to 0 (callers mask them separately).
    """
    import pyarrow as pa

    if isinstance(list_col, pa.ChunkedArray):
        list_col = list_col.combine_chunks()
    values = np.asarray(list_col.values.to_numpy(zero_copy_only=False),
                        dtype=np.int64).astype(np.uint64)
    offsets = list_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # slice-safe: a sliced ListArray keeps the full values buffer and
    # absolute offsets — trim to the slice's window and rebase
    values = values[offsets[0]:offsets[-1]]
    off0 = offsets - offsets[0]
    lengths = np.diff(off0)
    n = len(lengths)
    if len(values) == 0:
        mixed_sum = np.zeros(n, dtype=np.uint64)
    else:
        pos = np.arange(len(values), dtype=np.uint64) - np.repeat(
            off0[:-1].astype(np.uint64), lengths
        )
        with np.errstate(over="ignore"):
            mixed = splitmix64(values ^ (pos * _M2) ^ np.uint64(seed))
        # reduceat needs strictly valid starts; empty rows share a start
        # with their successor — compute via cumsum differences instead
        csum = np.concatenate(
            [np.zeros(1, dtype=np.uint64), np.cumsum(mixed, dtype=np.uint64)]
        )
        with np.errstate(over="ignore"):
            mixed_sum = csum[off0[1:]] - csum[off0[:-1]]
    with np.errstate(over="ignore"):
        out = splitmix64(mixed_sum ^ (lengths.astype(np.uint64) * _M1)
                         ^ np.uint64(seed))
    return out


def word_ngram_hashes(words_all, n: int, empty_doc_gram: bool = False):
    """Vectorized 64-bit hashes of each document's word ``n``-grams.

    No gram strings are built: the batch's words factorize once
    (``pd.factorize``, hash-based C path), the small UNIQUE vocabulary is
    hashed once, and each gram hash is a position-weighted splitmix mix
    of its word hashes — O(total words) vectorized work shared by the
    fingerprint and MinHash stages.

    ``words_all``: pandas Series of word lists (0-based RangeIndex).
    Docs with fewer than ``n`` words contribute ONE whole-doc gram
    (position-weighted over however many words they have); zero-word
    docs contribute the empty gram when ``empty_doc_gram`` else nothing.
    Returns ``(flat_hashes, offsets)`` with grams grouped by doc in
    order (offsets has n_docs+1 entries).
    """
    import pandas as pd

    n_docs = len(words_all)
    ex = words_all.explode()
    rows = ex.index.to_numpy()
    w = ex.to_numpy()
    valid = pd.notna(w)
    rows, w = rows[valid], w[valid]
    codes, uniq = pd.factorize(w)
    word_h = hash_strings(list(uniq)) if len(uniq) else \
        np.empty(0, dtype=np.uint64)
    h_words = word_h[codes] if len(codes) else np.empty(0, dtype=np.uint64)

    if len(w) >= n:
        same = rows[: len(w) - n + 1] == rows[n - 1:]
        starts = np.nonzero(same)[0]
    else:
        starts = np.array([], dtype=np.int64)
    gram_rows = rows[starts] if len(starts) else np.array([], dtype=np.int64)
    gh = np.zeros(len(starts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            gh ^= splitmix64(h_words[starts + j] ^ (np.uint64(j + 1) * _M2))
        gh = splitmix64(gh * _M1)

    short = np.setdiff1d(np.arange(n_docs), np.unique(gram_rows))
    if len(short):
        short_set = np.zeros(n_docs, dtype=bool)
        short_set[short] = True
        sel = short_set[rows]
        s_rows, s_h = rows[sel], h_words[sel]
        pos = np.arange(len(s_rows), dtype=np.uint64)
        first_idx = np.searchsorted(s_rows, short)
        if len(s_rows):
            # clamp: zero-word short docs have no rows, so their
            # first_idx may point past the end — their slots never
            # appear in the row->doc mapping, the clamp is inert for
            # them (caught by the winnowing empty-doc fixture, r3)
            first_c = np.minimum(first_idx, len(s_rows) - 1)
            pos = pos - pos[first_c][np.searchsorted(short, s_rows)]
        with np.errstate(over="ignore"):
            mixed = splitmix64(s_h ^ ((pos + np.uint64(1)) * _M2))
        csum = np.concatenate(
            [np.zeros(1, dtype=np.uint64), np.cumsum(mixed, dtype=np.uint64)])
        ends_idx = np.searchsorted(s_rows, short, side="right")
        with np.errstate(over="ignore"):
            # zero-word docs fall out naturally: empty segment -> mix of 0
            short_h = splitmix64((csum[ends_idx] - csum[first_idx]) * _M1)
        if not empty_doc_gram:
            has_words = np.isin(short, s_rows)
            short, short_h = short[has_words], short_h[has_words]
        gh = np.concatenate([gh, short_h])
        gram_rows = np.concatenate([gram_rows, short])

    order = np.argsort(gram_rows, kind="stable")
    gram_rows = gram_rows[order]
    gh = gh[order]
    offsets = np.searchsorted(gram_rows, np.arange(n_docs + 1)).astype(np.int64)
    return gh, offsets


# ----------------------------------------------------------------------
# HyperLogLog
# ----------------------------------------------------------------------


class HyperLogLog:
    """Fixed-size HLL with dense uint8 registers; merge = elementwise max."""

    __slots__ = ("p", "registers")

    def __init__(self, p: int = 14, registers=None):
        self.p = p
        self.registers = (
            registers if registers is not None else np.zeros(1 << p, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        p = self.p
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel bit
        # rank = leading zeros of remaining bits + 1, capped at 64-p+1
        lz = np.zeros(len(h), dtype=np.uint8)
        x = rest.copy()
        # count leading zeros via float exponent trick is imprecise; use
        # bit-length: lz = 64 - bit_length(x)
        bl = np.zeros(len(h), dtype=np.uint8)
        xx = x.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = xx >= (np.uint64(1) << np.uint64(shift))
            bl[mask] += shift
            xx[mask] >>= np.uint64(shift)
        bl[xx > 0] += 1
        lz = (np.uint8(64) - bl).astype(np.uint8) + 1
        np.maximum.at(self.registers, idx, lz)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(len(self.registers))
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int32))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = b[0]
        return cls(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


# ----------------------------------------------------------------------
# mergeable histogram
# ----------------------------------------------------------------------


class Histogram:
    """Fixed-edge histogram; merge = vector add.  Used for token-length
    distributions and drift (KS/PSI) per source partition."""

    __slots__ = ("edges", "counts")

    def __init__(self, edges: np.ndarray, counts=None):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = (
            counts
            if counts is not None
            else np.zeros(len(self.edges) - 1, dtype=np.int64)
        )

    @classmethod
    def log_bins(cls, lo: float = 1, hi: float = 4096, n: int = 64) -> "Histogram":
        return cls(np.unique(np.round(np.geomspace(lo, hi + 1, n + 1))))

    def add(self, values: np.ndarray) -> "Histogram":
        c, _ = np.histogram(values, bins=self.edges)
        self.counts += c
        return self

    def merge(self, other: "Histogram") -> "Histogram":
        self.counts += other.counts
        return self

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def cdf(self) -> np.ndarray:
        t = self.total
        if t == 0:
            return np.zeros(len(self.counts))
        return np.cumsum(self.counts) / t

    def to_list(self) -> list:
        return self.counts.tolist()


def ks_statistic(a: Histogram, b: Histogram) -> float:
    """Two-sample KS statistic over shared-edge histograms (sup |CDF diff|)."""
    return float(np.abs(a.cdf() - b.cdf()).max()) if a.total and b.total else 0.0


def psi(a: Histogram, b: Histogram, eps: float = 1e-6) -> float:
    """Population Stability Index between two shared-edge histograms."""
    if not a.total or not b.total:
        return 0.0
    pa_ = a.counts / a.total + eps
    pb_ = b.counts / b.total + eps
    return float(np.sum((pa_ - pb_) * np.log(pa_ / pb_)))


# ----------------------------------------------------------------------
# MinHash
# ----------------------------------------------------------------------

class BloomFilter:
    """Vectorized Bloom filter over 64-bit element hashes (Bloom 1970).

    Broadcast-side membership for dimension sets too large to ship as raw
    value arrays: ~10 bits/element at k=7 gives ~1% false positives —
    for an ANTI-join that means ~1% of true violations are missed unless
    re-checked, so callers either accept the bound or verify positives.
    Merge = OR (associative), so filters build distributed.
    """

    __slots__ = ("m", "k", "bits")

    def __init__(self, n_items: int, fp_rate: float = 0.01, bits=None):
        m = int(max(64, -n_items * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = ((m + 63) // 64) * 64
        self.k = max(1, int(round(self.m / max(1, n_items) * np.log(2))))
        self.bits = bits if bits is not None else np.zeros(self.m // 64, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # double hashing: pos_i = h1 + i*h2 (Kirsch–Mitzenmacher)
        h1 = h % np.uint64(self.m)
        h2 = (splitmix64(h) | np.uint64(1)) % np.uint64(self.m)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) % np.uint64(self.m)

    def add_hashes(self, h: np.ndarray) -> "BloomFilter":
        pos = self._positions(h).reshape(-1)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """k-permutation MinHash over 64-bit shingle hashes (Broder 1997).

    Universal hashing h_i(x) = (a_i * x + b_i) mod p; signatures are
    uint64[k]; banded LSH groups signatures into (band, band_hash) keys.
    """

    def __init__(self, k: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.k = k
        self.a = rng.integers(1, _MERSENNE, size=k, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=k, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """uint64[k] signature of one document's shingle-hash set."""
        if len(shingle_hashes) == 0:
            return np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            # (a*x + b) mod p on uint64 with wraparound is fine for minhash
            vals = self.a[None, :] * x[:, None] + self.b[None, :]
        return vals.min(axis=0)

    def signatures(self, hash_lists) -> np.ndarray:
        return np.stack([self.signature(h) for h in hash_lists])

    def signature_matrix_flat(self, flat: np.ndarray, offsets: np.ndarray,
                              chunk: int = 32) -> np.ndarray:
        """(n_docs, k) signatures from a FLAT shingle-hash array + row
        offsets — one vectorized pass per permutation chunk
        (``np.minimum.reduceat``), no per-document Python calls.  A
        duplicate shingle hash cannot change a min, so callers may skip
        per-doc ``np.unique``.  Empty rows get the all-max signature."""
        n = len(offsets) - 1
        out = np.full((n, self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(flat) == 0 or n == 0:
            return out
        lengths = np.diff(offsets)
        ne_idx = np.nonzero(lengths > 0)[0]
        # reduceat over NONEMPTY rows' starts only: a clamped start for a
        # trailing empty row would shift the previous row's segment end
        # and silently truncate its signature (code-review r3, confirmed
        # bug); nonempty starts are strictly increasing and each segment
        # ends exactly at the next nonempty row's start
        starts_ne = offsets[:-1][ne_idx]
        x = flat.astype(np.uint64)
        for c0 in range(0, self.k, chunk):
            a = self.a[c0:c0 + chunk]
            b = self.b[c0:c0 + chunk]
            with np.errstate(over="ignore"):
                vals = x[:, None] * a[None, :] + b[None, :]
            mins = np.minimum.reduceat(vals, starts_ne, axis=0)
            out[ne_idx, c0:c0 + len(a)] = mins
        return out

    @staticmethod
    def band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
        """(n_docs, bands) uint64 band-bucket hashes of signatures."""
        n, k = sigs.shape
        r = k // bands
        out = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            seg = sigs[:, b * r : (b + 1) * r]
            acc = np.zeros(n, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(r):
                    acc = (acc * np.uint64(1099511628211)) ^ seg[:, j]
            out[:, b] = splitmix64(acc)
        return out


def simhash(shingle_hashes: np.ndarray, weights=None) -> np.uint64:
    """64-bit SimHash of one document's feature-hash multiset (Charikar)."""
    if len(shingle_hashes) == 0:
        return np.uint64(0)
    bits = ((shingle_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    w = np.ones(len(shingle_hashes)) if weights is None else np.asarray(weights)
    score = (w[:, None] * (2 * bits - 1)).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(score > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return out


def unique_per_row(flat: np.ndarray, offsets: np.ndarray):
    """Per-row set semantics over a flat row-grouped array: drop duplicate
    values WITHIN each row (vectorized lexsort + boundary scan).  Returns
    the new ``(flat, offsets)``."""
    n = len(offsets) - 1
    if len(flat) == 0:
        return flat, offsets
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((flat, rows))
    r, f = rows[order], flat[order]
    keep = np.ones(len(f), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
    r, f = r[keep], f[keep]
    new_offsets = np.searchsorted(r, np.arange(n + 1)).astype(np.int64)
    return f, new_offsets


def simhash_flat(flat: np.ndarray, offsets: np.ndarray,
                 chunk: int = 16) -> np.ndarray:
    """Batch SimHash: 64-bit signature per row of a flat feature-hash
    array (row-grouped by ``offsets``) — vectorized bit-count segment
    sums in bit chunks, no per-document Python calls.  Empty rows get 0
    (same as :func:`simhash`)."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(flat) == 0 or n == 0:
        return out
    lengths = np.diff(offsets)
    ne_idx = np.nonzero(lengths > 0)[0]
    # nonempty-only reduceat (see signature_matrix_flat): clamped empty
    # starts truncated the previous row's segment
    starts_ne = offsets[:-1][ne_idx]
    x = flat.astype(np.uint64)
    for b0 in range(0, 64, chunk):
        shifts = np.arange(b0, min(b0 + chunk, 64), dtype=np.uint64)
        bits = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        score = np.add.reduceat(2 * bits - 1, starts_ne, axis=0)
        for j, bit in enumerate(shifts):
            hit = ne_idx[score[:, j] > 0]
            out[hit] |= np.uint64(1) << bit
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def md5_ngram_hashes(words_all, n: int):
    """Cross-engine-recomputable gram hashes: uint64 from the FIRST 16
    hex chars of ``md5(' '.join(gram))`` — the oracle-lane twin of
    :func:`word_ngram_hashes` (cf. the fingerprint stage's md5 lane).
    SQL recomputes the identical value nibble-by-nibble from
    ``md5(gram)``.  Same gram semantics: docs with fewer than ``n``
    words contribute ONE whole-doc gram; zero-word docs contribute
    nothing.  Distinct grams hash once per batch (dict cache)."""
    import hashlib

    flat: list = []
    offsets = np.zeros(len(words_all) + 1, dtype=np.int64)
    cache: dict = {}
    for r, words in enumerate(words_all):
        words = list(words) if words is not None else []
        if not words:
            grams = []
        elif len(words) < n:
            grams = [" ".join(words)]
        else:
            grams = [" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)]
        for g in grams:
            h = cache.get(g)
            if h is None:
                h = cache[g] = int(hashlib.md5(
                    g.encode("utf-8", "surrogatepass")).hexdigest()[:16], 16)
            flat.append(h)
        offsets[r + 1] = len(flat)
    return np.array(flat, dtype=np.uint64), offsets
