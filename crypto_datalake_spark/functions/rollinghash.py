"""Karp-Rabin rolling window fingerprints, vectorized in numpy.

The exact-substring tier (queries/dedup.py, queries/scrub.py) needs one
fingerprint per n-token window per position.  Hashing each window from
scratch costs O(n) per position — the reference-era plan (and our r6
plan) paid that as md5 over the concatenated window, ~n·token_len bytes
hashed per position.  Karp-Rabin replaces it with an O(1)-amortized
recurrence over per-token hashes: H(p+1) = (H(p) - h_p·Bⁿ⁻¹)·B + h_{p+n},
an n× cost drop on the tokenization tier at 100 TB (Lee et al. 2022 use
exactly this family for their suffix-array seeding).

A per-position recurrence is sequential, which Spark's array functions
cannot express without O(L²) accumulator copies and window functions
cannot express without an extra shuffle — so this lives in the engine's
designed pandas-UDF tier (the EMA-recurrence precedent, functions/ema.py),
FULLY vectorized: no Python loop touches a token.  The recurrence is
evaluated in closed form over prefix sums,

    H(p) = B^{p+n-1} · (S(p+n-1) - S(p-1))  (mod M),
    S(k) = Σ_{i≤k} h_i · B^{-i}             (mod M),

so a whole Arrow batch is one cumsum + a few vectorized multiplies.
Everything stays in uint64: hashes and powers are reduced below 2³¹, so
every product fits in 62 bits, and the un-reduced cumsum wraps mod 2⁶⁴
safely (differences of a wrapped cumsum recover the true window sum
exactly while the true sum < 2⁶⁴ — i.e. for windows under 2³³ tokens;
real windows are ~50).  Powers B^i / B^{-i} come from baby-step/
giant-step tables (two 2¹⁶-entry lookups + one multiply per position),
built once at import from Python-int modpow.  The tables cover exponent
indices i < 2³², so ``rolling_window_grams`` chunks each Arrow batch to
keep the FLAT concatenated length under 2³¹ tokens per evaluation —
document boundaries cancel out of the window hash, so chunking at doc
granularity changes nothing.  A single document can never exceed the
range on its own: Spark caps a string cell at 2 GiB ≪ 2³¹ tokens.

FOUR independent 31-bit modular fields are packed into two 62-bit longs
(a 124-bit composite fingerprint), so a false pair needs a simultaneous
collision in all four fields: P ≈ W²/2¹²⁴ across W windows — ~10⁻¹¹
even at 10¹³ windows (the 100 TB design point).  This matters because a
gram collision here is not just wasted compute: a false "verbatim run"
would make the scrub policy delete real text, so the fingerprint must
keep md5-class collision odds, not merely good-enough-for-dedup odds.
"""

from __future__ import annotations

import numpy as np

# the four largest primes below 2^31: keeps every product of two reduced
# values below 2^62 (uint64-safe) and each packed field pair below 2^62
M1 = 2_147_483_647
M2 = 2_147_483_629
M3 = 2_147_483_587
M4 = 2_147_483_579
B1 = 1_000_003
B2 = 1_000_033
B3 = 1_000_037
B4 = 1_000_039

_CHUNK = 1 << 16  # baby-step table size; giant table covers i < 2^32
_FLAT_CAP = 1 << 31  # max flat tokens per evaluation (pow-table range/2)


def _pow_tables(b: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(baby, giant) uint64 tables: b^i mod m = baby[i % 2^16] * giant[i >> 16]."""
    baby = [1] * _CHUNK
    for i in range(1, _CHUNK):
        baby[i] = baby[i - 1] * b % m
    big = baby[-1] * b % m  # b^CHUNK
    giant = [1] * _CHUNK
    for i in range(1, _CHUNK):
        giant[i] = giant[i - 1] * big % m
    return (np.array(baby, dtype=np.uint64), np.array(giant, dtype=np.uint64))


_FIELDS = [
    (M, _pow_tables(B, M), _pow_tables(pow(B, -1, M), M))
    for B, M in ((B1, M1), (B2, M2), (B3, M3), (B4, M4))
]
_LOW = np.uint64(_CHUNK - 1)
_SHIFT = np.uint64(16)


def _pows(idx: np.ndarray, tables, m: np.uint64) -> np.ndarray:
    baby, giant = tables
    return baby[idx & _LOW] * giant[idx >> _SHIFT] % m


def _field_grams(
    th: np.ndarray, p: np.ndarray, n: int, m: int, pows, invs
) -> np.ndarray:
    """Window hashes in one modular field for window starts ``p``
    (0-based global indices into the flat token-hash array ``th``)."""
    m64 = np.uint64(m)
    i = np.arange(len(th), dtype=np.uint64)
    s = th % m64 * _pows(i, invs, m64) % m64  # h_i * B^-i, < 2^62 pre-mod
    # exclusive-prefix cumsum, kept uint64 throughout (a Python-int 0 in
    # concatenate would promote uint64+int64 → float64 and corrupt bits)
    cs = np.concatenate((np.zeros(1, dtype=np.uint64), np.cumsum(s)))
    win = (cs[p + n] - cs[p]) % m64  # true window sum mod m (wrap-safe)
    return win * _pows(p.astype(np.uint64) + np.uint64(n - 1), pows, m64) % m64


def window_grams_flat(
    th: np.ndarray, offsets: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Every n-token window fingerprint for a batch of documents.

    ``th``: flat uint64 per-token hashes, documents concatenated
    (< 2³² tokens total — the pow-table range; the mapInPandas wrapper
    chunks batches to half that);
    ``offsets``: int64 document boundaries, len = ndocs+1, offsets[0]=0.
    Returns (doc_idx, pos, h1, h2): window's document index, 1-based
    position within its document, and the 124-bit composite fingerprint
    packed into two int64 columns — identical for equal token windows
    regardless of which document or offset they sit at.
    """
    if len(th) >= _CHUNK * _CHUNK:
        raise ValueError(
            f"flat batch of {len(th)} tokens exceeds the pow-table range "
            f"(2^32); chunk the batch (see rolling_window_grams)"
        )
    lens = np.diff(offsets)
    counts = np.maximum(lens - n + 1, 0)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), counts)
    first = np.concatenate(([0], np.cumsum(counts)))[:-1]
    pos0 = np.arange(counts.sum(), dtype=np.int64) - np.repeat(first, counts)
    p = offsets[:-1][doc_idx] + pos0  # global 0-based window starts
    if len(p) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    f = [
        _field_grams(th, p, n, m, pows, invs).astype(np.int64)
        for m, pows, invs in _FIELDS
    ]
    h1 = (f[0] << np.int64(31)) | f[1]
    h2 = (f[2] << np.int64(31)) | f[3]
    return doc_idx, pos0 + 1, h1, h2


def rolling_window_grams(d_th, n: int, flat_cap: int = _FLAT_CAP):
    """(doc_id, th array<long>) frame → exploded (doc_id, pos, gram)
    with ``gram`` a struct<h1,h2> 124-bit composite fingerprint, via
    Arrow-batched mapInPandas; docs shorter than ``n`` tokens must be
    filtered out upstream.  Per-token hashes are computed JVM-side
    (xxhash64) so Python never touches a string — each batch is numpy
    flatten + cumsum + table lookups, chunked at document granularity
    so a flat evaluation never exceeds the pow-table range."""
    import pyspark.sql.functions as F

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            cells = [np.asarray(c, dtype=np.int64) for c in pdf["th"]]
            ids = pdf["doc_id"].to_numpy()
            start = 0
            while start < len(cells):
                end, flat_len = start, 0
                while end < len(cells) and (
                    end == start or flat_len + len(cells[end]) <= flat_cap
                ):
                    flat_len += len(cells[end])
                    end += 1
                chunk = cells[start:end]
                offsets = np.zeros(len(chunk) + 1, dtype=np.int64)
                np.cumsum([len(c) for c in chunk], out=offsets[1:])
                flat = np.concatenate(chunk).view(np.uint64)
                doc_idx, pos, h1, h2 = window_grams_flat(flat, offsets, n)
                yield pd.DataFrame(
                    {
                        "doc_id": ids[start:end][doc_idx],
                        "pos": pos,
                        "h1": h1,
                        "h2": h2,
                    }
                )
                start = end

    return d_th.mapInPandas(
        gen, "doc_id long, pos long, h1 long, h2 long"
    ).select("doc_id", "pos", F.struct("h1", "h2").alias("gram"))
