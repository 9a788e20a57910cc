"""Batch-vectorized Jaro-Winkler similarity.

Replaces the reference's trie-based matcher (external lib
``similarity.jarowinkler``, used by `JaroWinklerMappingProcessor.java:81-88`)
with a numpy implementation that scores a whole Arrow batch of candidate
string pairs at once — no per-row Python in the hot loop (the north rule).

Semantics: classic Jaro similarity (match window ``max(|a|,|b|)/2 - 1``,
first-free-match marking, transposition count) plus the Winkler prefix
boost ``jw = j + l·0.1·(1-j)`` with ``l`` = common prefix length capped at
4, applied unconditionally. Equal strings score 1.0; a zero-match pair
scores 0.0.

The batch algorithm runs O(L·W) vectorized numpy passes over the whole
batch (L = max string length, W = max window), which beats per-pair Python
by ~2 orders of magnitude for realistic label lengths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

WINKLER_P = 0.1
WINKLER_MAX_PREFIX = 4


def jaro_winkler_ref(a: str, b: str) -> float:
    """Scalar reference implementation (used by tests/hypothesis only)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    w = max(la, lb) // 2 - 1
    used_b = [False] * lb
    matched_a = []
    for i, ca in enumerate(a):
        lo, hi = max(0, i - w), min(lb - 1, i + w)
        for j in range(lo, hi + 1):
            if not used_b[j] and b[j] == ca:
                used_b[j] = True
                matched_a.append(i)
                break
    m = len(matched_a)
    if m == 0:
        return 0.0
    b_matched = [b[j] for j in range(lb) if used_b[j]]
    t = sum(1 for i, j in zip(matched_a, range(m)) if a[i] != b_matched[j]) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= WINKLER_MAX_PREFIX:
            break
        prefix += 1
    return jaro + prefix * WINKLER_P * (1.0 - jaro)


def _encode(strings: "pd.Series", width: int) -> tuple[np.ndarray, np.ndarray]:
    """(N, width) uint32 codepoint matrix + lengths, fully vectorized."""
    arr = strings.fillna("").to_numpy(dtype=f"U{max(width, 1)}")
    lengths = np.char.str_len(arr).astype(np.int64)
    codes = arr.view(np.uint32).reshape(len(arr), -1)[:, :width] if width else (
        np.zeros((len(arr), 0), np.uint32)
    )
    return codes, lengths


def jaro_winkler_batch(s1: pd.Series, s2: pd.Series) -> np.ndarray:
    s1 = pd.Series(s1).fillna("")
    s2 = pd.Series(s2).fillna("")
    n = len(s1)
    if n == 0:
        return np.zeros(0)
    l1 = s1.str.len().to_numpy(dtype=np.int64)
    l2 = s2.str.len().to_numpy(dtype=np.int64)
    width = int(max(l1.max(initial=0), l2.max(initial=0)))
    if width == 0:
        return np.where((l1 == 0) & (l2 == 0), 1.0, 0.0)
    a, la = _encode(s1, width)
    b, lb = _encode(s2, width)
    # the kernel is memory-bandwidth-bound (dozens of vector passes over
    # the code matrices); Latin-1-only batches drop to uint8 — 4x less
    # bus traffic, which is what lets the scorer scale past ~8 cores
    if (a.max(initial=0) < 256) and (b.max(initial=0) < 256):
        a = a.astype(np.uint8)
        b = b.astype(np.uint8)

    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    wmax = int(w.max(initial=0))
    lmax = int(la.max(initial=0))

    matched_a = np.zeros((n, width), dtype=bool)
    used_b = np.zeros((n, width), dtype=bool)
    for i in range(lmax):
        active = i < la
        lo = np.maximum(i - w, 0)
        hi = np.minimum(i + w, lb - 1)
        found = np.zeros(n, dtype=bool)
        ai = a[:, i]
        for j in range(max(0, i - wmax), min(width, i + wmax + 1)):
            ok = (
                active
                & ~found
                & (j >= lo)
                & (j <= hi)
                & ~used_b[:, j]
                & (b[:, j] == ai)
            )
            if ok.any():
                used_b[ok, j] = True
                matched_a[ok, i] = True
                found |= ok
    m = matched_a.sum(axis=1)

    # transpositions: compare matched chars of a (in a-order) with used
    # chars of b (in b-order); stable argsort packs matched positions first
    order_a = np.argsort(~matched_a, axis=1, kind="stable")
    order_b = np.argsort(~used_b, axis=1, kind="stable")
    ga = np.take_along_axis(a, order_a, axis=1)
    gb = np.take_along_axis(b, order_b, axis=1)
    pos = np.arange(width)[None, :]
    t = ((ga != gb) & (pos < m[:, None])).sum(axis=1) // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - t) / np.maximum(m, 1)) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    jaro = np.where((la == 0) | (lb == 0), 0.0, jaro)

    # Winkler prefix boost
    prefix = np.zeros(n, dtype=np.int64)
    running = np.ones(n, dtype=bool)
    for i in range(min(WINKLER_MAX_PREFIX, width)):
        eq = running & (i < la) & (i < lb) & (a[:, i] == b[:, i])
        prefix += eq
        running &= eq
    jw = jaro + prefix * WINKLER_P * (1.0 - jaro)
    # exact equality fast-path (empty==empty handled above)
    eq_all = (l1 == l2) & ((a == b) | (pos >= l1[:, None])).all(axis=1)
    jw = np.where(eq_all, 1.0, jw)
    return jw


_duck_con = None


def _duckdb_jw_batch(s1: pd.Series, s2: pd.Series) -> np.ndarray:
    """C++-speed JW via DuckDB's jaro_winkler_similarity, one cached
    connection per python worker, single-threaded (Spark owns parallelism).

    DuckDB applies the Winkler boost only when jaro > 0.7 (the classic
    boost threshold) while the reference applies it unconditionally. With
    unconditional boost, jw <= 0.82 whenever jaro <= 0.7, so for every
    pair scoring strictly above 0.82 the two definitions coincide exactly
    — callers gate this path on threshold > 0.82 (see jw_score).
    """
    global _duck_con
    import duckdb

    if _duck_con is None:
        _duck_con = duckdb.connect()
        _duck_con.execute("SET threads=1")
    a = s1.fillna("")
    b = s2.fillna("")
    batch = pd.DataFrame({"a": a, "b": b})
    out = _duck_con.execute(
        "SELECT jaro_winkler_similarity(a, b) AS s FROM batch"
    ).fetchnumpy()["s"]
    # DuckDB's JW walks UTF-8 *bytes*; multibyte codepoints shift lengths
    # and match windows, so any pair touching non-ASCII goes through the
    # exact codepoint kernel instead
    non_ascii = (
        a.str.contains(r"[^\x00-\x7f]", regex=True).to_numpy()
        | b.str.contains(r"[^\x00-\x7f]", regex=True).to_numpy()
    )
    if non_ascii.any():
        out = out.copy()
        out[non_ascii] = jaro_winkler_batch(
            a[non_ascii].reset_index(drop=True), b[non_ascii].reset_index(drop=True)
        )
    # empty-vs-empty and exact equality pinned to the reference (1.0)
    return np.where(a.to_numpy() == b.to_numpy(), 1.0, out)


_jw_udfs: dict = {}


def jw_score(a, b, threshold: float | None = None):
    """Column: Jaro-Winkler score of two string columns (Arrow-batched).

    ``threshold``: when the caller will discard scores at or below 0.82,
    the DuckDB C++ scorer is provably identical on all surviving pairs and
    ~40x faster than the numpy kernel; otherwise the exact numpy batch
    runs. The gate is strict (> 0.82) because at exactly 0.82 a pair with
    jaro exactly at DuckDB's 0.7 boost cutoff and a 4-char common prefix
    is kept by the reference's unconditional boost but dropped by DuckDB.
    The pandas UDF is created lazily because pyspark 4 needs an active
    SparkSession to resolve the return type.
    """
    use_duck = threshold is not None and threshold > 0.82
    if use_duck:
        try:
            import duckdb  # noqa: F401
        except ImportError:
            use_duck = False
    key = "duck" if use_duck else "numpy"
    if key not in _jw_udfs:
        fn = _duckdb_jw_batch if use_duck else jaro_winkler_batch
        _jw_udfs[key] = F.pandas_udf(
            lambda s1, s2, _fn=fn: pd.Series(_fn(s1, s2)), "double"
        )
    return _jw_udfs[key](a, b)
