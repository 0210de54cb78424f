"""Broadcast Bloom-filter prefilter — the 100 TB semi-join pattern.

The decontamination / membership shape at scale is asymmetric: a bounded
"needle" set (eval-suite n-grams, a blocklist, a seen-ID ledger) probed by
an unbounded "haystack" (the 10^12-doc train corpus).  A plain join ships
every haystack shingle through a shuffle; the Bloom prefilter instead
broadcasts a bit array of the needle set to every executor and drops the
overwhelming majority of haystack rows *in the scan stage*, so only
probable hits reach the exchange.  False positives are removed by the exact
verify join that follows, so composed operators stay value-exact; false
negatives are impossible (every build-set key sets all its bits).

This is the same filter Spark's own runtime row-level filtering injects
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) — built explicitly
here because (a) the aggregate (`bloom_filter_agg`) is not SQL-registered
in this build, and (b) an explicit build lets the caller persist and reuse
one filter across many jobs (ingest batches, streaming micro-batches),
which the optimizer's per-query injection cannot.

Physical shape: the needle side is reduced DISTRIBUTED to distinct
xxhash64 values (JVM-side hash, one shuffle over the *small* side); only
those 8-byte hashes are collected — the same bounded-driver-data contract
as the sorted-neighborhood partition offsets.  The bit array ships as a
Spark broadcast variable; the membership test is a vectorized NumPy pass
inside an Arrow-batched pandas UDF (no per-row Python).

Analog of the reference's dictionary `contains` fast path
(``dictionary/dawg.rs``): an O(1) membership gate in front of the full
traversal/join.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# golden-ratio odd constant (splitmix64 increment) for the second hash of
# the Kirsch-Mitzenmacher double-hashing scheme g_i(x) = h1 + i*h2 mod m
_MIX = np.uint64(0x9E3779B97F4A7C15)


def optimal_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target false-positive rate; m is rounded up
    to a multiple of 64 so the bit array is whole uint64 words."""
    n = max(int(n_items), 1)
    p = min(max(float(fpp), 1e-12), 0.5)
    m = int(math.ceil(-n * math.log(p) / (math.log(2) ** 2)))
    m = max(((m + 63) // 64) * 64, 64)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(hashes: np.ndarray, i: int, m_bits: np.uint64) -> np.ndarray:
    """i-th double-hashed bit position for each input hash (uint64 wrap
    arithmetic on both sides of build/probe keeps them consistent)."""
    h1 = hashes.astype(np.int64, copy=False).view(np.uint64)
    h2 = (h1 * _MIX) | np.uint64(1)  # odd stride: full period mod 2^64
    return (h1 + np.uint64(i) * h2) % m_bits


def build_bits(hashes: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """Bit array (uint64 words) with every input hash's k bits set."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if hashes.size == 0:
        return words
    m = np.uint64(m_bits)
    for i in range(k_hashes):
        pos = _positions(hashes, i, m)
        # or.at: unbuffered scatter — duplicate word indices still all land
        np.bitwise_or.at(words, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))
    return words


def test_bits(words: np.ndarray, hashes: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """Vectorized membership: bool array, True = possibly present."""
    if hashes.size == 0:
        return np.zeros(0, dtype=bool)
    m = np.uint64(m_bits)
    acc = np.ones(hashes.size, dtype=bool)
    for i in range(k_hashes):
        pos = _positions(hashes, i, m)
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))) & np.uint64(1)
        acc &= bit.astype(bool)
    return acc


class BroadcastBloom:
    """A Bloom filter built from one DataFrame column and broadcast to the
    cluster; reusable across any number of probe jobs in the session."""

    def __init__(self, spark, words: np.ndarray, m_bits: int, k_hashes: int, n_items: int):
        self.m_bits = m_bits
        self.k_hashes = k_hashes
        self.n_items = n_items
        self._bc = spark.sparkContext.broadcast(words)

    @classmethod
    def from_column(cls, df: DataFrame, col: str, fpp: float = 0.01) -> "BroadcastBloom":
        """Build from the distinct values of ``df[col]``.

        The distinct + hash reduction runs distributed (xxhash64 is
        JVM-side); only 8-byte hashes cross to the driver — bounded by the
        needle-set cardinality, which is small by the operator's premise.
        """
        hashed = (
            df.select(F.xxhash64(F.col(col)).alias("_h")).distinct().toPandas()["_h"]
        )
        hashes = hashed.to_numpy(dtype=np.int64)
        m, k = optimal_params(hashes.size, fpp)
        return cls(df.sparkSession, build_bits(hashes, m, k), m, k, hashes.size)

    def might_contain(self, col: Column) -> Column:
        """Boolean Column: False = definitely absent, True = possibly
        present.  ``col`` must carry the SAME values the filter was built
        from (the xxhash64 is applied here, JVM-side, symmetrically)."""
        bc, m, k = self._bc, self.m_bits, self.k_hashes

        @F.pandas_udf("boolean")
        def _mc(h: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64)
            return pd.Series(test_bits(bc.value, hv, m, k))

        return _mc(F.xxhash64(col))

    def unpersist(self) -> None:
        self._bc.unpersist()
