"""Blocking-completeness tests for the keyed prefix / substring /
merge-split candidate paths (round-2 replacement of the full-scan
fallback).

Strategy: seeded random vocab + probes over a tiny alphabet (maximal
collision pressure), brute-force Python DP as ground truth, then assert the
BLOCKED Spark path returns exactly the DP's match set — i.e. the key
families lose no recall (precision is the kernel's job and is exact).

The merge-split vocab deliberately straddles the deletion/gram band
boundary (lengths 9..16 around MS_GRAM_MIN_LEN=11 / MS_DEL_MAX_LEN=13,
|len diff| <= 2 pairs crossing the bands) — the case a naive disjoint
banding would get wrong.
"""

from __future__ import annotations

import random

import pytest

from liblevenshtein_rust_spark.kernel import distances as D
from liblevenshtein_rust_spark.operators import matching
from liblevenshtein_rust_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_key_schemes", cores=4, shuffle_partitions=4)


def _rand_words(rng, n, lo, hi, alphabet="abc"):
    return list(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi)))
            for _ in range(n)
        }
    )


def _run_mode(spark, probes, terms, n, variant="standard", **mode):
    p = spark.createDataFrame([(x,) for x in probes], "query string")
    d = spark.createDataFrame([(x,) for x in terms], "term string")
    out = matching.fuzzy_query(p, d, n, variant, **mode)
    return {(r["query"], r["term"]): r["distance"] for r in out.collect()}


def test_prefix_mode_blocked_completeness(spark):
    rng = random.Random(7)
    terms = _rand_words(rng, 150, 1, 12)
    probes = _rand_words(rng, 25, 1, 7) + ["", "abcabc"]
    for n in (1, 2):
        got = _run_mode(spark, probes, terms, n, prefix_mode=True)
        want = {
            (q, t): D.prefix_distance(q, t)
            for q in set(probes)
            for t in terms
            if D.prefix_distance(q, t) <= n
        }
        assert got == want


def test_substring_mode_blocked_completeness(spark):
    rng = random.Random(11)
    terms = _rand_words(rng, 120, 1, 8)
    probes = _rand_words(rng, 20, 1, 14) + ["abcabcabcabc"]
    for n in (1, 2):
        got = _run_mode(spark, probes, terms, n, substring_mode=True)
        want = {
            (q, t): D.substring_distance(q, t)
            for q in set(probes)
            for t in terms
            if D.substring_distance(q, t) <= n
        }
        assert got == want


def test_merge_split_n2_blocked_completeness(spark):
    rng = random.Random(13)
    # straddle the hybrid band boundary: lengths 1..16, heavy around 9..15
    terms = (
        _rand_words(rng, 80, 1, 8)
        + _rand_words(rng, 120, 9, 16)
    )
    probes = _rand_words(rng, 10, 2, 8) + _rand_words(rng, 15, 9, 16)
    got = _run_mode(spark, probes, terms, 2, variant="merge_and_split")
    want = {
        (q, t): D.merge_and_split_distance(q, t)
        for q in set(probes)
        for t in terms
        if D.merge_and_split_distance(q, t) <= 2
    }
    assert got == want


def test_merge_split_keys_share_key_across_band(spark):
    """A length-13 (deletion+gram band) and length-15 (gram band) pair
    within merge-split distance 2 must share a key."""
    from pyspark.sql import functions as F

    from liblevenshtein_rust_spark.functions.blocking_keys import merge_split_keys

    a, b = "abcabcabcabca", "abcabcabcabcabc"  # split+split: distance 2
    assert D.merge_and_split_distance(a, b) <= 2
    df = spark.createDataFrame([(a,), (b,)], "s string").select(
        merge_split_keys(F.col("s")).alias("k")
    )
    ka, kb = [set(r["k"]) for r in df.collect()]
    assert ka & kb


def test_d3_blocked_completeness_standard_and_osa(spark):
    """VERDICT r3 task 1: the blocked path at n=3 must lose no recall,
    INCLUDING short strings (3 edits can destroy every 3-gram of a
    <= 6-char term — the exact case the old unpositioned-3-gram fallback
    got wrong).  Vocab straddles both hybrid bands (standard: 8/10,
    OSA: 11/13) and includes words of length <= 6; ground truth is the
    brute-force DP over the full cross product."""
    rng = random.Random(17)
    terms = (
        _rand_words(rng, 60, 1, 6)        # short band — the regression case
        + _rand_words(rng, 60, 7, 11)     # straddles the standard band
        + _rand_words(rng, 60, 12, 16)    # straddles the OSA band / gram-only
    )
    probes = (
        _rand_words(rng, 8, 1, 6)
        + _rand_words(rng, 8, 7, 11)
        + _rand_words(rng, 8, 12, 16)
    )
    for variant, fn in (
        ("standard", D.standard_distance),
        ("transposition", D.transposition_distance),
    ):
        got = _run_mode(spark, probes, terms, 3, variant=variant)
        want = {
            (q, t): fn(q, t)
            for q in set(probes)
            for t in terms
            if fn(q, t) <= 3
        }
        assert got == want, f"variant={variant}"


def test_d3_hybrid_keys_share_key_across_band(spark):
    """A deletion-band and a gram-band string within distance 3 must share
    a key (the band-overlap proof's crossing case), for both variants."""
    from pyspark.sql import functions as F

    from liblevenshtein_rust_spark.functions.blocking_keys import d3_hybrid_keys

    for osa, a, b in (
        (False, "abcabcab", "abcabcabcab"),    # len 8 vs 11: ins x3
        (True, "abcabcabcab", "abcabcabcabcab"),  # len 11 vs 14: ins x3
    ):
        assert D.standard_distance(a, b) <= 3
        df = spark.createDataFrame([(a,), (b,)], "s string").select(
            d3_hybrid_keys(F.col("s"), transposition=osa).alias("k")
        )
        ka, kb = [set(r["k"]) for r in df.collect()]
        assert ka & kb, (osa, a, b)
