"""Generalized weighted-op kernel: cross-validate batch vs scalar DP, and
the uniform-weight cases against the production kernel; builder facade."""

from __future__ import annotations

import random
import string

import pytest

from liblevenshtein_rust_spark.kernel import distances as dist
from liblevenshtein_rust_spark.kernel.batch import batch_distance
from liblevenshtein_rust_spark.kernel.generalized import (
    MERGE_SPLIT_WEIGHTS,
    STANDARD_WEIGHTS,
    TRANSPOSITION_WEIGHTS,
    OperationWeights,
    batch_generalized_distance,
    generalized_distance,
)


def _rand_words(rng, n, lo=0, hi=9):
    return [
        "".join(rng.choice("abc") for _ in range(rng.randint(lo, hi)))
        for _ in range(n)
    ]


@pytest.mark.parametrize(
    "w,variant",
    [
        (STANDARD_WEIGHTS, dist.STANDARD),
        (TRANSPOSITION_WEIGHTS, dist.TRANSPOSITION),
        (MERGE_SPLIT_WEIGHTS, dist.MERGE_AND_SPLIT),
    ],
)
def test_uniform_weights_match_production_kernel(w, variant):
    rng = random.Random(5)
    qs = _rand_words(rng, 400)
    ts = _rand_words(rng, 400)
    for n in (0, 1, 2, 3):
        got = batch_generalized_distance(qs, ts, n, w)
        want = batch_distance(qs, ts, n, variant)
        assert (got == want).all(), (n, variant)


@pytest.mark.parametrize(
    "w",
    [
        OperationWeights(substitute=2),
        OperationWeights(insert=2, delete=3),
        OperationWeights(transpose=1, substitute=2),
        OperationWeights(merge=2, split=1),
        OperationWeights(transpose=2, merge=3, split=2, substitute=2, insert=2, delete=2),
    ],
)
def test_batch_matches_scalar_oracle(w):
    rng = random.Random(11)
    qs = _rand_words(rng, 300, 0, 7)
    ts = _rand_words(rng, 300, 0, 7)
    for n in (1, 2, 4):
        got = batch_generalized_distance(qs, ts, n, w)
        for q, t, g in zip(qs, ts, got):
            d = generalized_distance(q, t, w)
            assert g == (d if d <= n else -1), (q, t, n, w)


def test_weighted_semantics():
    w = OperationWeights(substitute=2)
    assert generalized_distance("cat", "car", w) == 2  # sub costs 2
    assert generalized_distance("cat", "cats", w) == 1  # insert still 1
    w2 = OperationWeights(transpose=1)
    assert generalized_distance("ab", "ba", w2) == 1
    assert generalized_distance("ab", "ba", STANDARD_WEIGHTS) == 2


def test_invalid_weights_rejected():
    with pytest.raises(ValueError):
        OperationWeights(substitute=0).validate()
    with pytest.raises(ValueError):
        OperationWeights(transpose=0).validate()


# ---------------------------------------------------------------------------
# builder facade
# ---------------------------------------------------------------------------


def test_builder_facade():
    from liblevenshtein_rust_spark.operators.builder import FuzzyQueryBuilder
    from liblevenshtein_rust_spark.session import get_spark

    spark = get_spark("test_builder", cores=4, shuffle_partitions=4)
    d = spark.createDataFrame([("test",), ("text",), ("rest",)], "term string")
    p = spark.createDataFrame([("tst",)], "query string")
    res = (
        FuzzyQueryBuilder(d)
        .max_distance(1)
        .algorithm("transposition")
        .limit(2)
        .execute(p)
        .collect()
    )
    assert [(r["term"], r["distance"]) for r in res] == [("test", 1)]


# ---------------------------------------------------------------------------
# Spark-level blocking completeness (regression: merge/split ops span two
# standard edits, so deletion-neighborhood keys at depth n under-block)
# ---------------------------------------------------------------------------


def _spark():
    from liblevenshtein_rust_spark.session import get_spark

    return get_spark("test_generalized_spark", cores=4, shuffle_partitions=4)


def test_merge_split_blocking_completeness():
    """'abcd' -> 'xy' is two merges (ms-distance 2) but shares NO depth-2
    deletion key — the blocked join must not lose it."""
    from liblevenshtein_rust_spark.kernel.distances import MERGE_AND_SPLIT
    from liblevenshtein_rust_spark.operators import matching

    spark = _spark()
    probes = spark.createDataFrame([("ab",), ("abcd",)], "query string")
    terms = spark.createDataFrame([("c",), ("xy",), ("ab",)], "term string")
    out = matching.fuzzy_query(probes, terms, 2, MERGE_AND_SPLIT)
    got = sorted((r.query, r.term, r.distance) for r in out.collect())
    assert got == [
        ("ab", "ab", 0),
        ("ab", "c", 1),
        ("ab", "xy", 2),
        ("abcd", "ab", 2),
        ("abcd", "xy", 2),
    ]


def test_fuzzy_query_merge_split_crossval():
    """Blocked Spark query == brute-force scalar DP over the cross product."""
    from liblevenshtein_rust_spark.kernel.distances import MERGE_AND_SPLIT
    from liblevenshtein_rust_spark.operators import matching
    from liblevenshtein_rust_spark.sources.fixtures import random_dictionary

    spark = _spark()
    dic = random_dictionary(60, seed=7, min_len=1, max_len=8)
    prb = random_dictionary(10, seed=99, min_len=1, max_len=8)
    pdf = spark.createDataFrame([(p,) for p in prb], "query string")
    ddf = spark.createDataFrame([(t,) for t in dic], "term string")
    for n in (1, 2):
        got = sorted(
            (r.query, r.term, r.distance)
            for r in matching.fuzzy_query(pdf, ddf, n, MERGE_AND_SPLIT).collect()
        )
        exp = sorted(
            (q, t, generalized_distance(q, t, MERGE_SPLIT_WEIGHTS))
            for q in prb
            for t in dic
            if generalized_distance(q, t, MERGE_SPLIT_WEIGHTS) <= n
        )
        assert got == exp, f"mismatch at n={n}"


def test_fuzzy_query_weighted_crossval():
    """Weighted Spark query == brute-force weighted DP, for a policy that
    disables substitutions at budget 1 and for merge/split weights at 2."""
    from liblevenshtein_rust_spark.operators import matching
    from liblevenshtein_rust_spark.sources.fixtures import random_dictionary

    spark = _spark()
    dic = random_dictionary(60, seed=11, min_len=1, max_len=8)
    prb = random_dictionary(10, seed=42, min_len=1, max_len=8)
    pdf = spark.createDataFrame([(p,) for p in prb], "query string")
    ddf = spark.createDataFrame([(t,) for t in dic], "term string")
    for w, n in ((OperationWeights(substitute=2), 1), (MERGE_SPLIT_WEIGHTS, 2)):
        got = sorted(
            (r.query, r.term, r.distance)
            for r in matching.fuzzy_query_weighted(pdf, ddf, n, w).collect()
        )
        exp = sorted(
            (q, t, generalized_distance(q, t, w))
            for q in prb
            for t in dic
            if generalized_distance(q, t, w) <= n
        )
        assert got == exp
