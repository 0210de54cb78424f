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
