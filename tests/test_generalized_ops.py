"""Generalized restricted multichar operations — kernel cross-validation.

Reference spec: operation types t = ⟨t^x, t^y, t^w⟩ with optional
restriction sets (``/root/reference/src/transducer/operation_type.rs:1-90``,
``operation_set.rs:204-239``); the scalar DP `generalized_distance` is the
oracle for the banded batch kernel, mirroring how the reference
cross-validates its generalized automaton against DP
(``generalized/automaton.rs`` test suite).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from liblevenshtein_rust_spark.kernel.generalized import (
    OperationWeights,
    RestrictedOp,
    batch_generalized_distance,
    generalized_distance,
)

PHONETIC = OperationWeights(
    extra_ops=(
        RestrictedOp("ph", "f", 0.5),
        RestrictedOp("f", "ph", 0.5),
        RestrictedOp("ck", "k", 0.5),
        RestrictedOp("k", "ck", 0.5),
    )
)


def _cross_validate(w: OperationWeights, budget, qs, ts):
    got = batch_generalized_distance(qs, ts, budget, w)
    for q, t, g in zip(qs, ts, got):
        exact = generalized_distance(q, t, w)
        want = exact if exact <= budget + 1e-9 else -1
        assert abs(float(g) - float(want)) <= 1e-9, (q, t, float(g), want)


def test_phonetic_digraphs_golden():
    qs = ["philter", "fat", "kick", "sparck", "philters", "phat"]
    ts = ["filter", "phat", "kicck", "spark", "filter", "fat"]
    got = batch_generalized_distance(qs, ts, 1.0, PHONETIC)
    assert got.dtype == np.float64
    assert got.tolist() == [0.5, 0.5, 0.5, 0.5, -1.0, 0.5]
    # two digraph rewrites cost exactly 1.0
    two = batch_generalized_distance(["phack"], ["fak"], 1.0, PHONETIC)
    assert two.tolist() == [1.0]


def test_term_side_only_op_silent_e():
    # ⟨1, 0, 0.25⟩: dictionary 'e' consumed for 0.25 with no query char —
    # the reference's "Silent e" example (operation_type.rs:35-37)
    w = OperationWeights(extra_ops=(RestrictedOp("e", "", 0.25),))
    got = batch_generalized_distance(
        ["plan", "plan", ""], ["plane", "planee", "ee"], 1.0, w
    )
    assert got.tolist() == [0.25, 0.5, 0.5]


def test_query_side_only_op():
    w = OperationWeights(extra_ops=(RestrictedOp("", "h", 0.25),))
    got = batch_generalized_distance(["hhat", "hhhh"], ["at", ""], 1.0, w)
    assert got.tolist() == [0.5, 1.0]


def test_zero_weight_requires_length_preservation():
    with pytest.raises(ValueError):
        RestrictedOp("ph", "f", 0.0).validate()
    # length-preserving zero-weight is legal (case-fold-style pair)
    w = OperationWeights(extra_ops=(RestrictedOp("a", "b", 0.0),))
    got = batch_generalized_distance(["bbb"], ["aaa"], 0, w)
    assert got.tolist() == [0]


def test_integral_extra_ops_keep_int32():
    # term-side "fat" holds the 'f'; query-side "phat" holds the 'ph'
    w = OperationWeights(extra_ops=(RestrictedOp("f", "ph", 1),))
    got = batch_generalized_distance(["phat"], ["fat"], 2, w)
    assert got.dtype == np.int32
    assert got.tolist() == [1]


def test_property_cross_validation_random():
    rng = random.Random(13)
    alpha = "abcf hkpt e"

    def rnd():
        return "".join(rng.choice(alpha) for _ in range(rng.randrange(9)))

    cases = [
        PHONETIC,
        OperationWeights(extra_ops=(RestrictedOp("e", "", 0.25),)),
        OperationWeights(
            transpose=1,
            merge=1,
            split=1,
            extra_ops=(RestrictedOp("th", "t", 0.5), RestrictedOp("t", "th", 0.5)),
        ),
        OperationWeights(substitute=2, extra_ops=(RestrictedOp("cab", "k", 1.5),)),
    ]
    for w in cases:
        for budget in (0.5, 1, 2):
            qs = [rnd() for _ in range(200)]
            ts = [rnd() for _ in range(200)]
            _cross_validate(w, budget, qs, ts)


def test_band_half_width_from_drift():
    # digraph ops drift 1 char per 0.5 cost → half-width 2 at budget 1
    assert PHONETIC.band_half_width(1.0) == 2
    assert OperationWeights().band_half_width(2) == 2
    w = OperationWeights(extra_ops=(RestrictedOp("abc", "x", 0.5),))
    assert w.band_half_width(1.0) == 4
