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


# --- unrestricted multichar ops (MultiOp — OperationType::new without a
# restriction set, operation_type.rs:1-44) --------------------------------


def test_multiop_validation():
    from liblevenshtein_rust_spark.kernel.generalized import MultiOp

    with pytest.raises(ValueError):
        MultiOp(0, 0, 1.0).validate()
    with pytest.raises(ValueError):
        MultiOp(4, 1, 1.0).validate()  # tx > 3
    with pytest.raises(ValueError):
        MultiOp(1, 3, 1.0).validate()  # ty > 2
    with pytest.raises(ValueError):
        MultiOp(2, 1, 0.0).validate()  # zero weight must preserve length
    MultiOp(2, 2, 0.0).validate()
    MultiOp(3, 2, 1.5).validate()


def test_multiop_basic_semantics():
    from liblevenshtein_rust_spark.kernel.generalized import MultiOp

    # "any 3 term chars <-> any 1 query char at cost 1": 'x' matches 'abc'
    w = OperationWeights(extra_ops=(MultiOp(3, 1, 1.0),))
    got = batch_generalized_distance(
        ["x", "xd", "zzzz"], ["abc", "abcd", "zz"], 1.0, w
    )
    assert got.tolist() == [1, 1, -1]
    # integral weights keep the int32 contract
    assert got.dtype == np.int32
    # "delete any 2 consecutive term chars at cost 1" (term-only gap op)
    w2 = OperationWeights(extra_ops=(MultiOp(2, 0, 1.0),))
    got2 = batch_generalized_distance(["ad"], ["abcd"], 1.0, w2)
    assert got2.tolist() == [1]


def test_multiop_band_half_width():
    from liblevenshtein_rust_spark.kernel.generalized import MultiOp

    # drift 2 per 1.0 cost → half-width 2 at budget 1
    w = OperationWeights(extra_ops=(MultiOp(3, 1, 1.0),))
    assert w.band_half_width(1.0) == 2


def test_multiop_property_cross_validation():
    from liblevenshtein_rust_spark.kernel.generalized import MultiOp

    rng = random.Random(41)
    alpha = "abcf e"

    def rnd():
        return "".join(rng.choice(alpha) for _ in range(rng.randrange(9)))

    cases = [
        OperationWeights(extra_ops=(MultiOp(3, 1, 1.0),)),
        OperationWeights(extra_ops=(MultiOp(2, 0, 1.0),)),
        OperationWeights(extra_ops=(MultiOp(0, 2, 1.0),)),
        OperationWeights(extra_ops=(MultiOp(2, 2, 0.5),)),
        # mixed restricted + unrestricted, fractional budget
        OperationWeights(
            substitute=2,
            extra_ops=(MultiOp(3, 2, 1.5), RestrictedOp("ab", "c", 0.5)),
        ),
        # zero-weight length-preserving wildcard (free 1<->1 rewrite)
        OperationWeights(extra_ops=(MultiOp(1, 1, 0.0),)),
    ]
    for w in cases:
        for budget in (0.5, 1, 2):
            qs = [rnd() for _ in range(150)]
            ts = [rnd() for _ in range(150)]
            _cross_validate(w, budget, qs, ts)
