"""Meta-blocking (CBS weight graph + WEP / CNP pruning) on hand-computed
graphs — the pieces the one-row oracle summary can't isolate: exact weight
values, the integer-exact mean threshold, per-node top-k tie-breaks, and
the hot-key guard."""

from __future__ import annotations

import pytest

from liblevenshtein_rust_spark.operators import blocking
from liblevenshtein_rust_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_meta_blocking", cores=4, shuffle_partitions=4)


def _keyed(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, key string")


KEYED = [
    (1, "a"), (1, "b"), (1, "c"),
    (2, "a"), (2, "b"),
    (3, "b"), (3, "c"),
    (4, "c"), (4, "z"),
]
# weight graph: (1,2)=2 (1,3)=2 (1,4)=1 (2,3)=1 (3,4)=1 — sum 7 over 5 pairs


def test_pair_block_weights(spark):
    w = blocking.pair_block_weights(_keyed(spark, KEYED), hot_threshold=None)
    got = {(r.left_id, r.right_id): r.w for r in w.collect()}
    assert got == {(1, 2): 2, (1, 3): 2, (1, 4): 1, (2, 3): 1, (3, 4): 1}


def test_pair_block_weights_dedupes_repeated_keys(spark):
    # a duplicated (doc, key) row must not inflate the shared-key count
    w = blocking.pair_block_weights(
        _keyed(spark, KEYED + [(1, "a"), (2, "a")]), hot_threshold=None
    )
    got = {(r.left_id, r.right_id): r.w for r in w.collect()}
    assert got[(1, 2)] == 2


def test_wep_mean_threshold(spark):
    # mean = 7/5 = 1.4 → only the two w=2 pairs survive (w*5 >= 7)
    w = blocking.pair_block_weights(_keyed(spark, KEYED), hot_threshold=None)
    kept = {
        (r.left_id, r.right_id) for r in blocking.meta_block_wep(w).collect()
    }
    assert kept == {(1, 2), (1, 3)}


def test_cnp_top1_union_semantics(spark):
    # k=1: node 1 keeps (1,2) [tie w=2 broken by nbr asc], node 3 keeps
    # (1,3), node 4 keeps (1,4) → union {(1,2),(1,3),(1,4)}
    w = blocking.pair_block_weights(_keyed(spark, KEYED), hot_threshold=None)
    kept = {
        (r.left_id, r.right_id)
        for r in blocking.meta_block_cnp(w, k=1).collect()
    }
    assert kept == {(1, 2), (1, 3), (1, 4)}


def test_cnp_keeps_weights_and_subset(spark):
    w = blocking.pair_block_weights(_keyed(spark, KEYED), hot_threshold=None)
    all_w = {(r.left_id, r.right_id): r.w for r in w.collect()}
    for r in blocking.meta_block_cnp(w, k=2).collect():
        assert all_w[(r.left_id, r.right_id)] == r.w


def test_hot_key_guard(spark):
    # threshold 2: keys b (docs 1,2,3) and c (1,3,4) are hot and dropped;
    # only key a {1,2} and z {4} remain → single pair (1,2) with w=1
    w = blocking.pair_block_weights(_keyed(spark, KEYED), hot_threshold=2)
    got = {(r.left_id, r.right_id): r.w for r in w.collect()}
    assert got == {(1, 2): 1}
