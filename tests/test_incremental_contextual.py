"""Tests for DynamicDawg-analog incremental maintenance and the contextual
completion engine analog (reference parity: dynamic_dawg.rs insert/remove,
contextual/engine.rs visibility + draft/finalized)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.operators import contextual, incremental
from liblevenshtein_rust_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_inc_ctx", cores=4, shuffle_partitions=4)


def _d(spark, rows):
    return spark.createDataFrame(rows, "term string, value bigint")


def test_upsert_insert_and_replace(spark):
    d = _d(spark, [("cat", 1), ("dog", 2)])
    up = _d(spark, [("dog", 20), ("emu", 3)])
    out = {r["term"]: r["value"] for r in incremental.apply_upserts(d, up).collect()}
    assert out == {"cat": 1, "dog": 20, "emu": 3}


def test_delete(spark):
    d = _d(spark, [("cat", 1), ("dog", 2)])
    dele = spark.createDataFrame([("cat",)], "term string")
    out = {r["term"] for r in incremental.apply_deletes(d, dele).collect()}
    assert out == {"dog"}


def test_incremental_update_key_table_consistency(spark):
    """After any sequence of upserts/deletes, the incrementally-maintained
    key table must equal a from-scratch rebuild of the new dictionary."""
    d = _d(spark, [("cat", 1), ("dog", 2), ("bird", 3)])
    k = incremental.blocking_key_delta(d)
    up = _d(spark, [("dog", 20), ("emu", 4)])
    dele = spark.createDataFrame([("bird",)], "term string")
    nd, nk = incremental.incremental_update(d, k, upserts=up, deletes=dele)

    rebuilt = incremental.blocking_key_delta(nd)
    got = sorted((r["term"], r["key"]) for r in nk.collect())
    want = sorted((r["term"], r["key"]) for r in rebuilt.collect())
    assert got == want
    assert {r["term"]: r["value"] for r in nd.collect()} == {
        "cat": 1, "dog": 20, "emu": 4
    }


def test_incremental_does_not_shuffle_unchanged(spark):
    """Plan audit: the dictionary side of the maintenance join must be a
    broadcast anti-join (no shuffle of the unchanged majority)."""
    d = _d(spark, [(f"t{i}", i) for i in range(100)])
    up = _d(spark, [("t1", 999)])
    nd = incremental.apply_upserts(d, up)
    plan = nd._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# ---------------------------------------------------------------------------
# contextual
# ---------------------------------------------------------------------------

TREE = [(1, None), (2, 1), (3, 1), (4, 2)]


@pytest.fixture(scope="module")
def closure(spark):
    return contextual.ancestor_closure(spark, TREE)


def test_ancestor_closure(spark, closure):
    vis = {
        (r["context_id"], r["visible_context_id"]) for r in closure.collect()
    }
    assert vis == {(1, 1), (2, 2), (2, 1), (3, 3), (3, 1), (4, 4), (4, 2), (4, 1)}


def _terms(spark, rows):
    return spark.createDataFrame(rows, "term string, context_id int")


def test_visibility_and_draft_union(spark, closure):
    finalized = _terms(spark, [("apple", 1), ("apricot", 2), ("avocado", 3), ("ant", 4)])
    drafts = _terms(spark, [("appl", 2), ("axolotl", 3)])
    probes = spark.createDataFrame([("ap",)], "query string")

    out = contextual.complete(
        probes, finalized, drafts, closure, context_id=4, max_distance=0
    ).collect()
    got = {(r["term"], r["is_draft"]) for r in out}
    # context 4 sees {4, 2, 1}: apple(1), apricot(2), ant(4), draft appl(2);
    # avocado/axolotl live in invisible context 3; prefix d=0 keeps ap*-terms
    assert got == {("apple", False), ("apricot", False), ("appl", True)}

    fin_only = contextual.complete(
        probes, finalized, drafts, closure, 4, 0, include_drafts=False
    ).collect()
    assert {(r["term"], r["is_draft"]) for r in fin_only} == {
        ("apple", False), ("apricot", False)
    }


def test_finalize_moves_drafts(spark, closure):
    finalized = _terms(spark, [("apple", 1)])
    drafts = _terms(spark, [("appl", 2), ("banan", 2)])
    nd, nf = contextual.finalize(drafts, finalized, F.col("term").startswith("app"))
    assert {r["term"] for r in nd.collect()} == {"banan"}
    assert {r["term"] for r in nf.collect()} == {"apple", "appl"}
