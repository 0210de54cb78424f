"""Semantics tests for line-level dedup (CCNet-style boilerplate removal)
and incremental cluster maintenance (online DynamicDawg-analog updates) —
controlled inputs with analytically-known answers; the DuckDB oracle
additionally value-checks both on the sf0.01 corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.operators import clustering, dedup
from liblevenshtein_rust_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_line_dedup_incremental", cores=4, shuffle_partitions=4)


# ---------------------------------------------------------------------------
# tokens_to_lines
# ---------------------------------------------------------------------------


def test_tokens_to_lines_grouping_and_short_tail(spark):
    df = spark.createDataFrame(
        [("a b c d e f g",), ("x",)], "text string"
    ).select(dedup.tokens_to_lines(F.col("text"), 3).alias("lined"))
    got = [r["lined"] for r in df.collect()]
    assert got[0] == "a b c\nd e f\ng"
    assert got[1] == "x"


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def test_line_dedup_drops_boilerplate_preserves_order(spark):
    """The cookie banner (in 3 distinct docs >= threshold 3) vanishes from
    every doc; unique lines survive in original order; a fully-boilerplate
    doc survives the operator with n_kept = 0."""
    banner = "accept all cookies"
    docs = spark.createDataFrame(
        [
            (1, f"intro one\n{banner}\nbody one"),
            (2, f"{banner}\nbody two a\nbody two b"),
            (3, f"body three\n{banner}"),
            (4, banner),  # nothing but boilerplate
            (5, "standalone doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.line_dedup(docs, min_dup_docs=3).collect()
    }
    assert len(out) == 5
    assert out[1]["clean_text"] == "intro one\nbody one"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["clean_text"] == "body two a\nbody two b"
    assert out[3]["clean_text"] == "body three"
    assert (out[4]["n_kept"], out[4]["clean_text"]) == (0, "")
    assert out[4]["n_lines"] == 1
    assert out[5]["clean_text"] == "standalone doc"


def test_line_dedup_threshold_counts_distinct_docs_not_occurrences(spark):
    """A line repeated 5x WITHIN one doc is not boilerplate (1 distinct
    doc); the same line across 2 docs crosses a threshold of 2."""
    rep = "la la la"
    docs = spark.createDataFrame(
        [(1, "\n".join([rep] * 5)), (2, "other line")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.line_dedup(docs, min_dup_docs=2).collect()}
    assert out[1]["n_kept"] == 5  # intra-doc repeats kept

    docs2 = spark.createDataFrame(
        [(1, rep), (2, rep), (3, "unique")], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r for r in dedup.line_dedup(docs2, min_dup_docs=2).collect()}
    assert out2[1]["n_kept"] == 0 and out2[2]["n_kept"] == 0
    assert out2[3]["n_kept"] == 1


# ---------------------------------------------------------------------------
# incremental_cluster_update
# ---------------------------------------------------------------------------


def _assign(spark, rows):
    return spark.createDataFrame(rows, "node long, cluster long")


def test_incremental_merge_new_singleton_and_new_new(spark):
    """One arriving doc bridges two standing clusters (they merge to the
    global min label); an edgeless arrival becomes a singleton; a new-new
    pair forms its own fresh cluster."""
    standing = _assign(spark, [(1, 1), (2, 1), (5, 5), (6, 5), (9, 9)])
    new_nodes = spark.createDataFrame(
        [(100,), (101,), (102,), (103,)], "node long"
    )
    edges = spark.createDataFrame(
        [(100, 2), (100, 6), (102, 103)], "src long, dst long"
    )
    out = {
        r["node"]: r["cluster"]
        for r in clustering.incremental_cluster_update(
            standing, edges, new_nodes
        ).collect()
    }
    assert out == {
        1: 1, 2: 1, 5: 1, 6: 1,   # merged via the bridge
        9: 9,                      # untouched standing cluster
        100: 1,                    # the bridge joins the merged cluster
        101: 101,                  # edgeless arrival -> singleton
        102: 102, 103: 102,        # new-new pair -> fresh cluster
    }


def test_incremental_equals_full_recompute(spark):
    """Incremental (contract + delta CC) must be VALUE-IDENTICAL to
    re-running connected components on the union graph."""
    old_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (11, 12)], "src long, dst long"
    )
    old_nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7, 8, 11, 12, 20)], "node long"
    )
    standing = clustering.attach_singletons(
        clustering.connected_components(old_edges, "src", "dst"),
        old_nodes,
        "node",
    ).select("node", F.col("component").alias("cluster"))
    new_nodes = spark.createDataFrame([(i,) for i in (30, 31, 32)], "node long")
    delta = spark.createDataFrame(
        # 30 bridges the {1,2,3} and {7,8} clusters; 31-32 pair up
        [(30, 3), (30, 7), (31, 32)],
        "src long, dst long",
    )
    inc = {
        (r["node"], r["cluster"])
        for r in clustering.incremental_cluster_update(
            standing, delta, new_nodes
        ).collect()
    }
    full = {
        (r["node"], r["component"])
        for r in clustering.attach_singletons(
            clustering.connected_components(
                old_edges.unionByName(delta), "src", "dst"
            ),
            old_nodes.unionByName(new_nodes),
            "node",
        ).collect()
    }
    assert inc == full


def test_incremental_standing_side_never_shuffles(spark):
    """The standing assignment table must appear only under broadcast hash
    joins — no Exchange repartitions the big side (the whole point of the
    incremental path)."""
    standing = _assign(spark, [(1, 1), (2, 1), (5, 5)])
    new_nodes = spark.createDataFrame([(100,)], "node long")
    edges = spark.createDataFrame([(100, 2)], "src long, dst long")
    out = clustering.incremental_cluster_update(standing, edges, new_nodes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
