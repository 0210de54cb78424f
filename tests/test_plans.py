"""Physical-plan audits — assert the plans are the ones we designed for
100 TB, not whatever happened to pass.

Checks (via executedPlan/explain text):
- parquet scans carry PushedFilters / pruned ReadSchema (Catalyst pushdown
  reaches the source);
- small probe sides broadcast (no shuffle of the dictionary for
  interactive queries);
- the blocking stage contains no Python UDF (JVM-only until the kernel);
- whole-stage codegen covers the key-generation projections.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.operators import blocking, matching
from liblevenshtein_rust_spark.session import get_spark
from liblevenshtein_rust_spark.sources import tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_plans", cores=4, shuffle_partitions=4)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    docs = tables.documents(spark, SF)
    q = docs.where(F.col("lang") == "en").select("doc_id")
    plan = _plan(q)
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:120]


def test_column_pruning(spark):
    docs = tables.documents(spark, SF)
    q = docs.select("doc_id")
    plan = _plan(q)
    rs = plan.split("ReadSchema:")[1][:160]
    assert "doc_id" in rs and "text" not in rs  # 2-col projection prunes text


def test_probe_broadcast_in_fuzzy_join(spark):
    probes = spark.createDataFrame([("spark",)], "query string")
    terms = tables.documents(spark, SF).select(
        F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).distinct()
    q = matching.candidate_pairs(probes, terms, 1)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan  # dictionary side never shuffles


def test_blocking_stage_is_jvm_only(spark):
    docs = tables.documents(spark, SF).withColumnRenamed("text", "t").selectExpr(
        "cast(doc_id as string) as doc_id",
        "array(struct('text' as kind, t as text, '' as media_ref, 0 as offset)) as spans",
    )
    toks = blocking.doc_tokens(docs)
    keyed = blocking.token_blocking_keys(toks)
    plan = _plan(keyed)
    # the entire blocking stage is JVM expressions: explode/generate +
    # hash aggregate, zero Python evaluation nodes
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan and "HashAggregate" in plan


def test_exact_contains_is_semi_join(spark):
    probes = spark.createDataFrame([("spark",)], "query string")
    terms = tables.documents(spark, SF).select(
        F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    q = probes.join(terms, F.col("query") == F.col("term"), "left_semi")
    plan = _plan(q)
    assert "LeftSemi" in plan


def test_length_prefilter_below_kernel(spark):
    """The |len(a)-len(b)|<=n guard must sit in the join/filter, evaluated
    before any Arrow exchange (no pairs cross into Python just to be
    length-rejected)."""
    probes = spark.createDataFrame([("spark",)], "query string")
    terms = spark.createDataFrame([("sprak",), ("a",)], "term string")
    q = matching.fuzzy_query(probes, terms, 1)
    opt = _optimized(q)
    kernel_pos = opt.find("_dist")
    len_pos = opt.find("abs((length(")
    assert len_pos != -1 and kernel_pos != -1
    # optimized plan is printed top-down: the length filter must be BELOW
    # (after in text) the kernel projection — i.e. evaluated earlier
    assert len_pos > kernel_pos


def test_vocab_self_join_consumes_one_cached_exchange(spark):
    """The ER vocab self-join's two sides are alias-projections of the same
    keyed table; as distinct plans they defeat ReuseExchange, so each side
    used to pay its own full exchange (measured 2 x 2.2 GB at 1.2M docs)
    plus the join's 4.4 GB read.  The fix repartitions by key ONCE before
    the persist — both join sides must be InMemoryTableScans with NO
    Exchange between cache and join, and the join must be the sort-free
    ShuffledHashJoin."""
    from liblevenshtein_rust_spark.pipeline import er
    from liblevenshtein_rust_spark.sources import fixtures

    docs = fixtures.generate_docs(spark, 300, seed=7, partitions=4)
    toks = blocking.rare_tokens(
        blocking.doc_tokens(docs, min_len=3), max_df=50
    )
    tm = er.vocab_token_matches(toks, er.ERConfig(max_df=50))
    tm.count()
    plan = _plan(tm)
    join_pos = plan.find("ShuffledHashJoin")
    assert join_pos != -1, "cold self-join should be a ShuffledHashJoin"
    # the join subtree: from the join line to the first InMemoryRelation
    # (the cached build plan reprint); no exchange may appear in between
    sub = plan[join_pos : plan.find("InMemoryRelation", join_pos)]
    assert "Exchange" not in sub
    assert sub.count("InMemoryTableScan") >= 1
    from liblevenshtein_rust_spark.session import release_pooled

    release_pooled()
