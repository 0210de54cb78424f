"""Contextual completion — hierarchical scopes + draft/finalized visibility.

Batch restatement of the reference's ``ContextualCompletionEngine``
(``/root/reference/src/contextual/engine.rs:114-1174``): terms live in a
*context tree* (``context_tree.rs``); a completion query in context C sees
terms of C and all its ancestors (visibility inheritance, ``engine.rs:393``),
in two publication states — drafts (in-flight typing buffers,
``complete_drafts`` at ``engine.rs:1117``) and finalized terms
(``complete_finalized`` at ``engine.rs:1174``); ``complete`` (``:1058``)
unions both.

Spark mapping:
- context tree → tiny dimension table (context_id, parent_id) whose
  ancestor *closure* is computed once driver-side (trees are O(100) rows)
  and broadcast — every completion is then one equi-join, no recursion;
- drafts vs finalized → a staging table and a published table; `UNION ALL`
  at query time, exactly the staging/published pattern of a warehouse;
- completion itself → the fuzzy/prefix query core (`operators/matching`)
  over the visibility-filtered dictionary: filter-before-join again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel.distances import STANDARD
from .matching import fuzzy_query


def ancestor_closure(spark: SparkSession, edges: list[tuple[int, int | None]]) -> DataFrame:
    """(context_id, visible_context_id) closure from (child, parent) rows.

    Driver-side transitive walk — context trees are tiny control metadata
    (the reference caps nesting in practice); the closure broadcasts.
    """
    parent = {c: p for c, p in edges}
    rows = []
    for c in parent:
        cur: int | None = c
        while cur is not None:
            rows.append((c, cur))
            cur = parent.get(cur)
    return F.broadcast(
        spark.createDataFrame(rows, "context_id int, visible_context_id int")
    )


def visible_terms(
    terms: DataFrame,
    closure: DataFrame,
    context_id: int,
    term_context_col: str = "context_id",
) -> DataFrame:
    """Terms visible from ``context_id``: its own + every ancestor's."""
    vis = closure.where(F.col("context_id") == context_id).select(
        F.col("visible_context_id").alias(term_context_col)
    )
    return terms.join(F.broadcast(vis), term_context_col)


def complete(
    probes: DataFrame,
    finalized: DataFrame,
    drafts: DataFrame,
    closure: DataFrame,
    context_id: int,
    max_distance: int = 1,
    variant: str = STANDARD,
    include_drafts: bool = True,
    include_finalized: bool = True,
) -> DataFrame:
    """The `complete` family: prefix-fuzzy completion over the visible
    dictionary; output (query, term, distance, is_draft, context_id).

    `complete_drafts` / `complete_finalized` are the include_* flags.
    """
    parts = []
    if include_finalized:
        parts.append(
            visible_terms(finalized, closure, context_id).withColumn(
                "is_draft", F.lit(False)
            )
        )
    if include_drafts:
        parts.append(
            visible_terms(drafts, closure, context_id).withColumn(
                "is_draft", F.lit(True)
            )
        )
    dict_all = parts[0]
    for p in parts[1:]:
        dict_all = dict_all.unionByName(p)
    matches = fuzzy_query(
        probes,
        dict_all.select("term").distinct(),
        max_distance,
        variant,
        prefix_mode=True,
    )
    return matches.join(dict_all, "term").select(
        "query", "term", "distance", "is_draft", "context_id"
    )


def finalize(
    drafts: DataFrame, finalized: DataFrame, draft_filter=None
) -> tuple[DataFrame, DataFrame]:
    """Move (filtered) drafts into the finalized table (``finalize`` at
    ``engine.rs:830``): returns (new_drafts, new_finalized).  With Iceberg
    both sides are one MERGE each; the pattern is append-only + anti-join."""
    moving = drafts if draft_filter is None else drafts.where(draft_filter)
    staying = drafts if draft_filter is None else drafts.where(~draft_filter)
    return staying, finalized.unionByName(moving)
