"""Entity-resolution quality evaluation: pairwise match metrics and
B-cubed cluster metrics.

The reference gates its fuzzy-matching quality on labeled corpora — recall
of planted misspellings through the automaton walk
(``/root/reference/tests/corpus_validation.rs:22-28``) — but stops at
recall.  A production ER pipeline needs the full evaluation pair the
record-linkage literature standardized: pairwise precision/recall/F1 over
predicted match pairs, and B-cubed precision/recall over the resolved
clusters (Bagga & Baldwin 1998; Menestrina et al., "Evaluating entity
resolution results", PVLDB 2010 — the standard cluster-level metric
because, unlike pairwise F1, it degrades gracefully on singleton-heavy
corpora and weights every record equally).

Both operators are deliberately aggregation-only:

* :func:`pair_metrics` never enumerates the O(n²) non-match space — TP is
  one join between two already-blocked pair tables, and FP/FN fall out by
  subtraction, so evaluating costs no more than the join the pipeline
  already ran.
* :func:`bcubed` needs NO pairwise expansion at all.  The per-record
  B-cubed scores depend only on the contingency counts |pred ∩ truth|,
  |pred|, |truth|, so three groupBy aggregations (each output one row per
  cluster, never one row per record pair) and two cluster-keyed joins
  compute the exact metric.  At 10^11 records the shuffled state is
  cluster-count-sized; AQE broadcasts the per-cluster size tables when
  they are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_pairs(pairs: DataFrame) -> DataFrame:
    """Order each pair (left < right) and dedupe — metric counts must not
    depend on the direction or multiplicity a generator happened to emit."""
    return pairs.select(
        F.least("left_id", "right_id").alias("left_id"),
        F.greatest("left_id", "right_id").alias("right_id"),
    ).distinct()


def pair_metrics(pred_pairs: DataFrame, truth_pairs: DataFrame) -> DataFrame:
    """Pairwise ER evaluation: ONE row
    ``(n_pred, n_truth, tp, fp, fn, precision, recall, f1)``.

    F1 is computed as ``2·TP / (n_pred + n_truth)`` — the algebraic identity
    ``2PR/(P+R) = 2TP/(2TP+FP+FN)`` — so it is one exact integer ratio
    rather than a composition of two rounded quotients.

    Scale: TP is a single equi-join between two pair tables that blocking
    already bounded; the three counts combine via 1-row cross joins.
    Nothing is ever keyed by a record pair that neither input contains.
    """
    pred = _canon_pairs(pred_pairs)
    truth = _canon_pairs(truth_pairs)
    # ONE pass over the (expensive, generated) pred side: a left join that
    # flags each predicted pair as true/false feeds both counts — computing
    # n_pred and tp as separate aggregates would rebuild the whole candidate
    # generation twice (verified in the physical plan).
    flagged = pred.join(
        truth.withColumn("_t", F.lit(1)), ["left_id", "right_id"], "left"
    )
    counts = flagged.agg(
        F.count("*").cast("bigint").alias("n_pred"),
        F.sum(F.coalesce(F.col("_t"), F.lit(0))).cast("bigint").alias("tp"),
    )
    n_truth = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    row = counts.crossJoin(n_truth)
    return row.select(
        "n_pred",
        "n_truth",
        "tp",
        (F.col("n_pred") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("n_truth") - F.col("tp")).cast("bigint").alias("fn"),
        F.round(F.col("tp") / F.col("n_pred"), 6).alias("precision"),
        F.round(F.col("tp") / F.col("n_truth"), 6).alias("recall"),
        F.round(
            F.lit(2) * F.col("tp") / (F.col("n_pred") + F.col("n_truth")), 6
        ).alias("f1"),
    )


def bcubed(
    assignments: DataFrame,
    pred_col: str = "pred",
    truth_col: str = "truth",
) -> DataFrame:
    """B-cubed cluster evaluation over ``(record, pred cluster, truth
    cluster)`` assignments: ONE row ``(n_docs, bcubed_precision,
    bcubed_recall, bcubed_f1)``.

    Per-record B³ precision is |pred∩truth|/|pred| (how much of the
    record's predicted cluster truly belongs with it), recall is
    |pred∩truth|/|truth|; the reported numbers are the record-averaged
    sums, computed from the (pred, truth) contingency table:

        precision = Σ_{p,t} n_pt² / n_p / N      recall = Σ n_pt² / n_t / N

    so the whole metric is three groupBys + two joins on cluster ids —
    no pairwise expansion, no per-record state on the driver.
    """
    a = assignments.select(
        F.col(pred_col).alias("p"), F.col(truth_col).alias("t")
    )
    pt = a.groupBy("p", "t").agg(F.count("*").alias("n_pt"))
    # derive the marginals FROM the contingency table — the (possibly
    # expensive) assignments input is scanned exactly once, and pt is
    # cluster-count-sized, so re-aggregating it twice is negligible
    pp = pt.groupBy("p").agg(F.sum("n_pt").alias("n_p"))
    tt = pt.groupBy("t").agg(F.sum("n_pt").alias("n_t"))
    joined = pt.join(pp, "p").join(tt, "t")
    sums = joined.agg(
        F.sum("n_pt").cast("bigint").alias("n_docs"),
        F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_p")).alias("_ps"),
        F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_t")).alias("_rs"),
    )
    return sums.select(
        "n_docs",
        F.round(F.col("_ps") / F.col("n_docs"), 6).alias("bcubed_precision"),
        F.round(F.col("_rs") / F.col("n_docs"), 6).alias("bcubed_recall"),
        F.round(
            F.lit(2) * F.col("_ps") * F.col("_rs")
            / (F.col("n_docs") * (F.col("_ps") + F.col("_rs"))),
            6,
        ).alias("bcubed_f1"),
    )
