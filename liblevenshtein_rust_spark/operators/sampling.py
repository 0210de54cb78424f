"""Deterministic sampling operators for training-data curation.

A 100 TB pipeline can't use `DataFrame.sample` for corpus mixing: its
output depends on partitioning and Spark's internal RNG stream, so a rerun
(or a resume from checkpoint) draws a DIFFERENT sample.  Every operator
here decides membership from a content hash of the row's own key —
rerun-stable, resume-stable, partitioning-independent, and replayable in
ANSI SQL for the oracle.

Hash rule (shared with the dedup family's portability contract): the first
8 hex chars of md5(key) compared LEXICOGRAPHICALLY against a per-stratum
threshold string.  A uniform hash's hex prefix is uniform over the 16^8
space, so `prefix < hex(rate * 16^8)` keeps each row independently with
probability `rate` — a seeded Bernoulli sample without any RNG state.

Scale: membership is a pure per-row projection (one md5 + one string
compare, whole-stage codegen, zero shuffle).  Stratum rates arrive as a
literal CASE/map (broadcast-free); the scan prunes to (key, stratum) +
selected columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPACE = 16**8


def rate_threshold_hex(rate: float) -> str:
    """8-hex-digit lexicographic threshold for a keep-probability ``rate``.

    Clamped to [0, 16^8 - 1]: rate >= 1.0 keeps everything except the
    (2^-32-probability) all-f prefix — callers wanting exactly-all should
    skip sampling instead.
    """
    return format(max(0, min(int(rate * _SPACE), _SPACE - 1)), "08x")


def hash_keep(key_col, rate: float):
    """Boolean column: deterministic Bernoulli(rate) membership of a key."""
    return F.substring(F.md5(key_col.cast("string")), 1, 8) < F.lit(
        rate_threshold_hex(rate)
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample — the corpus-mixing
    primitive (e.g. keep 50% of web, 100% of books, 5% of logs).

    ``rates`` maps stratum value -> keep probability; strata absent from
    the map fall back to ``default_rate``.  Membership depends only on
    (id, stratum rate), so the same doc is kept or dropped identically on
    every rerun, at every parallelism, from any checkpoint.

    Returns the sampled rows (all input columns).
    """
    thr = None
    for value, rate in sorted(rates.items()):
        hexthr = F.lit(rate_threshold_hex(rate))
        thr = (
            F.when(F.col(strata_col) == value, hexthr)
            if thr is None
            else thr.when(F.col(strata_col) == value, hexthr)
        )
    thr = (
        thr.otherwise(F.lit(rate_threshold_hex(default_rate)))
        if thr is not None
        else F.lit(rate_threshold_hex(default_rate))
    )
    return docs.where(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < thr
    )


def sample_rates_sql(
    strata_col: str, rates: dict[str, float], default_rate: float, id_col: str
) -> str:
    """The WHERE predicate `stratified_sample` applies, as ANSI SQL (used
    by the DuckDB oracle; kept next to the Spark expression so the two can
    never drift)."""
    branches = "".join(
        f"WHEN '{v}' THEN '{rate_threshold_hex(r)}' "
        for v, r in sorted(rates.items())
    )
    return (
        f"substr(md5({id_col}::VARCHAR), 1, 8) < "
        f"(CASE {strata_col} {branches}ELSE '{rate_threshold_hex(default_rate)}' END)"
    )
