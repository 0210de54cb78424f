"""SparkSession factory tuned for the ER engine.

Local-mode defaults mirror what we would set on a 1000-executor cluster:
AQE on (runtime skew-join splitting + partition coalescing), Arrow enabled
for every pandas UDF batch, shuffle partitions sized to cores (locally) or
to ~2-3x total cores (cluster), session timezone pinned to UTC so results
are comparable with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "liblevenshtein_rust_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores=None`` → ``local[$SPARK_GRAFT_CPUS]`` (driver contract).
    ``shuffle_partitions`` defaults to 4x the core count (the standard
    2-4x rule): finer tasks bound per-task memory in wide self-joins (32
    core-wide partitions in one heap caused GC storms), and AQE coalesces
    whatever ends up small; every operator also takes explicit
    ``num_partitions`` overrides so the same code scales by config.
    """
    n = cores or default_parallelism()
    sp = shuffle_partitions or n * 4
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# ---------------------------------------------------------------------------
# pooled persist registry — caches that outlive their operator call
# ---------------------------------------------------------------------------
# Operators persist expensive reused intermediates (shingle tables, key
# tables, fingerprints).  A lazy DataFrame API can't unpersist them inside
# the operator (the returned plan still references them), so they register
# here and the *materializing* caller — bench between queries, the ER
# pipeline after each checkpointed stage, tests — calls release_pooled()
# once the consuming plan has been executed.  Unpersisting a plain persist()
# is always safe (Spark falls back to recompute); entries registered with
# ``checkpointed=True`` (localCheckpoint: lineage is truncated, recompute
# impossible) are only released explicitly for objects the caller knows are
# dead, which release_pooled() honors by releasing them too — callers must
# therefore only invoke it at a true materialization boundary.

_POOLED: list = []


def pooled_persist(df, eager: bool = False):
    """persist() + register for a later release_pooled()."""
    out = df.persist()
    if eager:
        out.count()
    _POOLED.append(out)
    return out


def register_pooled(df):
    """Register an already-persisted/checkpointed DataFrame for release."""
    _POOLED.append(df)
    return df


def release_pooled() -> int:
    """Unpersist every registered cache; returns how many were released.
    Call only after the plans consuming them have been materialized."""
    n = 0
    while _POOLED:
        df = _POOLED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
