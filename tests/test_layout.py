"""Partitioned corpus layout: deterministic buckets, partition-pruned reads
(the Iceberg-table stand-in's core property at 10^12 docs)."""

from __future__ import annotations

import os

import pytest

from liblevenshtein_rust_spark.session import get_spark
from liblevenshtein_rust_spark.sources import layout


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_layout", cores=4, shuffle_partitions=4)


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    docs = spark.range(0, 500).selectExpr(
        "id AS doc_id", "concat('text ', id) AS text"
    )
    path = str(tmp_path / "corpus")
    layout.write_partitioned_corpus(docs, path, n_buckets=8)

    # layout on disk: one Hive directory per bucket
    dirs = {d for d in os.listdir(path) if d.startswith("ingest_bucket=")}
    assert len(dirs) == 8

    # bucket assignment is deterministic and row-complete
    full = layout.read_corpus(spark, path)
    assert full.count() == 500
    two = layout.read_corpus(spark, path, buckets=[1, 5])
    per_bucket = dict(
        (r["ingest_bucket"], r["n"])
        for r in full.groupBy("ingest_bucket").count().withColumnRenamed("count", "n").collect()
    )
    assert two.count() == per_bucket[1] + per_bucket[5]

    # the prune is in the PLAN, not a post-scan filter: PartitionFilters
    # carries the bucket predicate and the scan lists only 2/8 directories
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ingest_bucket" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    from pyspark.sql import functions as F

    n_files_two = two.select(F.input_file_name()).distinct().count()
    n_files_all = full.select(F.input_file_name()).distinct().count()
    assert n_files_two < n_files_all
