"""Partitioned corpus layout — the Iceberg-table stand-in, with pruning.

The north rule reads "Iceberg tables of interleaved text+media documents at
10^12-doc scale".  No Iceberg runtime ships in this sandbox, so this module
implements the *layout contract* that makes such reads scale, on plain
parquet with Hive-style partitions (what an Iceberg identity/bucket
partition spec compiles to on disk):

- ``ingest_bucket = pmod(xxhash64(doc_id), n_buckets)`` — a deterministic
  bucket column, so any doc_id-ranged maintenance job (backfill, resume,
  GDPR delete) touches only its buckets;
- writes via ``partitionBy("ingest_bucket")`` — one directory per bucket,
  statistics per file;
- reads through :func:`read_corpus` push bucket predicates into
  ``PartitionFilters`` — Spark plans a scan over ONLY the matching
  directories (verified by test_layout_pruning on the explain output, and
  recorded in PLANS.md §7).  At 10^12 docs this is the difference between
  scanning ~100 TB and scanning one bucket's ~100 GB.

Swapping in real Iceberg is the one-line change the docstring of
``sources/tables.py`` promises: ``spark.read.table("cat.db.documents")``
with a ``bucket(doc_id, N)`` partition spec — the pruning semantics below
are exactly Iceberg's, so every caller keeps working.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "ingest_bucket"


def with_ingest_bucket(docs: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Deterministic bucket assignment on doc_id (xxhash64 → pmod)."""
    return docs.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")
    )


def write_partitioned_corpus(
    docs: DataFrame, path: str, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Write the interleaved corpus Hive-partitioned by ingest bucket.

    ``n_buckets`` sizes maintenance granularity, not query parallelism —
    within a bucket Spark still splits by ``maxPartitionBytes``.  At 100 TB
    pick buckets so one bucket (~total/n) is a tractable maintenance unit.
    """
    with_ingest_bucket(docs, n_buckets).write.mode(mode).partitionBy(
        BUCKET_COL
    ).parquet(path)


def read_corpus(
    spark: SparkSession, path: str, buckets: list[int] | None = None
) -> DataFrame:
    """Read the corpus; a bucket list becomes a PartitionFilters prune —
    directories outside ``buckets`` are never listed into the scan."""
    df = spark.read.parquet(path)
    if buckets is not None:
        df = df.where(F.col(BUCKET_COL).isin([int(b) for b in buckets]))
    return df
