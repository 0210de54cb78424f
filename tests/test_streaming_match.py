"""Streaming fuzzy match: probe file-drops against the prebuilt bucketed
index — batch parity per micro-batch, exactly-once resume over the probe
source, idempotent per-batch partitions."""

from __future__ import annotations

import tempfile

import pytest

from liblevenshtein_rust_spark.operators import matching
from liblevenshtein_rust_spark.session import get_spark
from liblevenshtein_rust_spark.sources import bucketed
from liblevenshtein_rust_spark.streaming import match as smatch

TERMS = ["banana", "bananas", "bandana", "spark", "sprak", "sparks",
         "query", "quary", "qwerty"]


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_streaming_match", cores=4, shuffle_partitions=4)


@pytest.fixture(scope="module")
def index(spark):
    d = spark.createDataFrame([(t,) for t in TERMS], "term string")
    with tempfile.TemporaryDirectory() as tmp:
        bucketed.write_bucketed_index(d, "test_stream_idx", n_buckets=2, path=tmp)
        yield "test_stream_idx"
        spark.sql("DROP TABLE IF EXISTS test_stream_idx")


def _matches(spark, out):
    return {
        (r["query"], r["term"], r["distance"])
        for r in spark.read.parquet(out).drop("batch_id").collect()
    }


def test_stream_matches_equal_batch_and_resume_exactly_once(spark, index, tmp_path):
    src = tmp_path / "probes"
    src.mkdir()
    (src / "p1.txt").write_text("banaan\nspark\n")
    out = str(tmp_path / "matches.parquet")
    ck = str(tmp_path / "ck")

    q = smatch.run_stream_fuzzy_match(
        smatch.stream_probes_from_files(spark, str(src)), index, out, ck
    )
    q.awaitTermination(120)

    d = spark.createDataFrame([(t,) for t in TERMS], "term string")
    p1 = spark.createDataFrame([("banaan",), ("spark",)], "query string")
    want1 = {
        (r["query"], r["term"], r["distance"])
        for r in matching.fuzzy_query(p1, d, 2).collect()
    }
    assert _matches(spark, out) == want1 and want1

    # drop a second probe file: the resumed query must process ONLY the new
    # probes (checkpointed offsets), appending their matches under a new
    # batch partition while batch-0 output stays untouched
    (src / "p2.txt").write_text("quarry\n")
    q2 = smatch.run_stream_fuzzy_match(
        smatch.stream_probes_from_files(spark, str(src)), index, out, ck
    )
    q2.awaitTermination(120)

    p2 = spark.createDataFrame([("quarry",)], "query string")
    want2 = {
        (r["query"], r["term"], r["distance"])
        for r in matching.fuzzy_query(p2, d, 2).collect()
    }
    assert _matches(spark, out) == want1 | want2
    assert want2  # the new probe really matched something
    batch_ids = {
        r["batch_id"]
        for r in spark.read.parquet(out).select("batch_id").distinct().collect()
    }
    assert len(batch_ids) == 2  # one partition per micro-batch
