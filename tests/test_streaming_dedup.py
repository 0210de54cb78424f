"""Streaming exact dedup at ingest: first arrival of a content digest
within the watermark horizon passes, later copies are dropped, state stays
bounded by the horizon; exactly-once resume over the file source."""

from __future__ import annotations

import json

import pytest

from liblevenshtein_rust_spark.session import get_spark
from liblevenshtein_rust_spark.streaming import dedup as sdedup


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_streaming_dedup", cores=4, shuffle_partitions=4)


def _write_batch(src, name, rows):
    (src / name).write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def _stream(spark, src):
    return (
        spark.readStream.schema(
            "doc_id LONG, text STRING, event_time TIMESTAMP"
        )
        .json(str(src))
    )


def _ids(spark, out):
    return sorted(r["doc_id"] for r in spark.read.parquet(out).collect())


def test_first_copy_passes_later_copies_drop(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(
        src,
        "b1.json",
        [
            {"doc_id": 1, "text": "Hello,  World!", "event_time": "2026-01-01T00:00:00"},
            {"doc_id": 2, "text": "hello world", "event_time": "2026-01-01T00:00:30"},
            {"doc_id": 3, "text": "something else", "event_time": "2026-01-01T00:01:00"},
        ],
    )
    out = str(tmp_path / "out.parquet")
    ck = str(tmp_path / "ck")
    q = sdedup.run_stream_dedup(_stream(spark, src), out, ck)
    q.awaitTermination(120)
    # doc 2 normalizes to doc 1's digest ("hello world") and is dropped
    assert _ids(spark, out) == [1, 3]


def test_resume_is_exactly_once_across_micro_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(
        src,
        "b1.json",
        [{"doc_id": 1, "text": "alpha beta", "event_time": "2026-01-01T00:00:00"}],
    )
    out = str(tmp_path / "out.parquet")
    ck = str(tmp_path / "ck")
    q = sdedup.run_stream_dedup(_stream(spark, src), out, ck)
    q.awaitTermination(120)

    # second run: one duplicate of doc 1 (inside the horizon) + one new doc;
    # the dedup STATE survives the restart via the checkpoint
    _write_batch(
        src,
        "b2.json",
        [
            {"doc_id": 10, "text": "ALPHA beta", "event_time": "2026-01-01T00:02:00"},
            {"doc_id": 11, "text": "gamma delta", "event_time": "2026-01-01T00:02:30"},
        ],
    )
    q = sdedup.run_stream_dedup(_stream(spark, src), out, ck)
    q.awaitTermination(120)
    assert _ids(spark, out) == [1, 11]


# ---------------------------------------------------------------------------
# streaming curation gate (stateless projection — streaming/curate.py)
# ---------------------------------------------------------------------------


def test_streaming_curation_gate(spark, tmp_path):
    """The batch gate applies unchanged to a stream; the sink keeps every
    row with its verdict, and verdicts match the batch operator exactly."""
    from liblevenshtein_rust_spark.operators import text as btext
    from liblevenshtein_rust_spark.streaming import curate as scurate

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog again today"},
        {"doc_id": 2, "text": "too short"},
        {"doc_id": 3, "text": "le chat est dans la maison et il est pour une des"},
    ]
    _write_batch(src, "b1.json", [dict(r, event_time="2026-01-01T00:00:00") for r in rows])
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, event_time TIMESTAMP")
        .json(str(src))
        .drop("event_time")
    )
    out = str(tmp_path / "gated.parquet")
    q = scurate.run_stream_curation(stream, out, str(tmp_path / "ck"))
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["keep"] and not got[2]["keep"] and not got[3]["keep"]
    # streamed verdicts == batch verdicts, column for column
    batch = {
        r["doc_id"]: r
        for r in btext.curate_documents(
            spark.createDataFrame(
                [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
            ),
            full_rows=True,
        ).collect()
    }
    for i in (1, 2, 3):
        assert got[i]["reasons"] == batch[i]["reasons"]
        assert got[i]["quality_score"] == batch[i]["quality_score"]
