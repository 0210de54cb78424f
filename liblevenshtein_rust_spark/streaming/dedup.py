"""Structured-Streaming exact dedup at ingest — drop arriving duplicates
before they ever land in the corpus.

Batch dedup (``operators/dedup.py``) answers "which standing docs are
copies"; at a 10^12-doc scale you ALSO dedup on the way in, or every
downstream stage pays for copies that were known-duplicate at arrival.
The Spark-native form is ``dropDuplicatesWithinWatermark`` keyed on the
normalized text digest:

    readStream ──> md5(normalize(text)) ──> withWatermark(event_time)
        ──> dropDuplicatesWithinWatermark(digest) ──> append sink

Semantics: the FIRST arrival of a digest within the watermark horizon
passes; later copies inside the horizon are dropped; a copy arriving after
the horizon expires passes again (and the BATCH dedup operators catch it —
the two layers are complementary, not redundant).  State stays bounded by
the horizon, which is what makes this runnable forever: an unwindowed
``dropDuplicates`` on an infinite stream grows state without bound.

Exactly-once: streaming checkpoint (offsets + dedup state) + append-only
file sink.  No semantics are invented beyond Spark's own — the reference
has no streams (SURVEY.md §2.7); the closest analog is DynamicDawg's
insert-if-absent (``/root/reference/src/dictionary/dynamic_dawg.rs:344``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import normalize_text


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Attach digest + watermark + within-watermark dedup to a streaming DF.

    Key on the 16-byte content digest, never the text: dedup state then
    stores (digest, timestamp) per distinct doc in the horizon — the same
    exchange-carries-digests rule as the batch operators.
    """
    return (
        docs.withColumn("text_hash", F.md5(normalize_text(F.col(text_col))))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def run_stream_dedup(
    stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    time_col: str = "event_time",
    watermark: str = "10 minutes",
    trigger_available_now: bool = True,
):
    """Wire the deduped stream to an append parquet sink; returns the
    StreamingQuery.  On Iceberg the sink is the same append with the
    catalog handling file commits."""
    deduped = dedup_stream(stream, text_col, time_col, watermark)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
