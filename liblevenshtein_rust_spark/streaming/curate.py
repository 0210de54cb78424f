"""Streaming curation gate — the ingest-path twin of the batch gate.

Because every rule in `text.curate_documents` is row-local (quality band,
language allowlist, repetition, PII — one codegen projection, no state),
the SAME operator applies unchanged to a Structured Streaming DataFrame:
no foreachBatch, no state store, no watermark.  That is the design point:
the gate that must touch all 100 TB in batch is also the gate that must
keep up with ingest, and a stateless projection does both for free.

Dropped rows are not discarded silently — the sink keeps every row with
its (keep, reasons) verdict so the reason ledger exists for the streamed
corpus too; downstream consumers filter `keep`.  Corpus-level filters
(near-dup, decontamination) stay in the batch/foreachBatch path
(`streaming/dedup.py` handles the ingest-time exact-dup horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import text


def curate_stream(
    stream_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    allowed_langs: tuple = ("en",),
    max_dup_frac: float = 0.2,
    max_pii: int = 5,
) -> DataFrame:
    """Streaming DataFrame → same rows + (keep, reasons, signals)."""
    return text.curate_documents(
        stream_docs,
        text_col=text_col,
        id_col=id_col,
        allowed_langs=allowed_langs,
        max_dup_frac=max_dup_frac,
        max_pii=max_pii,
        full_rows=True,
    )


def run_stream_curation(
    stream_docs: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **gate_kwargs,
):
    """Attach a parquet sink carrying the verdict ledger; returns the
    StreamingQuery.  Exactly-once via the streaming checkpoint (file-source
    offsets) + append-only parquet."""
    gated = curate_stream(stream_docs, **gate_kwargs)
    w = (
        gated.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
