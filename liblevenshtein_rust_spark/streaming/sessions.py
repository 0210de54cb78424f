"""Stateful streaming typing sessions — ``applyInPandasWithState``.

The reference's ``ContextualCompletionEngine`` is an *interactive* surface:
a user types into a draft buffer (``insert_char`` ~4 µs,
``/root/reference/src/contextual/engine.rs:596``), drops cheap checkpoints
(an 8-byte snapshot of the buffer state, ``engine.rs:642``, README.md:597),
undoes back to them, and finalizes the draft into the published dictionary
(``engine.rs:713``).  The batch module (``operators/contextual.py``) covers
the *query* side; this module covers the *session* side at cluster scale:

    events stream (session_id, seq, op, arg)
        ──> groupBy(session_id).applyInPandasWithState(...)
        ──> (session_id, seq, kind, text) rows:
                kind='final'  one row per finalize (the published term)
                kind='draft'  the session's buffer after the micro-batch

Why a *stateful* operator and not ``foreachBatch``: the draft buffer must
survive across micro-batches (a user's half-typed word arrives over many
triggers) — exactly what Spark's versioned state store provides, including
crash recovery: restarting the query from the same checkpointLocation
restores every session's buffer (proved in tests by killing and resuming).

State per session mirrors the reference engine's per-buffer state:
``draft`` (the buffer), ``checkpoints`` (a stack of buffer *lengths* — the
reference checkpoint is likewise a fixed-size snapshot, not a copy of the
text), ``n_events``.  Ops, matching ``engine.rs``'s command set:

    insert <text>   append to the draft buffer
    backspace       drop the last character
    checkpoint      push len(draft) onto the checkpoint stack
    undo            truncate the draft to the last checkpoint (pop); no-op
                    on an empty stack, like the reference's Err(NoCheckpoint)
    finalize        emit the draft as a published term, reset buffer+stack

Ordering: events are applied in ``seq`` order *within* a micro-batch; the
source must deliver a session's events batch-monotonically (Kafka keyed by
session_id gives this; a file source gives it per-file).  At 10^12-doc
scale the operator shuffles only (session_id, seq, op, arg) rows once per
batch — state is partition-local, sized O(active sessions / executors).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("session_id", StringType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("arg", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("session_id", StringType()),
        StructField("seq", LongType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("draft", StringType()),
        StructField("checkpoints", ArrayType(IntegerType())),
        StructField("n_events", LongType()),
    ]
)


def apply_events(
    draft: str, checkpoints: list[int], events: Iterable[tuple[int, str, str]]
) -> tuple[str, list[int], list[tuple[int, str]]]:
    """Pure fold of (seq, op, arg) events over one session's buffer.

    Shared by the Spark stateful function and the tests' oracle — the
    operator's semantics live here, untied to any execution engine.
    Returns (draft, checkpoints, finalized) with finalized = [(seq, term)].
    """
    finalized: list[tuple[int, str]] = []
    for seq, op, arg in events:
        if op == "insert":
            draft += arg or ""
        elif op == "backspace":
            draft = draft[:-1]
        elif op == "checkpoint":
            checkpoints = checkpoints + [len(draft)]
        elif op == "undo":
            if checkpoints:
                draft = draft[: checkpoints[-1]]
                checkpoints = checkpoints[:-1]
        elif op == "finalize":
            if draft:
                finalized.append((seq, draft))
            draft, checkpoints = "", []
        else:
            raise ValueError(f"unknown session op: {op!r}")
    return draft, checkpoints, finalized


def _session_fn(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-session state transition for applyInPandasWithState."""
    (session_id,) = key
    if state.exists:
        draft, checkpoints, n_events = state.get
        checkpoints = list(checkpoints or [])
    else:
        draft, checkpoints, n_events = "", [], 0

    events: list[tuple[int, str, str]] = []
    for pdf in pdf_iter:
        events.extend(
            zip(pdf["seq"].astype("int64"), pdf["op"], pdf["arg"].fillna(""))
        )
    events.sort(key=lambda e: e[0])

    draft, checkpoints, finalized = apply_events(draft, checkpoints, events)
    n_events += len(events)
    state.update((draft, [int(c) for c in checkpoints], int(n_events)))

    last_seq = int(events[-1][0]) if events else 0
    rows: list[dict[str, Any]] = [
        {"session_id": session_id, "seq": int(s), "kind": "final", "text": t}
        for s, t in finalized
    ]
    rows.append(
        {"session_id": session_id, "seq": last_seq, "kind": "draft", "text": draft}
    )
    yield pd.DataFrame(rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def session_updates(events: DataFrame) -> DataFrame:
    """Attach the stateful operator to an event stream (or batch test frame).

    One shuffle on session_id per micro-batch; the state store carries each
    session's buffer between batches and across restarts.
    """
    return events.groupBy("session_id").applyInPandasWithState(
        _session_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def session_fold(events: DataFrame) -> DataFrame:
    """Batch fold of session events — identical semantics to the streaming
    operator (both call :func:`apply_events`); lets the DuckDB oracle check
    the fold on a deterministic event program while pytest covers the
    streaming execution (state store, restarts).  One shuffle on
    session_id; the fold is Arrow-batched, no per-row Python."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[dict[str, Any]] = []
        for sid, g in pdf.groupby("session_id"):
            evs = sorted(
                zip(g["seq"].astype("int64"), g["op"], g["arg"].fillna(""))
            )
            draft, _cks, fin = apply_events("", [], evs)
            last = int(g["seq"].max())
            out.extend(
                {"session_id": sid, "seq": int(s), "kind": "final", "text": t}
                for s, t in fin
            )
            out.append(
                {"session_id": sid, "seq": last, "kind": "draft", "text": draft}
            )
        return pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return events.groupBy("session_id").applyInPandas(fn, OUTPUT_SCHEMA)


def stream_session_events(spark, path: str, max_files_per_trigger: int | None = None):
    """JSON-lines event source; one file per micro-batch when
    ``max_files_per_trigger=1`` (used by tests to force multi-batch runs)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def run_session_stream(
    events: DataFrame, out_path: str, checkpoint_dir: str
):
    """Start the session-state query with an availableNow trigger.

    Restarting with the same ``checkpoint_dir`` resumes every session's
    draft buffer from the state store — the streaming analog of the batch
    pipeline's runstate resume.
    """
    return (
        session_updates(events)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
