"""Stateful typing sessions via applyInPandasWithState: draft buffers
survive across micro-batches AND across query restarts (state-store
recovery), and the streamed fold equals the pure-Python oracle fold."""

from __future__ import annotations

import json
import os
import time

import pytest

from liblevenshtein_rust_spark.session import get_spark
from liblevenshtein_rust_spark.streaming import sessions

EVENTS_B1 = [
    # session A types "bana", checkpoints, keeps typing
    ("A", 1, "insert", "ba"),
    ("A", 2, "insert", "na"),
    ("A", 3, "checkpoint", None),
    ("A", 4, "insert", "nX"),
    # session B finalizes a whole word in the first batch
    ("B", 1, "insert", "spark"),
    ("B", 2, "finalize", None),
    ("B", 3, "insert", "qu"),
]
EVENTS_B2 = [
    # A undoes back to the checkpoint ("bana"), finishes the word
    ("A", 5, "undo", None),
    ("A", 6, "insert", "na"),
    ("A", 7, "finalize", None),
    ("B", 4, "backspace", None),
    ("B", 5, "insert", "uery"),
]
EVENTS_B3 = [
    # after a RESTART: B's buffer ("query") must have survived
    ("B", 6, "finalize", None),
    ("A", 8, "insert", "re"),
]


def _write_batch(src: str, name: str, events, mtime: float) -> None:
    path = os.path.join(src, name)
    with open(path, "w") as f:
        for sid, seq, op, arg in events:
            f.write(json.dumps(
                {"session_id": sid, "seq": seq, "op": op, "arg": arg}) + "\n")
    os.utime(path, (mtime, mtime))  # file-source batch order = mtime order


def _oracle(events_by_batch, session_id):
    draft, cks, finals = "", [], []
    for batch in events_by_batch:
        evs = sorted(
            [(s, op, a or "") for sid, s, op, a in batch if sid == session_id]
        )
        draft, cks, fin = sessions.apply_events(draft, cks, evs)
        finals.extend(fin)
    return draft, finals


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_sessions", cores=4, shuffle_partitions=4)


def test_apply_events_pure_semantics():
    draft, cks, fin = sessions.apply_events(
        "", [], [(1, "insert", "ab"), (2, "checkpoint", ""), (3, "insert", "c"),
                 (4, "undo", ""), (5, "insert", "e"), (6, "finalize", "")]
    )
    assert fin == [(6, "abe")] and draft == "" and cks == []
    # undo without checkpoint is a no-op (reference: Err(NoCheckpoint))
    draft, cks, _ = sessions.apply_events("xy", [], [(1, "undo", "")])
    assert draft == "xy"


def test_sessions_state_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    out = str(tmp_path / "out.parquet")
    ck = str(tmp_path / "ck")
    now = time.time()
    _write_batch(src, "b1.json", EVENTS_B1, now - 20)
    _write_batch(src, "b2.json", EVENTS_B2, now - 10)

    # run 1: two micro-batches (one file each) — state crosses batches
    q = sessions.run_session_stream(
        sessions.stream_session_events(spark, src, max_files_per_trigger=1),
        out, ck,
    )
    q.awaitTermination(120)

    rows = {(r.session_id, r.seq, r.kind, r.text)
            for r in spark.read.parquet(out).collect()}
    # A's finalize sees the undo-to-checkpoint from batch 1's state
    assert ("A", 7, "final", "banana") in rows
    assert ("B", 2, "final", "spark") in rows

    # run 2: NEW query object, same checkpoint — buffers recovered from the
    # state store ("query" was typed across batches 1-2, finalized here)
    _write_batch(src, "b3.json", EVENTS_B3, now)
    q2 = sessions.run_session_stream(
        sessions.stream_session_events(spark, src, max_files_per_trigger=1),
        out, ck,
    )
    q2.awaitTermination(120)

    rows = {(r.session_id, r.seq, r.kind, r.text)
            for r in spark.read.parquet(out).collect()}
    assert ("B", 6, "final", "query") in rows

    # every finalized term and the final drafts match the pure oracle fold
    batches = [EVENTS_B1, EVENTS_B2, EVENTS_B3]
    for sid in ("A", "B"):
        draft, finals = _oracle(batches, sid)
        assert {(sid, s, "final", t) for s, t in finals} <= rows
        last_draft = max(
            (r for r in rows if r[0] == sid and r[2] == "draft"),
            key=lambda r: r[1],
        )
        assert last_draft[3] == draft
