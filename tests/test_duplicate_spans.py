"""Semantics tests for exact duplicated-substring span detection
(ExactSubstr-style, Lee et al. 2022) — controlled inputs with known spans;
the DuckDB oracle additionally value-checks on the sf0.01 corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.operators import dedup
from liblevenshtein_rust_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_duplicate_spans", cores=4, shuffle_partitions=4)


def _spans(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicate_spans(docs, **kw)
    return {
        (r["doc_id"], r["start_tok"], r["end_tok"]): r["n_windows"]
        for r in out.collect()
    }


def test_overlapping_hits_merge_to_one_span(spark):
    """Docs sharing the 4-token run "c d e f": two overlapping 3-token
    windows each, merged to one maximal span covering tokens 2..5 / 0..3."""
    got = _spans(
        spark,
        [(1, "a b c d e f g h"), (2, "c d e f q r s")],
        window_tokens=3,
        min_dup_docs=2,
    )
    assert got == {(1, 2, 5): 2, (2, 0, 3): 2}


def test_disjoint_shared_runs_stay_separate_spans(spark):
    """Shared prefix AND shared suffix with unique middles: two islands per
    doc (positions 0 and 6 are farther apart than the window width)."""
    got = _spans(
        spark,
        [(1, "x y z q1 q2 q3 a b c"), (2, "x y z r s t a b c")],
        window_tokens=3,
        min_dup_docs=2,
    )
    assert got == {
        (1, 0, 2): 1,
        (1, 6, 8): 1,
        (2, 0, 2): 1,
        (2, 6, 8): 1,
    }


def test_intra_doc_repetition_not_flagged(spark):
    """The cutoff counts DISTINCT docs: a phrase repeated within one doc is
    not corpus-level duplication; docs shorter than the window yield no
    windows at all (empty-array guard)."""
    got = _spans(
        spark,
        [(1, "p q r p q r p q r"), (2, "unrelated text here"), (3, "a b")],
        window_tokens=3,
        min_dup_docs=2,
    )
    assert got == {}


def test_normalization_feeds_windows(spark):
    """Punctuation/case differences collapse before windowing — "C, d E!"
    and "c d e" share a window."""
    got = _spans(
        spark,
        [(1, "x C, d E! y"), (2, "z c d e w")],
        window_tokens=3,
        min_dup_docs=2,
    )
    assert (1, 1, 3) in got and (2, 1, 3) in got


def test_cut_spans_removes_ranges_and_passes_untouched_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "keep all of this text")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 2, 5)], "doc_id long, start_tok int, end_tok int"
    )
    out = {r["doc_id"]: r for r in dedup.cut_spans(docs, spans).collect()}
    assert out[1]["clean_text"] == "a b g h"
    assert (out[1]["n_tokens"], out[1]["n_cut"]) == (8, 4)
    assert out[2]["clean_text"] == "keep all of this text"
    assert (out[2]["n_tokens"], out[2]["n_cut"]) == (5, 0)


def test_cut_spans_composes_with_detection(spark):
    """Detection then cut: the shared run vanishes from both docs, the
    unique remainders survive."""
    docs = spark.createDataFrame(
        [(1, "u1 u2 c d e f1 f2"), (2, "v1 v2 c d e w1 w2")],
        "doc_id long, text string",
    )
    spans = dedup.duplicate_spans(docs, window_tokens=3, min_dup_docs=2)
    out = {r["doc_id"]: r for r in dedup.cut_spans(docs, spans).collect()}
    assert out[1]["clean_text"] == "u1 u2 f1 f2"
    assert out[2]["clean_text"] == "v1 v2 w1 w2"
    assert out[1]["n_cut"] == 3 and out[2]["n_cut"] == 3


def test_contamination_spans_cross_corpus_only(spark):
    """Only train windows whose exact text appears in EVAL flag; train-train
    duplication is NOT contamination (that's duplicate_spans's job)."""
    train = spark.createDataFrame(
        [
            (1, "t1 t2 leaked eval phrase here t3 t4"),
            (2, "same train text repeated x y z"),
            (3, "same train text repeated q r s"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "intro leaked eval phrase here outro")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["start_tok"], r["end_tok"]): r["n_windows"]
        for r in dedup.contamination_spans(
            train, ev, window_tokens=3
        ).collect()
    }
    # "leaked eval phrase here" = tokens 2..5 of doc 1 (two 3-token windows)
    assert got == {(1, 2, 5): 2}
