"""End-to-end resumable curation pipeline: every stage drops exactly the
planted offender, manifests carry lineage + metrics, and a rerun resumes
from checkpoints without recomputing (byte-identical output)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.pipeline import curation
from liblevenshtein_rust_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_curation", cores=4, shuffle_partitions=4)


GOOD = "the quick brown fox jumps over the lazy dog and then it runs far away home"
BOILER = "all rights reserved cookie banner"  # shared tail -> line dedup


def _corpus(spark):
    rows = []
    # 8 clean docs, each with the shared boilerplate tail (>=5 docs -> cut)
    for i in range(8):
        rows.append((i, f"{GOOD} unique marker number {i} extra {i * 7} " + BOILER))
    # near-dup pair: 100 survives (longest), 101 dropped
    rows.append((100, GOOD + " shared duplicate body with a longer tail here"))
    rows.append((101, GOOD + " shared duplicate body with a longer tail"))
    # gate drop: too short
    rows.append((200, "tiny doc"))
    # decontam drop: leaks the eval document verbatim
    rows.append((300, GOOD + " leaked evaluation answer about secret benchmark item"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _eval(spark):
    return spark.createDataFrame(
        [(9000, "leaked evaluation answer about secret benchmark item")],
        "doc_id long, text string",
    )


def test_curation_pipeline_e2e_and_resume(spark, tmp_path):
    run_dir = str(tmp_path / "run")
    cfg = curation.CurationConfig(
        line_min_docs=5,
        segment_lines=True,
        tokens_per_line=4,
        near_dup_threshold=0.5,
        decontam_min_shared=2,
        decontam_max_df=None,
    )
    out = curation.run_curation(spark, _corpus(spark), _eval(spark), run_dir, cfg)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}

    assert 200 not in rows  # gate: too short
    assert 300 not in rows  # decontam: eval leak
    assert 101 not in rows and 100 in rows  # near-dup: one survivor
    assert set(rows) == {0, 1, 2, 3, 4, 5, 6, 7, 100}
    # boilerplate lines are gone from every survivor, real content remains
    for i in range(8):
        assert "cookie banner" not in rows[i]
        assert f"marker number {i}" in rows[i]

    # manifests: every stage present with lineage + rows
    rs = curation.Runstate(spark, run_dir, curation.asdict(cfg))
    man = rs.manifests()
    assert set(man) == {"docs", "gate", "lines", "near_dup", "corpus"}
    assert man["docs"]["rows"] == 12
    assert man["gate"]["metrics"]["n_kept"] == 11
    assert man["near_dup"]["metrics"]["n_canonical"] == 10
    assert man["corpus"]["metrics"]["n_final"] == 9
    assert man["corpus"]["inputs"] == ["near_dup"]

    # resume: same config -> checkpoints reused (manifest timestamps frozen)
    ts_before = {s: m["ts"] for s, m in man.items()}
    out2 = curation.run_curation(spark, _corpus(spark), _eval(spark), run_dir, cfg)
    rows2 = {r["doc_id"]: r["text"] for r in out2.collect()}
    assert rows2 == rows
    man2 = curation.Runstate(spark, run_dir, curation.asdict(cfg)).manifests()
    assert {s: m["ts"] for s, m in man2.items()} == ts_before

    # config change invalidates: a different threshold reruns the stages
    cfg2 = curation.CurationConfig(
        line_min_docs=5,
        segment_lines=True,
        tokens_per_line=4,
        near_dup_threshold=0.9,
        decontam_min_shared=2,
        decontam_max_df=None,
    )
    curation.run_curation(spark, _corpus(spark), _eval(spark), run_dir, cfg2)
    man3 = curation.Runstate(spark, run_dir, curation.asdict(cfg2)).manifests()
    assert man3["corpus"]["ts"] != ts_before["corpus"]
