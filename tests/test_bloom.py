"""Broadcast Bloom prefilter: primitive properties (no false negatives,
sane false-positive rate) and value-exact parity of the composed
bloom-prefiltered decontamination operator with its exact twin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.functions import bloom
from liblevenshtein_rust_spark.operators import dedup
from liblevenshtein_rust_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_bloom", cores=4, shuffle_partitions=4)


def test_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(7)
    present = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    absent = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    absent = np.setdiff1d(absent, present)
    m, k = bloom.optimal_params(present.size, 0.01)
    words = bloom.build_bits(present, m, k)
    assert bool(bloom.test_bits(words, present, m, k).all())  # never FN
    fp = float(bloom.test_bits(words, absent, m, k).mean())
    # theoretical 1%; allow generous slack for hash family imperfection
    assert fp < 0.03, fp


def test_optimal_params_shape():
    m, k = bloom.optimal_params(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/key at 1%
    assert 1 <= k <= 16
    # degenerate inputs stay valid
    m0, k0 = bloom.optimal_params(0, 0.01)
    assert m0 >= 64 and k0 >= 1


def test_broadcast_bloom_column(spark):
    df = spark.createDataFrame([(f"key{i}",) for i in range(500)], "g string")
    bf = bloom.BroadcastBloom.from_column(df, "g", fpp=0.01)
    probe = spark.createDataFrame(
        [(f"key{i}",) for i in range(400, 600)]
        + [(f"nope{i}",) for i in range(2000)],
        "g string",
    )
    hits = probe.where(bf.might_contain(F.col("g")))
    got = {r["g"] for r in hits.collect()}
    want = {f"key{i}" for i in range(400, 500)}
    assert want <= got  # every true member survives the filter
    assert len(got - want) < 200  # FPs bounded (2% of 2100 probes << 200)
    bf.unpersist()


def test_bloom_contamination_parity(spark):
    """Bit-identical output vs the exact operator on a corpus with planted
    leaks, boilerplate (df-capped) shingles, and clean docs."""
    boiler = "terms of service apply to all"
    rows = []
    for i in range(60):
        body = f"unique text number {i} about topic {i % 7} item {i * 3}"
        rows.append((i, f"{body} {boiler}"))
    # planted leaks: eval docs 0,10,20 share their body with train twins
    for i in (0, 10, 20):
        rows.append((1000 + i, f"unique text number {i} about topic {i % 7} item {i * 3}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train = docs.where(F.col("doc_id") % 10 != 0)
    ev = docs.where(F.col("doc_id") % 10 == 0)

    def canon(df):
        return sorted(map(tuple, df.collect()))

    exact = dedup.contamination_overlap(train, ev, min_shared=2, max_df=10)
    fast = dedup.bloom_contamination_overlap(train, ev, min_shared=2, max_df=10)
    got, want = canon(fast), canon(exact)
    assert got == want and len(want) > 0
