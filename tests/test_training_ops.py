"""Semantics tests for the round-2 training-data-pipeline additions:
near-dup cluster resolution, contamination detection, deterministic
stratified sampling, and intra-doc repetition stats — controlled inputs
where the expected answer is known analytically (the DuckDB oracle
additionally value-checks each on the sf0.01 corpus)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.operators import dedup, sampling, text
from liblevenshtein_rust_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_training_ops", cores=4, shuffle_partitions=4)


# ---------------------------------------------------------------------------
# near-dup cluster resolution
# ---------------------------------------------------------------------------


def test_near_dup_clusters_chain_and_canonical(spark):
    """A~B and B~C chain into ONE cluster even when A!~C directly; the
    canonical survivor is the longest normalized text."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base + " extra tail words here"),   # longest -> canonical
            (2, base + " extra tail words"),        # near 1 and 3
            (3, base + " extra tail"),              # near 2, farther from 1
            (10, "completely different text about unrelated topics entirely"),
        ],
        "doc_id long, text string",
    )
    out = dedup.near_dup_clusters(docs, threshold=0.5).collect()
    by_id = {r["doc_id"]: r for r in out}
    # chain collapses to one cluster labeled by the min id
    assert by_id[1]["cluster"] == by_id[2]["cluster"] == by_id[3]["cluster"] == 1
    # singleton keeps its own id and is its own canonical
    assert by_id[10]["cluster"] == 10 and by_id[10]["is_canonical"] == 1
    # exactly one canonical per cluster; it is the longest member
    canon = [r["doc_id"] for r in out if r["cluster"] == 1 and r["is_canonical"]]
    assert canon == [1]


def test_near_dup_clusters_accepts_precomputed_pairs(spark):
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(5)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (3, 4)], "left_id long, right_id long"
    )
    out = dedup.near_dup_clusters(docs, pairs=pairs).collect()
    clusters = {r["doc_id"]: r["cluster"] for r in out}
    assert clusters == {0: 0, 1: 0, 2: 2, 3: 3, 4: 3}


# ---------------------------------------------------------------------------
# contamination detection
# ---------------------------------------------------------------------------


def test_contamination_finds_planted_leak(spark):
    leak = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [
            (1, "training document with " + leak + " inside the middle"),
            (2, "clean training document about something else entirely"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [
            (100, leak),
            (101, "an evaluation document with no overlap whatsoever"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.contamination_overlap(
        train, eval_docs, min_shared=2, max_df=None
    ).collect()
    hits = {(r["eval_id"], r["train_id"]): r["n_shared"] for r in rows}
    assert (100, 1) in hits and hits[(100, 1)] >= 5
    assert all(e != 101 for e, _ in hits)


def test_contamination_df_cap_drops_boilerplate(spark):
    boiler = "all rights reserved standard license header text"
    train = spark.createDataFrame(
        [(i, boiler) for i in range(20)], "doc_id long, text string"
    )
    eval_docs = spark.createDataFrame([(100, boiler)], "doc_id long, text string")
    # every shingle appears in 20 train docs; cap at 10 kills them all
    assert (
        dedup.contamination_overlap(train, eval_docs, min_shared=1, max_df=10).count()
        == 0
    )
    assert (
        dedup.contamination_overlap(train, eval_docs, min_shared=1, max_df=None).count()
        == 20
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_deterministic_and_stratified(spark):
    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 2), "x") for i in range(2000)],
        "doc_id long, source string, text string",
    )
    rates = {"s0": 0.5, "s1": 0.0}
    a = sampling.stratified_sample(docs, "source", rates, id_col="doc_id")
    b = sampling.stratified_sample(
        docs.repartition(7), "source", rates, id_col="doc_id"
    )
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    # identical under different partitioning (rerun/resume stability)
    assert ids_a == ids_b
    # stratum with rate 0 contributes nothing; rate .5 lands near 500/1000
    assert all(i % 2 == 0 for i in ids_a)
    assert 400 <= len(ids_a) <= 600
    # default_rate covers unmapped strata
    none_kept = sampling.stratified_sample(
        docs, "source", {}, default_rate=0.0
    ).count()
    assert none_kept == 0


def test_per_source_cap_exact_vs_naive_window(spark):
    """Skewed corpus: one hot source (1500 docs), one warm (40), one below
    the cap (3).  The two-phase plan must be row-identical to the naive
    global window (the oracle's formulation) and stable under
    repartitioning."""
    from pyspark.sql import Window

    rows = (
        [(i, "hot", "x") for i in range(1500)]
        + [(10_000 + i, "warm", "x") for i in range(40)]
        + [(20_000 + i, "tiny", "x") for i in range(3)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    k = 8
    got = sorted(
        (r["doc_id"], r["source"], r["src_rank"], r["n_src"])
        for r in sampling.per_source_cap(docs, k).collect()
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = (
        docs.withColumn("src_rank", F.row_number().over(w).cast("long"))
        .withColumn("n_src", F.count("*").over(Window.partitionBy("source")))
        .where(F.col("src_rank") <= k)
    )
    want = sorted(
        (r["doc_id"], r["source"], r["src_rank"], r["n_src"])
        for r in naive.select("doc_id", "source", "src_rank", "n_src").collect()
    )
    assert got == want
    # the under-cap source keeps all 3 rows; capped sources keep exactly k
    per_src = {}
    for _, s, _, _ in got:
        per_src[s] = per_src.get(s, 0) + 1
    assert per_src == {"hot": k, "warm": k, "tiny": 3}
    # partitioning-independent (rerun/resume stability)
    again = sorted(
        (r["doc_id"], r["source"], r["src_rank"], r["n_src"])
        for r in sampling.per_source_cap(docs.repartition(11), k).collect()
    )
    assert again == got
    # the hot source's window input is pre-filtered: far fewer rows than
    # the 1500-row domain reach the unsplittable sort
    pre_rows = (
        sampling.per_source_cap(docs, k)
        ._jdf.queryExecution()  # noqa: SLF001 — plan-shape assertion only
        .optimizedPlan()
        .toString()
    )
    assert "DIV" in pre_rows or "div" in pre_rows  # integer threshold filter


def test_gap_sessions_semantics(spark):
    """Controlled event log: user 1 has two sessions split by a >gap
    silence; user 2 has one single-event session.  Boundary case: a gap of
    EXACTLY ``gap_s`` stays in-session (strict > splits)."""
    import datetime as dt

    from liblevenshtein_rust_spark.operators import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1, session 1: 0s, +60s, +120s (exactly gap -> same session)
        (1, at(0), 10, "view"),
        (2, at(60), 10, "click"),
        (3, at(180), 10, "view"),  # 120s after prev == gap, stays
        # silence of 121s > gap -> session 2
        (4, at(301), 10, "buy"),
        # user 2: one event
        (5, at(50), 20, "view"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in sessionize.gap_sessions(events, gap_s=120).collect()
    }
    assert set(out) == {(10, 1), (10, 2), (20, 1)}
    s1 = out[(10, 1)]
    assert s1["n_events"] == 3 and s1["n_types"] == 2
    assert s1["duration_us"] == 180 * 1_000_000
    s2 = out[(10, 2)]
    assert s2["n_events"] == 1 and s2["duration_us"] == 0
    assert out[(20, 1)]["n_events"] == 1
    # partitioning-independent
    again = {
        (r["user_id"], r["session_idx"]): r["n_events"]
        for r in sessionize.gap_sessions(events.repartition(7), gap_s=120).collect()
    }
    assert again == {k: v["n_events"] for k, v in out.items()}


def test_rate_threshold_hex_bounds():
    assert sampling.rate_threshold_hex(0.0) == "00000000"
    assert sampling.rate_threshold_hex(1.0) == "ffffffff"
    assert sampling.rate_threshold_hex(0.5) == "80000000"
    assert sampling.rate_threshold_hex(2.0) == "ffffffff"  # clamped


# ---------------------------------------------------------------------------
# repetition stats
# ---------------------------------------------------------------------------


def test_repetition_stats_gopher_rule(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),        # 5 bigrams, 1 distinct
            (2, "one two three four five six"),           # all distinct
            (3, "tiny"),                                   # < n tokens
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.repetition_stats(docs, n=2).collect()}
    assert rows[1]["n_grams"] == 5 and rows[1]["n_distinct"] == 1
    assert rows[1]["dup_frac"] == 0.8 and rows[1]["keep"] == 0
    assert rows[2]["dup_frac"] == 0.0 and rows[2]["keep"] == 1
    assert rows[3]["n_grams"] == 0 and rows[3]["dup_frac"] == 0.0


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_counts_and_masks(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@corp.example.org now"),
            (2, "call 555-010-1234 or 555.010.9876 today"),
            (3, "server 10.0.0.7 and 192.168.001.255 up"),
            (4, "clean text with no identifiers at all"),
            (5, "a@b.io via 10.1.2.3 ring 555-010-0000"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.redact_pii(docs).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["clean_text"] == "mail <EMAIL> now"
    # dotted phone is consumed by the phone pass, never counted as an IP
    assert rows[2]["n_phone"] == 2 and rows[2]["n_ipv4"] == 0
    assert rows[2]["clean_text"] == "call <PHONE> or <PHONE> today"
    assert rows[3]["n_ipv4"] == 2
    assert rows[3]["clean_text"] == "server <IPV4> and <IPV4> up"
    assert rows[4]["n_email"] == rows[4]["n_phone"] == rows[4]["n_ipv4"] == 0
    assert rows[4]["clean_text"] == "clean text with no identifiers at all"
    assert (rows[5]["n_email"], rows[5]["n_phone"], rows[5]["n_ipv4"]) == (1, 1, 1)
    assert rows[5]["clean_text"] == "<EMAIL> via <IPV4> ring <PHONE>"


# ---------------------------------------------------------------------------
# golden-record survivorship merge
# ---------------------------------------------------------------------------


def test_golden_records_merges_cluster_evidence(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base + " extra tail words here"),   # canonical (longest)
            (2, base + " extra tail words"),
            (3, base + " extra tail"),
            (10, "completely different text about unrelated topics entirely"),
        ],
        "doc_id long, text string",
    )
    rows = {r["cluster"]: r for r in dedup.golden_records(docs, threshold=0.5).collect()}
    assert set(rows) == {1, 10}
    g = rows[1]
    assert g["canonical_id"] == 1 and g["n_members"] == 3
    assert g["member_ids"] == "1,2,3"
    # merged evidence: total_len sums members, canonical_len is the survivor's
    assert g["total_len"] > g["canonical_len"] > 0
    s = rows[10]
    assert s["canonical_id"] == 10 and s["n_members"] == 1
    assert s["total_len"] == s["canonical_len"]


def test_golden_records_accepts_precomputed_clusters(spark):
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(4)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 0), (2, 2, 1), (3, 3, 1)],
        "doc_id long, cluster long, is_canonical int",
    )
    rows = {r["cluster"]: r for r in
            dedup.golden_records(docs, clusters=clusters).collect()}
    assert rows[0]["n_members"] == 2 and rows[0]["canonical_id"] == 0
    assert rows[2]["n_members"] == 1 and rows[3]["n_members"] == 1


# ---------------------------------------------------------------------------
# blocking-scheme quality metrics
# ---------------------------------------------------------------------------


def test_blocking_quality_metrics(spark):
    from liblevenshtein_rust_spark.operators import blocking

    docs = spark.createDataFrame(
        [(i, "x") for i in range(5)], "doc_id long, text string"
    )
    # keys put (0,1) and (0,2) in blocks; truth is (0,1) and (3,4)
    keyed = spark.createDataFrame(
        [(0, "a"), (1, "a"), (0, "b"), (2, "b"), (3, "c")],
        "doc_id long, key string",
    )
    truth = spark.createDataFrame(
        [(0, 1), (3, 4)], "left_id long, right_id long"
    )
    row = blocking.blocking_quality(docs, truth, keyed).collect()[0]
    assert row["n_docs"] == 5 and row["n_candidates"] == 2
    assert row["n_truth"] == 2 and row["n_truth_in_candidates"] == 1
    # 10 possible pairs, 2 candidates -> RR = 0.8; 1 of 2 truths found
    assert abs(row["reduction_ratio"] - 0.8) < 1e-9
    assert abs(row["pairs_completeness"] - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# ER evaluation metrics
# ---------------------------------------------------------------------------


def test_pair_metrics_counts_and_scores(spark):
    from liblevenshtein_rust_spark.operators import evaluation

    # (2,1) is a reversed duplicate of (1,2): canonicalization must dedupe it
    pred = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (4, 5)], "left_id long, right_id long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (5, 4), (6, 7)], "left_id long, right_id long"
    )
    row = evaluation.pair_metrics(pred, truth).collect()[0]
    assert (row["n_pred"], row["n_truth"], row["tp"]) == (3, 3, 2)
    assert (row["fp"], row["fn"]) == (1, 1)
    assert abs(row["precision"] - 2 / 3) < 1e-6
    assert abs(row["recall"] - 2 / 3) < 1e-6
    assert abs(row["f1"] - 2 / 3) < 1e-6


def test_bcubed_textbook_example(spark):
    from liblevenshtein_rust_spark.operators import evaluation

    # truth {1,2},{3},{4,5}; pred {1,2,3},{4},{5}
    assign = spark.createDataFrame(
        [(1, "A", "X"), (2, "A", "X"), (3, "A", "Y"),
         (4, "B", "Z"), (5, "C", "Z")],
        "doc_id long, pred string, truth string",
    )
    row = evaluation.bcubed(assign).collect()[0]
    assert row["n_docs"] == 5
    assert abs(row["bcubed_precision"] - 11 / 15) < 1e-6   # 0.733333
    assert abs(row["bcubed_recall"] - 0.8) < 1e-6
    assert abs(row["bcubed_f1"] - 88 / 115) < 1e-6          # 0.765217


def test_bcubed_perfect_clustering_is_all_ones(spark):
    from liblevenshtein_rust_spark.operators import evaluation

    assign = spark.createDataFrame(
        [(i, i // 2, i // 2) for i in range(10)],
        "doc_id long, pred long, truth long",
    )
    row = evaluation.bcubed(assign).collect()[0]
    assert row["bcubed_precision"] == 1.0
    assert row["bcubed_recall"] == 1.0 and row["bcubed_f1"] == 1.0


# ---------------------------------------------------------------------------
# training-window chunking + TF-IDF keywords
# ---------------------------------------------------------------------------


def test_chunk_documents_windows(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "x y"), (4, "   ")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in text.chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    }
    # stride 3: starts 0, 3, 6; final window short
    assert out == {
        (1, 0): (4, "a b c d"),
        (1, 1): (4, "d e f g"),
        (1, 2): (1, "g"),
        (3, 0): (2, "x y"),
    }
    with pytest.raises(ValueError):
        text.chunk_documents(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        text.chunk_documents(docs, chunk_tokens=0)


def test_chunk_documents_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        text.chunk_documents(docs, chunk_tokens=2, overlap=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure projection + explode


def test_tfidf_keywords_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),   # apple tf=2 rare-ish
            (2, "banana banana banana"), # banana common across docs
            (3, "apple banana cherry"),
        ],
        "doc_id long, text string",
    )
    import math

    rows = text.tfidf_keywords(docs, top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple (tf=2, df=2) beats banana (tf=1, df=3)
    top1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["token"] for r in top1] == ["apple", "banana"]
    a = next(r for r in top1 if r["token"] == "apple")
    assert (a["tf"], a["df"]) == (2, 2)
    assert abs(a["score"] - 2 * (math.log(4 / 3) + 1)) < 1e-9
    # doc 3: cherry df=1 is the rarest -> rank 1
    assert sorted(by_doc[3], key=lambda r: r["rank"])[0]["token"] == "cherry"
    # every doc returns at most top_k rows
    assert all(len(v) <= 2 for v in by_doc.values())


# ---------------------------------------------------------------------------
# unigram self-perplexity (CCNet-style LM quality score)
# ---------------------------------------------------------------------------


def test_unigram_perplexity_closed_form(spark):
    """Hand-computed corpus: tokens {a:3, b:2, c:1}, N=6.
    doc1 = "a a b": ce = ln6 - (2*ln3 + ln2)/3; doc2 = "a b c": ce = ln6 -
    (ln3 + ln2 + ln1)/3.  The rarer-token doc scores strictly higher."""
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in text.unigram_perplexity(docs).collect()}
    ce1 = math.log(6) - (2 * math.log(3) + math.log(2)) / 3
    ce2 = math.log(6) - (math.log(3) + math.log(2) + 0.0) / 3
    assert abs(out[1]["cross_entropy"] - round(ce1, 6)) < 1e-9
    assert abs(out[2]["cross_entropy"] - round(ce2, 6)) < 1e-9
    assert out[2]["cross_entropy"] > out[1]["cross_entropy"]
    assert abs(out[1]["perplexity"] - round(math.exp(ce1), 6)) < 1e-6
    assert (out[1]["n_tokens"], out[2]["n_tokens"]) == (3, 3)


def test_unigram_perplexity_flags_divergent_doc(spark):
    """A gibberish doc full of hapaxes scores the corpus-maximum
    cross-entropy ln(N) (every token count = 1)."""
    import math

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat the end"),
         (2, "the cat sat on the mat again ok"),
         (3, "zxq qqv jjw kkp")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.unigram_perplexity(docs).collect()}
    n_total = 8 + 8 + 4
    assert abs(out[3]["cross_entropy"] - round(math.log(n_total), 6)) < 1e-9
    assert out[3]["cross_entropy"] > out[1]["cross_entropy"]
    assert out[3]["cross_entropy"] > out[2]["cross_entropy"]


# ---------------------------------------------------------------------------
# composite curation gate
# ---------------------------------------------------------------------------


def test_curate_documents_rules_fire(spark):
    """Each rule fires on a purpose-built document; a clean English doc
    passes all seven; reasons are ordered and comma-joined."""
    good = "the quick brown fox jumps over the lazy dog and it runs away"
    rows = [
        (1, good),
        (2, "tiny doc now"),  # < 5 tokens -> length (plus stopword band misses)
        (3, "le chat est dans la maison et il est pour une des"),  # fr -> lang
        (4, good + " " + ("repeat token " * 30).strip()),  # repetition
        (5, good + " a@b.com c@d.org e@f.net g@h.io i@j.co k@l.us"),  # pii > 5
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text.curate_documents(
            docs, allowed_langs=("en",), max_pii=5
        ).collect()
    }
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert not out[2]["keep"] and "length" in out[2]["reasons"].split(",")
    # the English-stopword band legitimately also misses on a French doc
    assert not out[3]["keep"] and "lang" in out[3]["reasons"].split(",")
    assert not out[4]["keep"] and "repetition" in out[4]["reasons"].split(",")
    assert not out[5]["keep"] and "pii" in out[5]["reasons"].split(",")
    assert out[5]["pii_hits"] == 6
    # reason order is the declared rule order
    assert out[2]["reasons"].split(",")[0] == "length"


def test_semantic_dedup_planted_duplicates(spark):
    """Three identical vectors collapse to one kept survivor (the
    best-ranked); orthogonal vectors all survive."""
    import math

    from liblevenshtein_rust_spark.operators import similarity

    dim = 8
    def unit(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v
    rows = [(0, unit(0)), (1, unit(0)), (2, unit(0))]       # identical trio
    rows += [(10 + i, unit(1 + i)) for i in range(5)]       # 5 orthogonal singles
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup(emb, n_cells=1, threshold=0.99)
    got = {r["vec_id"]: r for r in out.collect()}
    trio_kept = [i for i in (0, 1, 2) if got[i]["keep"]]
    assert len(trio_kept) == 1  # exactly one survivor of the identical trio
    assert all(got[10 + i]["keep"] for i in range(5))
    # every vector appears exactly once with a rank inside its cell
    assert len(got) == 8


def test_quantize_embeddings_roundtrip_bound(spark):
    """Dequantized values are within scale/2 of the originals; all-zero
    vectors quantize to zeros with scale 0; qvec stays in [-127, 127]."""
    from liblevenshtein_rust_spark.operators import similarity

    rows = [
        (1, [0.5, -1.0, 0.25, 0.125]),
        (2, [100.0, -50.0, 0.0, 1.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in similarity.quantize_embeddings(emb).collect()}
    for vid, vec in rows:
        q, s = got[vid]["qvec"], got[vid]["scale"]
        assert all(-127 <= x <= 127 for x in q)
        if all(v == 0 for v in vec):
            assert s == 0 and all(x == 0 for x in q)
            continue
        s_true = max(abs(v) for v in vec) / 127.0
        assert abs(s - s_true) < 1e-9  # output scale = rounded display copy
        for orig, qi in zip(vec, q):
            assert abs(qi * s_true - orig) <= s_true / 2 + 1e-9


def test_hash_split_partition_and_determinism(spark):
    """Every row gets exactly one label; proportions track the weights;
    assignment is content-hash-stable (identical across calls and
    independent of other rows being present)."""
    docs = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    out = sampling.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 4000
    from collections import Counter

    c = Counter(rows.values())
    assert set(c) == {"train", "val", "test"}
    assert abs(c["train"] / 4000 - 0.8) < 0.03
    assert abs(c["val"] / 4000 - 0.1) < 0.02
    assert abs(c["test"] / 4000 - 0.1) < 0.02
    # append-stability: the same ids keep their labels inside a superset
    sup = sampling.hash_split(
        spark.range(0, 8000).withColumnRenamed("id", "doc_id"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    sup_rows = {r["doc_id"]: r["split"] for r in sup.collect()}
    assert all(sup_rows[i] == rows[i] for i in rows)


def test_hash_split_validation(spark):
    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        sampling.hash_split(docs, {})
    with pytest.raises(ValueError):
        sampling.hash_split(docs, {"a": 0.0})
    # single label: everything lands there, no when-chain needed
    assert {
        r["split"] for r in sampling.hash_split(docs, {"all": 2.0}).collect()
    } == {"all"}


def test_modality_stats(spark):
    from liblevenshtein_rust_spark.operators import multimodal

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        ("a", [span("text", "hello", "", 0), span("media", "", "m1", 1),
               span("text", "worlds", "", 2)]),
        ("b", [span("text", "only", "", 0)]),
        ("c", [span("media", "", "m2", 0), span("media", "", "m3", 1)]),
    ]
    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    docs = spark.createDataFrame(rows, schema)
    got = {r["doc_id"]: r for r in multimodal.modality_stats(docs).collect()}
    a, b, c = got["a"], got["b"], got["c"]
    assert (a["n_spans"], a["n_text"], a["n_media"]) == (3, 2, 1)
    assert abs(a["media_frac"] - round(1 / 3, 6)) < 1e-9
    assert a["first_media_offset"] == 1 and a["text_chars"] == 11
    assert (b["n_media"], b["first_media_offset"], b["text_chars"]) == (0, None, 4)
    assert (c["n_text"], c["media_frac"], c["text_chars"]) == (0, 1.0, 0)


def test_canonical_url_rules(spark):
    """Each canonicalization rule on a controlled pair set: fragment,
    scheme/host case, default ports (non-default kept), tracking params
    (surviving order preserved), trailing slash, root path."""
    cases = [
        (1, "https://Ex.COM/a#sec", "https://ex.com/a"),
        (2, "HTTP://ex.com:80/a", "http://ex.com/a"),
        (3, "https://ex.com:443/a", "https://ex.com/a"),
        (4, "https://ex.com:8443/a", "https://ex.com:8443/a"),
        (5, "https://ex.com/a?utm_source=x&b=2&fbclid=z&a=1",
            "https://ex.com/a?b=2&a=1"),   # survivor order preserved
        (6, "https://ex.com/a/", "https://ex.com/a"),
        (7, "https://ex.com/", "https://ex.com/"),
        (8, "https://ex.com", "https://ex.com/"),
        (9, "https://ex.com/a?utm_source=x", "https://ex.com/a"),
        # bare "ref" is FUNCTIONAL (branch selectors etc.) — kept
        (10, "https://ex.com/blob/f?ref=main", "https://ex.com/blob/f?ref=main"),
        (11, "https://ex.com/a?ref_src=twsrc", "https://ex.com/a"),
        # non-absolute inputs pass through unchanged (never merged)
        (12, "example.com/a", "example.com/a"),
        (13, "mailto:x@y.example", "mailto:x@y.example"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "url_id long, url string"
    )
    got = {
        r["url_id"]: r["canon"]
        for r in df.select(
            "url_id", text.canonical_url(F.col("url")).alias("canon")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_groups(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://ex.com/p"),
            (2, "https://EX.com/p/"),
            (3, "https://ex.com/p?utm_source=a"),
            (4, "https://ex.com/p?id=7"),       # real param: separate group
        ],
        "url_id long, url string",
    )
    got = {r["canon_url"]: (r["n_urls"], r["min_id"])
           for r in text.url_dedup(urls).collect()}
    assert got == {
        "https://ex.com/p": (3, 1),
        "https://ex.com/p?id=7": (1, 4),
    }


def test_canonical_url_idempotent(spark):
    """canon(canon(x)) == canon(x): the canonical form must be a fixed
    point, or re-running a dedup pass over already-canonicalized data
    would split/merge groups differently."""
    urls = [
        "https://Ex.COM:443/a/b/?utm_source=x&q=1#frag",
        "HTTP://HOST.example:80",
        "https://ex.com/a?fbclid=1",
        "example.com/bare",
        "https://ex.com/a?ref=main&utm_x=1",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "url_id long, url string")
    once = df.select("url_id", text.canonical_url(F.col("url")).alias("c1"))
    twice = once.select("url_id", F.col("c1"),
                        text.canonical_url(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


def test_url_domain_and_domain_stats(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://www.shop.example.com/a"),
            (2, "https://cdn.example.com:8443/b"),
            (3, "http://example.com/c"),
            (4, "other.org/bare"),             # schemeless host
            (5, "no host here"),               # no extractable host -> null
            (6, "https://localhost/x"),        # single label kept as-is
        ],
        "url_id long, url string",
    )
    got = {r["url_id"]: r["d"] for r in urls.select(
        "url_id", text.url_domain(F.col("url")).alias("d")).collect()}
    assert got == {1: "example.com", 2: "example.com", 3: "example.com",
                   4: "other.org", 5: None, 6: "localhost"}
    stats = {r["domain"]: (r["n_urls"], r["n_canonical"])
             for r in text.domain_stats(urls).collect()}
    # three example.com rows with three DISTINCT canonical forms
    assert stats["example.com"] == (3, 3)
    assert stats["other.org"] == (1, 1)
    # duplication factor: cosmetic variants share one canonical
    dup = spark.createDataFrame(
        [(1, "https://ex.com/p"), (2, "https://EX.com/p/"),
         (3, "https://ex.com/p?utm_source=x")],
        "url_id long, url string",
    )
    s2 = text.domain_stats(dup).collect()[0]
    assert (s2["domain"], s2["n_urls"], s2["n_canonical"]) == ("ex.com", 3, 1)


def test_registrable_domain_psl_rule_classes(spark):
    """The PSL path must handle every rule class the snapshot carries:
    ccSLD normal rules (.co.uk stays per-site, where the two-label
    heuristic over-groups), wildcard (*.ck), exception (!www.ck), the
    default rule (unknown TLD -> 2 labels), and the host-is-a-public-
    suffix NULL case."""
    from liblevenshtein_rust_spark.operators import text as T

    psl = T.load_psl(
        spark,
        str(Path(__file__).resolve().parent.parent / "data/psl_snapshot.dat"),
    )
    urls = spark.createDataFrame(
        [
            (1, "https://shop.example.co.uk/p/1"),
            (2, "https://sub.deep.example.com/a"),
            (3, "https://foo.xyzzy.ck/w"),   # wildcard *.ck
            (4, "http://www.ck/x"),          # exception !www.ck
            (5, "https://nomatch.zz/y"),     # default rule
            (6, "https://uk/"),              # host IS a public suffix
        ],
        "url_id long, url string",
    )
    got = {
        r["url_id"]: r["domain"]
        for r in T.registrable_domain_psl(urls, psl).collect()
    }
    assert got == {
        1: "example.co.uk",
        2: "example.com",
        3: "foo.xyzzy.ck",
        4: "www.ck",
        5: "nomatch.zz",
        6: None,
    }
    # the heuristic fallback over-groups case 1 — documented difference
    h = urls.where(F.col("url_id") == 1).select(
        T.url_domain(F.col("url")).alias("d")
    ).first()
    assert h["d"] == "co.uk"


def test_psl_full_snapshot_kawasaki(spark):
    """Round 5: the committed snapshot is the FULL published list (Debian
    `publicsuffix` package copy of publicsuffix.org's file) — assert the
    rule-census floor (9,506 rules / 107 wildcards / 8 exceptions at the
    packaged version; floors so a refreshed snapshot can only grow) and
    drive a second exception-rule family end-to-end: *.kawasaki.jp makes
    any direct label a public suffix, !city.kawasaki.jp carves city back
    out."""
    from liblevenshtein_rust_spark.operators import text as T

    psl = T.load_psl(
        spark,
        str(Path(__file__).resolve().parent.parent / "data/psl_snapshot.dat"),
    )
    rows = psl.collect()
    assert len(rows) >= 9000
    assert sum(r["rule"].startswith("*.") for r in rows) >= 100
    exceptions = {r["rule"] for r in rows if r["is_exception"]}
    assert {"www.ck", "city.kawasaki.jp"} <= exceptions
    urls = spark.createDataFrame(
        [
            (1, "https://www.city.kawasaki.jp/ku/"),   # exception wins
            (2, "https://blog.foo.kawasaki.jp/x"),     # wildcard suffix
            (3, "https://foo.kawasaki.jp/"),           # host IS the suffix
        ],
        "url_id long, url string",
    )
    got = {
        r["url_id"]: r["domain"]
        for r in T.registrable_domain_psl(urls, psl).collect()
    }
    assert got == {
        1: "city.kawasaki.jp",
        2: "blog.foo.kawasaki.jp",
        3: None,
    }
