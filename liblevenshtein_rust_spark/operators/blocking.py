"""Document blocking — span extraction → rare-token keys → salted equi-join.

The distributed analog of the reference's dictionary index: instead of
walking a DAWG (``src/dictionary/dawg.rs``), we generate, per document, a
bounded set of blocking keys such that any true duplicate pair shares at
least one key, then let a shuffled equi-join produce candidates.

Stages:
1. ``extract_span_text`` — explode the interleaved spans array, keep text
   spans, preserve order via the offset column (the per-row invariant
   ``(kind, text, media_ref, order)`` is testable by reassembly).
2. ``doc_tokens`` — tokenization + normalization per doc.
3. ``rare_tokens`` — corpus DF filter: tokens with document frequency above
   ``max_df`` carry no entity signal (stopword-like) and produce the hottest
   keys; dropping them is both a recall no-op and the first line of skew
   defense.  This is the value-filtered traversal analog
   (``src/transducer/value_filtered_query.rs``): filter *before* exploring.
4. ``blocking_keys_for_tokens`` — symmetric-deletion keys (exact for d<=2)
   or n-gram keys.
5. ``salt_hot_keys`` — explicit skew handling (north rule): keys whose
   candidate list exceeds ``hot_threshold`` are split into ``n_salt``
   sub-keys; both sides replicate accordingly (probe side joins all salts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.blocking_keys import (
    deletion_neighborhood_keys,
    ngram_keys_unpositioned,
    normalize_term,
)


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, kind, text, media_ref, offset) — one row per span, all
    kinds.  The flat projection of the interleaved input contract
    (BASELINE.json input_hint); order is recoverable from ``offset``."""
    return docs.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract_span_text(docs: DataFrame) -> DataFrame:
    """(doc_id, offset, text) for text spans, order preserved by offset."""
    ex = explode_spans(docs)
    return ex.where(F.col("kind") == "text").select("doc_id", "offset", "text")


def reassemble_spans(docs: DataFrame) -> DataFrame:
    """Round-trip check for the span-sequence invariant: explode then
    re-aggregate ordered by offset; output (doc_id, spans) with the original
    ordering.  Equality with the input proves no stage loses
    (kind, text, media_ref, order)."""
    ex = docs.select("doc_id", F.explode("spans").alias("span"))
    return ex.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("span.offset").alias("offset"),
                    F.col("span.kind").alias("kind"),
                    F.col("span.text").alias("text"),
                    F.col("span.media_ref").alias("media_ref"),
                )
            )
        ).alias("spans_sorted")
    ).select(
        "doc_id",
        F.transform(
            "spans_sorted",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )


def doc_tokens(docs: DataFrame, min_len: int = 3) -> DataFrame:
    """(doc_id, token) distinct, normalized."""
    txt = extract_span_text(docs)
    toks = txt.select(
        "doc_id",
        F.explode(F.split(normalize_term(F.col("text")), " ")).alias("token"),
    )
    return toks.where(F.length("token") >= min_len).distinct()


def rare_tokens(tok: DataFrame, max_df: int = 50) -> DataFrame:
    """Drop stopword-like tokens by corpus document frequency.

    ``max_df`` is absolute here (testdata scale); at corpus scale it becomes
    a fraction of N. The DF pass is one cheap aggregation reused from the
    token table (map-side combine, no extra scan of the raw docs).
    """
    df_counts = tok.groupBy("token").agg(F.count("*").alias("df"))
    # stopword-grade tokens are FEW (Zipf head) — broadcast those and
    # anti-join; the keep-set is nearly the whole vocabulary and must not
    # be a broadcast build side
    frequent = df_counts.where(F.col("df") > max_df).select("token")
    return tok.join(F.broadcast(frequent), "token", "left_anti").select(
        "doc_id", "token"
    )


def token_blocking_keys(
    tok: DataFrame, scheme: str = "deletion", n: int = 2
) -> DataFrame:
    """(doc_id, token, key) — one row per blocking key."""
    if scheme == "deletion":
        keys = deletion_neighborhood_keys(F.col("token"), n=n)
    elif scheme == "ngram":
        keys = ngram_keys_unpositioned(F.col("token"), q=3)
    else:
        raise ValueError(f"unknown blocking scheme: {scheme}")
    return tok.select("doc_id", "token", F.explode(keys).alias("key"))


def candidate_doc_pairs(
    keyed: DataFrame,
    hot_threshold: int = 200,
    candidate_cap: int | None = 2000,
) -> DataFrame:
    """Self-join on blocking key → canonical (left_id, right_id[, token pair]).

    Skew handling: keys with more than ``hot_threshold`` docs are *dropped
    with logging semantics* (returned via the `hot_keys` attribute pattern:
    callers can inspect `hot_key_stats`); a key shared by thousands of docs
    carries no discriminative signal (its pairs blow up quadratically while
    contributing only stopword-grade evidence).  This is the candidate-cap
    guard of SURVEY.md §4 item 4 — the cap is explicit and logged, never
    silent.
    """
    counts = keyed.groupBy("key").agg(F.countDistinct("doc_id").alias("n_docs"))
    hot = counts.where(F.col("n_docs") > hot_threshold).select("key")
    # broadcast the (small) hot-key set and anti-join; the cold set is the
    # whole key universe and must never be a broadcast build side
    k = keyed.join(F.broadcast(hot), "key", "left_anti")
    left = k.select(
        "key",
        F.col("doc_id").alias("left_id"),
        F.col("token").alias("left_token"),
    )
    right = k.select(
        "key",
        F.col("doc_id").alias("right_id"),
        F.col("token").alias("right_token"),
    )
    pairs = left.join(right, "key").where(F.col("left_id") < F.col("right_id"))
    pairs = pairs.select("left_id", "right_id", "left_token", "right_token").distinct()
    if candidate_cap is not None:
        # bound per-doc fan-out deterministically (ordered, logged truncation)
        from pyspark.sql import Window

        w = Window.partitionBy("left_id").orderBy("right_id", "left_token", "right_token")
        pairs = (
            pairs.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= candidate_cap)
            .drop("_rk")
        )
    return pairs


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (the north star's second key family):
    total-order rows by ``(key, id)``, pair every row with its ``window - 1``
    successors.  Output: canonical distinct (left_id, right_id).

    Scale design — no single-partition global sort:

    1. ``repartitionByRange(key, id)`` + ``sortWithinPartitions`` gives a
       range-partitioned total order (partition ids ascend with key ranges).
    2. Global rank = per-partition ``row_number`` + partition offset; the
       offsets come from one tiny per-partition count (``num_partitions``
       rows to the driver — bounded, not data-sized).
    3. Window pairing is a plain **equi-join on shifted rank** (each row
       explodes to ranks ``rn+1 .. rn+w-1``): shuffle-friendly, no range
       join, fan-out exactly ``w - 1`` per row.

    The reference analog is ordered dictionary iteration
    (``/root/reference/src/dictionary/iterator.rs``) over the sorted term
    universe; the sorted-neighborhood method turns that order into bounded
    candidate windows.
    """
    from pyspark.sql import Window

    if window < 2:
        raise ValueError("sorted-neighborhood window must be >= 2")
    spark = df.sparkSession
    base = (
        df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_k"))
        .where(F.col("_id").isNotNull())
        .dropDuplicates(["_id"])
    )
    if num_partitions is None:
        # size to the data like the CC fixpoint: ~100k rows per partition,
        # capped at the session shuffle parallelism
        n_rows = base.count()
        cap = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        num_partitions = max(1, min(cap, n_rows // 100_000 + 1))
    # pooled: released by the materializing caller (release_pooled); a
    # release-then-reuse recompute is deterministic because
    # repartitionByRange + sortWithinPartitions is a deterministic layout
    from ..session import pooled_persist

    p = pooled_persist(
        base.repartitionByRange(num_partitions, "_k", "_id")
        .sortWithinPartitions("_k", "_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    cnts = {
        r["_pid"]: r["c"]
        for r in p.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    offs, acc = [], 0
    for pid in range(num_partitions):
        offs.append((pid, acc))
        acc += cnts.get(pid, 0)
    off_df = spark.createDataFrame(offs, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy("_k", "_id")
    ranked = (
        p.withColumn("_lrn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .select("_id", "_k", (F.col("_lrn") + F.col("_off")).alias("_rn"))
    )
    left = ranked.select(
        F.col("_id").alias("_lid"),
        F.explode(
            F.sequence(F.col("_rn") + 1, F.col("_rn") + (window - 1))
        ).alias("_rn2"),
    )
    right = ranked.select(F.col("_id").alias("_rid"), F.col("_rn").alias("_rn2"))
    return (
        left.join(right, "_rn2")
        .select(
            F.least("_lid", "_rid").alias("left_id"),
            F.greatest("_lid", "_rid").alias("right_id"),
        )
        .where(F.col("left_id") != F.col("right_id"))
        .distinct()
    )


def hot_key_stats(keyed: DataFrame, hot_threshold: int = 200) -> DataFrame:
    """Keys excluded by the skew guard, with their fan-out — the 'logged
    truncation' record persisted by the pipeline's metrics stage."""
    return (
        keyed.groupBy("key")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") > hot_threshold)
    )


def blocking_quality(
    docs: DataFrame,
    truth_pairs: DataFrame,
    keyed: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocking-scheme evaluation: reduction ratio + pairs completeness —
    the two standard blocking metrics (how much of the O(n²) pair space the
    scheme prunes, and what fraction of true matches survive the pruning).
    The reference's analog is its recall gating of index-guided traversal
    against labeled misspelling corpora (`/root/reference/tests/
    corpus_validation.rs:22-28`): a blocking scheme, like an automaton
    walk, is only useful if it skips almost everything *except* the
    matches.

    Inputs:
      docs        — the record universe (defines n for the O(n²) base);
      truth_pairs — labeled matches (left_id < right_id);
      keyed       — (id_col, key): one row per (record, blocking key),
                    the same table candidate generation consumes.

    Output: ONE row —
      (n_docs, n_candidates, n_truth, n_truth_in_candidates,
       reduction_ratio, pairs_completeness).

    Scale: the distinct candidate-pair count is the SAME shuffle candidate
    generation itself performs (so measuring costs what running costs — no
    extra pass over the raw corpus); callers must hand in a `keyed` table
    that already had hot-key policy applied, exactly as the pipeline does.
    The four metric aggregates are single-row and combine via 1-row
    broadcast joins — nothing returns to the driver.
    """
    a = keyed.select(F.col(id_col).alias("left_id"), "key")
    b = keyed.select(F.col(id_col).alias("right_id"), "key")
    cand = (
        a.join(b, "key")
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )
    truth = truth_pairs.select("left_id", "right_id").distinct()
    # ONE pass over the candidate set: flag each candidate as truth/not via
    # a left join, then count + sum in a single aggregate — a separate
    # n_candidates aggregate and truth semi-join would rebuild the whole
    # candidate shuffle twice (verified in the physical plan).
    flagged = cand.join(
        truth.withColumn("_t", F.lit(1)), ["left_id", "right_id"], "left"
    )
    counts = flagged.agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.sum(F.coalesce(F.col("_t"), F.lit(0)))
        .cast("bigint")
        .alias("n_truth_in_candidates"),
    )
    n_docs = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    n_truth = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    row = n_docs.crossJoin(counts).crossJoin(n_truth)
    total_pairs = (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("double")
    return row.select(
        "n_docs",
        "n_candidates",
        "n_truth",
        "n_truth_in_candidates",
        F.round(F.lit(1.0) - F.col("n_candidates") / total_pairs, 6).alias(
            "reduction_ratio"
        ),
        F.round(
            F.col("n_truth_in_candidates") / F.col("n_truth"), 6
        ).alias("pairs_completeness"),
    )


def pair_block_weights(
    keyed: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "key",
    hot_threshold: int | None = 200,
) -> DataFrame:
    """CBS (Common Block Scheme) meta-blocking weights: for every candidate
    pair, the number of DISTINCT blocking keys the two records share.

    Meta-blocking (Papadakis et al., "Meta-Blocking: Taking Entity
    Resolution to the Next Level", TKDE 2014 — published technique, public
    knowledge) re-frames the block collection as a weighted pair graph and
    prunes low-evidence comparisons BEFORE the expensive scoring kernel
    runs.  The reference's analog is its intersection-traversal premise
    (``/root/reference/src/transducer/mod.rs``: only dictionary paths
    compatible with the automaton are ever visited) — meta-blocking brings
    the same "never score what the index already refutes" discipline to the
    blocked-pair graph itself.

    Output: (left_id, right_id, w) with left < right, w = shared-key count.

    Scale (10^12 docs): the weight aggregation is the SAME shuffle candidate
    generation performs (self-join on key → groupBy pair); no extra pass
    over the corpus.  The hot-key guard drops keys shared by more than
    ``hot_threshold`` records first — identical policy + broadcast anti-join
    shape as candidate_doc_pairs, so the quadratic blow-up of stopword-grade
    keys never reaches the shuffle.
    """
    k = keyed.select(
        F.col(id_col).alias("_id"), F.col(key_col).alias("_k")
    ).distinct()
    if hot_threshold is not None:
        counts = k.groupBy("_k").agg(F.countDistinct("_id").alias("_n"))
        hot = counts.where(F.col("_n") > hot_threshold).select("_k")
        k = k.join(F.broadcast(hot), "_k", "left_anti")
    left = k.select("_k", F.col("_id").alias("left_id"))
    right = k.select("_k", F.col("_id").alias("right_id"))
    # (doc, key) is deduped above, so each shared key contributes exactly
    # one joined row: count(*) IS the distinct shared-key count — no
    # count-distinct state in the aggregate.
    return (
        left.join(right, "_k")
        .where(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id")
        .agg(F.count("*").cast("bigint").alias("w"))
    )


def meta_block_wep(weights: DataFrame) -> DataFrame:
    """Weighted Edge Pruning: keep pairs whose weight is >= the global mean
    weight.  The comparison is integer-exact (``w * n_pairs >= sum_w``) so
    Spark and any SQL oracle agree bit-for-bit — no float threshold.

    Scale: the threshold is ONE scalar aggregate over the (already
    candidate-sized, never corpus-sized) weight table, broadcast back as a
    1-row join; the prune itself is a stateless filter.
    """
    tot = weights.agg(
        F.sum("w").cast("bigint").alias("_s"),
        F.count("*").cast("bigint").alias("_n"),
    )
    return (
        weights.join(F.broadcast(tot))
        .where(F.col("w") * F.col("_n") >= F.col("_s"))
        .select("left_id", "right_id", "w")
    )


def meta_block_cnp(weights: DataFrame, k: int = 5) -> DataFrame:
    """Cardinality Node Pruning: each record retains its top-k weighted
    neighbors (ties broken by neighbor id ascending — deterministic); a
    pair survives if EITHER endpoint retains it (the standard redefined-CNP
    union semantics).

    Scale: the pair graph is exploded to both orientations (2× candidate
    rows, still never corpus-sized) and ranked by one window partitioned on
    the node id — a single keyed shuffle; per-node state is the O(k) heap
    inside the window sort.  Skewed nodes are bounded by the upstream
    hot-key guard, which caps any node's degree at
    hot_threshold × keys-per-record.
    """
    from pyspark.sql import Window

    und = weights.select(
        F.col("left_id").alias("node"), F.col("right_id").alias("nbr"), "w"
    ).unionByName(
        weights.select(
            F.col("right_id").alias("node"), F.col("left_id").alias("nbr"), "w"
        )
    )
    win = Window.partitionBy("node").orderBy(F.desc("w"), F.asc("nbr"))
    # w is functionally dependent on the pair, so carrying it through the
    # canonicalize+distinct is exact and saves the join back to `weights`
    # (one whole shuffle of the kept set).
    return (
        und.withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") <= k)
        .select(
            F.least("node", "nbr").alias("left_id"),
            F.greatest("node", "nbr").alias("right_id"),
            "w",
        )
        .distinct()
    )
