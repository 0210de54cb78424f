"""End-to-end entity-resolution pipeline (the north-rule centerpiece).

    interleaved docs ──> span text ──> rare tokens ──> vocab token-pair
    matching (blocked kernel) ──> doc-pair evidence ──> match edges ──>
    connected components ──> (doc_id, entity)

Spark-first restatement of the reference's full query stack: blocking =
dictionary intersection (``/root/reference/src/dictionary/dawg.rs`` traversal
pruning), pairwise scoring = the universal-automaton accept kernel
(``src/transducer/universal/automaton.rs:242-283``) as an Arrow-batched
pandas UDF, clustering = the FuzzyMultiMap-style aggregation taken to its
transitive closure.

Scale design (each stage annotated for the 10^12-doc target):

- **Vocabulary-level matching.**  Token pairs are scored once over the
  *distinct token vocabulary* (Heaps' law: vocab grows ~ N^0.5, so at
  10^12 docs the vocab self-join is orders of magnitude smaller than any
  doc-level join).  This is the distributed MemoCache
  (``src/distance/mod.rs:29-208``): d(a,b)=d(b,a), computed once, reused by
  every doc pair that shares the tokens.
- **Rare-token filter before everything.**  Document frequency is the value
  filter of ``value_filtered_query.rs`` — stopword-grade tokens are both
  skew bombs (hottest keys) and signal-free; dropping them bounds every
  downstream fan-out by ``max_df``.
- **Deletion-neighborhood blocking** (SymSpell family) is *exact* for
  distance <= 2: any OSA-d<=2 pair shares a depth-2 deletion variant, so
  blocking loses no recall — candidate generation mirrors automaton-guided
  trie intersection (bounded-error neighborhood enumeration, not scans).
- **Skew**: hot keys are dropped with logged stats (``hot_keys`` manifest
  metric); AQE skew-join splits what remains.  Evidence-join fan-out is
  bounded by ``max_df`` per token by construction.
- **Per-stage parquet checkpoints** (:mod:`.runstate`) give resumability +
  per-partition lineage; the CC loop additionally ``localCheckpoint``s per
  iteration (lineage truncation inside the fixpoint).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import edit_distance_udf, length_prefilter
from ..kernel.distances import TRANSPOSITION
from ..operators import blocking, clustering
from .runstate import Runstate


@dataclass(frozen=True)
class ERConfig:
    max_distance: int = 2            # token-pair edit threshold (kernel n)
    variant: str = TRANSPOSITION     # typos include adjacent swaps
    min_token_len: int = 3
    max_df: int = 50                 # rare-token document-frequency cutoff
    hot_key_threshold: int = 1000    # above this fan-out a key gets SALTED
    extreme_key_threshold: int = 100_000  # above this a key is dropped+logged
    n_salt: int = 8                  # salt groups for hot keys
    min_token_matches: int = 2       # doc-pair evidence threshold
    num_partitions: int | None = None
    # When set, the whole pipeline runs with exactly this many shuffle
    # partitions and AQE partition *coalescing* disabled (skew splitting
    # stays on): the cluster model is ~128 MB per shuffle partition sized to
    # the DATA, identical at every cluster size — locally, parallelism-first
    # coalescing re-sizes each exchange to the current core count, so a
    # 2-core and an 8-core run execute different physical plans and the
    # scaling comparison measures AQE's local heuristics, not the engine
    # (measured: match_edges coalesced to 10-13 tasks at 8 cores — 1.3 task
    # waves, ~35% of the wall lost to wave quantization).
    static_shuffle_partitions: int | None = None


def vocab_token_matches(
    toks: DataFrame, cfg: ERConfig, hot_stats: list | None = None
) -> DataFrame:
    """All (tok_a <= tok_b, distance) pairs within ``max_distance`` over the
    distinct token vocabulary, via deletion-neighborhood blocking + kernel.

    The d=0 diagonal (tok, tok, 0) is included without touching the kernel.
    """
    from ..functions.blocking_keys import deletion_neighborhood_keys

    vocab = toks.select("token").distinct()
    n = min(cfg.max_distance, 2)
    keyed = vocab.select(
        "token",
        F.explode(deletion_neighborhood_keys(F.col("token"), n=max(n, 1))).alias("key"),
    )
    # Hash the string keys to 8-byte longs before the shuffle-heavy part:
    # halves exchange bytes and join hashing cost.  A hash collision ADDS
    # candidate pairs (kernel rejects them; ~2^-44 odds per key pair), with
    # one theoretical asterisk: a collision that merges a benign key into a
    # key already at extreme_key_threshold could drop that key's pairs with
    # the extreme band.  At 2^-44 per pair of keys this is astronomically
    # unlikely (and bounded by one key's pairs); the completeness guarantee
    # is probabilistic only in that sense.
    keyed = keyed.select("token", F.xxhash64("key").alias("key"))
    # The exploded key table feeds three consumers (hot count, cold filter,
    # self-join sides); without persisting, the O(len^2)-per-token deletion
    # expression is recomputed for each — persist once, reuse everywhere
    # (pooled: run_pipeline releases after the stage checkpoint is written).
    #
    # Hash-partition by `key` BEFORE the persist: the self-join's two sides
    # are alias-projections of this same table, which Spark treats as
    # distinct plans — ReuseExchange can't collapse them, so each side paid
    # its own full exchange and the join re-read both (measured at 1.2M
    # docs: 2 x 2.2 GB shuffle writes + a 4.4 GB shuffle read — the
    # pipeline's single largest cost center).  With the cache already
    # HashPartitioning(key), the pre-count aggregate, the extreme anti-join
    # probe side, and BOTH self-join sides satisfy the join's distribution
    # requirement straight from cached partitions: one data-sized exchange
    # total, paid at materialization.
    from ..session import pooled_persist

    keyed = pooled_persist(keyed.repartition("key"))
    # skew guard on the vocab self-join: a deletion variant shared by
    # thousands of tokens (e.g. every 3-char fragment) explodes quadratically
    # The per-key fan-out table feeds three consumers (hot set, extreme set,
    # stats agg) — persist the aggregate once instead of re-running the
    # groupBy shuffle for each.
    counts = pooled_persist(keyed.groupBy("key").agg(F.count("*").alias("n_toks")))
    # three bands, per the north rule's explicit skew handling:
    #   cold    (<= hot_key_threshold)       → plain equi self-join
    #   hot     (.. extreme_key_threshold]   → SALTED self-join (triangle
    #             decomposition, plans.rewrites.salted_self_join_pairs):
    #             every pair kept, no shuffle partition gets a whole bucket
    #   extreme (> extreme_key_threshold)    → dropped with logged stats (a
    #             key shared by 10^5+ tokens carries no pair-level signal
    #             and its pair count is quadratically catastrophic)
    band = counts.agg(
        F.coalesce(
            F.sum((F.col("n_toks") > cfg.hot_key_threshold).cast("long")), F.lit(0)
        ).alias("hx")
    ).first()
    n_hot_or_extreme = int(band["hx"])
    if hot_stats is not None:
        hot_stats.append(n_hot_or_extreme)

    if n_hot_or_extreme == 0:
        # Data-adaptive fast path: the pre-count proved there is no skew
        # band, so the salting machinery (broadcast anti-join, hot-marker
        # join, triangle union) would be three extra passes over the key
        # table for nothing.  The skewed path stays fully exercised by the
        # hot-key fixtures and tests.
        cl = keyed.select("key", F.col("token").alias("left_id"))
        cr = keyed.select("key", F.col("token").alias("right_id"))
        # shuffle_hash: both sides arrive co-partitioned from the cache, so
        # the hint only swaps the per-partition algorithm — a build-side hash
        # map instead of sorting BOTH sides (SMJ), with partition size
        # bounded by data/num_partitions
        raw = cl.join(cr.hint("shuffle_hash"), "key").where(
            F.col("left_id") < F.col("right_id")
        )
    else:
        hot = counts.where(
            (F.col("n_toks") > cfg.hot_key_threshold)
            & (F.col("n_toks") <= cfg.extreme_key_threshold)
        ).select("key")
        extreme = counts.where(
            F.col("n_toks") > cfg.extreme_key_threshold
        ).select("key")
        # Broadcast the HOT/EXTREME sides (small by construction) and
        # anti-join: the cold side is nearly the whole key table —
        # broadcasting it would serialize a multi-GB hash build on the
        # driver (measured: the stage went flat at any core count until
        # this was inverted).
        k = keyed.join(F.broadcast(extreme), "key", "left_anti")

        from ..plans.rewrites import salted_self_join_pairs

        raw = salted_self_join_pairs(
            k, hot, n_salt=cfg.n_salt, key_col="key", id_col="token"
        )

    pairs = (
        raw.select(F.col("left_id").alias("tok_a"), F.col("right_id").alias("tok_b"))
        .distinct()
        .where(length_prefilter(F.col("tok_a"), F.col("tok_b"), cfg.max_distance))
    )
    dist = edit_distance_udf(cfg.max_distance, cfg.variant)
    scored = pairs.withColumn("distance", dist(F.col("tok_a"), F.col("tok_b")))
    scored = scored.where(F.col("distance") >= 0)
    diagonal = vocab.select(
        F.col("token").alias("tok_a"),
        F.col("token").alias("tok_b"),
        F.lit(0).alias("distance"),
    )
    return scored.unionByName(diagonal)


def doc_match_edges(
    toks: DataFrame, token_matches: DataFrame, cfg: ERConfig
) -> DataFrame:
    """Doc pairs with >= ``min_token_matches`` distinct matched token pairs.

    Fan-out bound: each (tok_a, tok_b) row joins <= max_df docs per side, so
    the evidence join produces <= |matches| * max_df^2 rows — linear in the
    vocabulary, never quadratic in documents.

    Shuffle diet (this stage is two wide joins + a wide agg — at 10^12 docs
    its exchanges dominate the pipeline's network bill):

    - ``token_matches`` is already canonical (tok_a <= tok_b), so instead of
      symmetrizing it (doubling the largest join input, the old shape) the
      *doc pair* is canonicalized after the join: every unordered doc-pair ×
      token-pair evidence combination still appears exactly once (diagonal
      tok_a == tok_b rows are filtered to left < right; off-diagonal rows to
      left != right, and least/greatest folds the two orientations).
    - Evidence rows carry a precomputed ``(pair_id, w)`` — an xxhash64 of the
      canonical token pair and its score contribution, both computed ONCE per
      vocabulary pair instead of once per evidence row — so the wide
      exchanges and the final agg shuffle longs + doubles, never token
      strings or per-row length arithmetic.  countDistinct(pair_id) equals
      countDistinct(tok_a, tok_b) up to a 64-bit collision *within one doc
      pair's token pairs* (p < 1e-15 at max_df^2 pairs).
    - Both joins take ``shuffle_hash`` hints: the build sides (the vocabulary
      pair table and the token table) are the sublinear sides (Heaps' law),
      and per-partition build size is bounded by data/num_partitions, so the
      sort-merge sorts of the (much larger) evidence stream are pure waste
      (measured: the two SMJ sorts were ~60% of this stage's CPU at 1.2M
      docs; AQE skew-splitting is not needed here because per-token fan-out
      is bounded by max_df upstream).
    """
    tm = token_matches.select(
        "tok_a",
        "tok_b",
        F.xxhash64("tok_a", "tok_b").alias("pair_id"),
        (
            1.0 - F.col("distance") / F.greatest(F.length("tok_a"), F.length("tok_b"))
        ).alias("w"),
        (F.col("tok_a") == F.col("tok_b")).alias("diag"),
    )
    left = toks.select(F.col("doc_id").alias("la"), F.col("token").alias("tok_a"))
    right = toks.select(F.col("doc_id").alias("rb"), F.col("token").alias("tok_b"))
    ev = (
        left.join(tm.hint("shuffle_hash"), "tok_a")
        # project the join key + carried strings away BEFORE the next
        # exchange: the second join shuffles only (la, tok_b, pair_id, w)
        .select("la", "tok_b", "pair_id", "w", "diag")
        .join(right.hint("shuffle_hash"), "tok_b")
        .where(
            F.when(F.col("diag"), F.col("la") < F.col("rb")).otherwise(
                F.col("la") != F.col("rb")
            )
        )
        .select(
            F.least("la", "rb").alias("left_id"),
            F.greatest("la", "rb").alias("right_id"),
            "pair_id",
            "w",
        )
    )
    agg = ev.groupBy("left_id", "right_id").agg(
        F.countDistinct("pair_id").alias("n_matched"),
        F.sum("w").alias("score"),
    )
    return agg.where(F.col("n_matched") >= cfg.min_token_matches)


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    run_dir: str,
    cfg: ERConfig | None = None,
) -> DataFrame:
    """Full resumable run; returns (doc_id, entity).

    Every stage checkpoints to ``run_dir`` (see :mod:`.runstate`); a rerun
    with the same config resumes from the last completed stage.
    """
    cfg = cfg or ERConfig()
    rs = Runstate(spark, run_dir, asdict(cfg))

    if cfg.static_shuffle_partitions is not None:
        # data-sized static exchanges, identical at every cluster size — see
        # the ERConfig field comment.  Restored in the finally below.
        overrides = {
            "spark.sql.shuffle.partitions": str(cfg.static_shuffle_partitions),
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        }
        saved = {k: spark.conf.get(k) for k in overrides}
        for k, v in overrides.items():
            spark.conf.set(k, v)
        try:
            return _run_stages(spark, docs, rs, cfg)
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
    return _run_stages(spark, docs, rs, cfg)


def _run_stages(
    spark: SparkSession, docs: DataFrame, rs: Runstate, cfg: ERConfig
) -> DataFrame:
    from ..session import release_pooled

    docs_ck = rs.stage(
        "docs",
        lambda: docs,
        observe={"n_docs": F.count(F.lit(1))},
    )

    def build_tokens() -> DataFrame:
        from ..session import pooled_persist

        t = blocking.doc_tokens(docs_ck, min_len=cfg.min_token_len)
        # rare_tokens consumes t twice — once to build the broadcast
        # frequent-token set (a separate broadcast-exchange job) and once as
        # the anti-join probe side.  Without a persist the explode + distinct
        # (the stage's whole cost) runs twice: ReuseExchange cannot span the
        # broadcast subquery boundary (verified on the executed plan).
        return blocking.rare_tokens(pooled_persist(t), max_df=cfg.max_df)

    toks = rs.stage("tokens", build_tokens, inputs=("docs",))
    # tokens is parquet-materialized; the persisted pre-filter token table
    # only backed the stage build
    release_pooled()

    hot_stats: list = []
    tok_matches = rs.stage(
        "token_matches",
        lambda: vocab_token_matches(toks, cfg, hot_stats),
        inputs=("tokens",),
        observe={
            "kernel_pairs": F.coalesce(
                F.sum((F.col("tok_a") != F.col("tok_b")).cast("long")), F.lit(0)
            )
        },
        metrics=lambda d: {"hot_keys_dropped": hot_stats[0] if hot_stats else 0},
    )
    # the stage above is parquet-materialized — the pooled key/count caches
    # inside vocab_token_matches are dead weight from here on
    release_pooled()

    edges = rs.stage(
        "match_edges",
        lambda: doc_match_edges(toks, tok_matches, cfg),
        inputs=("tokens", "token_matches"),
    )

    # edge count from the stage manifest just written — sizes the CC
    # fixpoint's partitioning without a pre-loop count job over the edges
    edges_manifest = rs.manifest("match_edges") or {}
    ent_partitions = cfg.num_partitions or clustering.fixpoint_partitions(
        spark, edges_manifest.get("rows") or 0
    )
    entities = rs.stage(
        "entities",
        lambda: clustering.cluster_matches(
            edges,
            docs_ck.select("doc_id"),
            id_col="doc_id",
            left_col="left_id",
            right_col="right_id",
            num_partitions=ent_partitions,
            edge_count_hint=edges_manifest.get("rows"),
        ),
        inputs=("match_edges", "docs"),
        # the whole stage (fixpoint + singleton attach + write) runs at the
        # fixpoint's data-sized partition count: its output is ~1 node row
        # per input doc, far below the pipeline's static shuffle sizing
        shuffle_partitions=ent_partitions,
    )
    # entities is parquet-materialized; drop the CC fixpoint's final
    # localCheckpoint blocks (registered by connected_components)
    release_pooled()
    return entities


# ---------------------------------------------------------------------------
# evaluation — pairwise F1 on labeled pairs at shared blocking keys
# ---------------------------------------------------------------------------


def pairwise_f1(
    entities: DataFrame,
    labels: DataFrame,
    toks: DataFrame | None = None,
) -> dict:
    """Pairwise precision/recall/F1 of predicted co-membership on labels.

    If ``toks`` is given, labels are restricted to pairs sharing >= 1 token
    blocking key ("labeled pairs at shared blocking keys", BASELINE.json) —
    blocking recall is reported separately as ``blocked_fraction``.
    """
    lab = labels
    n_total = lab.count()
    if toks is not None:
        from ..functions.blocking_keys import deletion_neighborhood_keys

        keyed = toks.select(
            "doc_id",
            F.explode(deletion_neighborhood_keys(F.col("token"), n=2)).alias("key"),
        ).distinct()
        a = keyed.select(F.col("doc_id").alias("left_doc_id"), "key")
        b = keyed.select(F.col("doc_id").alias("right_doc_id"), "key")
        shared = a.join(b, "key").select("left_doc_id", "right_doc_id").distinct()
        lab = lab.join(shared, ["left_doc_id", "right_doc_id"], "left_semi")
    n_blocked = lab.count()

    ea = entities.select(F.col("doc_id").alias("left_doc_id"), F.col("entity").alias("ea"))
    eb = entities.select(F.col("doc_id").alias("right_doc_id"), F.col("entity").alias("eb"))
    j = (
        lab.join(ea, "left_doc_id")
        .join(eb, "right_doc_id")
        .withColumn("pred", F.col("ea") == F.col("eb"))
    )
    c = j.agg(
        F.sum(F.when(F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = c["tp"] or 0, c["fp"] or 0, c["fn"] or 0
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": prec,
        "recall": rec,
        "f1": f1,
        "blocked_fraction": n_blocked / n_total if n_total else 1.0,
    }
