"""Cross-table record linkage — match records of table A to records of
table B (customers ↔ suppliers, arrivals ↔ a master table), the classic
two-corpus form of entity resolution that the self-join ER pipeline
(`pipeline/er.py`) doesn't directly expose.

Same engineering altitude as the ER pipeline, restated for two sides:

- **Vocabulary-level matching, cross form**: the two RARE-token
  vocabularies are joined through shared deletion-neighborhood keys —
  an A-vocab × B-vocab blocked join (no self-join, no canonicalization,
  no triangle salting: the sides are disjoint by construction).  The key
  scheme is budget-dispatched like ``operators/matching.py`` — deletion
  neighborhood (exact for budget ≤ 2), the d3 hybrid for standard/OSA at
  distance 3, and a RAISE outside the exact envelope — so no recall is
  lost vs the reference's trie-intersection traversal
  (``dictionary/dawg.rs``).
- **Evidence join bounded by max_df per side**: each matched token pair
  touches ≤ max_df_a × max_df_b doc pairs — linear in vocabulary, never
  |A|×|B|.
- **Deterministic best-match**: per A-record ranking on
  (rounded score DESC, n_matched DESC, b_id ASC) — reproducible across
  engines, which is what lets the DuckDB oracle replay the full linkage
  including the final assignment.

Skew: the same hashed-key + extreme-fanout drop policy as
`er.vocab_token_matches`; a cross join's per-key cost is n_a × n_b, so the
guard multiplies the two side counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.blocking_keys import deletion_neighborhood_keys, normalize_term
from ..functions.udfs import edit_distance_udf, length_prefilter
from ..kernel.distances import TRANSPOSITION
from ..operators import blocking


@dataclass(frozen=True)
class LinkConfig:
    max_distance: int = 1            # token-pair edit threshold
    variant: str = TRANSPOSITION
    min_token_len: int = 3
    max_df: int = 50                 # per-side rare-token DF cutoff
    min_token_matches: int = 2       # evidence threshold per linked pair
    extreme_key_product: int = 1_000_000  # drop keys with n_a*n_b above
    # second evidence channel: token pairs with EQUAL phonetic codes that
    # the edit channel missed (name-matching ER's classic OR-blocking —
    # reference analog: the phonetic rewrite engine feeding the transducer,
    # phonetic/rules.rs) — scored at a fixed discounted weight
    use_phonetic: bool = False
    phonetic_ruleset: str = "skeleton"
    phonetic_weight: float = 0.5
    # assignment hardening for asymmetric sides (real master-data linkage):
    # drop candidate pairs below the score floor BEFORE ranking, and/or
    # keep only MUTUAL best matches (B is A's best AND A is B's best) —
    # one-to-one assignment instead of best-per-A many-to-one
    min_score: float = 0.0
    mutual: bool = False


def _tokens(docs: DataFrame, cfg: LinkConfig) -> DataFrame:
    """(doc_id, token) distinct rare tokens; spans-aware or plain text."""
    if "spans" in docs.columns:
        toks = blocking.doc_tokens(docs, min_len=cfg.min_token_len)
    else:
        toks = (
            docs.select(
                "doc_id",
                F.explode(
                    F.split(normalize_term(F.col("text")), " ")
                ).alias("token"),
            )
            .where(F.length("token") >= cfg.min_token_len)
            .distinct()
        )
    return blocking.rare_tokens(toks, max_df=cfg.max_df)


def cross_vocab_matches(
    vocab_a: DataFrame, vocab_b: DataFrame, cfg: LinkConfig
) -> DataFrame:
    """(tok_a, tok_b, distance) for every A-vocab × B-vocab pair within
    ``max_distance`` — blocked through shared keys, kernel-scored.  Exact
    A∩B tokens fall out of the same join (same keys, distance 0).

    Key scheme by budget (same dispatch as ``operators/matching.py``):
    merge/split ops span up to TWO standard edits, so the key budget is
    ``2 × max_distance`` for that variant; budget ≤ 2 → deletion
    neighborhood (exact), budget 3 for standard/OSA → ``d3_hybrid_keys``
    (exact, length-banded).  Anything beyond that envelope RAISES rather
    than silently losing pairs — the linkage contract promises every
    within-distance pair, and an incomplete key family would bias the
    learned EM weights invisibly.
    """
    from ..functions.blocking_keys import d3_hybrid_keys
    from ..kernel.distances import MERGE_AND_SPLIT, STANDARD

    span = 2 if cfg.variant == MERGE_AND_SPLIT else 1
    budget = max(cfg.max_distance * span, 1)
    if budget <= 2:
        keys_of = lambda c: deletion_neighborhood_keys(c, n=budget)  # noqa: E731
    elif budget == 3 and cfg.variant in (STANDARD, TRANSPOSITION):
        osa = cfg.variant == TRANSPOSITION
        keys_of = lambda c: d3_hybrid_keys(c, transposition=osa)  # noqa: E731
    else:
        raise ValueError(
            "cross_vocab_matches has no exact blocking-key scheme for "
            f"variant={cfg.variant!r} at max_distance={cfg.max_distance} "
            f"(key budget {budget}); supported: any variant with budget <= 2, "
            "standard/transposition at 3"
        )

    def keyed(vocab: DataFrame, col: str) -> DataFrame:
        return vocab.select(
            F.col("token").alias(col),
            F.explode(keys_of(F.col("token"))).alias("k"),
        ).select(col, F.xxhash64("k").alias("key"))

    ka = keyed(vocab_a, "tok_a")
    kb = keyed(vocab_b, "tok_b")
    # cross-join skew guard: per-key cost is n_a * n_b, so the band is on
    # the PRODUCT of the two side fan-outs (same logged-drop policy as the
    # ER pipeline's extreme band)
    ca = ka.groupBy("key").agg(F.count("*").alias("na"))
    cb = kb.groupBy("key").agg(F.count("*").alias("nb"))
    extreme = (
        ca.join(cb, "key")
        .where(F.col("na") * F.col("nb") > cfg.extreme_key_product)
        .select("key")
    )
    ka = ka.join(F.broadcast(extreme), "key", "left_anti")
    pairs = (
        ka.join(kb, "key")
        .select("tok_a", "tok_b")
        .distinct()
        .where(length_prefilter(F.col("tok_a"), F.col("tok_b"), cfg.max_distance))
    )
    dist = edit_distance_udf(cfg.max_distance, cfg.variant)
    return pairs.withColumn("distance", dist(F.col("tok_a"), F.col("tok_b"))).where(
        F.col("distance") >= 0
    )


def link_tables(
    a_docs: DataFrame, b_docs: DataFrame, cfg: LinkConfig | None = None
) -> DataFrame:
    """Best B-side match per A-side record (or mutual-best one-to-one).

    Output: (a_id, b_id, n_matched, score, rank) for the top match of
    every A record with >= ``min_token_matches`` matched rare-token pairs;
    ``score`` = Σ (1 − d/max_len) over distinct matched token pairs,
    rounded to 6 (the cross-engine determinism contract) BEFORE ranking.

    ``cfg.min_score`` floors the candidate score before ranking (an A
    record with only sub-floor candidates links to nothing — the shape a
    master-data join needs, instead of force-assigning every record);
    ``cfg.mutual`` keeps only pairs that are top-ranked from BOTH sides
    (B is A's best and A is B's best, ties broken on the deterministic
    (score DESC, n_matched DESC, id ASC) order) — duplicate A records
    contending for one B resolve one-to-one instead of many-to-one.
    The mutual filter adds one extra keyed shuffle (the b_id window) over
    the candidate-pair table, which is orders smaller than the evidence.
    """
    cfg = cfg or LinkConfig()
    return _assign(score_pairs(a_docs, b_docs, cfg), cfg)


def _rank_window(part_col: str, tie_col: str):
    """THE assignment ordering — (score DESC, n_matched DESC, tie-id ASC)
    within a partition key.  Single definition shared by the per-A rank,
    the per-B rank, and the mutual filter, so the mutual identity
    (mutual = best_per_a ⨝ best_per_b) can never silently break on a
    one-sided ordering change (round-4 review)."""
    return Window.partitionBy(part_col).orderBy(
        F.col("score").desc(), F.col("n_matched").desc(), F.col(tie_col)
    )


def _assign(agg: DataFrame, cfg: LinkConfig) -> DataFrame:
    """Shared assignment tail: score floor → per-A rank (→ per-B rank when
    mutual) — used by both the bag-of-tokens and the field-weighted
    linkage so assignment semantics can never diverge."""
    if cfg.min_score:
        agg = agg.where(F.col("score") >= cfg.min_score)
    out = agg.withColumn("rank", F.row_number().over(_rank_window("a_id", "b_id")))
    if cfg.mutual:
        wb = _rank_window("b_id", "a_id")
        out = (
            out.withColumn("_rb", F.row_number().over(wb))
            .where((F.col("rank") == 1) & (F.col("_rb") == 1))
            .drop("_rb")
        )
    else:
        out = out.where(F.col("rank") == 1)
    return out


def best_per_a(candidates: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Deterministic best-per-A reduction of a scored candidate-pair table
    — delegates to :func:`_assign` (non-mutual) so the ranking rule exists
    exactly once and the incremental merge can never diverge from the
    batch assignment."""
    from dataclasses import replace

    cfg = cfg or LinkConfig()
    return _assign(candidates, replace(cfg, mutual=False)).drop("rank")


def score_pairs(
    a_docs: DataFrame, b_docs: DataFrame, cfg: LinkConfig | None = None
) -> DataFrame:
    """All scored (a_id, b_id, n_matched, score) candidate pairs above the
    evidence threshold — the single scoring body shared by the batch
    assignment (``link_tables``) and the incremental merge
    (``update_assignments``), so the two paths can never score
    differently.  Includes the phonetic evidence channel when
    ``cfg.use_phonetic`` is set."""
    cfg = cfg or LinkConfig()
    ta = _tokens(a_docs, cfg)
    tb = _tokens(b_docs, cfg)
    va = ta.select("token").distinct()
    vb = tb.select("token").distinct()
    tm = cross_vocab_matches(va, vb, cfg).select(
        "tok_a",
        "tok_b",
        (
            1.0 - F.col("distance") / F.greatest(F.length("tok_a"), F.length("tok_b"))
        ).alias("w"),
    )
    if cfg.use_phonetic:
        from ..functions.phonetic import phonetic_normalize

        pa = va.select(
            F.col("token").alias("tok_a"),
            phonetic_normalize(F.col("token"), cfg.phonetic_ruleset).alias("code"),
        )
        pb = vb.select(
            F.col("token").alias("tok_b"),
            phonetic_normalize(F.col("token"), cfg.phonetic_ruleset).alias("code"),
        )
        # hot-code guard: the phonetic channel's per-key cost is also a
        # product of side fan-outs (same band policy as the deletion keys)
        hot = (
            pa.groupBy("code").agg(F.count("*").alias("na"))
            .join(pb.groupBy("code").agg(F.count("*").alias("nb")), "code")
            .where(F.col("na") * F.col("nb") > cfg.extreme_key_product)
            .select("code")
        )
        ph = (
            pa.join(F.broadcast(hot), "code", "left_anti")
            .join(pb, "code")
            .select("tok_a", "tok_b")
            .distinct()
            # only pairs the edit channel MISSED: the union stays a set and
            # an edit match never gets double-counted or down-weighted
            .join(tm.select("tok_a", "tok_b"), ["tok_a", "tok_b"], "left_anti")
            .withColumn("w", F.lit(float(cfg.phonetic_weight)))
        )
        tm = tm.unionByName(ph)
    tm = tm.select(
        "tok_a", "tok_b", F.xxhash64("tok_a", "tok_b").alias("pair_id"), "w"
    )
    ev = (
        ta.select(F.col("doc_id").alias("a_id"), F.col("token").alias("tok_a"))
        .join(tm.hint("shuffle_hash"), "tok_a")
        .select("a_id", "tok_b", "pair_id", "w")
        .join(
            tb.select(F.col("doc_id").alias("b_id"), F.col("token").alias("tok_b"))
            .hint("shuffle_hash"),
            "tok_b",
        )
    )
    return (
        ev.groupBy("a_id", "b_id")
        .agg(
            F.countDistinct("pair_id").alias("n_matched"),
            F.round(F.sum("w"), 6).alias("score"),
        )
        .where(F.col("n_matched") >= cfg.min_token_matches)
    )


def update_assignments(
    standing: DataFrame,
    a_docs: DataFrame,
    b_delta: DataFrame,
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """Incremental linkage: fold a batch of NEW B-side records into a
    standing best-match table without re-scoring the old B side — the
    linkage twin of `operators/clustering.incremental_clusters` (and of
    the reference's DynamicDawg insert path, ``dictionary/dynamic_dawg.rs``:
    the standing index absorbs additions without a rebuild).

    ``standing``: (a_id, b_id, n_matched, score) — current rank-1 rows
    (e.g. ``link_tables`` output, rank column optional and ignored).
    ``b_delta``: ONLY the new B records.  Output: the new standing table
    (a_id, b_id, n_matched, score, changed) where ``changed`` marks rows
    whose assignment this delta created or displaced.  A standing
    assignment can only be displaced by a STRICTLY better candidate under
    the deterministic order (score DESC, n_matched DESC, b_id ASC) — ties
    keep the incumbent, so replaying deltas is idempotent and a batch
    rebuild over A×(B∪delta) yields the same winners wherever the
    incumbent-vs-rebuild tie semantics coincide (asserted in pytest).

    Scale: the delta is scored against the A side only (blocked vocab ×
    vocab — the expensive part is proportional to the DELTA, not the
    standing corpus); the merge is one keyed join on a_id between the
    standing table and the delta's best-per-A reduction.  The standing
    table is never shuffled beyond that single a_id-keyed join.

    ``cfg.mutual`` is NOT supported incrementally: a new B record winning
    two A records at once would need a cross-A resolution pass over the
    standing table, which is a rebuild, not a delta merge — raise rather
    than silently emit a many-to-one table that claims to be one-to-one.
    """
    cfg = cfg or LinkConfig()
    if cfg.mutual:
        raise ValueError(
            "update_assignments does not support cfg.mutual: one-to-one "
            "assignment needs the per-B standing state too — use "
            "update_assignments_mutual(standing_a, standing_b, ...) instead"
        )
    delta_best = best_per_a(score_pairs(a_docs, b_delta, cfg), cfg)
    return _merge_standing(standing, delta_best)


def _merge_standing(standing: DataFrame, delta_best: DataFrame) -> DataFrame:
    """The a_id-keyed strictly-better displacement merge shared by the
    plain and mutual incremental paths (semantics documented on
    :func:`update_assignments`)."""
    # Standing is documented as one row per a_id; a duplicate a_id would
    # silently fan out through the full_outer join below and emit duplicate
    # assignments.  Enforce the invariant with the SAME deterministic order
    # the merge uses (score DESC, n_matched DESC, b_id ASC) — a no-op on
    # well-formed input, self-healing on a malformed one (ADVICE r3).
    from pyspark.sql import Window

    sw = Window.partitionBy("a_id").orderBy(
        F.col("score").desc(), F.col("n_matched").desc(), F.col("b_id").asc()
    )
    standing = (
        standing.withColumn("_sr", F.row_number().over(sw))
        .where(F.col("_sr") == 1)
        .drop("_sr")
    )
    s = standing.select(
        "a_id",
        F.col("b_id").alias("s_b"),
        F.col("n_matched").alias("s_n"),
        F.col("score").alias("s_sc"),
    )
    d = delta_best.select(
        "a_id",
        F.col("b_id").alias("d_b"),
        F.col("n_matched").alias("d_n"),
        F.col("score").alias("d_sc"),
    )
    m = s.join(d, "a_id", "full_outer")
    # strictly-better displacement under (score, n_matched, -b_id)
    delta_wins = F.when(F.col("s_b").isNull(), F.lit(True)).otherwise(
        F.when(F.col("d_b").isNull(), F.lit(False)).otherwise(
            (F.col("d_sc") > F.col("s_sc"))
            | ((F.col("d_sc") == F.col("s_sc")) & (F.col("d_n") > F.col("s_n")))
            | (
                (F.col("d_sc") == F.col("s_sc"))
                & (F.col("d_n") == F.col("s_n"))
                & (F.col("d_b") < F.col("s_b"))
            )
        )
    )
    return m.select(
        "a_id",
        F.when(delta_wins, F.col("d_b")).otherwise(F.col("s_b")).alias("b_id"),
        F.when(delta_wins, F.col("d_n")).otherwise(F.col("s_n")).alias("n_matched"),
        F.when(delta_wins, F.col("d_sc")).otherwise(F.col("s_sc")).alias("score"),
        delta_wins.alias("changed"),
    )


def best_per_b(candidates: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Deterministic best-per-B reduction — the mirror of
    :func:`best_per_a` (score DESC, n_matched DESC, a_id ASC per b_id),
    honoring the same ``cfg.min_score`` floor.  This is the second
    standing table the MUTUAL incremental path maintains."""
    cfg = cfg or LinkConfig()
    agg = candidates
    if cfg.min_score:
        agg = agg.where(F.col("score") >= cfg.min_score)
    return (
        agg.withColumn("_rb", F.row_number().over(_rank_window("b_id", "a_id")))
        .where(F.col("_rb") == 1)
        .drop("_rb")
    )


def update_assignments_mutual(
    standing_a: DataFrame,
    standing_b: DataFrame,
    a_docs: DataFrame,
    b_delta: DataFrame,
    cfg: LinkConfig | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental ONE-TO-ONE (mutual-best) linkage — round 4 (VERDICT r3
    task 7).  The key identity: the mutual assignment over a candidate
    set is exactly ``best_per_a ⨝ best_per_b`` on (a_id, b_id) — a pair
    survives iff it is top-ranked from BOTH sides (`_assign`'s mutual
    semantics).  Both reductions are incrementally maintainable when only
    B records arrive:

    - per-A best: the existing strictly-better displacement merge
      (:func:`_merge_standing`) — delta-sized work;
    - per-B best: an OLD B's best A never changes (its candidate set is
      untouched by new B records), so the standing per-B table is the
      UNION with the delta's best-per-B reduction, passed through one
      b_id-keyed rank-1 window that enforces the one-row-per-b_id
      invariant (pass-through on well-formed disjoint inputs; resolves
      malformed/overlapping ones deterministically) — no cross-A
      rescoring of old state, which is why this is a delta merge and
      not the rebuild the round-3 raise feared.

    Inputs: ``standing_a`` = best-per-A rows (a_id, b_id, n_matched,
    score; `link_tables(..., mutual=False)` output), ``standing_b`` =
    best-per-B rows (same columns; :func:`best_per_b` over the original
    candidate pairs), ``b_delta`` = ONLY new B records (ids disjoint from
    the standing B corpus — the caller invariant).

    Returns ``(new_standing_a, new_standing_b, assignment)`` — the two
    updated standing tables (feed them to the next delta) and the mutual
    assignment (a_id, b_id, n_matched, score, changed), where ``changed``
    marks pairs whose a-side winner this delta created or displaced.
    Equivalence: matches the batch rebuild
    ``link_tables(a, b0 ∪ delta, mutual=True)`` wherever the
    incumbent-keep tie rule coincides with the rebuild's id-ascending
    tie (same caveat as the non-mutual path; oracle row
    `linkage_incremental_mutual` checks against a FULL independent
    rebuild).

    Scale: scoring ∝ delta (blocked vocab x vocab); the a-side merge is
    one a_id-keyed join; the b-side is a union + one b_id-keyed rank-1
    window (same order of work as the a-side merge join); the mutual
    join is keyed on (a_id, b_id) over two rank-1 tables — each orders
    smaller than the candidate table.
    """
    from dataclasses import replace

    from ..session import pooled_persist

    cfg = cfg or LinkConfig()
    base = replace(cfg, mutual=False)
    # both reductions (per-A and per-B) consume the delta scores — persist
    # or the blocked delta scoring runs twice
    delta_scores = pooled_persist(score_pairs(a_docs, b_delta, base))
    new_a = _merge_standing(standing_a, best_per_a(delta_scores, base))
    delta_b = best_per_b(delta_scores, base).select(
        "a_id", "b_id", "n_matched", "score", F.lit(True).alias("_new")
    )
    # Per-B invariant enforcement (ADVICE r4 + VERDICT r4 task 6): a raw
    # union trusts the caller twice — that standing_b has one row per b_id
    # AND that the delta's b_ids are disjoint from it.  Either violation
    # fans out through the mutual inner join below into duplicate
    # "one-to-one" assignments.  Resolve both with the SAME deterministic
    # rank-1 the per-B reduction uses (`_rank_window("b_id", "a_id")` —
    # score DESC, n_matched DESC, a_id ASC, matching the batch rebuild's
    # tie rule), `_new` DESC as the final exact-duplicate tiebreak.  On
    # well-formed disjoint inputs every b_id partition has one row and the
    # window is a pure pass-through; cost is one b_id-keyed shuffle of
    # standing ∪ delta — the same order as the a-side `_merge_standing`
    # join, still delta-proportional in rows scored.
    bw = Window.partitionBy("b_id").orderBy(
        F.col("score").desc(),
        F.col("n_matched").desc(),
        F.col("a_id").asc(),
        F.col("_new").desc(),
    )
    new_b = (
        standing_b.select(
            "a_id", "b_id", "n_matched", "score", F.lit(False).alias("_new")
        )
        .unionByName(delta_b)
        .withColumn("_rb", F.row_number().over(bw))
        .where(F.col("_rb") == 1)
        .drop("_rb")
    )
    assignment = (
        new_a.join(new_b.select("a_id", "b_id"), ["a_id", "b_id"], "inner")
        .select("a_id", "b_id", "n_matched", "score", "changed")
    )
    return new_a.drop("_new"), new_b.drop("_new"), assignment


def fs_decision_bands(
    pattern_counts: list[tuple[tuple[int, ...], int]],
    m: list[float],
    u: list[float],
    mu: float = 0.05,
    lam: float = 0.05,
) -> list[tuple[tuple[int, ...], int, float, str]]:
    """The Fellegi-Sunter OPTIMAL DECISION RULE (Fellegi & Sunter 1969,
    Theorem 1): order the agreement patterns by likelihood ratio, take
    patterns from the top into the LINK set while the accumulated
    false-match mass Σ P(γ|U) stays ≤ ``mu``, from the bottom into the
    NON-LINK set while the accumulated false-non-match mass Σ P(γ|M)
    stays ≤ ``lam``; everything between is POSSIBLE (clerical review).
    This is the canonical 1969 completion of the EM-learned m/u story:
    the error bounds are chosen, the thresholds are DERIVED.

    Cross-engine determinism: P(γ|M) / P(γ|U) are products of the
    bit-locked EM parameters; the cumulative sums run in INTEGER space
    (probabilities scaled by 1e9 and half-up rounded to BIGINT), so the
    accumulation is exact and order-independent — a DuckDB window sum and
    this sequential loop cannot disagree.  Ordering ties break on the
    pattern vector itself (DESC on the link side, ASC on the non-link
    side), mirrored in the oracle's ORDER BY.

    Driver-side like the EM: the pattern table is ≤ 2^F rows.

    Returns [(gamma, count, llr, band)] with band ∈ link / possible /
    non_link.
    """
    import math

    n_fields = len(m)
    rows = []
    for gamma, c in sorted(pattern_counts):
        pgm = pgu = 1.0
        for f in range(n_fields):
            pgm *= m[f] if gamma[f] else 1.0 - m[f]
            pgu *= u[f] if gamma[f] else 1.0 - u[f]
        rows.append(
            {
                "gamma": gamma,
                "c": c,
                "llr": _round9(math.log2(pgm / pgu)),
                "pgm9": math.floor(pgm * 1e9 + 0.5),
                "pgu9": math.floor(pgu * 1e9 + 0.5),
            }
        )
    mu9 = math.floor(mu * 1e9 + 0.5)
    lam9 = math.floor(lam * 1e9 + 0.5)
    cum = 0
    for r in sorted(
        rows, key=lambda r: (-r["llr"], tuple(-g for g in r["gamma"]))
    ):
        cum += r["pgu9"]
        r["cum_u9"] = cum
    cum = 0
    for r in sorted(rows, key=lambda r: (r["llr"], r["gamma"])):
        cum += r["pgm9"]
        r["cum_m9"] = cum
    out = []
    for r in rows:
        band = (
            "link"
            if r["cum_u9"] <= mu9
            else "non_link"
            if r["cum_m9"] <= lam9
            else "possible"
        )
        out.append((r["gamma"], r["c"], r["llr"], band))
    return out


def link_records_decisions(
    a_recs: DataFrame,
    b_recs: DataFrame,
    fields: list[str],
    cfg: LinkConfig | None = None,
    n_iter: int = 5,
    mu: float = 0.05,
    lam: float = 0.05,
) -> DataFrame:
    """Per-pattern FS decision table over the blocked candidate pairs:
    (g_<field>..., c, llr, band) — the triage a production linkage ships
    alongside its assignment (how many pairs auto-link, how many need
    clerical review, at which learned LLR cut).  Same blocked evidence,
    EM fit, and determinism contract as :func:`link_records_learned`;
    the band rule is :func:`fs_decision_bands`.

    Scale: one groupBy to pattern counts (≤ 2^F rows), driver-side EM +
    band rule over those rows — cost identical to the learned path's
    weight fit; the result is field-count-bounded, not data-bounded.
    """
    cfg = cfg or LinkConfig()
    if not fields:
        raise ValueError("fields must be non-empty")
    from ..session import pooled_persist

    g = pooled_persist(field_agreements(a_recs, b_recs, fields, cfg))
    gcols = [f"g_{f}" for f in fields]
    counts = g.groupBy(*gcols).agg(F.count(F.lit(1)).alias("c")).collect()
    pattern_counts = [
        (tuple(int(r[c]) for c in gcols), int(r["c"])) for r in counts
    ]
    p_m, m, u = fellegi_sunter_em(pattern_counts, len(fields), n_iter=n_iter)
    bands = fs_decision_bands(pattern_counts, m, u, mu=mu, lam=lam)
    # calibrated posterior P(M|gamma) = p*P(g|M) / (p*P(g|M)+(1-p)*P(g|U))
    # — the third leg of the FS triad (learned weights -> decision bands ->
    # match probabilities a downstream consumer can threshold or average)
    def posterior(gamma: tuple[int, ...]) -> float:
        pm = p_m
        pu = 1.0 - p_m
        for f in range(len(fields)):
            pm *= m[f] if gamma[f] else 1.0 - m[f]
            pu *= u[f] if gamma[f] else 1.0 - u[f]
        return _round9(pm / (pm + pu))

    spark = a_recs.sparkSession
    rows = [
        tuple(int(x) for x in gamma)
        + (int(c), float(llr), band, posterior(gamma))
        for gamma, c, llr, band in bands
    ]
    schema = (
        ", ".join(f"{c} int" for c in gcols)
        + ", c bigint, llr double, band string, posterior double"
    )
    return spark.createDataFrame(rows, schema)


def _field_tokens(
    recs: DataFrame, fields: dict[str, float], cfg: LinkConfig, id_alias: str
) -> DataFrame:
    """Melt (doc_id, <field cols>) into distinct (id, field, token) rows,
    rare-filtered per (field, token) — a token common WITHIN a field
    (every record's city is "springfield") is stopword-grade evidence for
    that field even if globally rare."""
    stack = F.explode(
        F.array(*[
            F.struct(
                F.lit(name).alias("field"),
                F.col(name).cast("string").alias("raw"),
            )
            for name in fields
        ])
    ).alias("fv")
    toks = (
        recs.select(F.col("doc_id").alias(id_alias), stack)
        .select(
            id_alias,
            F.col("fv.field").alias("field"),
            F.explode(
                F.split(normalize_term(F.col("fv.raw")), " ")
            ).alias("token"),
        )
        .where(F.length("token") >= cfg.min_token_len)
        .distinct()
    )
    dfc = toks.groupBy("field", "token").agg(F.count("*").alias("df"))
    frequent = dfc.where(F.col("df") > cfg.max_df).select("field", "token")
    return toks.join(F.broadcast(frequent), ["field", "token"], "left_anti")


def link_records(
    a_recs: DataFrame,
    b_recs: DataFrame,
    fields: dict[str, float],
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """Schema-aware record linkage: per-FIELD token evidence with field
    agreement weights — the master-data shape (a light Fellegi-Sunter:
    each field carries a fixed agreement weight instead of learned m/u
    odds; a phone-field match tells more than a city-field match).

    ``fields`` maps column name -> weight; both inputs need (doc_id +
    those columns).  A token pair only counts as evidence when it matches
    within the SAME field; its weight is
    ``field_weight * (1 - d / max_len)``.  Output: best B per A —
    (a_id, b_id, n_matched, score, rank), floored/ranked exactly like
    :func:`link_tables` (``cfg.min_score`` / ``cfg.mutual`` honored).

    Scale: the token-similarity table is still computed ONCE on the
    field-agnostic distinct vocabulary (deletion-key blocked, kernel
    scored) — fields multiply nothing there; the field dimension rides
    the evidence join as an equality key, and the rare filter runs per
    (field, token) so one field's stopwords don't poison another's.
    """
    cfg = cfg or LinkConfig()
    if not fields:
        raise ValueError("fields must be non-empty")
    ta = _field_tokens(a_recs, fields, cfg, "a_id")
    tb = _field_tokens(b_recs, fields, cfg, "b_id")
    va = ta.select("token").distinct()
    vb = tb.select("token").distinct()
    tm = cross_vocab_matches(va, vb, cfg).select(
        "tok_a",
        "tok_b",
        (
            1.0 - F.col("distance") / F.greatest(F.length("tok_a"), F.length("tok_b"))
        ).alias("w_tok"),
    )
    weight = F.create_map(
        *[x for name, w in sorted(fields.items()) for x in (F.lit(name), F.lit(float(w)))]
    )
    ev = (
        ta.select("a_id", "field", F.col("token").alias("tok_a"))
        .join(tm.hint("shuffle_hash"), "tok_a")
        .select("a_id", "field", "tok_a", "tok_b", "w_tok")
        .join(
            tb.select("b_id", "field", F.col("token").alias("tok_b"))
            .hint("shuffle_hash"),
            ["field", "tok_b"],
        )
        .select(
            "a_id", "b_id",
            F.xxhash64("field", "tok_a", "tok_b").alias("pair_id"),
            (weight[F.col("field")] * F.col("w_tok")).alias("w"),
        )
    )
    agg = (
        ev.groupBy("a_id", "b_id")
        .agg(
            F.countDistinct("pair_id").alias("n_matched"),
            F.round(F.sum("w"), 6).alias("score"),
        )
        .where(F.col("n_matched") >= cfg.min_token_matches)
    )
    return _assign(agg, cfg)


# ---------------------------------------------------------------------------
# learned weights: Fellegi-Sunter with EM (round 4; VERDICT r3 task 3)
# ---------------------------------------------------------------------------


def _round9(x: float) -> float:
    """Round-half-UP to 9 dp via the explicit floor formula — the SAME
    formula the DuckDB oracle uses (``floor(x*1e9 + 0.5)/1e9``), so the
    EM trajectories stay bit-locked across engines (Python's built-in
    round() is banker's rounding and would drift)."""
    import math

    return math.floor(x * 1e9 + 0.5) / 1e9


# clamp bounds as exact decimal literals shared with the oracle SQL
# (1.0 - 1e-6 computed at runtime is 0.99999900000000008..., a different
# double from the parsed literal 0.999999)
_EM_CLAMP = 1e-6
_EM_CLAMP_HI = 0.999999


def field_agreements(
    a_recs: DataFrame,
    b_recs: DataFrame,
    fields: list[str],
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """Per-field binary agreement vectors over the BLOCKED candidate pairs:
    (a_id, b_id, g_<field> int 0/1 per field).  gamma_f = 1 iff the pair
    shares at least one fuzzy-matching token (<= cfg.max_distance) in
    field f.  Candidate set = pairs with >= 1 agreeing field — the same
    deletion-key-blocked evidence join every linkage path uses; at 10^12
    records the comparison space is the blocked one, which is also the
    population EM's u-probabilities describe (standard practice: m/u are
    estimated on the compared pairs, not the full cross product).
    """
    cfg = cfg or LinkConfig()
    fw = {f: 1.0 for f in fields}
    ta = _field_tokens(a_recs, fw, cfg, "a_id")
    tb = _field_tokens(b_recs, fw, cfg, "b_id")
    va = ta.select("token").distinct()
    vb = tb.select("token").distinct()
    tm = cross_vocab_matches(va, vb, cfg).select("tok_a", "tok_b")
    ag = (
        ta.select("a_id", "field", F.col("token").alias("tok_a"))
        .join(tm.hint("shuffle_hash"), "tok_a")
        .join(
            tb.select("b_id", "field", F.col("token").alias("tok_b"))
            .hint("shuffle_hash"),
            ["field", "tok_b"],
        )
        .select("a_id", "b_id", "field")
        .distinct()
    )
    return ag.groupBy("a_id", "b_id").agg(
        *[
            F.max((F.col("field") == f).cast("int")).alias(f"g_{f}")
            for f in fields
        ]
    )


def fellegi_sunter_em(
    pattern_counts: list[tuple[tuple[int, ...], int]],
    n_fields: int,
    n_iter: int = 5,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> tuple[float, list[float], list[float]]:
    """Fixed-iteration EM for the Fellegi-Sunter m/u probabilities, run on
    the agreement-PATTERN sufficient statistics (<= 2^F rows — the
    driver-side table is bounded by the field count, NOT the pair count,
    so the same code serves 10^12 candidate pairs).

    Deterministic by construction: fixed iteration count, fixed init,
    every parameter re-rounded to 9 dp per iteration with the explicit
    half-away formula (:func:`_round9`) and clamped to
    [1e-6, 0.999999] — the DuckDB oracle replays the identical unrolled
    iterations as chained CTEs and lands on the identical doubles.

    Returns (p, m[f], u[f]).  Reference analog: the reference hard-codes
    per-operation costs (``transducer/algorithm.rs``); FS-EM is the
    linkage-native way to LEARN the evidence weights from the data
    (Fellegi & Sunter 1969; Winkler 1988 EM formulation).
    """
    p = init_p
    m = [init_m] * n_fields
    u = [init_u] * n_fields
    pats = sorted(pattern_counts)
    if not pats:
        # no blocked pairs at all (disjoint vocabularies / empty side):
        # return the init parameters so the caller scores an empty
        # evidence table gracefully — the fixed-weight path returns an
        # empty linkage on the same input, and the learned path must not
        # crash where its sibling degrades.
        return _round9(p), [_round9(x) for x in m], [_round9(x) for x in u]
    for _ in range(n_iter):
        sw = swc = sc = 0.0
        sm = [0.0] * n_fields
        su = [0.0] * n_fields
        for gamma, c in pats:
            pm = p
            pu = 1.0 - p
            for f in range(n_fields):
                pm *= m[f] if gamma[f] else 1.0 - m[f]
                pu *= u[f] if gamma[f] else 1.0 - u[f]
            w = pm / (pm + pu)
            sc += c
            sw += c * w
            swc += c * (1.0 - w)
            for f in range(n_fields):
                if gamma[f]:
                    sm[f] += c * w
                    su[f] += c * (1.0 - w)
        p = _round9(min(max(sw / sc, _EM_CLAMP), _EM_CLAMP_HI))
        m = [
            _round9(min(max(sm[f] / sw, _EM_CLAMP), _EM_CLAMP_HI))
            for f in range(n_fields)
        ]
        u = [
            _round9(min(max(su[f] / swc, _EM_CLAMP), _EM_CLAMP_HI))
            for f in range(n_fields)
        ]
    return p, m, u


def link_records_learned(
    a_recs: DataFrame,
    b_recs: DataFrame,
    fields: list[str],
    cfg: LinkConfig | None = None,
    n_iter: int = 5,
) -> DataFrame:
    """Record linkage with LEARNED field weights (full Fellegi-Sunter):
    per-field agreement vectors over blocked candidates → EM-estimated
    m/u probabilities → log-likelihood-ratio scores → the shared
    deterministic assignment (:func:`_assign`).

    score = sum_f [ gamma_f * log2(m_f/u_f)
                    + (1-gamma_f) * log2((1-m_f)/(1-u_f)) ], rounded to 6.

    vs :func:`link_records`: there the caller HANDS us the field weights;
    here the evidence table itself says a phone agreement is worth more
    than a city agreement (m/u odds), with disagreements scored too
    (negative evidence) — the textbook FS upgrade.

    Scale: the only extra cost over `link_records` is one groupBy to
    pattern counts (<= 2^F rows collected — bounded by field count) and a
    driver-side EM over those rows; scoring is a literal-weight
    projection.  Output: (a_id, b_id, n_matched, score, rank) rank-1
    rows, n_matched = number of agreeing fields.
    """
    import math

    cfg = cfg or LinkConfig()
    if not fields:
        raise ValueError("fields must be non-empty")
    # the agreement table feeds BOTH the EM sufficient statistics (an
    # action) and the scoring projection — persist it or the whole blocked
    # evidence join runs twice (measured ~2x on the oracle fixture)
    from ..session import pooled_persist

    g = pooled_persist(field_agreements(a_recs, b_recs, fields, cfg))
    gcols = [f"g_{f}" for f in fields]
    counts = g.groupBy(*gcols).agg(F.count(F.lit(1)).alias("c")).collect()
    pattern_counts = [
        (tuple(int(r[c]) for c in gcols), int(r["c"])) for r in counts
    ]
    _, m, u = fellegi_sunter_em(pattern_counts, len(fields), n_iter=n_iter)
    w_agree = [_round9(math.log2(m[f] / u[f])) for f in range(len(fields))]
    w_dis = [
        _round9(math.log2((1.0 - m[f]) / (1.0 - u[f])))
        for f in range(len(fields))
    ]
    score = None
    for f in range(len(fields)):
        term = F.when(F.col(gcols[f]) == 1, F.lit(w_agree[f])).otherwise(
            F.lit(w_dis[f])
        )
        score = term if score is None else score + term
    n_matched = None
    for c in gcols:
        t = F.col(c).cast("bigint")
        n_matched = t if n_matched is None else n_matched + t
    agg = g.select(
        "a_id",
        "b_id",
        n_matched.alias("n_matched"),
        F.round(score, 6).alias("score"),
    ).where(F.col("n_matched") >= 1)
    return _assign(agg, cfg)
