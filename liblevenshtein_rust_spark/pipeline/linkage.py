"""Cross-table record linkage — match records of table A to records of
table B (customers ↔ suppliers, arrivals ↔ a master table), the classic
two-corpus form of entity resolution that the self-join ER pipeline
(`pipeline/er.py`) doesn't directly expose.

Same engineering altitude as the ER pipeline, restated for two sides:

- **Vocabulary-level matching, cross form**: the two RARE-token
  vocabularies are joined through shared deletion-neighborhood keys —
  an A-vocab × B-vocab blocked join (no self-join, no canonicalization,
  no triangle salting: the sides are disjoint by construction).  Deletion
  blocking is exact for d ≤ 2 (``functions/blocking_keys.py``), so no
  recall is lost vs the reference's trie-intersection traversal
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
    ``max_distance`` — blocked through shared deletion keys, kernel-scored.
    Exact A∩B tokens fall out of the same join (same keys, distance 0)."""
    n = max(min(cfg.max_distance, 2), 1)

    def keyed(vocab: DataFrame, col: str) -> DataFrame:
        return vocab.select(
            F.col("token").alias(col),
            F.explode(
                deletion_neighborhood_keys(F.col("token"), n=n)
            ).alias("k"),
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
    """Best B-side match per A-side record.

    Output: (a_id, b_id, n_matched, score, rank) for the top match of
    every A record with >= ``min_token_matches`` matched rare-token pairs;
    ``score`` = Σ (1 − d/max_len) over distinct matched token pairs,
    rounded to 6 (the cross-engine determinism contract) BEFORE ranking.
    """
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
    agg = (
        ev.groupBy("a_id", "b_id")
        .agg(
            F.countDistinct("pair_id").alias("n_matched"),
            F.round(F.sum("w"), 6).alias("score"),
        )
        .where(F.col("n_matched") >= cfg.min_token_matches)
    )
    w = Window.partitionBy("a_id").orderBy(
        F.col("score").desc(), F.col("n_matched").desc(), F.col("b_id")
    )
    return agg.withColumn("rank", F.row_number().over(w)).where(F.col("rank") == 1)
