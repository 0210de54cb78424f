"""Candidate generation + pairwise scoring — the engine's fuzzy query core.

Spark-first restatement of the reference's query entry points
(``Transducer::query`` ``src/transducer/mod.rs:360-369``, ``query_ordered``
``:418-427``, ``query_filtered`` ``:548-564``, fuzzy multimap
``src/cache/multimap.rs:288``):

    probes ⋈ blocking-keys ⋈ dictionary  →  length prefilter (JVM)
    →  pair dedupe  →  vectorized kernel accept/distance  →  rank / agg

Design notes for 100 TB:
- The blocking join is a shuffled equi-join on `key`; AQE splits skewed
  keys at runtime and `candidate_cap` hard-bounds pathological keys.
- `dedupe_pairs` canonicalizes (least, greatest) before the kernel — the
  distributed analog of the reference's symmetric MemoCache
  (``src/distance/mod.rs:29-208``): d(a,b)=d(b,a), score each pair once.
- The length prefilter runs JVM-side *before* Arrow serialization.
- Small probe sets are broadcast (`F.broadcast`) so the dictionary never
  shuffles for interactive queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.blocking_keys import (
    d3_hybrid_keys,
    deletion_neighborhood_keys,
    merge_split_keys,
    ngram_keys_unpositioned,
    normalize_term,
    prefix_deletion_keys,
)
from ..functions.udfs import edit_distance_udf, length_prefilter
from ..kernel.distances import MERGE_AND_SPLIT, STANDARD, TRANSPOSITION


def explode_keys(df: DataFrame, term_col: str, keys_col, out: str = "key") -> DataFrame:
    """Attach + explode blocking keys for `term_col`."""
    return df.withColumn(out, F.explode(keys_col))


def candidate_pairs(
    probes: DataFrame,
    dictionary: DataFrame,
    max_distance: int,
    probe_col: str = "query",
    term_col: str = "term",
    broadcast_probes: bool = True,
    candidate_cap: int | None = None,
    use_deletion_keys: bool = True,
    key_budget: int | None = None,
    variant: str | None = None,
) -> DataFrame:
    """Join probes to dictionary on shared blocking keys.

    Key scheme: deletion-neighborhood keys (exact for n<=2) when
    ``use_deletion_keys``; at n=3 the length-banded depth-3-deletion /
    positional-2-gram hybrid (:func:`d3_hybrid_keys` — exact for Standard
    and OSA, band proof in ``functions/blocking_keys``); else unpositioned
    n-grams (recall-complete only when both sides are long enough that n
    edits can't destroy every gram — the n>=4 fallback, not exact for
    short strings).

    ``key_budget`` overrides the deletion-key depth when the variant's ops
    span more than one standard edit (merge/split count as up to two), while
    the length prefilter stays at ``max_distance`` (every variant op changes
    string length by at most 1).

    Returns distinct (probe_col, term_col) candidate pairs.  ``candidate_cap``
    truncates per-key candidate lists (logged via a `truncated` marker column
    aggregated by the caller) — the explosion guard SURVEY.md §4 item 4.

    ``variant`` defaults to Standard, EXCEPT at effective budget 3 where the
    d3 band constants differ per variant (3 transpositions can kill up to 9
    2-grams — the OSA band is wider): there the caller must pass its actual
    variant explicitly or this raises, so a transposition caller can never
    silently get the narrower Standard band (ADVICE r4).
    """
    n = max_distance
    kb = key_budget if key_budget is not None else n
    if kb == 3 and variant is None:
        raise ValueError(
            "candidate_pairs with an effective key budget of 3 requires an "
            "explicit variant= (the d=3 hybrid band constants are "
            "variant-specific; Standard's band is incomplete for OSA)"
        )
    variant = STANDARD if variant is None else variant
    if use_deletion_keys and kb <= 2:
        pkeys = deletion_neighborhood_keys(F.col(probe_col), n=min(kb, 2) or 1)
        dkeys = deletion_neighborhood_keys(F.col(term_col), n=min(kb, 2) or 1)
    elif use_deletion_keys and kb == 3 and variant in (STANDARD, TRANSPOSITION):
        osa = variant == TRANSPOSITION
        pkeys = d3_hybrid_keys(F.col(probe_col), transposition=osa)
        dkeys = d3_hybrid_keys(F.col(term_col), transposition=osa)
    else:
        pkeys = ngram_keys_unpositioned(F.col(probe_col))
        dkeys = ngram_keys_unpositioned(F.col(term_col))

    p = probes.select(probe_col).where(F.col(probe_col).isNotNull()).distinct()
    p = p.withColumn("key", F.explode(pkeys))
    d = dictionary.select(term_col).where(F.col(term_col).isNotNull()).distinct()
    d = d.withColumn("key", F.explode(dkeys))

    if candidate_cap is not None:
        w = Window.partitionBy("key").orderBy(term_col)
        d = (
            d.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= candidate_cap)
            .drop("_rk")
        )

    if broadcast_probes:
        p = F.broadcast(p)
    pairs = p.join(d, "key").select(probe_col, term_col).distinct()
    return pairs.where(length_prefilter(F.col(probe_col), F.col(term_col), n))


def _keyed_candidate_pairs(
    probes: DataFrame,
    dictionary: DataFrame,
    probe_keys,
    term_keys,
    probe_col: str,
    term_col: str,
    broadcast_probes: bool,
    pair_filter=None,
) -> DataFrame:
    """Generic blocked candidate generation: explode per-side key arrays,
    equi-join on key, dedupe, optional length filter.  All key families are
    recall-complete supersets; the kernel is the exact filter."""
    p = probes.select(probe_col).where(F.col(probe_col).isNotNull()).distinct()
    p = p.withColumn("key", F.explode(probe_keys))
    d = dictionary.select(term_col).where(F.col(term_col).isNotNull()).distinct()
    d = d.withColumn("key", F.explode(term_keys))
    if broadcast_probes:
        p = F.broadcast(p)
    pairs = p.join(d, "key").select(probe_col, term_col).distinct()
    if pair_filter is not None:
        pairs = pairs.where(pair_filter)
    return pairs


def prefix_candidate_pairs(
    probes: DataFrame,
    dictionary: DataFrame,
    max_distance: int,
    probe_col: str = "query",
    term_col: str = "term",
    broadcast_probes: bool = True,
    max_probe_len: int | None = None,
) -> DataFrame:
    """PREFIX-mode blocking: probe emits its deletion neighborhood, term
    emits the deletion neighborhoods of its prefixes up to length
    ``max_probe_len + n`` (exact — a prefix match at distance n can't use a
    longer prefix; see :func:`prefix_deletion_keys`).  The reference walks
    the trie for this (``ordered_query.rs:320``); prefix keys are the join
    form of the same prefix-sharing.

    ``max_probe_len`` defaults to one scalar aggregate over the probe table
    (a bounded driver fetch, same class as the sorted-neighborhood offsets).
    """
    n = max_distance
    if max_probe_len is None:
        row = probes.agg(F.max(F.length(probe_col))).first()
        max_probe_len = int(row[0] or 0)
    return _keyed_candidate_pairs(
        probes,
        dictionary,
        deletion_neighborhood_keys(F.col(probe_col), n=n),
        prefix_deletion_keys(F.col(term_col), n=n, max_prefix_len=max_probe_len + n),
        probe_col,
        term_col,
        broadcast_probes,
        # a term only matches if some prefix reaches within n of the probe:
        # that prefix has length >= len(probe) - n, so the term must too
        pair_filter=F.length(term_col) >= F.length(probe_col) - n,
    )


def substring_candidate_pairs(
    probes: DataFrame,
    dictionary: DataFrame,
    max_distance: int,
    probe_col: str = "query",
    term_col: str = "term",
    broadcast_probes: bool = True,
) -> DataFrame:
    """SUBSTRING-mode blocking — the mirror of prefix mode: the term must be
    within n of some *prefix of the probe*, so the PROBE emits its
    prefix-deletion keys (all prefixes — the probe side is the small side)
    and the dictionary emits plain deletion keys, the same index the
    standard mode already uses.  Reference analog: the suffix-automaton
    index (``suffix_automaton.rs:758``) — the inverted index over term
    deletion variants plays the automaton's role."""
    n = max_distance
    return _keyed_candidate_pairs(
        probes,
        dictionary,
        prefix_deletion_keys(F.col(probe_col), n=n),
        deletion_neighborhood_keys(F.col(term_col), n=n),
        probe_col,
        term_col,
        broadcast_probes,
        pair_filter=F.length(probe_col) >= F.length(term_col) - n,
    )


def merge_split_candidate_pairs(
    probes: DataFrame,
    dictionary: DataFrame,
    probe_col: str = "query",
    term_col: str = "term",
    broadcast_probes: bool = True,
) -> DataFrame:
    """MergeAndSplit n=2 blocking via the hybrid depth-4-deletion / 3-gram
    key family (:func:`merge_split_keys`): every op is bridged by <= 2
    deletions per side, so depth-2n deletion keys are exact; long strings
    switch to 3-grams (see the band proof in ``functions/blocking_keys``).
    Each op changes length by at most 1, so the length prefilter holds at
    n."""
    return _keyed_candidate_pairs(
        probes,
        dictionary,
        merge_split_keys(F.col(probe_col), n=2),
        merge_split_keys(F.col(term_col), n=2),
        probe_col,
        term_col,
        broadcast_probes,
        pair_filter=length_prefilter(F.col(probe_col), F.col(term_col), 2),
    )


def fuzzy_query(
    probes: DataFrame,
    dictionary: DataFrame,
    max_distance: int,
    variant: str = STANDARD,
    probe_col: str = "query",
    term_col: str = "term",
    prefix_mode: bool = False,
    substring_mode: bool = False,
    allowed_subs: frozenset | None = None,
    broadcast_probes: bool = True,
) -> DataFrame:
    """`Transducer::query_with_distance` as a DataFrame op.

    Output: (query, term, distance) for every dictionary term within
    ``max_distance`` of each probe.  Every mode is key-blocked (equi-join,
    never a dictionary scan):

    - standard/transposition: symmetric-deletion keys at depth n (n<=2) —
      exact for OSA distance n (SymSpell property); at n=3 the
      length-banded depth-3-deletion / positional-2-gram hybrid
      (:func:`d3_hybrid_keys`), exact for both variants;
    - prefix mode: probe deletion keys × term *prefix*-deletion keys
      (:func:`prefix_candidate_pairs`);
    - substring mode: the mirror — probe prefix-deletion keys × term
      deletion keys (:func:`substring_candidate_pairs`);
    - MergeAndSplit: an op spans up to two standard edits, so n=1 doubles
      the deletion-key depth and n=2 uses the hybrid depth-4/3-gram family
      (:func:`merge_split_candidate_pairs`).

    The broadcast-probe dictionary scan survives only as the fallback for
    combinations without a key scheme (MergeAndSplit n>2, and prefix/
    substring under MergeAndSplit) — correct but not scale-safe; callers at
    cluster scale should stay inside the keyed modes.
    """
    n = max_distance
    keyed_variant = variant != MERGE_AND_SPLIT
    if prefix_mode and keyed_variant and 1 <= n <= 2:
        pairs = prefix_candidate_pairs(
            probes, dictionary, n, probe_col, term_col, broadcast_probes
        )
    elif substring_mode and keyed_variant and 1 <= n <= 2:
        pairs = substring_candidate_pairs(
            probes, dictionary, n, probe_col, term_col, broadcast_probes
        )
    elif (
        variant == MERGE_AND_SPLIT
        and n == 2
        and not (prefix_mode or substring_mode)
    ):
        pairs = merge_split_candidate_pairs(
            probes, dictionary, probe_col, term_col, broadcast_probes
        )
    elif prefix_mode or substring_mode or (
        variant == MERGE_AND_SPLIT and 2 * n > 2
    ):
        # fallback: cross join against (broadcast) probes; kernel rejects
        # cheaply.  Only reachable for mode combinations listed above.
        p = probes.select(probe_col).distinct()
        if broadcast_probes:
            p = F.broadcast(p)
        pairs = dictionary.select(term_col).distinct().join(p)
        if not (prefix_mode or substring_mode):
            pairs = pairs.where(
                length_prefilter(F.col(probe_col), F.col(term_col), max_distance)
            )
    else:
        pairs = candidate_pairs(
            probes,
            dictionary,
            max_distance,
            probe_col,
            term_col,
            broadcast_probes=broadcast_probes,
            key_budget=2 * max_distance if variant == MERGE_AND_SPLIT else None,
            variant=variant,
        )
    dist = edit_distance_udf(
        max_distance,
        variant,
        prefix_mode=prefix_mode,
        substring_mode=substring_mode,
        allowed_subs=allowed_subs,
    )
    out = pairs.withColumn("distance", dist(F.col(probe_col), F.col(term_col)))
    return out.where(F.col("distance") >= 0)


def _weighted_blocking_bounds(weights, budget: float) -> dict:
    """Blocking-relevant bounds for a generalized op set at ``budget``:
    worst-case query/term chars consumed by non-match ops (``dq``/``dt`` —
    the deletion-key depth needed per side), worst-case length drift
    (``max_delta`` — the length-prefilter bound), op-count bound
    (``max_ops``), and widest segment (``max_seg``).  Each is the LP bound
    floor(budget * max_op(metric/weight)); zero-weight ops (unbounded
    applications) force the caller to the fallback path (``unbounded``)."""
    import math

    # (query_consumed ty, term_consumed tx, weight) per enabled op; kernel
    # orientation: delete eats a query char, insert eats a term char.
    ops = [(1, 1, weights.substitute), (0, 1, weights.insert), (1, 0, weights.delete)]
    if weights.transpose is not None:
        ops.append((2, 2, weights.transpose))
    if weights.merge is not None:
        ops.append((2, 1, weights.merge))
    if weights.split is not None:
        ops.append((1, 2, weights.split))
    from ..kernel.generalized import op_shape

    ops += [
        (ty, tx, wgt)
        for tx, ty, wgt, _, _ in (op_shape(o) for o in weights.extra_ops)
    ]
    if any(w == 0 for _, _, w in ops):
        return {"unbounded": True}

    def bound(metric) -> int:
        return math.floor(
            budget * max((metric(ty, tx) / w for ty, tx, w in ops), default=0)
            + 1e-9
        )

    return {
        "unbounded": False,
        "dq": bound(lambda ty, tx: ty),
        "dt": bound(lambda ty, tx: tx),
        "max_delta": bound(lambda ty, tx: abs(ty - tx)),
        "max_ops": bound(lambda ty, tx: 1),
        "max_seg": max((max(ty, tx) for ty, tx, _ in ops), default=1),
    }


def fuzzy_query_weighted(
    probes: DataFrame,
    dictionary: DataFrame,
    max_distance: float,
    weights,
    probe_col: str = "query",
    term_col: str = "term",
    broadcast_probes: bool = True,
) -> DataFrame:
    """Fuzzy query under a runtime-weighted operation set
    (``GeneralizedAutomaton``, reference ``generalized/mod.rs``; restricted
    multichar ops per ``operation_type.rs:46-68``): output
    (query, term, distance) with the weighted distance <= budget.

    Blocking is chosen from :func:`_weighted_blocking_bounds`: two strings
    within weighted distance n agree after removing the chars the ops
    touched — at most ``dq`` from the query and ``dt`` from the term — so
    deletion neighborhoods at those depths must intersect (the SymSpell
    argument, op-weight generalized):

    - ``max(dq, dt) <= 2``: plain deletion keys at that depth;
    - depths <= 4, length drift <= 2, and total gram damage
      ``max_ops * (max_seg + 2) <= 8``: the merge-split hybrid
      depth-4-deletion / 3-gram family (its band proof needs exactly those
      bounds — see ``functions/blocking_keys``);
    - otherwise (incl. any zero-weight op, whose application count is
      unbounded): broadcast-probe scan, correct but not scale-safe.

    The length prefilter uses the op-derived drift bound ``max_delta``."""
    from ..functions.blocking_keys import merge_split_keys
    from ..functions.udfs import generalized_distance_udf

    b = _weighted_blocking_bounds(weights, float(max_distance))
    if not b["unbounded"] and max(b["dq"], b["dt"]) <= 2:
        pairs = candidate_pairs(
            probes,
            dictionary,
            b["max_delta"],
            probe_col,
            term_col,
            broadcast_probes=broadcast_probes,
            key_budget=max(b["dq"], b["dt"], 1),
        )
    elif (
        not b["unbounded"]
        and max(b["dq"], b["dt"]) <= 4
        and b["max_delta"] <= 2
        and b["max_ops"] * (b["max_seg"] + 2) <= 8
    ):
        pairs = _keyed_candidate_pairs(
            probes,
            dictionary,
            merge_split_keys(F.col(probe_col), n=2),
            merge_split_keys(F.col(term_col), n=2),
            probe_col,
            term_col,
            broadcast_probes,
            pair_filter=length_prefilter(
                F.col(probe_col), F.col(term_col), b["max_delta"]
            ),
        )
    else:
        p = probes.select(probe_col).distinct()
        if broadcast_probes:
            p = F.broadcast(p)
        pairs = dictionary.select(term_col).distinct().join(p)
        if not b["unbounded"]:
            pairs = pairs.where(
                length_prefilter(F.col(probe_col), F.col(term_col), b["max_delta"])
            )
    dist = generalized_distance_udf(max_distance, weights)
    out = pairs.withColumn("distance", dist(F.col(probe_col), F.col(term_col)))
    return out.where(F.col("distance") >= 0)


def fuzzy_query_ordered(
    probes: DataFrame,
    dictionary: DataFrame,
    max_distance: int,
    variant: str = STANDARD,
    limit: int | None = None,
    **kw,
) -> DataFrame:
    """`query_ordered` contract (``ordered_query.rs:30-41``): results sorted
    by (distance ASC, term ASC) per probe; optional per-probe top-k."""
    res = fuzzy_query(probes, dictionary, max_distance, variant, **kw)
    if limit is not None:
        w = Window.partitionBy("query").orderBy("distance", "term")
        res = (
            res.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= limit)
            .drop("rank")
        )
    return res.orderBy("query", "distance", "term")


def fuzzy_multimap_query(
    probes: DataFrame,
    mapped_dictionary: DataFrame,
    max_distance: int,
    variant: str = STANDARD,
    probe_col: str = "query",
    term_col: str = "term",
    value_col: str = "value",
) -> DataFrame:
    """FuzzyMultiMap::query (``src/cache/multimap.rs:83-112``): fuzzy-match
    keys, union all matched keys' values per probe (HashSet-union semantics →
    distinct aggregation).  ``values`` materializes the unioned value
    collection itself, sorted — the ``CollectionAggregate`` contract
    (``multimap.rs:67-80``: HashSet/BTreeSet union); the summary columns
    (n/min/max) stay for cheap cardinality-only consumers.  At scale the
    array column is bounded by the per-probe distinct-value fan-out, the
    same bound the reference's in-memory set union pays."""
    matches = fuzzy_query(
        probes,
        mapped_dictionary.select(term_col).distinct(),
        max_distance,
        variant,
        probe_col=probe_col,
        term_col=term_col,
    )
    joined = matches.join(mapped_dictionary, term_col)
    return joined.groupBy(probe_col).agg(
        F.countDistinct(value_col).alias("n_values"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.countDistinct(term_col).alias("n_terms"),
        F.sort_array(F.collect_set(value_col)).alias("values"),
    )


def dedupe_pairs(df: DataFrame, a: str, b: str) -> DataFrame:
    """Canonicalize + dedupe symmetric pairs (MemoCache analog)."""
    return (
        df.select(
            F.least(F.col(a), F.col(b)).alias(a),
            F.greatest(F.col(a), F.col(b)).alias(b),
        )
        .where(F.col(a) < F.col(b))
        .distinct()
    )
