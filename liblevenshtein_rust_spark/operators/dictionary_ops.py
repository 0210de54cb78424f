"""Dictionary-surface parity operators — the reference APIs not yet covered
by the fuzzy-join core.

| reference                                            | here                      |
|------------------------------------------------------|---------------------------|
| PrefixZipper::with_prefix (prefix_zipper.rs:130)     | prefix_iterate            |
| Transducer::query_filtered (mod.rs:548-564)          | query_filtered            |
| Transducer::query_by_value_set (mod.rs:607-623)      | query_by_value_set        |
| MutableMappedDictionary::union_with (mod.rs:447-455) | union_with                |
| MutableMappedDictionary::union_replace (mod.rs:457)  | union_replace             |
| SuffixAutomaton::match_positions (suffix_automaton.rs:758) | substring_match_positions |
| substring query mode (dictionary/mod.rs:228-241)     | fuzzy_substring_query     |

All pure DataFrame ops; the value-filter/value-set variants demonstrate the
reference's "filter during traversal" as Catalyst predicate pushdown: the
filter sits on the dictionary side *before* the blocking join, so the scan
prunes first (the 10-100x claim of value_filtered_query.rs is exactly a
selectivity win, which Spark gets for free once the plan is declarative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel.distances import STANDARD
from .matching import fuzzy_query


def prefix_iterate(dictionary: DataFrame, prefix: str, term_col: str = "term") -> DataFrame:
    """All terms with the given prefix, ordered — PrefixZipper's O(k)+O(m)
    iteration becomes a pushed-down range predicate on the sorted term
    column (parquet min/max stats prune whole files at scale)."""
    return dictionary.where(F.col(term_col).startswith(prefix)).orderBy(term_col)


def query_filtered(
    probes: DataFrame,
    mapped_dictionary: DataFrame,
    max_distance: int,
    predicate: Column,
    variant: str = STANDARD,
    term_col: str = "term",
) -> DataFrame:
    """Fuzzy query over only the dictionary entries whose *value* passes the
    predicate — the filter is applied before blocking so Catalyst prunes the
    join's build side (value_filtered_query.rs semantics)."""
    filtered = mapped_dictionary.where(predicate)
    return fuzzy_query(
        probes, filtered.select(term_col).distinct(), max_distance, variant,
        term_col=term_col,
    ).join(filtered, term_col)


def query_by_value_set(
    probes: DataFrame,
    mapped_dictionary: DataFrame,
    max_distance: int,
    values: DataFrame,
    variant: str = STANDARD,
    term_col: str = "term",
    value_col: str = "value",
) -> DataFrame:
    """Set-membership filtered traversal: dictionary left-semi-joined to the
    (broadcast) value set before the fuzzy join."""
    filtered = mapped_dictionary.join(
        F.broadcast(values), value_col, "left_semi"
    )
    return fuzzy_query(
        probes, filtered.select(term_col).distinct(), max_distance, variant,
        term_col=term_col,
    ).join(filtered, term_col)


def union_with(
    d1: DataFrame,
    d2: DataFrame,
    term_col: str = "term",
    value_col: str = "value",
    merge: str = "sum",
) -> DataFrame:
    """Union of two mapped dictionaries with a commutative merge of values
    on key collision (union_with semantics; merge fn ∈ sum/min/max —
    map-side combinable aggregates, one shuffle)."""
    both = d1.select(term_col, value_col).unionByName(d2.select(term_col, value_col))
    agg = {"sum": F.sum, "min": F.min, "max": F.max}[merge]
    return both.groupBy(term_col).agg(agg(value_col).alias(value_col))


def union_replace(
    d1: DataFrame,
    d2: DataFrame,
    term_col: str = "term",
    value_col: str = "value",
) -> DataFrame:
    """Right-biased union: d2's value wins on collision (union_replace) —
    last-wins without a window: anti-join d1 against d2's keys, then union."""
    keep1 = d1.select(term_col, value_col).join(
        d2.select(term_col), term_col, "left_anti"
    )
    return keep1.unionByName(d2.select(term_col, value_col))


def substring_match_positions(
    docs: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All (doc_id, pos) occurrences (1-based) of ``pattern`` —
    ``SuffixAutomaton::match_positions``.  Columnar scan: a sequence over
    window starts filtered on substring equality; at index scale this is a
    positional n-gram table join instead (operators/blocking n-gram index),
    but the scan form is exact and shuffle-free."""
    t = F.col(text_col)
    m = len(pattern)
    starts = F.sequence(F.lit(1), F.greatest(F.length(t) - (m - 1), F.lit(0)))
    hits = F.filter(starts, lambda i: t.substr(i, F.lit(m)) == F.lit(pattern))
    return docs.select(
        F.col(id_col), F.explode(hits).alias("pos")
    )


def fuzzy_substring_query(
    probes: DataFrame,
    dictionary: DataFrame,
    max_distance: int,
    variant: str = STANDARD,
    probe_col: str = "query",
    term_col: str = "term",
) -> DataFrame:
    """Substring-mode fuzzy query (``is_suffix_based`` accounting,
    ``src/transducer/query.rs:146-156``): the unmatched query suffix is
    free, so a term matches when it is within ``max_distance`` of *some
    prefix* of the query.  Candidate generation is key-blocked (probe
    prefix-deletion keys × term deletion keys —
    ``matching.substring_candidate_pairs``); the kernel flag does the exact
    accounting."""
    return fuzzy_query(
        probes,
        dictionary,
        max_distance,
        variant,
        probe_col=probe_col,
        term_col=term_col,
        substring_mode=True,
    )
