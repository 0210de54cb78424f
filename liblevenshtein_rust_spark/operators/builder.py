"""Fluent query-builder facade — ``QueryBuilder`` parity
(``/root/reference/src/transducer/builder_api.rs:35-130``).

    results = (FuzzyQueryBuilder(dictionary)
                 .max_distance(2)
                 .algorithm("transposition")
                 .prefix()
                 .substitutions(KEYBOARD_QWERTY)
                 .limit(10)
                 .execute(probes))

Pure configuration sugar over :mod:`.matching` — the DataFrame plan it
builds is identical to calling the operators directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..kernel.distances import MERGE_AND_SPLIT, STANDARD, TRANSPOSITION
from . import matching

_ALGOS = {
    "standard": STANDARD,
    "transposition": TRANSPOSITION,
    "merge_and_split": MERGE_AND_SPLIT,
}


class FuzzyQueryBuilder:
    def __init__(self, dictionary: DataFrame, term_col: str = "term"):
        self._dict = dictionary
        self._term_col = term_col
        self._n = 2
        self._algo = STANDARD
        self._prefix = False
        self._substring = False
        self._subs: frozenset | None = None
        self._limit: int | None = None
        self._ordered = False

    def max_distance(self, n: int) -> "FuzzyQueryBuilder":
        self._n = int(n)
        return self

    def algorithm(self, name: str) -> "FuzzyQueryBuilder":
        self._algo = _ALGOS[name]
        return self

    def prefix(self, on: bool = True) -> "FuzzyQueryBuilder":
        self._prefix = on
        return self

    def substring(self, on: bool = True) -> "FuzzyQueryBuilder":
        self._substring = on
        return self

    def substitutions(self, policy: frozenset | None) -> "FuzzyQueryBuilder":
        self._subs = policy
        return self

    def ordered(self, on: bool = True) -> "FuzzyQueryBuilder":
        self._ordered = on
        return self

    def limit(self, k: int | None) -> "FuzzyQueryBuilder":
        self._limit = k
        self._ordered = True
        return self

    def execute(self, probes: DataFrame, probe_col: str = "query") -> DataFrame:
        kw = dict(
            probe_col=probe_col,
            term_col=self._term_col,
            prefix_mode=self._prefix,
            substring_mode=self._substring,
            allowed_subs=self._subs,
        )
        if self._ordered or self._limit is not None:
            return matching.fuzzy_query_ordered(
                probes, self._dict, self._n, self._algo, limit=self._limit, **kw
            )
        return matching.fuzzy_query(probes, self._dict, self._n, self._algo, **kw)
