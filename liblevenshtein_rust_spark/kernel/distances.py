"""Scalar edit-distance functions — the brute-force oracle for the engine.

Reimplements (from public semantics, not code) the three distance variants of
universal-automata/liblevenshtein-rust:

- ``standard_distance``      — classic Levenshtein (reference:
  ``src/distance/mod.rs:228-288``, two-row DP).
- ``transposition_distance`` — Levenshtein + adjacent transposition, i.e. the
  *restricted* Damerau / Optimal-String-Alignment metric (reference:
  ``src/distance/mod.rs:304-359``, three-row DP using ``two_ago[j-2]+1``).
- ``merge_and_split_distance`` — Levenshtein + unconditional cost-1 merge
  (two source chars → one target char) and split (one source char → two
  target chars) (reference: ``src/distance/mod.rs:624-730``).

These scalar functions are intentionally simple: they are the *oracle* used
by property tests to cross-validate both the scalar automaton
(:mod:`.automaton`) and the vectorized batch kernel (:mod:`.batch`), mirroring
the reference's ``tests/proptest_automaton_distance_cross_validation.rs``.
They are never used in the Spark hot path.
"""

from __future__ import annotations

STANDARD = "standard"
TRANSPOSITION = "transposition"
MERGE_AND_SPLIT = "merge_and_split"
VARIANTS = (STANDARD, TRANSPOSITION, MERGE_AND_SPLIT)


def standard_distance(source: str, target: str) -> int:
    """Classic Levenshtein distance (codepoint-level, like the reference's
    ``char``-unit path)."""
    s, t = source, target
    m, n = len(s), len(t)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        curr = [i] + [0] * n
        si = s[i - 1]
        for j in range(1, n + 1):
            cost = 0 if si == t[j - 1] else 1
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
        prev = curr
    return prev[n]


def transposition_distance(source: str, target: str) -> int:
    """Restricted Damerau-Levenshtein (OSA): adjacent transposition costs 1,
    and a transposed pair cannot be edited again."""
    s, t = source, target
    m, n = len(s), len(t)
    if m == 0:
        return n
    if n == 0:
        return m
    two_ago = [0] * (n + 1)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        curr = [i] + [0] * n
        si = s[i - 1]
        for j in range(1, n + 1):
            cost = 0 if si == t[j - 1] else 1
            d = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and si == t[j - 2] and s[i - 2] == t[j - 1]:
                d = min(d, two_ago[j - 2] + 1)
            curr[j] = d
        two_ago, prev = prev, curr
    return prev[n]


def merge_and_split_distance(source: str, target: str) -> int:
    """Levenshtein + merge/split: two source chars may become one target char
    (merge) or one source char may become two target chars (split), each at
    cost 1 regardless of the characters involved.

    DP recurrence (full matrix; the reference uses memoized recursion with
    affix stripping — same function, different evaluation order)::

        D[i][j] = min( D[i-1][j] + 1,                       # deletion
                       D[i][j-1] + 1,                       # insertion
                       D[i-1][j-1] + (s[i-1] != t[j-1]),    # match/substitute
                       D[i-2][j-1] + 1  if i >= 2,          # merge  (2 → 1)
                       D[i-1][j-2] + 1  if j >= 2 )         # split  (1 → 2)
    """
    s, t = source, target
    m, n = len(s), len(t)
    if m == 0:
        return n
    if n == 0:
        return m
    rows = [[0] * (n + 1) for _ in range(m + 1)]
    for j in range(n + 1):
        rows[0][j] = j
    for i in range(1, m + 1):
        rows[i][0] = i
        si = s[i - 1]
        for j in range(1, n + 1):
            cost = 0 if si == t[j - 1] else 1
            d = min(
                rows[i - 1][j] + 1,
                rows[i][j - 1] + 1,
                rows[i - 1][j - 1] + cost,
            )
            if i >= 2:
                d = min(d, rows[i - 2][j - 1] + 1)  # merge
            if j >= 2:
                d = min(d, rows[i - 1][j - 2] + 1)  # split
            rows[i][j] = d
    return rows[m][n]


def distance(source: str, target: str, variant: str = STANDARD) -> int:
    """Dispatch on variant name (reference ``Algorithm`` enum,
    ``src/transducer/algorithm.rs:15-43``)."""
    if variant == STANDARD:
        return standard_distance(source, target)
    if variant == TRANSPOSITION:
        return transposition_distance(source, target)
    if variant == MERGE_AND_SPLIT:
        return merge_and_split_distance(source, target)
    raise ValueError(f"unknown variant: {variant!r}")


def prefix_distance(query: str, term: str, variant: str = STANDARD) -> int:
    """Distance between ``query`` and the *best* prefix of ``term``
    (autocomplete semantics; reference ``prefix_mode`` in
    ``src/transducer/transition.rs:189-192``)."""
    best = len(query)  # empty prefix
    for k in range(1, len(term) + 1):
        best = min(best, distance(query, term[:k], variant))
    return best


def substring_distance(query: str, term: str, variant: str = STANDARD) -> int:
    """Distance with the unmatched *query suffix* free (reference substring
    mode: ``state.min_distance()`` instead of ``infer_distance``,
    ``src/transducer/query.rs:146-156``) — min over prefixes of the query."""
    best = len(term)  # empty query prefix → all of term inserted
    for k in range(0, len(query) + 1):
        best = min(best, distance(query[:k], term, variant))
    return best
