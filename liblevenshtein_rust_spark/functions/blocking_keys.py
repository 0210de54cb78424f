"""Blocking-key generation — the distributed analog of the DAWG index.

The reference's dictionary structures (``src/dictionary/double_array_trie.rs``,
``dawg.rs``) make fuzzy search fast by sharing prefixes so the automaton only
explores terms that share a viable prefix window with the query.  In Spark the
same pruning is an **equi-join on blocking keys**: generate, for every term, a
small set of keys such that any pair within edit distance n shares at least
one key; then candidate generation is ``probe.join(dict, "key")``.

Everything here is pure `pyspark.sql.functions` — JVM-side, whole-stage
codegen, no Python in the path.

Key families:

- **prefix keys** (``prefix_key``): first p chars — the literal trie-walk
  analog (``PrefixZipper``, ``src/dictionary/prefix_zipper.rs:130``). Not
  deletion-robust on its own; used for sorted-neighborhood.
- **positional q-gram keys** (``ngram_keys``): all character q-grams tagged
  with a coarse position bucket.  Completeness: an edit changes at most q
  q-grams, so two strings of length ≥ q within distance n share a q-gram
  whenever ``min_len - q + 1 > n*q`` — we also emit a whole-string key for
  short strings so tiny terms still block together.
- **sorted-neighborhood key** (``sorted_neighborhood_key``): a sort prefix;
  downstream a window over the globally sorted key joins each row to its w
  neighbors (``operators/blocking.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def normalize_term(col: Column) -> Column:
    """Lowercase + trim + collapse whitespace: canonical term form.

    Mirrors the codepoint-level (`char` CharUnit) path of the reference —
    byte-level tricks are irrelevant under Arrow.
    """
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Split normalized text into alphanumeric tokens (array<string>)."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


# ---------------------------------------------------------------------------
# key generators (all return array<string>)
# ---------------------------------------------------------------------------


def prefix_key(col: Column, p: int = 4) -> Column:
    return F.substring(col, 1, p)


def ngram_keys(col: Column, q: int = 3, pos_bucket: int = 4) -> Column:
    """Positional character q-grams as an array of keys ``"g:<gram>:<bucket>"``.

    ``pos_bucket`` coarsens the gram position by integer division so that an
    edit shifting later grams by <= n positions still lands in the same or an
    adjacent bucket; we emit both the bucket and its successor for shift
    robustness.  Short strings (< q chars) emit a whole-string key.
    """
    s = col
    length = F.length(s)
    idxs = F.sequence(F.lit(1), F.greatest(length - (q - 1), F.lit(1)))
    grams = F.transform(
        idxs,
        lambda i: F.concat(
            F.lit("g:"),
            s.substr(i, F.lit(q)),
            F.lit(":"),
            ((i - 1) / pos_bucket).cast("int").cast("string"),
        ),
    )
    grams_shift = F.transform(
        idxs,
        lambda i: F.concat(
            F.lit("g:"),
            s.substr(i, F.lit(q)),
            F.lit(":"),
            (((i - 1) / pos_bucket).cast("int") + 1).cast("string"),
        ),
    )
    short = F.array(F.concat(F.lit("w:"), s))
    return F.when(length < q, short).otherwise(
        F.array_distinct(F.concat(grams, grams_shift))
    )


def ngram_keys_unpositioned(col: Column, q: int = 3) -> Column:
    """Plain character q-gram keys (no position) — higher recall, hotter keys.

    Used for the oracle-checked blocking queries because it is exactly
    expressible in ANSI SQL (substring + series join).
    """
    s = col
    length = F.length(s)
    idxs = F.sequence(F.lit(1), F.greatest(length - (q - 1), F.lit(1)))
    grams = F.transform(idxs, lambda i: s.substr(i, F.lit(q)))
    short = F.array(s)
    return F.when(length < q, short).otherwise(F.array_distinct(grams))


def _delete_at(s: Column, i) -> Column:
    """String with the i-th (1-based) character removed."""
    return F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s)))


def let_bound(value_col: Column, fn) -> Column:
    """Evaluate ``value_col`` ONCE per row and pass it to ``fn`` as a bound
    lambda variable.  Spark SQL has no `let`; referencing a subexpression
    twice re-evaluates its whole subtree (interpreted HOFs get no
    common-subexpression elimination) — see the same pattern in
    ``operators/dedup.py``."""
    return F.transform(F.array(value_col), fn)[0]


def sorted_neighborhood_key(col: Column, p: int = 5) -> Column:
    """Sort key for the sorted-neighborhood method (window-join downstream)."""
    return F.rpad(F.substring(col, 1, p), p, "\x00")


def deletion_neighborhood_keys(col: Column, n: int = 1) -> Column:
    """All strings obtainable by deleting up to ``n`` characters — the
    FastSS / symmetric-delete blocking family.  Exact for distance <= n:
    q and t within distance n always share a member of their deletion
    neighborhoods.  n=1 emits len+1 keys; n=2 is quadratic — gated.

    This is the closest distributed analog of automaton-guided trie
    intersection: both enumerate the *bounded-error neighborhood* instead of
    scanning the dictionary.
    """
    if n not in (1, 2):
        raise ValueError("deletion_neighborhood_keys supports n in {1, 2}")
    s = col
    length = F.length(s)
    # F.sequence(1, 0) would produce a *descending* [1, 0] — guard empties.
    del1 = F.when(length < 1, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.greatest(length, F.lit(1))), lambda i: _delete_at(s, i))
    )
    if n == 1:
        return F.array_distinct(F.concat(F.array(s), del1))

    # n == 2: delete once more from each single-deletion string.  ``del1``
    # feeds both the output and the second deletion pass — let-bind it so
    # the O(len)-per-element transform runs once per row, not twice.
    def build(d1: Column) -> Column:
        del2 = F.flatten(
            F.transform(
                d1,
                lambda d: F.when(
                    F.length(d) < 1, F.array().cast("array<string>")
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.length(d), F.lit(1))),
                        lambda i: _delete_at(d, i),
                    )
                ),
            )
        )
        return F.array_distinct(F.concat(F.array(s), d1, del2))

    return let_bound(del1, build)
