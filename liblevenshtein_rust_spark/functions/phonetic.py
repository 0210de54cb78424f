"""Phonetic / orthographic normalization — the recall booster.

The reference couples a rule-rewriting phonetic engine to fuzzy search
(``/root/reference/src/phonetic/``: ``apply_rules_seq`` at
``application.rs:313``, rule sets in ``rules.rs``; used by
``transducer/phonetic.rs:421`` to match sound-alike terms).  Its rules are
Coq-verified for termination/boundedness; ours get the cheaper guarantee:
a *finite ordered chain* of non-expanding regexp rewrites, each applied
once globally, is trivially terminating and at most length-preserving.

We define an original, deliberately simple English orthography→pseudo-phone
rule chain (NOT a port of the reference's Zompist rules — same operator
shape, different data).  Each rule is a (pattern, replacement) pair applied
in order via `regexp_replace` — pure codegen, and the DuckDB oracle mirrors
the chain verbatim.

At scale: normalization is a per-row projection fused into the scan; the
normalized column becomes the blocking/matching key, exactly like the
reference's phonetic dictionary wrapper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered rewrite chain; RE2-compatible (no lookahead/backrefs) so the
# DuckDB oracle can run the identical patterns
PHONETIC_RULES: list[tuple[str, str]] = [
    (r"ough", "o"),     # though/thorough family
    (r"augh", "af"),    # laugh
    (r"tion", "shun"),  # -tion  (equal length)
    (r"ph", "f"),       # phone → fone
    (r"wr", "r"),       # write → rite
    (r"kn", "n"),       # knight → night-ish
    (r"wh", "w"),       # what → wat
    (r"qu", "kw"),      # quick → kwick
    (r"ck", "k"),       # black → blak
    (r"x", "ks"),       # box → boks (expands by 1 — bounded: applied once)
    (r"c([eiy])", "s$1"),  # cell → sell (group ref, not lookahead: RE2-safe)
    (r"c", "k"),        # cat → kat
    (r"y", "i"),        # phonetic vowel collapse
] + [
    (f"{c}{{2,}}", c) for c in "abcdefghijklmnopqrstuvwxyz"  # squeeze runs
]


def phonetic_normalize(col: Column) -> Column:
    """Apply the rule chain to lowercased input — `apply_rules_seq`'s
    fuel-bounded iteration becomes a fixed-length regexp_replace chain."""
    out = F.lower(col)
    for pat, rep in PHONETIC_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def phonetic_rules_sql(expr: str) -> str:
    """The identical chain as nested DuckDB regexp_replace calls (oracle)."""
    out = f"lower({expr})"
    for pat, rep in PHONETIC_RULES:
        sql_rep = rep.replace("$1", "\\1")
        out = f"regexp_replace({out}, '{pat}', '{sql_rep}', 'g')"
    return out


def phonetic_keys(docs: DataFrame, text_col: str = "term") -> DataFrame:
    """Attach the phonetic key column — sound-alike terms collide."""
    return docs.withColumn("phonetic_key", phonetic_normalize(F.col(text_col)))
