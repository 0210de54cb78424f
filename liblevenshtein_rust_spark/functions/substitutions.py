"""Zero-cost substitution policies — reference parity for
``src/transducer/substitution_policy.rs`` / ``substitution_set.rs`` presets
(phonetic_basic :536, keyboard_qwerty :560, leet_speak :590,
ocr_friendly :616).

A policy is a frozenset of (dict_char, query_char) pairs whose substitution
costs 0 in the kernel (``allowed_subs`` parameter of
``kernel.batch.batch_distance``).  The sets below are original
domain-knowledge data, symmetric closures of the obvious confusion pairs —
same operator shape as the reference, not its tables.

At scale the set ships to executors once inside the pandas-UDF closure
(the Spark analog of the reference's ZST-vs-instance policy dispatch).
"""

from __future__ import annotations


def _sym(pairs: list[tuple[str, str]]) -> frozenset:
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return frozenset(out)


# sound-alike letters (coarse)
PHONETIC_BASIC = _sym(
    [("c", "k"), ("c", "s"), ("s", "z"), ("f", "v"), ("g", "j"),
     ("i", "y"), ("m", "n"), ("b", "p"), ("d", "t")]
)

# physically adjacent keys on a QWERTY row (typo fat-fingers)
_QWERTY_ROWS = ["qwertyuiop", "asdfghjkl", "zxcvbnm"]
KEYBOARD_QWERTY = _sym(
    [(row[i], row[i + 1]) for row in _QWERTY_ROWS for i in range(len(row) - 1)]
)

# classic leetspeak digit/letter swaps
LEET_SPEAK = _sym(
    [("o", "0"), ("i", "1"), ("l", "1"), ("e", "3"), ("a", "4"),
     ("s", "5"), ("t", "7"), ("b", "8"), ("g", "9")]
)

# glyph confusions typical of OCR output
OCR_FRIENDLY = _sym(
    [("o", "0"), ("l", "1"), ("i", "l"), ("s", "5"), ("b", "6"),
     ("g", "9"), ("z", "2"), ("e", "c"), ("u", "v"), ("m", "n")]
)

PRESETS = {
    "phonetic_basic": PHONETIC_BASIC,
    "keyboard_qwerty": KEYBOARD_QWERTY,
    "leet_speak": LEET_SPEAK,
    "ocr_friendly": OCR_FRIENDLY,
}


def allow(*pairs: tuple[str, str]) -> frozenset:
    """Build a custom symmetric policy (``SubstitutionSet::allow`` analog)."""
    return _sym(list(pairs))
