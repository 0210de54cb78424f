"""Schulz–Mihov Levenshtein automaton — scalar reference implementation.

This module reimplements, in pure Python, the *parameterized* Levenshtein
automaton of Schulz & Mihov 2002 ("Fast string correction with Levenshtein
automata") exactly as shipped by universal-automata/liblevenshtein-rust:

- positions ``(term_index i, num_errors e, is_special)``
  (reference ``src/transducer/position.rs:21-33``),
- characteristic vectors β(dict_char, query[i .. i+n+1])
  (``src/transducer/transition.rs:38-68``),
- per-variant elementary transitions δ for Standard / Transposition /
  MergeAndSplit including multi-character deletion via first-match index
  (``src/transducer/transition.rs:118-495``),
- ε-closure for free query-char deletions (``transition.rs:502-534``),
- online subsumption-pruned states, including the reference's *fixed*
  subsumption rules (a normal position never subsumes a special one for
  transposition; merge/split requires strictly fewer errors)
  (``src/transducer/position.rs:82-180``, ``state.rs:76-113``),
- distance inference for final states (``state.rs:200-254``) and the
  substring-mode accounting (``query.rs:146-156``).

The automaton state after consuming ``j`` characters of a candidate term is
the subsumption-pruned antichain of DP cells ``{(i, D[i][j])}`` within the
diagonal band ``|i - j| <= n`` — which is why the *vectorized* engine
(:mod:`.batch`) can realize the identical accept/score semantics as a banded
DP over NumPy batches.  This scalar version exists as the semantic anchor:
golden tests port the reference's acceptance cases verbatim and property
tests cross-validate it against the DP oracle (:mod:`.distances`), mirroring
``tests/proptest_automaton_distance_cross_validation.rs`` and
``tests/universal_vs_parameterized.rs``.

NOT a translation of the reference's execution engine: there is no dictionary
graph here.  In the Spark engine, candidate terms come from a blocking join;
this kernel only answers per-pair accept/score questions.
"""

from __future__ import annotations

from .distances import MERGE_AND_SPLIT, STANDARD, TRANSPOSITION

Position = tuple[int, int, bool]  # (term_index, num_errors, is_special)


def _index_of_match(cv: tuple[bool, ...], limit: int) -> int:
    """First True in cv[:limit]; -1 if none (reference transition.rs:163)."""
    for j in range(min(limit, len(cv))):
        if cv[j]:
            return j
    return -1


def _subsumes(p1: Position, p2: Position, variant: str, query_length: int) -> bool:
    """Does p1 subsume p2?  Reference ``position.rs:82-180`` (fixed rules)."""
    i, e, s = p1
    j, f, t = p2
    if e > f:
        return False
    if variant == STANDARD:
        return abs(i - j) <= (f - e)
    if variant == TRANSPOSITION:
        if s:
            if t:
                return i == j
            # Reference has `(f == query_length) && (i == j)` here
            # (position.rs:95-100, inherited from C++ subsumes.cpp). That is
            # a latent bug for short queries: witness query='ab',
            # candidate='bbab', n=2 — OSA distance is 2 but the special
            # (0,2,T) would subsume the normal (0,2,F) whose match-match
            # path is the only accepting one. Symmetric to the C++ bug the
            # reference itself fixes (normal never subsumes special), the
            # correct rule is: special never subsumes normal. Our proptest
            # cross-validation (automaton == OSA DP) enforces this.
            return False
        if t:
            # normal must NEVER subsume special (upstream C++/Java bug fixed
            # in the reference; see position.rs:117-140)
            return False
        return abs(i - j) <= (f - e)
    # MERGE_AND_SPLIT: special cannot subsume normal; needs strictly e < f
    if s and not t:
        return False
    if e >= f:
        return False
    return abs(i - j) <= (f - e)


class State:
    """Sorted, subsumption-pruned antichain of positions
    (reference ``state.rs:43-113``)."""

    __slots__ = ("positions",)

    def __init__(self) -> None:
        self.positions: list[Position] = []

    def insert(self, pos: Position, variant: str, query_length: int) -> None:
        for existing in self.positions:
            if _subsumes(existing, pos, variant, query_length):
                return
        self.positions = [
            p for p in self.positions if not _subsumes(pos, p, variant, query_length)
        ]
        self.positions.append(pos)
        self.positions.sort(key=lambda p: (p[0], p[1], p[2]))

    def __bool__(self) -> bool:
        return bool(self.positions)

    def min_distance(self) -> int | None:
        """Min errors over all positions (substring mode; state.rs:200)."""
        if not self.positions:
            return None
        return min(e for _, e, _ in self.positions)

    def infer_distance(self, query_length: int) -> int | None:
        """e + remaining query chars, min over NON-special positions
        (state.rs:230-254)."""
        vals = [
            e + max(0, query_length - i)
            for i, e, special in self.positions
            if not special
        ]
        return min(vals) if vals else None

    def prefix_distance(self, query_length: int) -> int | None:
        """Min errors over positions having consumed the whole query
        (state.rs:256+, prefix matching)."""
        vals = [
            e for i, e, special in self.positions if not special and i >= query_length
        ]
        return min(vals) if vals else None


class LevenshteinAutomaton:
    """Automaton for a fixed ``(query, max_distance, variant)``.

    ``accepts(candidate)``/``distance(candidate)`` consume the candidate term
    character by character, like the reference's dictionary traversal feeds
    edge labels into ``transition_state`` (``transition.rs:578-621``).
    """

    def __init__(
        self,
        query: str,
        max_distance: int,
        variant: str = STANDARD,
        prefix_mode: bool = False,
        substring_mode: bool = False,
        allowed_subs: frozenset[tuple[str, str]] | None = None,
    ) -> None:
        self.query = query
        self.n = max_distance
        self.variant = variant
        self.prefix_mode = prefix_mode
        self.substring_mode = substring_mode
        # SubstitutionPolicy (substitution_policy.rs): zero-cost (dict, query)
        # char pairs folded into the characteristic vector.
        self.allowed_subs = allowed_subs or frozenset()

    # -- construction -----------------------------------------------------
    def initial_state(self) -> State:
        """Reference ``transition.rs:716-728``: {(0,0)} plus initial
        deletions (i, i) for i <= n — subsumption collapses these for the
        standard variant but they matter for merge/split."""
        st = State()
        st.insert((0, 0, False), self.variant, len(self.query))
        for i in range(1, min(self.n, len(self.query)) + 1):
            st.insert((i, i, False), self.variant, len(self.query))
        return st

    # -- transitions ------------------------------------------------------
    def _characteristic_vector(self, dict_char: str, offset: int) -> tuple[bool, ...]:
        w = self.n + 1
        q = self.query
        out = []
        for k in range(w):
            idx = offset + k
            if idx < len(q):
                qc = q[idx]
                out.append(qc == dict_char or (dict_char, qc) in self.allowed_subs)
            else:
                out.append(False)
        # trim trailing window beyond query like reference (cv len = window)
        return tuple(out)

    def _transition_position(
        self, pos: Position, cv: tuple[bool, ...]
    ) -> list[Position]:
        variant = self.variant
        if variant == STANDARD:
            return self._t_standard(pos, cv)
        if variant == TRANSPOSITION:
            return self._t_transposition(pos, cv)
        return self._t_merge_split(pos, cv)

    def _window(self, i: int) -> int:
        """Effective cv length: the reference's cv has constant length
        ``window_size = n + 1`` (``transition.rs:556``), with entries beyond
        the query set to False — the w==1 / w==0 subcases are only reachable
        at n == 0."""
        return self.n + 1

    def _t_standard(self, pos: Position, cv: tuple[bool, ...]) -> list[Position]:
        i, e, _ = pos
        n, qlen = self.n, len(self.query)
        w = self._window(i)
        nxt: list[Position] = []
        if self.prefix_mode and i >= qlen:
            return [(i, e, False)]
        if e < n:
            if 2 <= w:
                k = min(n - e + 1, w)
                j = _index_of_match(cv, k)
                if j == 0:
                    nxt.append((i + 1, e, False))
                elif j > 0:
                    nxt.append((i, e + 1, False))
                    nxt.append((i + 1, e + 1, False))
                    nxt.append((i + j + 1, e + j, False))
                else:
                    nxt.append((i, e + 1, False))
                    nxt.append((i + 1, e + 1, False))
            elif w == 1:
                if cv[0]:
                    nxt.append((i + 1, e, False))
                else:
                    nxt.append((i, e + 1, False))
                    nxt.append((i + 1, e + 1, False))
            else:
                nxt.append((i, e + 1, False))
        elif e == n and 0 < w and cv[0]:
            nxt.append((i + 1, n, False))
        return nxt

    def _t_transposition(self, pos: Position, cv: tuple[bool, ...]) -> list[Position]:
        i, e, t = pos
        n, qlen = self.n, len(self.query)
        w = self._window(i)
        nxt: list[Position] = []
        if self.prefix_mode and i >= qlen:
            return [(i, e, False)]
        if e == 0 and n > 0:
            if 2 <= w:
                k = min(n + 1, w)
                j = _index_of_match(cv, k)
                if j == 0:
                    nxt.append((i + 1, 0, False))
                elif j == 1:
                    nxt.append((i, 1, False))
                    nxt.append((i, 1, True))  # transposition start
                    nxt.append((i + 1, 1, False))
                    nxt.append((i + 2, 1, False))
                elif j > 1:
                    nxt.append((i, 1, False))
                    nxt.append((i + 1, 1, False))
                    nxt.append((i + j + 1, j, False))
                else:
                    nxt.append((i, 1, False))
                    nxt.append((i + 1, 1, False))
            elif w == 1:
                if cv[0]:
                    nxt.append((i + 1, 0, False))
                else:
                    nxt.append((i, 1, False))
                    nxt.append((i + 1, 1, False))
            else:
                nxt.append((i, 1, False))
        elif 1 <= e < n:
            if 2 <= w:
                if not t:
                    k = min(n - e + 1, w)
                    j = _index_of_match(cv, k)
                    if j == 0:
                        nxt.append((i + 1, e, False))
                    elif j == 1:
                        nxt.append((i, e + 1, False))
                        nxt.append((i, e + 1, True))
                        nxt.append((i + 1, e + 1, False))
                        nxt.append((i + 2, e + 1, False))
                    elif j > 1:
                        nxt.append((i, e + 1, False))
                        nxt.append((i + 1, e + 1, False))
                        nxt.append((i + j + 1, e + j, False))
                    else:
                        nxt.append((i, e + 1, False))
                        nxt.append((i + 1, e + 1, False))
                else:
                    if cv[0]:
                        nxt.append((i + 2, e, False))  # complete transposition
            elif w == 1:
                if cv[0]:
                    nxt.append((i + 1, e, False))
                else:
                    nxt.append((i, e + 1, False))
                    nxt.append((i + 1, e + 1, False))
            else:
                nxt.append((i, e + 1, False))
        elif e == n:
            if 0 < w and not t:
                if cv[0]:
                    nxt.append((i + 1, n, False))
            elif 2 <= w and t and cv[0]:
                nxt.append((i + 2, n, False))
        return nxt

    def _t_merge_split(self, pos: Position, cv: tuple[bool, ...]) -> list[Position]:
        i, e, s = pos
        n, qlen = self.n, len(self.query)
        w = self._window(i)
        nxt: list[Position] = []
        if self.prefix_mode and i >= qlen:
            return [(i, e, False)]
        if e == 0 and n > 0:
            if 2 <= w:
                if cv[0]:
                    nxt.append((i + 1, e, False))
                else:
                    nxt.append((i, e + 1, False))
                    if i < qlen:
                        nxt.append((i, e + 1, True))  # split start
                    nxt.append((i + 1, e + 1, False))
                    if i + 2 <= qlen:
                        nxt.append((i + 2, e + 1, False))  # merge
            elif w == 1:
                if cv[0]:
                    nxt.append((i + 1, e, False))
                else:
                    nxt.append((i, e + 1, False))
                    if i < qlen:
                        nxt.append((i, e + 1, True))
                    nxt.append((i + 1, e + 1, False))
            else:
                nxt.append((i, e + 1, False))
        elif e < n:
            if 2 <= w:
                if not s:
                    if cv[0]:
                        nxt.append((i + 1, e, False))
                    else:
                        nxt.append((i, e + 1, False))
                        if i < qlen:
                            nxt.append((i, e + 1, True))
                        nxt.append((i + 1, e + 1, False))
                        if i + 2 <= qlen:
                            nxt.append((i + 2, e + 1, False))
                else:
                    nxt.append((i + 1, e, False))  # completing split
            elif w == 1:
                if not s:
                    if cv[0]:
                        nxt.append((i + 1, e, False))
                    else:
                        nxt.append((i, e + 1, False))
                        if i < qlen:
                            nxt.append((i, e + 1, True))
                        nxt.append((i + 1, e + 1, False))
                else:
                    nxt.append((i + 1, e, False))
            else:
                nxt.append((i, e + 1, False))
        elif e == n and 0 < w:
            if not s:
                if cv[0]:
                    nxt.append((i + 1, n, False))
            else:
                nxt.append((i + 1, e, False))
        return nxt

    def _epsilon_closure(self, state: State) -> State:
        """Free query-char deletions (transition.rs:502-534)."""
        qlen = len(self.query)
        out = State()
        seen: set[Position] = set()
        todo: list[Position] = list(state.positions)
        while todo:
            p = todo.pop()
            if p in seen:
                continue
            seen.add(p)
            out.insert(p, self.variant, qlen)
            i, e, _ = p
            if e < self.n and i < qlen:
                todo.append((i + 1, e + 1, False))
        return out

    def transition_state(self, state: State, dict_char: str) -> State | None:
        """Δ over all positions with per-position CV; None ⇒ dead (prunes a
        dictionary subtree in the reference; here: rejects the pair)."""
        qlen = len(self.query)
        expanded = self._epsilon_closure(state)
        nxt = State()
        for pos in expanded.positions:
            cv = self._characteristic_vector(dict_char, pos[0])
            for np_ in self._transition_position(pos, cv):
                nxt.insert(np_, self.variant, qlen)
        return nxt if nxt else None

    # -- queries -----------------------------------------------------------
    def _final_distance(self, state: State) -> int | None:
        if self.substring_mode:
            return state.min_distance()
        if self.prefix_mode:
            # consumed entire query → min errors; else fall back to standard
            d = state.prefix_distance(len(self.query))
            if d is not None:
                return d
            return state.infer_distance(len(self.query))
        return state.infer_distance(len(self.query))

    def distance(self, candidate: str) -> int | None:
        """Edit distance (per variant/mode) if <= n else None.

        Mirrors ``UniversalAutomaton::accepts`` guards
        (``universal/automaton.rs:246-254``): empty candidate accepts iff the
        inferred distance of the initial state is within n; candidates longer
        than ``len(query) + n`` reject immediately (cannot be within n) —
        except in prefix mode, where the candidate may be arbitrarily long.
        """
        if not self.prefix_mode and not self.substring_mode:
            if len(candidate) > len(self.query) + self.n:
                return None
        state: State | None = self.initial_state()
        for ch in candidate:
            state = self.transition_state(state, ch)
            if state is None:
                return None
        d = self._final_distance(state)
        if d is None or d > self.n:
            return None
        return d

    def accepts(self, candidate: str) -> bool:
        return self.distance(candidate) is not None


def automaton_accepts(
    query: str,
    candidate: str,
    max_distance: int,
    variant: str = STANDARD,
    prefix_mode: bool = False,
    substring_mode: bool = False,
    allowed_subs: frozenset[tuple[str, str]] | None = None,
) -> bool:
    """Convenience scalar accept — ports the contract of
    ``UniversalAutomaton::accepts(word, input)``
    (``universal/automaton.rs:242-283``)."""
    return LevenshteinAutomaton(
        query,
        max_distance,
        variant,
        prefix_mode=prefix_mode,
        substring_mode=substring_mode,
        allowed_subs=allowed_subs,
    ).accepts(candidate)


def automaton_distance(
    query: str,
    candidate: str,
    max_distance: int,
    variant: str = STANDARD,
    prefix_mode: bool = False,
    substring_mode: bool = False,
) -> int | None:
    return LevenshteinAutomaton(
        query,
        max_distance,
        variant,
        prefix_mode=prefix_mode,
        substring_mode=substring_mode,
    ).distance(candidate)
