"""Vectorized batch kernel — the Spark hot path.

Computes accept/score for a *batch* of (query, term) pairs with zero
per-row Python: all loops are over character positions (O(max_len * (2n+1))
NumPy operations per Arrow batch), every operation is vectorized across the
batch dimension.

Relationship to the universal Levenshtein automaton
(``/root/reference/src/transducer/universal/automaton.rs:67-353``): the
universal automaton's offset-coded positions ``I + t#k`` / ``M + t#k``
(``universal/position.rs:7-21``) index the diagonal offset ``t = j - i`` and
error count ``k`` within the band ``|t| <= n`` — exactly the cells of the
banded edit-distance DP restricted to the Schulz–Mihov bounded diagonal
(Theorem 8.2, cited at ``state.rs:14-41``).  The subsumption-closed automaton
state after consuming ``j`` term characters is the antichain of
``(i, D[i][j])`` pairs in that band.  Evaluating the band row-by-row over a
whole Arrow batch is therefore the vectorized form of running the universal
automaton over every pair simultaneously — same accepted language, same
distances, but with NumPy SIMD instead of the reference's AVX2 intrinsics
(``distance/simd.rs``, which we deliberately do not port).

Variants (``src/transducer/algorithm.rs:15-43``):
- standard        — match/substitute/insert/delete
- transposition   — + adjacent transposition (OSA recurrence,
                    ``distance/mod.rs:304-359``)
- merge_and_split — + merge (2→1) and split (1→2), unconditional cost 1
                    (``distance/mod.rs:624-730``)

Modes:
- prefix_mode     — distance to the best *prefix* of the term
                    (``transition.rs:189-192``), used for autocomplete.
- substring_mode  — unmatched query suffix is free
                    (``query.rs:146-156`` / ``state.min_distance``).

Cross-validated against both the scalar DP oracle (:mod:`.distances`) and the
scalar automaton (:mod:`.automaton`) by ``tests/test_batch_kernel.py``.
"""

from __future__ import annotations

import numpy as np

from .distances import MERGE_AND_SPLIT, STANDARD, TRANSPOSITION

_PAD = np.uint32(0xFFFFFFFF)  # sentinel codepoint: never equal to a real char


def encode_strings(strings, max_len: int | None = None):
    """Encode a sequence of python strings into a (batch, L) uint32 codepoint
    matrix (padded with a sentinel) plus an int32 length vector.

    This is the per-batch columnarization step — the analog of the
    reference's ``CharUnit`` decode (``dictionary/char_unit.rs``), done once
    per Arrow batch instead of once per trie edge.
    """
    n_rows = len(strings)
    lengths = np.fromiter(
        (len(s) if s is not None else 0 for s in strings), dtype=np.int32, count=n_rows
    )
    L = int(lengths.max()) if n_rows and lengths.size else 0
    if max_len is not None:
        L = max(L, max_len)
    mat = np.full((n_rows, max(L, 1)), _PAD, dtype=np.uint32)
    for r, s in enumerate(strings):
        if s:
            mat[r, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    return mat, lengths


def batch_distance(
    queries,
    terms,
    max_distance: int,
    variant: str = STANDARD,
    prefix_mode: bool = False,
    substring_mode: bool = False,
    allowed_subs: frozenset | None = None,
) -> np.ndarray:
    """Banded DP over the whole batch.

    Returns an int32 array: the variant distance when <= max_distance, else
    -1 (reject).  ``queries``/``terms`` are sequences of ``str`` (``None``
    treated as empty).
    """
    n = int(max_distance)
    if n < 0:
        raise ValueError("max_distance must be >= 0")
    if variant not in (STANDARD, TRANSPOSITION, MERGE_AND_SPLIT):
        raise ValueError(f"unknown variant: {variant!r}")

    Q, qlen = encode_strings(queries)
    T, tlen = encode_strings(terms)
    batch = Q.shape[0]
    if batch == 0:
        return np.empty(0, dtype=np.int32)

    W = 2 * n + 1  # band width; offsets t = j - i in [-n, n], k = t + n
    INF = np.int16(n + 1)
    max_q = int(qlen.max()) if batch else 0
    max_t = int(tlen.max()) if batch else 0

    # Zero-cost substitution pairs (substitution_policy.rs): encoded as
    # q_char * 2^21 + t_char, membership via sorted search.
    subs_codes = None
    if allowed_subs:
        subs_codes = np.sort(
            np.fromiter(
                ((ord(q) << 21) | ord(t) for (t, q) in allowed_subs),
                dtype=np.int64,
            )
        )

    def char_eq(qc: np.ndarray, tc: np.ndarray, valid: np.ndarray) -> np.ndarray:
        eq = (qc == tc) & valid
        if subs_codes is not None:
            codes = (qc.astype(np.int64) << 21) | tc.astype(np.int64)
            idx = np.searchsorted(subs_codes, codes)
            allowed = (idx < subs_codes.size) & (
                subs_codes[np.clip(idx, 0, subs_codes.size - 1)] == codes
            )
            eq |= allowed & valid
        return eq

    # rows: prev (i-1), two_ago (i-2), curr (i); each (batch, W), capped at INF
    two_ago = np.full((batch, W), INF, dtype=np.int16)
    prev = np.full((batch, W), INF, dtype=np.int16)
    # Row 0: D[0][j] = j for 0 <= j <= n  →  k = j + n - 0? row i=0 centered
    # at 0: j = k - n, valid j in [0, n] → k in [n, 2n].
    for k in range(n, W):
        prev[:, k] = k - n

    # result capture
    out_row = np.full((batch, W), INF, dtype=np.int16)  # band row at i = qlen
    done0 = qlen == 0
    if done0.any():
        out_row[done0] = prev[done0]
    # substring mode: running min over rows i of D[i][tlen]
    sub_min = np.full(batch, INF, dtype=np.int16)
    if substring_mode:
        k0 = tlen - 0 + n  # k index of j = tlen in row 0
        valid = (k0 >= 0) & (k0 < W)
        rr = np.where(valid, prev[np.arange(batch), np.clip(k0, 0, W - 1)], INF)
        sub_min = np.minimum(sub_min, rr.astype(np.int16))

    col_idx = np.arange(batch)
    ones = np.int16(1)

    for i in range(1, max_q + 1):
        curr = np.full((batch, W), INF, dtype=np.int16)
        qc = Q[:, i - 1] if i - 1 < Q.shape[1] else np.full(batch, _PAD)
        qprev = Q[:, i - 2] if i >= 2 and i - 2 < Q.shape[1] else None
        row_active = qlen >= i
        for k in range(W):
            j = i + (k - n)  # absolute term column for this band cell
            if j < 0:
                continue
            if j == 0:
                # D[i][0] = i, only valid cell when k = n - i
                curr[:, k] = np.where(row_active, np.int16(min(i, n + 1)), INF)
                continue
            # gather term chars b[j-1]; j varies per-cell but is scalar here
            jc = j - 1
            tc = T[:, jc] if jc < T.shape[1] else np.full(batch, _PAD)
            cell_valid = row_active & (tlen >= j)
            eq = char_eq(qc, tc, cell_valid)
            cost = np.where(eq, np.int16(0), ones).astype(np.int16)
            best = np.minimum(prev[:, k] + cost, INF)  # diag: D[i-1][j-1]
            if k + 1 < W:
                best = np.minimum(best, np.minimum(prev[:, k + 1] + ones, INF))
            if k - 1 >= 0:
                best = np.minimum(best, np.minimum(curr[:, k - 1] + ones, INF))
            if variant == TRANSPOSITION and i >= 2 and j >= 2 and qprev is not None:
                jb2 = j - 2
                tb2 = T[:, jb2] if jb2 < T.shape[1] else np.full(batch, _PAD)
                swap = (
                    cell_valid
                    & (qc == tb2)
                    & (qprev == tc)
                    & (qc != _PAD)
                    & (tc != _PAD)
                )
                # D[i-2][j-2]: two_ago centered at i-2 → k' = j-2-(i-2)+n = k
                cand = np.minimum(two_ago[:, k] + ones, INF)
                best = np.where(swap, np.minimum(best, cand), best)
            if variant == MERGE_AND_SPLIT:
                if i >= 2 and k + 1 < W:
                    # merge: D[i-2][j-1] → two_ago k' = j-1-(i-2)+n = k+1
                    best = np.minimum(
                        best, np.minimum(two_ago[:, k + 1] + ones, INF)
                    )
                if j >= 2 and k - 1 >= 0:
                    # split: D[i-1][j-2] → prev k' = j-2-(i-1)+n = k-1
                    best = np.minimum(best, np.minimum(prev[:, k - 1] + ones, INF))
            curr[:, k] = np.where(cell_valid, best, INF)
        two_ago, prev = prev, curr
        hit = qlen == i
        if hit.any():
            out_row[hit] = curr[hit]
        if substring_mode:
            ki = tlen - i + n
            valid = (ki >= 0) & (ki < W) & (qlen >= i)
            rr = np.where(valid, curr[col_idx, np.clip(ki, 0, W - 1)], INF)
            sub_min = np.minimum(sub_min, rr.astype(np.int16))

    # extract answers
    if substring_mode:
        res = sub_min
    elif prefix_mode:
        # min over k with 0 <= j = qlen + k - n <= tlen
        j_abs = qlen[:, None] + (np.arange(W)[None, :] - n)
        valid = (j_abs >= 0) & (j_abs <= tlen[:, None])
        res = np.where(valid, out_row, INF).min(axis=1)
    else:
        kf = tlen - qlen + n
        valid = (kf >= 0) & (kf < W)
        res = np.where(valid, out_row[col_idx, np.clip(kf, 0, W - 1)], INF)
    res = res.astype(np.int32)
    res[res > n] = -1
    return res


def batch_accepts(
    queries,
    terms,
    max_distance: int,
    variant: str = STANDARD,
    prefix_mode: bool = False,
    substring_mode: bool = False,
    allowed_subs: frozenset | None = None,
) -> np.ndarray:
    """Boolean accept per pair — the vectorized
    ``UniversalAutomaton::accepts`` (``universal/automaton.rs:242-283``)."""
    return (
        batch_distance(
            queries,
            terms,
            max_distance,
            variant,
            prefix_mode,
            substring_mode,
            allowed_subs,
        )
        >= 0
    )
