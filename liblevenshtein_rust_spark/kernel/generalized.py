"""Generalized (runtime-configurable, weighted) edit operations.

Reference parity for the generalized-automaton module
(``/root/reference/src/transducer/generalized/`` — ``OperationSet`` with
runtime-selected ops and weights, ``operation_set.rs:204-239``).  The
reference pays 10-20% overhead for runtime dispatch vs its compile-time
automata; here the weighted banded DP is the same NumPy code path with cost
constants read from an :class:`OperationWeights` — batch-level overhead ~0.

Band validity: every enabled op has cost >= 1 and moves the alignment
diagonal by at most 1, so cells with |j - i| > max_distance can never be
reached within the budget — the same Schulz-Mihov bounded diagonal the
uniform-cost kernel uses.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .batch import _PAD, encode_strings


@dataclass(frozen=True)
class OperationWeights:
    """Integer costs; None disables the op (``OperationSet`` analog)."""

    substitute: int = 1
    insert: int = 1
    delete: int = 1
    transpose: int | None = None
    merge: int | None = None
    split: int | None = None

    def validate(self) -> None:
        for name in ("substitute", "insert", "delete"):
            if getattr(self, name) < 1:
                raise ValueError(f"{name} weight must be >= 1")
        for name in ("transpose", "merge", "split"):
            v = getattr(self, name)
            if v is not None and v < 1:
                raise ValueError(f"{name} weight must be >= 1 or None")


STANDARD_WEIGHTS = OperationWeights()
TRANSPOSITION_WEIGHTS = OperationWeights(transpose=1)
MERGE_SPLIT_WEIGHTS = OperationWeights(merge=1, split=1)


def generalized_distance(query: str, term: str, w: OperationWeights) -> int:
    """Scalar reference DP (unbounded) — the oracle for the batch kernel."""
    w.validate()
    a, b = query, term
    la, lb = len(a), len(b)
    INF = 10 ** 9
    D = [[INF] * (lb + 1) for _ in range(la + 1)]
    D[0][0] = 0
    for i in range(la + 1):
        for j in range(lb + 1):
            if i < la:
                D[i + 1][j] = min(D[i + 1][j], D[i][j] + w.delete)
            if j < lb:
                D[i][j + 1] = min(D[i][j + 1], D[i][j] + w.insert)
            if i < la and j < lb:
                cost = 0 if a[i] == b[j] else w.substitute
                D[i + 1][j + 1] = min(D[i + 1][j + 1], D[i][j] + cost)
            if (
                w.transpose is not None
                and i + 1 < la
                and j + 1 < lb
                and a[i] == b[j + 1]
                and a[i + 1] == b[j]
            ):
                D[i + 2][j + 2] = min(D[i + 2][j + 2], D[i][j] + w.transpose)
            if w.merge is not None and i + 1 < la and j < lb:
                # two query chars merge into one term char
                D[i + 2][j + 1] = min(D[i + 2][j + 1], D[i][j] + w.merge)
            if w.split is not None and i < la and j + 1 < lb:
                # one query char splits into two term chars
                D[i + 1][j + 2] = min(D[i + 1][j + 2], D[i][j] + w.split)
    return D[la][lb]


def batch_generalized_distance(
    queries, terms, max_distance: int, w: OperationWeights
) -> np.ndarray:
    """Vectorized weighted banded DP; int32 distances, -1 when > budget."""
    w.validate()
    n = int(max_distance)
    Q, qlen = encode_strings(queries)
    T, tlen = encode_strings(terms)
    batch = Q.shape[0]
    if batch == 0:
        return np.empty(0, dtype=np.int32)

    W = 2 * n + 1
    INF = np.int32(n + 1)
    max_q = int(qlen.max()) if batch else 0

    P = n + 2
    T_pad = np.full((batch, T.shape[1] + P + W + 2), _PAD, dtype=np.uint32)
    T_pad[:, P : P + T.shape[1]] = T
    k_off = np.arange(W, dtype=np.int32) - n

    two_ago = np.full((batch, W), INF, dtype=np.int32)
    prev = np.full((batch, W), INF, dtype=np.int32)
    for k in range(n, W):
        prev[:, k] = (k - n) * w.insert  # row 0: j inserts

    out_row = np.full((batch, W), INF, dtype=np.int32)
    done0 = qlen == 0
    if done0.any():
        out_row[done0] = prev[done0]
    col_idx = np.arange(batch)

    for i in range(1, max_q + 1):
        qc = Q[:, i - 1] if i - 1 < Q.shape[1] else np.full(batch, _PAD)
        row_active = qlen >= i
        j_abs = i + k_off
        cell_valid = row_active[:, None] & (j_abs[None, :] >= 1) & (
            j_abs[None, :] <= tlen[:, None]
        )
        tc = T_pad[:, i - 1 - n + P : i - 1 + n + 1 + P]
        eq = (tc == qc[:, None]) & (tc != _PAD) & (qc[:, None] != _PAD)
        cost = np.where(eq, np.int32(0), np.int32(w.substitute))
        best = np.minimum(prev + cost, INF)
        # prev[k+1] = D[i-1][j]: consumes a QUERY char → delete cost
        best[:, :-1] = np.minimum(
            best[:, :-1], np.minimum(prev[:, 1:] + w.delete, INF)
        )
        if w.transpose is not None and i >= 2:
            qprev = Q[:, i - 2]
            tprev = T_pad[:, i - 2 - n + P : i - 2 + n + 1 + P]
            swap = (
                (tprev == qc[:, None])
                & (tc == qprev[:, None])
                & (tc != _PAD)
                & (tprev != _PAD)
            )
            cand = np.minimum(two_ago + w.transpose, INF)
            best = np.where(swap, np.minimum(best, cand), best)
        if w.merge is not None and i >= 2:
            best[:, :-1] = np.minimum(
                best[:, :-1], np.minimum(two_ago[:, 1:] + w.merge, INF)
            )
        if w.split is not None:
            best[:, 1:] = np.minimum(
                best[:, 1:], np.minimum(prev[:, :-1] + w.split, INF)
            )
        best = np.where(cell_valid, best, INF)
        if i * w.delete <= n:
            best[row_active, n - i] = np.int32(i * w.delete)
        elif i <= n:
            best[row_active, n - i] = INF
        # in-row scan = D[i][j-1]: consumes a TERM char → insert cost
        run = best[:, 0].copy()
        curr = np.empty_like(best)
        curr[:, 0] = run
        for k in range(1, W):
            run = np.minimum(best[:, k], np.minimum(run + w.insert, INF))
            curr[:, k] = run
        curr = np.where(
            cell_valid | ((j_abs[None, :] == 0) & row_active[:, None]), curr, INF
        )
        two_ago, prev = prev, curr
        hit = qlen == i
        if hit.any():
            out_row[hit] = curr[hit]

    kf = tlen - qlen + n
    valid = (kf >= 0) & (kf < W)
    res = np.where(valid, out_row[col_idx, np.clip(kf, 0, W - 1)], INF)
    res = res.astype(np.int32)
    res[res > n] = -1
    return res
