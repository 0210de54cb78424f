"""Generalized (runtime-configurable, weighted) edit operations.

Reference parity for the generalized-automaton module
(``/root/reference/src/transducer/generalized/`` — ``OperationSet`` with
runtime-selected ops and weights, ``operation_set.rs:204-239``; operation
types t = ⟨t^x, t^y, t^w⟩ per ``operation_type.rs:1-90``: consume t^x chars
of the dictionary term, t^y chars of the query, at float cost t^w,
optionally *restricted* to an explicit set of (term-segment, query-segment)
pairs).  The reference pays 10-20% overhead for runtime dispatch vs its
compile-time automata; here the weighted banded DP is the same NumPy code
path with cost constants read from an :class:`OperationWeights` —
batch-level overhead ~0.

Band validity: the classic argument needs every enabled op to have cost
>= 1 and move the alignment diagonal (j - i) by at most 1, giving
half-width n.  With arbitrary ops the generalization of the reference's
bounded-diagonal constraint (``operation_type.rs`` "Theoretical
Constraints", TCS 2011 Thm 8.2: t^w = 0 ⇒ t^x = t^y) is: diagonal drift d
costs at least d * min over ops of (t^w / |t^x - t^y|), so the half-width
is  H = max(n_int, floor(budget * max_op |t^x - t^y| / t^w))  — computed at
kernel entry from the enabled set.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .batch import _PAD, encode_strings


@dataclass(frozen=True)
class RestrictedOp:
    """One generalized operation t = ⟨t^x, t^y, t^w⟩ restricted to a single
    (term_seg, query_seg) pair — the ``OperationType::with_restriction``
    analog (``operation_type.rs:46-68``); a reference restriction *set* maps
    to one RestrictedOp per allowed pair.  ``term_seg`` is consumed from the
    dictionary term (t^x = len), ``query_seg`` from the query (t^y = len).

    Kernel limits (checked in validate): len(query_seg) <= 2 (the DP keeps
    two prior rows, like transposition), len(term_seg) <= 3, not both empty,
    weight >= 0, and weight == 0 requires equal lengths (Thm 8.2)."""

    term_seg: str
    query_seg: str
    weight: float

    def validate(self) -> None:
        tx, ty = len(self.term_seg), len(self.query_seg)
        if tx == 0 and ty == 0:
            raise ValueError("RestrictedOp must consume at least one char")
        if ty > 2 or tx > 3:
            raise ValueError("RestrictedOp supports len(query_seg)<=2, len(term_seg)<=3")
        if self.weight < 0:
            raise ValueError("weight must be >= 0")
        if self.weight == 0 and tx != ty:
            raise ValueError("zero-weight ops must be length-preserving (TCS 2011 Thm 8.2)")


@dataclass(frozen=True)
class MultiOp:
    """One UNRESTRICTED generalized operation t = ⟨t^x, t^y, t^w⟩: consume
    any ``tx`` consecutive dictionary-term chars and any ``ty`` consecutive
    query chars at cost ``weight`` — the restriction-free
    ``OperationType::new(tx, ty, w)`` analog (``operation_type.rs:1-44``;
    :class:`RestrictedOp` covers the ``with_restriction`` form).  Same
    kernel window limits as restricted ops: ty <= 2 (the DP keeps two prior
    rows), tx <= 3; zero weight requires tx == ty (TCS 2011 Thm 8.2)."""

    tx: int
    ty: int
    weight: float

    def validate(self) -> None:
        if self.tx == 0 and self.ty == 0:
            raise ValueError("MultiOp must consume at least one char")
        if self.tx < 0 or self.ty < 0:
            raise ValueError("MultiOp lengths must be >= 0")
        if self.ty > 2 or self.tx > 3:
            raise ValueError("MultiOp supports ty<=2, tx<=3")
        if self.weight < 0:
            raise ValueError("weight must be >= 0")
        if self.weight == 0 and self.tx != self.ty:
            raise ValueError("zero-weight ops must be length-preserving (TCS 2011 Thm 8.2)")


def op_shape(op) -> tuple[int, int, float, str | None, str | None]:
    """(tx, ty, weight, term_seg, query_seg) for either extra-op kind;
    segments are None for the unrestricted :class:`MultiOp`."""
    if isinstance(op, MultiOp):
        return op.tx, op.ty, op.weight, None, None
    return len(op.term_seg), len(op.query_seg), op.weight, op.term_seg, op.query_seg


@dataclass(frozen=True)
class OperationWeights:
    """Costs; None disables the op (``OperationSet`` analog).  Core op
    weights are numeric (int or float) >= 1 — fractional costs arrive via
    ``extra_ops``, whose weights may be any value >= 0 (0 only when
    length-preserving)."""

    substitute: float = 1
    insert: float = 1
    delete: float = 1
    transpose: float | None = None
    merge: float | None = None
    split: float | None = None
    extra_ops: tuple = field(default=())  # RestrictedOp | MultiOp

    def validate(self) -> None:
        for name in ("substitute", "insert", "delete"):
            if getattr(self, name) < 1:
                raise ValueError(f"{name} weight must be >= 1")
        for name in ("transpose", "merge", "split"):
            v = getattr(self, name)
            if v is not None and v < 1:
                raise ValueError(f"{name} weight must be >= 1 or None")
        for op in self.extra_ops:
            op.validate()

    def is_integral(self) -> bool:
        vals = [self.substitute, self.insert, self.delete,
                self.transpose, self.merge, self.split]
        vals += [op.weight for op in self.extra_ops]
        return all(v is None or float(v).is_integer() for v in vals)

    def band_half_width(self, budget: float) -> int:
        """Bounded-diagonal half-width for this op set at ``budget`` (see
        module docstring)."""
        h = int(budget)
        drift = [(1, self.insert), (1, self.delete)]
        if self.merge is not None:
            drift.append((1, self.merge))
        if self.split is not None:
            drift.append((1, self.split))
        for op in self.extra_ops:
            tx, ty, wgt, _, _ = op_shape(op)
            d = abs(tx - ty)
            if d:
                drift.append((d, wgt))
        for d, w in drift:
            if w == 0:
                continue  # validate() forbids zero-weight drift ops
            h = max(h, math.floor(budget * d / w + 1e-9))
        return h


STANDARD_WEIGHTS = OperationWeights()
TRANSPOSITION_WEIGHTS = OperationWeights(transpose=1)
MERGE_SPLIT_WEIGHTS = OperationWeights(merge=1, split=1)


def generalized_distance(query: str, term: str, w: OperationWeights) -> float:
    """Scalar reference DP (unbounded) — the oracle for the batch kernel.
    Returns an int-valued float when ``w.is_integral()``."""
    w.validate()
    a, b = query, term
    la, lb = len(a), len(b)
    INF = float(10 ** 9)
    D = [[INF] * (lb + 1) for _ in range(la + 1)]
    D[0][0] = 0.0
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
            for op in w.extra_ops:
                tx, ty, wgt, tseg, qseg = op_shape(op)
                if (
                    i + ty <= la
                    and j + tx <= lb
                    and (qseg is None or a[i : i + ty] == qseg)
                    and (tseg is None or b[j : j + tx] == tseg)
                ):
                    D[i + ty][j + tx] = min(D[i + ty][j + tx], D[i][j] + wgt)
    return D[la][lb]


def batch_generalized_distance(
    queries, terms, max_distance: float, w: OperationWeights
) -> np.ndarray:
    """Vectorized weighted banded DP over the full generalized op set
    (core weighted ops + restricted :class:`RestrictedOp` and unrestricted
    :class:`MultiOp` multichar ``extra_ops``).

    Returns int32 distances with -1 rejects when every weight is integral
    (back-compatible with the uniform kernel); float64 otherwise (-1.0
    rejects), since fractional op costs make the distance itself fractional.
    Band half-width comes from :meth:`OperationWeights.band_half_width`.
    """
    w.validate()
    budget = float(max_distance)
    if budget < 0:
        raise ValueError("max_distance must be >= 0")
    integral = w.is_integral()
    n_int = int(math.floor(budget + 1e-9))
    H = w.band_half_width(budget)
    Q, qlen = encode_strings(queries)
    T, tlen = encode_strings(terms)
    batch = Q.shape[0]
    dtype = np.int32 if integral else np.float64
    if batch == 0:
        return np.empty(0, dtype=dtype)

    def wt(v):
        return dtype(int(v)) if integral else np.float64(v)

    wsub, wins, wdel = wt(w.substitute), wt(w.insert), wt(w.delete)
    W = 2 * H + 1
    INF = dtype(n_int + 1) if integral else np.float64(budget + 1.0)
    max_q = int(qlen.max()) if batch else 0

    P = H + 2
    # width must cover the deepest query row (see batch.py T_pad note)
    T_pad = np.full(
        (batch, max(T.shape[1], max_q) + P + W + 2), _PAD, dtype=np.uint32
    )
    T_pad[:, P : P + T.shape[1]] = T
    k_off = np.arange(W, dtype=np.int32) - H

    # --- restricted extra ops: precompute term-side "segment ends at column
    # c" masks over the padded layout (slice per row like the char window)
    # and partition by query consumption ty (0 = in-row, 1/2 = prev/two_ago).
    ext = []
    for op in w.extra_ops:
        tx, ty, wgt, tseg, qseg = op_shape(op)
        M = np.ones_like(T_pad, dtype=bool)
        for u in range(tx):
            # restricted: position must equal the segment char; unrestricted
            # (tseg None): position must hold ANY real (non-pad) char
            ch = None if tseg is None else np.uint32(ord(tseg[tx - 1 - u]))
            if u == 0:
                M &= (T_pad != _PAD) if ch is None else (T_pad == ch)
            else:
                M[:, u:] &= (
                    (T_pad[:, :-u] != _PAD) if ch is None else (T_pad[:, :-u] == ch)
                )
                M[:, :u] = False
        ext.append((tx, ty, wt(wgt), qseg, M))
    inrow_ops = [e for e in ext if e[1] == 0]
    cell_ops = [e for e in ext if e[1] >= 1]
    has_tx0 = [e for e in ext if e[0] == 0 and e[1] >= 1]

    def qmatch(i: int, ty: int, seg: str | None) -> np.ndarray:
        """Rows where query chars i-ty+1..i equal ``seg`` (seg=None: any
        ``ty`` real chars — the unrestricted :class:`MultiOp` form)."""
        if ty == 0:
            return np.ones(batch, dtype=bool)
        if i < ty:
            return np.zeros(batch, dtype=bool)
        m = np.ones(batch, dtype=bool)
        for u in range(ty):
            idx = i - ty + u
            if idx < Q.shape[1]:
                col = Q[:, idx]
                m &= (col != _PAD) if seg is None else (col == np.uint32(ord(seg[u])))
            else:
                return np.zeros(batch, dtype=bool)
        return m

    def row_slice(M: np.ndarray, i: int) -> np.ndarray:
        """Band view of mask M for row i: column k ↔ term position j=i+k-H."""
        return M[:, i - 1 - H + P : i - 1 + H + 1 + P]

    def apply_inrow(curr_best: np.ndarray, i: int) -> np.ndarray:
        """In-row left-to-right scan: insert steps + ty==0 extra ops."""
        curr = np.empty_like(curr_best)
        tms = [(tx, wgt, row_slice(M, i)) for (tx, _ty, wgt, _s, M) in inrow_ops]
        for k in range(W):
            val = curr_best[:, k]
            if k >= 1:
                val = np.minimum(val, curr[:, k - 1] + wins)
            for tx, wgt, tm in tms:
                if k - tx >= 0 and tx >= 1:
                    val = np.minimum(
                        val, np.where(tm[:, k], curr[:, k - tx] + wgt, INF)
                    )
            curr[:, k] = np.minimum(val, INF)
        return curr

    # --- row 0: D[0][j] — insert chain + term-only (ty==0) extra ops
    two_ago = np.full((batch, W), INF, dtype=dtype)
    prev = np.full((batch, W), INF, dtype=dtype)
    row0 = np.full((batch, W), INF, dtype=dtype)
    row0[:, H] = 0
    prev = apply_inrow(row0, 0)
    prev[:, :H] = INF  # j < 0 cells

    # boundary column D[i][0] (delete chain + tx==0 extra ops), with 2-row
    # history for ty==2 ops
    bnd_hist = [np.zeros(batch, dtype=dtype), None]  # [i-1, i-2]

    out_row = np.full((batch, W), INF, dtype=dtype)
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
        tc = T_pad[:, i - 1 - H + P : i - 1 + H + 1 + P]
        eq = (tc == qc[:, None]) & (tc != _PAD) & (qc[:, None] != _PAD)
        cost = np.where(eq, dtype(0), wsub)
        best = np.minimum(prev + cost, INF)
        # prev[k+1] = D[i-1][j]: consumes a QUERY char → delete cost
        best[:, :-1] = np.minimum(
            best[:, :-1], np.minimum(prev[:, 1:] + wdel, INF)
        )
        if w.transpose is not None and i >= 2:
            qprev = Q[:, i - 2]
            tprev = T_pad[:, i - 2 - H + P : i - 2 + H + 1 + P]
            swap = (
                (tprev == qc[:, None])
                & (tc == qprev[:, None])
                & (tc != _PAD)
                & (tprev != _PAD)
            )
            cand = np.minimum(two_ago + wt(w.transpose), INF)
            best = np.where(swap, np.minimum(best, cand), best)
        if w.merge is not None and i >= 2:
            best[:, :-1] = np.minimum(
                best[:, :-1], np.minimum(two_ago[:, 1:] + wt(w.merge), INF)
            )
        if w.split is not None:
            best[:, 1:] = np.minimum(
                best[:, 1:], np.minimum(prev[:, :-1] + wt(w.split), INF)
            )
        # restricted extra ops consuming ty>=1 query chars: source cell
        # (i-ty, j-tx) sits at band column k + (ty - tx)
        for tx, ty, wgt, seg, M in cell_ops:
            src = prev if ty == 1 else two_ago
            if ty == 2 and i < 2:
                continue
            qm = qmatch(i, ty, seg)
            if not qm.any():
                continue
            tm = row_slice(M, i)
            s2 = ty - tx
            if s2 == 0:
                cand = np.minimum(src + wgt, INF)
                mask = tm & qm[:, None]
                best = np.where(mask, np.minimum(best, cand), best)
            elif s2 > 0:
                cand = np.minimum(src[:, s2:] + wgt, INF)
                mask = tm[:, : W - s2] & qm[:, None]
                best[:, : W - s2] = np.where(
                    mask, np.minimum(best[:, : W - s2], cand), best[:, : W - s2]
                )
            else:
                cand = np.minimum(src[:, :s2] + wgt, INF)
                mask = tm[:, -s2:] & qm[:, None]
                best[:, -s2:] = np.where(
                    mask, np.minimum(best[:, -s2:], cand), best[:, -s2:]
                )
        best = np.where(cell_valid, best, INF)
        # boundary D[i][0]: delete chain + query-only (tx==0) extra ops
        bnd = np.minimum(bnd_hist[0] + wdel, INF)
        for tx, ty, wgt, seg, M in has_tx0:
            src_b = bnd_hist[0] if ty == 1 else bnd_hist[1]
            if src_b is None:
                continue
            qm = qmatch(i, ty, seg)
            bnd = np.where(qm, np.minimum(bnd, src_b + wgt), bnd)
        bnd = np.minimum(bnd, INF)
        if i <= H:
            best[row_active, H - i] = bnd[row_active]
        bnd_hist = [bnd, bnd_hist[0]]
        # in-row scan = D[i][j-1]: insert steps + ty==0 extra ops
        curr = apply_inrow(best, i)
        curr = np.where(
            cell_valid | ((j_abs[None, :] == 0) & row_active[:, None]), curr, INF
        )
        two_ago, prev = prev, curr
        hit = qlen == i
        if hit.any():
            out_row[hit] = curr[hit]

    kf = tlen - qlen + H
    valid = (kf >= 0) & (kf < W)
    res = np.where(valid, out_row[col_idx, np.clip(kf, 0, W - 1)], INF)
    if integral:
        res = res.astype(np.int32)
        res[res > n_int] = -1
        return res
    res = res.astype(np.float64)
    res[res > budget + 1e-9] = -1.0
    return res
