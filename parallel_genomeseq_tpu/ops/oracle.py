"""Numpy correctness oracle: textbook Smith-Waterman DP + traceback.

This is the trivially-correct implementation every accelerated path is
differentially tested against, mirroring how the reference tests its skewed
AVX2 kernel cell-by-cell against the naive float matrix
(reference: test/test_skewedmatrix.cpp:39-66, src/aligner/similaritymatrix.cpp:83-97).

Semantics reproduced exactly:
- recurrence H(i,j) = max(H(i-1,j-1)+s, H(i,j-1)-g, H(i-1,j)-g, 0)
  (reference: src/aligner/similaritymatrix.cpp:49-54)
- saturating-uint8 variant: H = max(sat(sat(nw+p)-m), sat(w-g), sat(n-g))
  where p/m are the match/mismatch magnitudes (src/aligner/similaritymatrix.cpp:75-81)
- argmax = first maximum in column-major traversal (Eigen maxCoeff,
  src/aligner/similaritymatrix.cpp:21-28): smallest ref index j first, then
  smallest read index i
- traceback: greedy NW >= W >= N walk from the max; stops when any of the
  three neighbors is 0; appends the stop cell's chars; pos = 1-based ref
  index at the stop cell (src/aligner/smithwaterman.cpp:41-78)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils.config import ScoringConfig, Semantics
from ..utils.encoding import to_bytes
from ..utils.result import AlignResult, Timings


def _as_bytes(seq) -> np.ndarray:
    if isinstance(seq, str):
        return to_bytes(seq)
    return np.asarray(seq, dtype=np.uint8)


def sw_matrix(x, y, cfg: ScoringConfig = ScoringConfig()) -> np.ndarray:
    """Full (m+1, n+1) DP matrix. Row 0 / column 0 are the zero boundary."""
    xb, yb = _as_bytes(x), _as_bytes(y)
    m, n = len(xb), len(yb)
    tab = cfg.byte_table()
    if cfg.semantics == Semantics.SAT_UINT8:
        return _sw_matrix_sat_u8(xb, yb, cfg)
    dt = cfg.dp_dtype()
    H = np.zeros((m + 1, n + 1), dtype=dt)
    g = dt(cfg.gap_penalty) if dt == np.float32 else int(cfg.gap_penalty)
    tab = tab.astype(dt) if dt == np.float32 else tab.astype(np.int32)
    for j in range(1, n + 1):
        for i in range(1, m + 1):
            s = tab[xb[i - 1], yb[j - 1]]
            H[i, j] = max(H[i - 1, j - 1] + s, H[i, j - 1] - g, H[i - 1, j] - g, 0)
    return H


def _sw_matrix_sat_u8(xb, yb, cfg: ScoringConfig) -> np.ndarray:
    """Saturating-uint8 DP, the reference skewed path's arithmetic.

    Match/mismatch magnitudes are clamped to [0, 255] the same way the
    reference probes and saturates them (src/aligner/similaritymatrix.cpp:376-392).
    Only uniform scoring is supported in this mode (same restriction as the
    reference AVX2 path).
    """
    if not cfg.is_uniform:
        raise ValueError("SAT_UINT8 semantics supports uniform scoring only")

    def _sat(v):
        return np.uint8(min(max(int(v), 0), 255))

    p = _sat(cfg.match)
    q = _sat(-cfg.mismatch)
    g = _sat(cfg.gap_penalty)
    m, n = len(xb), len(yb)
    H = np.zeros((m + 1, n + 1), dtype=np.uint8)

    def adds(a, b):
        return np.uint8(min(int(a) + int(b), 255))

    def subs(a, b):
        return np.uint8(max(int(a) - int(b), 0))

    for j in range(1, n + 1):
        for i in range(1, m + 1):
            eq = xb[i - 1] == yb[j - 1]
            diag = subs(adds(H[i - 1, j - 1], p if eq else 0), 0 if eq else q)
            west = subs(H[i, j - 1], g)
            north = subs(H[i - 1, j], g)
            H[i, j] = max(diag, west, north)
    return H


def sw_score_fast(x, y, cfg: ScoringConfig = ScoringConfig()) -> Tuple[int, int, int]:
    """(score, i, j) via a column-vectorized numpy DP — fast enough to
    verify live results at engine startup (ms per lane, vs seconds for the
    per-cell sw_matrix loop). Integral scoring only.

    The in-column north dependency H[i,j] = max(E[i,j], H[i-1,j] - g) is
    resolved with a prefix max: H[i] = max_{k<=i}(E[k] + g*k) - g*i.
    Tie-break matches find_max (column-major first occurrence).
    """
    if not cfg.is_integral:
        raise ValueError("sw_score_fast requires integral scoring")
    xb, yb = _as_bytes(x), _as_bytes(y)
    tab = cfg.byte_table().astype(np.int64)
    g = int(cfg.gap_penalty)
    m = len(xb)
    gi = g * np.arange(m, dtype=np.int64)
    Hprev = np.zeros(m + 1, np.int64)
    best, bi, bj = 0, 0, 0
    for j in range(1, len(yb) + 1):
        s = tab[xb, yb[j - 1]]
        E = np.maximum(Hprev[:-1] + s, np.maximum(Hprev[1:] - g, 0))
        Hcol = np.maximum.accumulate(E + gi) - gi
        cm = int(Hcol.max())
        if cm > best:
            best, bi, bj = cm, int(np.argmax(Hcol)) + 1, j
        Hprev[1:] = Hcol
    return best, bi, bj


def sw_affine_score_fast(
    x, y, cfg: ScoringConfig
) -> Tuple[int, int, int]:
    """(score, i, j) for the affine (Gotoh) model via a column-vectorized
    DP — the live-verification oracle for the affine Pallas kernel (ms per
    lane). Integral scoring only.

    The in-column F dependency F[i,j] = max(H[i-1,j] - open, F[i-1,j]) - ext
    (which feeds H[i,j] in the same column) is resolved with the same prefix-
    max trick as sw_score_fast: with A[i] = max(0, diag, E[i]) (previous-
    column terms only) and Q[i] = max_{u<=i}(H[u] + ext*u),
    H[i] = max(A[i], Q[i-1] - open - ext*i) and Q[i] = max(Q[i-1],
    A[i] + ext*i) — one np.maximum.accumulate per column.
    """
    if not cfg.is_integral:
        raise ValueError("sw_affine_score_fast requires integral scoring")
    xb, yb = _as_bytes(x), _as_bytes(y)
    tab = cfg.byte_table().astype(np.int64)
    open_ = int(cfg.gap_open)
    ext = int(cfg.gap_penalty)
    m = len(xb)
    NEG = np.int64(-(2**60))
    gi = ext * np.arange(1, m + 1, dtype=np.int64)  # ext * i
    Hprev = np.zeros(m + 1, np.int64)  # H[0..m] of the previous column
    Eprev = np.full(m, NEG, np.int64)  # E[1..m] of the previous column
    best, bi, bj = 0, 0, 0
    for j in range(1, len(yb) + 1):
        s = tab[xb, yb[j - 1]]
        E = np.maximum(Hprev[1:] - open_, Eprev) - ext
        A = np.maximum(np.maximum(Hprev[:-1] + s, E), 0)
        Q = np.maximum.accumulate(np.concatenate(([np.int64(0)], A + gi)))
        Hcol = np.maximum(A, Q[:-1] - open_ - gi)
        cm = int(Hcol.max())
        if cm > best:
            best, bi, bj = cm, int(np.argmax(Hcol)) + 1, j
        Hprev[1:] = Hcol
        Eprev = E
    return best, bi, bj


def find_max(H: np.ndarray) -> Tuple[int, int, float]:
    """(i, j, value): first maximum in column-major order (Eigen maxCoeff)."""
    flat = np.argmax(H.T)  # row-major argmax of the transpose == column-major
    j, i = divmod(flat, H.shape[0])
    return int(i), int(j), H[i, j].item()


def traceback(H: np.ndarray, x, y, i: int, j: int):
    """Greedy reference-exact traceback from 1-based cell (i, j).

    Returns (pos, consensus_x, consensus_y) with consensus strings in
    reverse order, '-' for gaps.
    """
    xb, yb = _as_bytes(x), _as_bytes(y)
    cx, cy = [], []
    while True:
        n1 = H[i - 1, j - 1]
        n2 = H[i, j - 1]
        n3 = H[i - 1, j]
        if n1 == 0 or n2 == 0 or n3 == 0:
            cx.append(chr(xb[i - 1]))
            cy.append(chr(yb[j - 1]))
            return j, "".join(cx), "".join(cy)
        if n1 >= n2 and n1 >= n3:  # north-west
            cx.append(chr(xb[i - 1]))
            cy.append(chr(yb[j - 1]))
            i -= 1
            j -= 1
        elif n2 >= n1 and n2 >= n3:  # west
            cx.append("-")
            cy.append(chr(yb[j - 1]))
            j -= 1
        else:  # north
            cx.append(chr(xb[i - 1]))
            cy.append("-")
            i -= 1


def nw_matrix(x, y, cfg: ScoringConfig = ScoringConfig()) -> np.ndarray:
    """Needleman-Wunsch global-alignment DP matrix (no zero floor; gap-cost
    boundary). The SW/NW/Hirschberg method family shares one recurrence —
    global mode drops the max-with-zero and initializes the boundary to
    cumulative gap costs."""
    xb, yb = _as_bytes(x), _as_bytes(y)
    m, n = len(xb), len(yb)
    tab = cfg.byte_table().astype(np.float64)
    g = float(cfg.gap_penalty)
    H = np.zeros((m + 1, n + 1), np.float64)
    H[0, :] = -g * np.arange(n + 1)
    H[:, 0] = -g * np.arange(m + 1)
    for j in range(1, n + 1):
        for i in range(1, m + 1):
            s = tab[xb[i - 1], yb[j - 1]]
            H[i, j] = max(H[i - 1, j - 1] + s, H[i, j - 1] - g, H[i - 1, j] - g)
    return H


def nw_align(x, y, cfg: ScoringConfig = ScoringConfig()) -> AlignResult:
    """Global alignment: traceback from the (m, n) corner to (0, 0) with the
    same greedy NW >= W >= N preference as the local walk."""
    xb, yb = _as_bytes(x), _as_bytes(y)
    H = nw_matrix(x, y, cfg)
    g = float(cfg.gap_penalty)
    i, j = len(xb), len(yb)
    cx, cy = [], []
    tab = cfg.byte_table().astype(np.float64)
    while i > 0 or j > 0:
        if i > 0 and j > 0 and H[i, j] == H[i - 1, j - 1] + tab[xb[i - 1], yb[j - 1]]:
            cx.append(chr(xb[i - 1]))
            cy.append(chr(yb[j - 1]))
            i -= 1
            j -= 1
        elif j > 0 and H[i, j] == H[i, j - 1] - g:
            cx.append("-")
            cy.append(chr(yb[j - 1]))
            j -= 1
        else:
            cx.append(chr(xb[i - 1]))
            cy.append("-")
            i -= 1
    return AlignResult(
        score=float(H[len(xb), len(yb)]), pos=1,
        consensus_x="".join(cx), consensus_y="".join(cy),
        max_i=len(xb), max_j=len(yb),
    )


def sw_affine_matrices(x, y, cfg: ScoringConfig):
    """Gotoh affine-gap local DP: returns (H, E, F), each (m+1, n+1).

    A gap of length L costs ``gap_open + L * gap_penalty`` (see
    ScoringConfig.is_affine). E tracks gap-in-read (west) runs, F tracks
    gap-in-reference (north) runs:

        E[i,j] = max(H[i,j-1] - open, E[i,j-1]) - extend
        F[i,j] = max(H[i-1,j] - open, F[i-1,j]) - extend
        H[i,j] = max(0, H[i-1,j-1] + s(x_i, y_j), E[i,j], F[i,j])

    With open == 0 this is exactly the linear recurrence (H >= E, F always,
    so the running max collapses). Extension beyond the reference, which has
    no affine gaps.
    """
    xb, yb = _as_bytes(x), _as_bytes(y)
    m, n = len(xb), len(yb)
    tab = cfg.byte_table().astype(np.float64)
    open_ = float(cfg.gap_open)
    ext = float(cfg.gap_penalty)
    NEG = -1e18
    H = np.zeros((m + 1, n + 1), np.float64)
    E = np.full((m + 1, n + 1), NEG, np.float64)
    F = np.full((m + 1, n + 1), NEG, np.float64)
    for j in range(1, n + 1):
        for i in range(1, m + 1):
            E[i, j] = max(H[i, j - 1] - open_, E[i, j - 1]) - ext
            F[i, j] = max(H[i - 1, j] - open_, F[i - 1, j]) - ext
            s = tab[xb[i - 1], yb[j - 1]]
            H[i, j] = max(0.0, H[i - 1, j - 1] + s, E[i, j], F[i, j])
    return H, E, F


def affine_traceback(H, E, F, x, y, i: int, j: int, cfg: ScoringConfig):
    """State-machine traceback from 1-based (i, j): H state chooses
    NW / enter-E / enter-F by recomputing which term achieved H; E/F states
    emit gap columns and either keep extending or return to H. Stops when
    the H state reaches a zero cell (the local-alignment start). Returns
    (pos, consensus_x, consensus_y), reversed strings, '-' gaps; pos is the
    1-based reference index of the first aligned column."""
    xb, yb = _as_bytes(x), _as_bytes(y)
    tab = cfg.byte_table().astype(np.float64)
    open_ = float(cfg.gap_open)
    ext = float(cfg.gap_penalty)
    cx, cy = [], []
    state = "H"
    pos = j
    while True:
        if state == "H":
            if H[i, j] == 0:
                return pos, "".join(cx), "".join(cy)
            if H[i, j] == H[i - 1, j - 1] + tab[xb[i - 1], yb[j - 1]]:
                cx.append(chr(xb[i - 1]))
                cy.append(chr(yb[j - 1]))
                pos = j
                i -= 1
                j -= 1
            elif H[i, j] == E[i, j]:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            cx.append("-")
            cy.append(chr(yb[j - 1]))
            pos = j
            extend = E[i, j] == E[i, j - 1] - ext
            j -= 1
            if not extend:
                state = "H"
        else:  # F
            cx.append(chr(xb[i - 1]))
            cy.append("-")
            extend = F[i, j] == F[i - 1, j] - ext
            i -= 1
            if not extend:
                state = "H"


def affine_align(x, y, cfg: ScoringConfig) -> AlignResult:
    """End-to-end affine-gap oracle alignment."""
    H, E, F = sw_affine_matrices(x, y, cfg)
    i, j, score = find_max(H)
    if score <= 0:
        return AlignResult(score=float(score), pos=0)
    pos, cx, cy = affine_traceback(H, E, F, x, y, i, j, cfg)
    return AlignResult(
        score=float(score), pos=pos, consensus_x=cx, consensus_y=cy,
        max_i=i, max_j=j, timings=Timings(),
    )


def align(x, y, cfg: ScoringConfig = ScoringConfig()) -> AlignResult:
    """End-to-end oracle alignment of read x against reference y."""
    if cfg.is_affine:
        return affine_align(x, y, cfg)
    H = sw_matrix(x, y, cfg)
    i, j, score = find_max(H)
    if score <= 0:
        return AlignResult(score=float(score), pos=0)
    pos, cx, cy = traceback(H, x, y, i, j)
    return AlignResult(
        score=float(score), pos=pos, consensus_x=cx, consensus_y=cy,
        max_i=i, max_j=j, timings=Timings(),
    )
