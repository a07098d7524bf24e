"""Anti-diagonal wavefront Smith-Waterman as a jittable ``lax.scan``.

This is the device-side reference path: the same diagonal-major formulation
the Pallas kernel uses, expressed in pure JAX so it runs anywhere (CPU test
meshes, TPU) and serves as the differential baseline for the kernel — the
role the naive float matrix plays for the AVX2 skewed kernel in the reference
(test/test_skewedmatrix.cpp:39-66).

Formulation
-----------
Cells are indexed (r, d): r = i - 1 is the 0-based read position, d = i + j - 2
is the anti-diagonal. Cell (r, d) is DP cell (i = r + 1, j = d - r + 1).
Neighbor map (reference recurrence, src/aligner/similaritymatrix.cpp:49-54):

    west   (i, j-1)   -> step d-1, row r
    north  (i-1, j)   -> step d-1, row r-1
    nw     (i-1, j-1) -> step d-2, row r-1

Each scan step updates one diagonal of shape (M, B): M = padded read length
on the sublane axis, B = batch lanes (independent (read, reference-window)
problems). The reference window is stored reversed-and-padded so the
characters a diagonal needs are one contiguous slice regardless of per-lane
lengths (the trick behind the reference's reversed inv_sequence_y,
src/aligner/similaritymatrix.cpp:283-285, generalized to ragged batches):
with y padded to N and YR = flip(concat(y_pad, M sentinels)) of height
N + 2M, the char y[t] sits at p = N + M - 1 - t, so diagonal d reads
YR[N + M - 1 - d : ... + M].

Invalid cells (j < 1, i > m_b, j > n_b) are stored as 0, which simultaneously
implements the zero boundary condition and keeps the elementwise running
argmax exact.

Argmax tie-break matches Eigen's column-major maxCoeff on the plain float
matrix (src/aligner/similaritymatrix.cpp:21-28): smallest reference index j
first, then smallest read index i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import ScoringConfig, Semantics
from ..utils.encoding import Y_PAD

_INT32_MAX = np.int32(2**31 - 1)


def _shift_down(h):
    """h'[r] = h[r-1], h'[0] = 0 (the i-1 neighbor along a diagonal)."""
    zero_row = jnp.zeros((1,) + h.shape[1:], h.dtype)
    return jnp.concatenate([zero_row, h[:-1]], axis=0)


def _dp_step(h1s, h1, h2s, scores_pm, gap, semantics: str, dtype):
    """One diagonal update given shifted carries and +/- score pair.

    scores_pm is (plus, minus): for exact semantics minus is 0 and plus is
    the signed substitution score; for SAT_UINT8 they are the split
    saturating add/subtract operands of the reference's uint8 path
    (src/aligner/similaritymatrix.cpp:75-81).
    """
    plus, minus = scores_pm
    if semantics == Semantics.SAT_UINT8.value:
        diag = jnp.clip(jnp.clip(h2s + plus, 0, 255) - minus, 0, 255)
        west = jnp.clip(h1 - gap, 0, 255)
        north = jnp.clip(h1s - gap, 0, 255)
        return jnp.maximum(jnp.maximum(diag, west), north)
    zero = jnp.asarray(0, dtype)
    diag = h2s + plus
    west = h1 - gap
    north = h1s - gap
    return jnp.maximum(jnp.maximum(diag, west), jnp.maximum(north, zero))


# Traceback move codes emitted by the forward sweep (bits 0-1) plus the
# stop flag (bit 2). Move preference matches the reference's greedy walk:
# NW if n1 >= n2 and n1 >= n3, else W if n2 >= n1 and n2 >= n3, else N
# (src/aligner/smithwaterman.cpp:41-78); stop when any neighbor is zero.
MOVE_NW = np.uint8(0)
MOVE_W = np.uint8(1)
MOVE_N = np.uint8(2)
STOP_BIT = np.uint8(4)


@functools.partial(
    jax.jit,
    static_argnames=("semantics", "keep_matrix", "emit_moves", "tie"),
)
def _wavefront(
    x_mb, yr, m, n, table, gap, *, semantics: str, keep_matrix: bool,
    emit_moves: bool = False, tie: str = "colmajor",
):
    """Scan all M+N-1 diagonals.

    x_mb: (M, B) uint8 read chars; yr: (N + 2M, B) uint8 reversed-padded refs;
    m, n: (B,) int32 true lengths; table: (256, 256) score table (already the
    DP dtype); gap: scalar DP-dtype gap penalty.

    Returns (best (M, B), bestd (M, B), outs dict with optional 'hstack'
    (D, M, B) DP values and 'moves' (D, M, B) uint8 traceback codes).
    """
    M, B = x_mb.shape
    N = yr.shape[0] - 2 * M
    D = M + N - 1
    dtype = table.dtype

    rr = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    rowmask = rr < m[None, :]  # (M, B)

    sat = semantics == Semantics.SAT_UINT8.value
    skewed_tie = tie == "skewed"
    if skewed_tie:
        # Precomputed per-lane geometry for the reference's skewed raw
        # layout (src/aligner/similaritymatrix.cpp:330-369 with the x/y swap
        # at :274-285): nrows-1 = min(m, n), ncols-1 = max(m, n), and the
        # raw row index depends on which side is shorter.
        minmn = jnp.minimum(m, n)[None, :]  # (1, B)
        maxmn = jnp.maximum(m, n)[None, :]
        n_gt_m = (n > m)[None, :]
        KEY_MULT = M + 33  # > any raw row index (nrows + 32 padding rows)

    def step(carry, d):
        if skewed_tie:
            h1, h2, best, bestd, bestkey = carry
        else:
            h1, h2, best, bestd = carry
        ywin = jax.lax.dynamic_slice_in_dim(yr, N + M - 1 - d, M, axis=0)
        if sat:
            eq = x_mb == ywin
            plus = jnp.where(eq, table[0, 0], jnp.asarray(0, dtype))
            minus = jnp.where(eq, jnp.asarray(0, dtype), table[0, 1])
        else:
            plus = table[x_mb, ywin]
            minus = jnp.asarray(0, dtype)
        h1s = _shift_down(h1)  # north  (i-1, j)
        h2s = _shift_down(h2)  # nw     (i-1, j-1)
        hd = _dp_step(h1s, h1, h2s, (plus, minus), gap, semantics, dtype)
        valid = (rr <= d) & rowmask & (rr >= d + 1 - n[None, :])
        hd = jnp.where(valid, hd, jnp.asarray(0, dtype))
        if skewed_tie:
            # Eigen maxCoeff over the RAW skewed storage: first max in raw
            # column-major order = min (raw col, raw row). Raw coords of
            # cell (i = r+1, j = d-r+1) with s = i + j = d + 2:
            ii = rr + 1
            jj_cell = d - rr + 1
            s = d + 2
            ri = jnp.where(
                n_gt_m,
                jnp.where(
                    s < minmn, jj_cell,
                    jnp.where(s > maxmn, jj_cell - (n - m)[None, :], m[None, :] - ii),
                ),
                jj_cell,
            )
            rj = jnp.where(s <= maxmn, s, s - maxmn - 1)
            rawkey = rj * KEY_MULT + ri
            nonzero = hd > jnp.asarray(0, dtype)
            upd = (hd > best) | ((hd == best) & nonzero & (rawkey < bestkey))
            best = jnp.where(upd, hd, best)
            bestd = jnp.where(upd, d, bestd)
            bestkey = jnp.where(upd, rawkey, bestkey)
        else:
            upd = hd > best  # strict: keeps the earliest diagonal (smallest j) on ties
            best = jnp.where(upd, hd, best)
            bestd = jnp.where(upd, d, bestd)
        out = {}
        if keep_matrix:
            out["hstack"] = hd
        if emit_moves:
            n1, n2, n3 = h2s, h1, h1s  # nw, west, north
            nw_move = (n1 >= n2) & (n1 >= n3)
            w_move = (n2 >= n1) & (n2 >= n3)
            mv = jnp.where(
                nw_move, MOVE_NW, jnp.where(w_move, MOVE_W, MOVE_N)
            ).astype(jnp.uint8)
            zero = jnp.asarray(0, dtype)
            stop = (n1 == zero) | (n2 == zero) | (n3 == zero)
            out["moves"] = mv | jnp.where(stop, STOP_BIT, np.uint8(0))
        if skewed_tie:
            return (hd, h1, best, bestd, bestkey), out
        return (hd, h1, best, bestd), out

    zeros = jnp.zeros((M, B), dtype)
    if skewed_tie:
        init = (
            zeros, zeros, zeros, jnp.zeros((M, B), jnp.int32),
            jnp.full((M, B), _INT32_MAX, jnp.int32),
        )
        (_, _, best, bestd, bestkey), outs = jax.lax.scan(
            step, init, jnp.arange(D, dtype=jnp.int32)
        )
        outs = dict(outs or {})
        outs["bestkey"] = bestkey
        return best, bestd, outs
    init = (zeros, zeros, zeros, jnp.zeros((M, B), jnp.int32))
    (_, _, best, bestd), outs = jax.lax.scan(step, init, jnp.arange(D, dtype=jnp.int32))
    return best, bestd, outs


# Affine (Gotoh) traceback move encoding — one uint8 per cell:
#   bits 0-1: which term achieved H (preference NW > E > F on ties):
#             0 = NW (diagonal), 1 = E (west gap run), 2 = F (north gap
#             run), 3 = H is zero (local-alignment start boundary)
#   bit 3:    E extends (E[i,j] came from E[i,j-1], i.e. keep the west run)
#   bit 4:    F extends (F[i,j] came from F[i-1,j])
H_NW = np.uint8(0)
H_E = np.uint8(1)
H_F = np.uint8(2)
H_ZERO = np.uint8(3)
E_EXT_BIT = np.uint8(8)
F_EXT_BIT = np.uint8(16)


@functools.partial(
    jax.jit, static_argnames=("keep_matrix", "emit_moves")
)
def _wavefront_affine(
    x_mb, yr, m, n, table, gap_open, gap_ext, *, keep_matrix: bool,
    emit_moves: bool = False,
):
    """Affine-gap (Gotoh) anti-diagonal wavefront — extension beyond the
    reference (which only has linear gaps, src/aligner/smithwaterman.cpp:8).

    Same diagonal-major formulation as _wavefront with two extra carried
    diagonals: E (west gap runs) and F (north gap runs). A gap of length L
    costs gap_open + L * gap_ext; gap_open == 0 degenerates exactly to the
    linear recurrence. Invalid cells hold H = 0 (zero boundary) and
    E = F = NEG (a gap run cannot cross the boundary).
    """
    M, B = x_mb.shape
    N = yr.shape[0] - 2 * M
    D = M + N - 1
    dtype = table.dtype
    NEG = (
        jnp.asarray(-(2**30), dtype)
        if dtype == jnp.int32
        else jnp.asarray(-1e30, dtype)
    )
    zero = jnp.asarray(0, dtype)

    rr = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    rowmask = rr < m[None, :]  # (M, B)

    def step(carry, d):
        h1, h2, e1, f1, best, bestd = carry
        ywin = jax.lax.dynamic_slice_in_dim(yr, N + M - 1 - d, M, axis=0)
        s = table[x_mb, ywin]
        h1s = _shift_down(h1)  # north  (i-1, j)
        h2s = _shift_down(h2)  # nw     (i-1, j-1)
        f1s = _shift_down(f1)  # north F
        e_open = h1 - gap_open
        f_open = h1s - gap_open
        e_d = jnp.maximum(e_open, e1) - gap_ext
        f_d = jnp.maximum(f_open, f1s) - gap_ext
        diag = h2s + s
        hd = jnp.maximum(jnp.maximum(diag, e_d), jnp.maximum(f_d, zero))
        valid = (rr <= d) & rowmask & (rr >= d + 1 - n[None, :])
        hd = jnp.where(valid, hd, zero)
        e_d = jnp.where(valid, e_d, NEG)
        f_d = jnp.where(valid, f_d, NEG)
        upd = hd > best  # strict: earliest diagonal (smallest j) wins ties
        best = jnp.where(upd, hd, best)
        bestd = jnp.where(upd, d, bestd)
        out = {}
        if keep_matrix:
            out["hstack"] = hd
            out["estack"] = e_d
            out["fstack"] = f_d
        if emit_moves:
            h_src = jnp.where(
                hd == zero,
                H_ZERO,
                jnp.where(
                    hd == diag, H_NW, jnp.where(hd == e_d, H_E, H_F)
                ),
            ).astype(jnp.uint8)
            # Extend-on-tie matches the oracle walk, which tests the extend
            # branch first (oracle.affine_traceback).
            e_ext = e1 >= e_open
            f_ext = f1s >= f_open
            mv = (
                h_src
                | jnp.where(e_ext, E_EXT_BIT, np.uint8(0))
                | jnp.where(f_ext, F_EXT_BIT, np.uint8(0))
            )
            out["moves"] = mv
        return (hd, h1, e_d, f_d, best, bestd), out

    zeros = jnp.zeros((M, B), dtype)
    negs = jnp.full((M, B), NEG, dtype)
    init = (zeros, zeros, negs, negs, zeros, jnp.zeros((M, B), jnp.int32))
    (_, _, _, _, best, bestd), outs = jax.lax.scan(
        step, init, jnp.arange(D, dtype=jnp.int32)
    )
    return best, bestd, outs


@jax.jit
def _reduce_best(best, bestd):
    """(M, B) elementwise bests -> per-lane (score, i, j) with the
    column-major tie-break: min j, then min i."""
    M = best.shape[0]
    score = jnp.max(best, axis=0)  # (B,)
    rr = jax.lax.broadcasted_iota(jnp.int32, best.shape, 0)
    jj = bestd - rr + 1
    # lexicographic (j, i) key; i = r + 1 <= M + 1
    key = jj * (M + 2) + rr + 1
    key = jnp.where(best == score[None, :], key, _INT32_MAX)
    r_star = jnp.argmin(key, axis=0)  # (B,)
    lanes = jnp.arange(best.shape[1])
    i_star = r_star + 1
    j_star = bestd[r_star, lanes] - r_star + 1
    # degenerate all-zero matrix: reference semantics returns cell (0, 0)
    nonzero = score > 0
    i_star = jnp.where(nonzero, i_star, 0)
    j_star = jnp.where(nonzero, j_star, 0)
    return score, i_star, j_star


@jax.jit
def _reduce_best_skewed(best, bestd, bestkey):
    """Per-lane (score, i, j) with the reference's skewed raw-layout
    tie-break: among max cells, minimum raw-storage key."""
    score = jnp.max(best, axis=0)
    key = jnp.where(best == score[None, :], bestkey, _INT32_MAX)
    r_star = jnp.argmin(key, axis=0)
    lanes = jnp.arange(best.shape[1])
    i_star = r_star + 1
    j_star = bestd[r_star, lanes] - r_star + 1
    nonzero = score > 0
    return (
        score,
        jnp.where(nonzero, i_star, 0),
        jnp.where(nonzero, j_star, 0),
    )


class ScanEngine:
    """Batched wavefront engine over fixed padded shapes (M, N, B).

    One instance = one compiled program per shape; reuse across batches of
    the same padded geometry. Semantics and scoring come from ScoringConfig.
    """

    def __init__(self, cfg: ScoringConfig = ScoringConfig(), tie: str = "colmajor"):
        """tie: 'colmajor' (Eigen maxCoeff on the dense matrix — the
        reference's float path) or 'skewed' (first max in the skewed RAW
        storage's column-major order — the reference's AVX2 path,
        src/aligner/similaritymatrix.cpp:291-299). Combine tie='skewed' with
        Semantics.SAT_UINT8 for bit-parity with the reference's serial
        sw_solve_small build."""
        self.cfg = cfg
        self.tie = tie
        dt = cfg.dp_dtype()
        self._dtype = jnp.int32 if dt == np.uint8 else jnp.dtype(dt)
        if cfg.semantics == Semantics.SAT_UINT8:
            if not cfg.is_uniform:
                raise ValueError("SAT_UINT8 supports uniform scoring only")
            sat = lambda v: min(max(int(v), 0), 255)
            tab = np.zeros((256, 256), np.int32)
            tab[0, 0] = sat(cfg.match)
            tab[0, 1] = sat(-cfg.mismatch)
            self._table = jnp.asarray(tab)
            self._gap = jnp.asarray(sat(cfg.gap_penalty), jnp.int32)
        else:
            self._table = jnp.asarray(cfg.byte_table().astype(self._dtype))
            self._gap = jnp.asarray(cfg.gap_penalty, self._dtype)
        self._open = jnp.asarray(cfg.gap_open, self._dtype)
        if cfg.is_affine and tie == "skewed":
            raise ValueError(
                "affine gaps are an extension without a reference skewed "
                "build to mirror; use tie='colmajor'"
            )

    def prepare_refs(self, y_bn: jnp.ndarray, M: int) -> jnp.ndarray:
        """(B, N) padded refs -> (N + 2M, B) reversed-padded ref buffer."""
        B, N = y_bn.shape
        ypad = jnp.concatenate(
            [y_bn, jnp.full((B, M), Y_PAD, jnp.uint8)], axis=1
        )  # (B, N + M)
        yr = jnp.flip(ypad, axis=1).T  # (N + M, B)
        return jnp.concatenate([yr, jnp.full((M, B), Y_PAD, jnp.uint8)], axis=0)

    def score_batch(
        self, x_bm, y_bn, m, n, keep_matrix: bool = False,
        emit_moves: bool = False,
    ):
        """Align B lanes: x_bm (B, M) reads, y_bn (B, N) refs, m/n true lengths.

        Returns dict with per-lane 'score' (DP dtype), 'i', 'j' (1-based
        argmax cell, 0 if the matrix is all zero), and optionally 'hstack'
        (D, M, B) diagonal-major DP values / 'moves' (D, M, B) uint8
        traceback codes.
        """
        x_mb = jnp.asarray(x_bm, jnp.uint8).T
        yr = self.prepare_refs(jnp.asarray(y_bn, jnp.uint8), x_mb.shape[0])
        if self.cfg.is_affine:
            best, bestd, outs = _wavefront_affine(
                x_mb, yr, jnp.asarray(m, jnp.int32), jnp.asarray(n, jnp.int32),
                self._table, self._open, self._gap,
                keep_matrix=keep_matrix, emit_moves=emit_moves,
            )
            score, i, j = _reduce_best(best, bestd)
            out = {"score": score, "i": i, "j": j}
            out.update(outs)
            return out
        best, bestd, outs = _wavefront(
            x_mb, yr, jnp.asarray(m, jnp.int32), jnp.asarray(n, jnp.int32),
            self._table, self._gap,
            semantics=self.cfg.semantics.value, keep_matrix=keep_matrix,
            emit_moves=emit_moves, tie=self.tie,
        )
        if self.tie == "skewed":
            score, i, j = _reduce_best_skewed(best, bestd, outs.pop("bestkey"))
        else:
            score, i, j = _reduce_best(best, bestd)
        out = {"score": score, "i": i, "j": j}
        out.update(outs)
        return out


def hstack_to_matrix(hstack, m: int, n: int, lane: int = 0) -> np.ndarray:
    """Diagonal-major (D, M, B) stack -> dense (m+1, n+1) DP matrix with the
    zero boundary row/column, for tests and traceback."""
    hs = np.asarray(hstack[:, :, lane])
    H = np.zeros((m + 1, n + 1), dtype=hs.dtype)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            H[i, j] = hs[i + j - 2, i - 1]
    return H


def sw_matrix_scan(x, y, cfg: ScoringConfig = ScoringConfig()) -> np.ndarray:
    """Single-pair convenience: full (m+1, n+1) DP matrix via the scan path."""
    from ..utils.encoding import to_bytes

    xb = to_bytes(x) if isinstance(x, str) else np.asarray(x, np.uint8)
    yb = to_bytes(y) if isinstance(y, str) else np.asarray(y, np.uint8)
    eng = ScanEngine(cfg)
    res = eng.score_batch(
        xb[None, :], yb[None, :],
        np.array([len(xb)]), np.array([len(yb)]), keep_matrix=True,
    )
    H = hstack_to_matrix(res["hstack"], len(xb), len(yb))
    if cfg.semantics == Semantics.SAT_UINT8:
        H = H.astype(np.uint8)
    return H
