"""Batched on-device traceback over forward-sweep move codes.

The reference walks the dense DP matrix on the host
(src/aligner/smithwaterman.cpp:41-78). On TPU, shipping the full matrix to
the host per read would swamp the interconnect, so the forward sweep records
a per-cell uint8 move/stop code (ops/scan_dp.py `emit_moves`) — the greedy
decision NW >= W >= N plus the "any neighbor zero" stop flag — and a batched
``lax.while_loop`` walks all B lanes in lockstep on device, gathering one
code per lane per step and emitting consensus characters into fixed-size
buffers. Host-side work is just byte -> string assembly.

Emitted consensus strings are in reverse order with '-' gaps, matching the
reference's push_back-while-walking construction.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .scan_dp import MOVE_N, MOVE_W, STOP_BIT

GAP_BYTE = np.uint8(ord("-"))


@functools.partial(jax.jit, static_argnames=("max_steps",))
def walk_moves(moves, x_mb, y_bn, i0, j0, *, max_steps: int):
    """Walk B lanes from their 1-based argmax cells (i0, j0).

    moves: (D, M, B) uint8 move/stop codes (diagonal-major).
    x_mb:  (M, B) uint8 read chars.
    y_bn:  (B, N) uint8 reference chars.
    i0,j0: (B,) int32; lanes with i0 == 0 (all-zero matrix) are skipped.

    Returns (pos (B,), cx (max_steps, B) uint8, cy (max_steps, B) uint8,
    steps (B,) int32). Consensus buffers are NUL-padded after the walk.
    pos is exact regardless of max_steps; consensus is truncated if a walk
    exceeds max_steps (practically impossible for max_steps >= 3 * read len,
    since each west gap burns gap_penalty of score).
    """
    M, B = x_mb.shape
    lanes = jnp.arange(B)
    cx0 = jnp.zeros((max_steps, B), jnp.uint8)
    cy0 = jnp.zeros((max_steps, B), jnp.uint8)

    # Fixed-trip fori_loop rather than a data-dependent while_loop: inactive
    # lanes are masked, and a static trip count avoids per-iteration
    # condition evaluation (which some remote execution paths turn into a
    # host round trip per step).
    def body(it, state):
        i, j, pos, active, cx, cy, steps = state
        d = jnp.clip(i + j - 2, 0, moves.shape[0] - 1)
        r = jnp.clip(i - 1, 0, M - 1)
        mv = moves[d, r, lanes]  # (B,) gather
        stop = (mv & STOP_BIT) != 0
        code = mv & np.uint8(3)
        xc = x_mb[r, lanes]
        yc = y_bn[lanes, jnp.clip(j - 1, 0, y_bn.shape[1] - 1)]
        go_w = (code == MOVE_W) & ~stop
        go_n = (code == MOVE_N) & ~stop
        emit_x = jnp.where(go_w, GAP_BYTE, xc)
        emit_y = jnp.where(go_n, GAP_BYTE, yc)
        # A lane is active from iteration 0 until it stops (never resumes),
        # so steps == it for every active lane: the emission slot is the
        # loop index — a static row write, not a per-lane scatter.
        cx = cx.at[it].set(jnp.where(active, emit_x, jnp.uint8(0)))
        cy = cy.at[it].set(jnp.where(active, emit_y, jnp.uint8(0)))
        steps = jnp.where(active, steps + 1, steps)
        pos = jnp.where(active & stop, j, pos)
        di = jnp.where(go_w, 0, 1)
        dj = jnp.where(go_n, 0, 1)
        i = jnp.where(active & ~stop, i - di, i)
        j = jnp.where(active & ~stop, j - dj, j)
        active = active & ~stop
        return (i, j, pos, active, cx, cy, steps)

    i0 = jnp.asarray(i0, jnp.int32)
    j0 = jnp.asarray(j0, jnp.int32)
    active0 = i0 > 0
    state = (
        i0, j0, jnp.zeros((B,), jnp.int32), active0, cx0, cy0,
        jnp.zeros((B,), jnp.int32),
    )
    _, _, pos, _, cx, cy, steps = jax.lax.fori_loop(0, max_steps, body, state)
    return pos, cx, cy, steps


@functools.partial(jax.jit, static_argnames=("max_steps",))
def walk_moves_affine(moves, x_mb, y_bn, i0, j0, *, max_steps: int):
    """Affine (Gotoh) traceback walk over the state-machine move codes from
    scan_dp._wavefront_affine (extension beyond the reference's linear-gap
    greedy walk). Per-lane state: 0 = H, 1 = in an E (west gap) run, 2 = in
    an F (north gap) run. Entering a run from H emits its first gap column
    in the same iteration (the oracle's H->E/H->F transition plus the E/F
    action at the same cell fused), so every active iteration emits exactly
    one column and the static-row-write trick of walk_moves still applies.
    Stops when the H state reads the H_ZERO code (H == 0 local start);
    pos = 1-based reference index of the last diagonal emission (the first
    aligned column — affine paths always start and end with NW moves).

    Returns (pos (B,), cx, cy (max_steps, B) uint8, steps (B,) int32).
    """
    from .scan_dp import E_EXT_BIT, F_EXT_BIT, H_E, H_F, H_NW, H_ZERO

    M, B = x_mb.shape
    lanes = jnp.arange(B)
    cx0 = jnp.zeros((max_steps, B), jnp.uint8)
    cy0 = jnp.zeros((max_steps, B), jnp.uint8)

    def body(it, st):
        i, j, pos, state, active, cx, cy, steps = st
        d = jnp.clip(i + j - 2, 0, moves.shape[0] - 1)
        r = jnp.clip(i - 1, 0, M - 1)
        mv = moves[d, r, lanes]
        hsrc = mv & np.uint8(3)
        e_ext = (mv & E_EXT_BIT) != 0
        f_ext = (mv & F_EXT_BIT) != 0
        in_h = state == 0
        # Effective op at this cell: H picks its source; E/F runs continue.
        op = jnp.where(in_h, hsrc.astype(jnp.int32), state)
        # Stop on the H_ZERO code, and also at the i = 0 / j = 0 boundary:
        # boundary cells (H = 0 by construction) are not part of the moves
        # tensor, and the clipped (d, r) gather would otherwise read a
        # neighboring cell's code after a path consumes the whole read.
        stop = in_h & ((hsrc == H_ZERO) | (i <= 0) | (j <= 0))
        nw = active & ~stop & (op == H_NW)
        go_w = active & ~stop & (op == H_E)
        go_n = active & ~stop & (op == H_F)
        xc = x_mb[r, lanes]
        yc = y_bn[lanes, jnp.clip(j - 1, 0, y_bn.shape[1] - 1)]
        emit_x = jnp.where(go_w, GAP_BYTE, xc)
        emit_y = jnp.where(go_n, GAP_BYTE, yc)
        emitting = active & ~stop
        cx = cx.at[it].set(jnp.where(emitting, emit_x, jnp.uint8(0)))
        cy = cy.at[it].set(jnp.where(emitting, emit_y, jnp.uint8(0)))
        steps = jnp.where(emitting, steps + 1, steps)
        pos = jnp.where(nw, j, pos)
        state = jnp.where(
            nw,
            0,
            jnp.where(
                go_w,
                jnp.where(e_ext, 1, 0),
                jnp.where(go_n, jnp.where(f_ext, 2, 0), state),
            ),
        )
        i = i - jnp.where(nw | go_n, 1, 0)
        j = j - jnp.where(nw | go_w, 1, 0)
        active = active & ~stop
        return (i, j, pos, state, active, cx, cy, steps)

    i0 = jnp.asarray(i0, jnp.int32)
    j0 = jnp.asarray(j0, jnp.int32)
    active0 = i0 > 0
    st = (
        i0, j0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
        active0, cx0, cy0, jnp.zeros((B,), jnp.int32),
    )
    _, _, pos, _, _, cx, cy, steps = jax.lax.fori_loop(0, max_steps, body, st)
    return pos, cx, cy, steps


@functools.partial(jax.jit, static_argnames=("max_steps",))
def walk_strip_level(moves, x_strip, y_bn, base_row, state, *, max_steps: int):
    """Advance the batched greedy walk through ONE row-strip of the DP
    matrix (strip-length-read traceback; see PallasEngine.score_batch_strip_moves).

    moves:   (D, S, B) uint8 move/stop codes of the strip rows
             [base_row, base_row + S), recomputed from the checkpointed
             boundary row (exact full-matrix values).
    x_strip: (S, B) uint8 read chars of the strip rows.
    y_bn:    (B, N) uint8 reference chars.
    base_row: global 0-based row index of the strip's first row (traced, so
             one compiled program serves every strip level).
    state:   (i, j, pos, active, cx, cy, steps) carried across levels; lanes
             whose current row is outside this strip pass through untouched,
             lanes that cross the strip's top edge pause until their level.

    Emissions go to per-lane slots cx[steps[b], b] (lanes progress unevenly
    across levels, so the slot is data-dependent — a scatter, unlike the
    single-strip walk's static row writes).
    """
    D, S, B = moves.shape
    N = y_bn.shape[1]
    lanes = jnp.arange(B)
    Mbuf = state[4].shape[0]  # cx rows

    def body(_, st):
        i, j, pos, active, cx, cy, steps = st
        inlevel = active & (i - 1 >= base_row)
        r = jnp.clip(i - 1 - base_row, 0, S - 1)
        d = jnp.clip(i + j - 2 - base_row, 0, D - 1)
        mv = moves[d, r, lanes]
        stop = (mv & STOP_BIT) != 0
        code = mv & np.uint8(3)
        xc = x_strip[r, lanes]
        yc = y_bn[lanes, jnp.clip(j - 1, 0, N - 1)]
        go_w = (code == MOVE_W) & ~stop
        go_n = (code == MOVE_N) & ~stop
        emit_x = jnp.where(go_w, GAP_BYTE, xc)
        emit_y = jnp.where(go_n, GAP_BYTE, yc)
        slot = jnp.where(inlevel, steps, Mbuf)  # out-of-range rows drop
        cx = cx.at[slot, lanes].set(emit_x, mode="drop")
        cy = cy.at[slot, lanes].set(emit_y, mode="drop")
        steps = jnp.where(inlevel, steps + 1, steps)
        pos = jnp.where(inlevel & stop, j, pos)
        di = jnp.where(go_w, 0, 1)
        dj = jnp.where(go_n, 0, 1)
        i = jnp.where(inlevel & ~stop, i - di, i)
        j = jnp.where(inlevel & ~stop, j - dj, j)
        active = active & ~(inlevel & stop)
        return (i, j, pos, active, cx, cy, steps)

    return jax.lax.fori_loop(0, max_steps, body, state)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def walk_strip_level_affine(moves, x_strip, y_bn, base_row, state, *,
                            max_steps: int):
    """Advance the batched AFFINE state-machine walk through ONE row-strip
    (strip-length affine traceback; see
    PallasEngine.score_batch_strip_affine_moves). The per-lane gap-machine
    state (0 = H, 1 = E run, 2 = F run) is carried in the state tuple, so a
    gap run crossing a strip edge (an F run always does) resumes correctly
    at the next level.

    moves: (D, S, B) uint8 affine move codes (scan_dp H_*/E_EXT/F_EXT
           encoding) of the strip rows [base_row, base_row + S), recomputed
           from the checkpointed H and F boundary rows.
    state: (i, j, pos, gstate, active, cx, cy, steps); same level gating and
           scatter emission as walk_strip_level, same per-cell semantics as
           walk_moves_affine (the H_ZERO cell stops without emitting).
    """
    from .scan_dp import E_EXT_BIT, F_EXT_BIT, H_E, H_F, H_NW, H_ZERO

    D, S, B = moves.shape
    N = y_bn.shape[1]
    lanes = jnp.arange(B)
    Mbuf = state[5].shape[0]  # cx rows

    def body(_, st):
        i, j, pos, gstate, active, cx, cy, steps = st
        inlevel = active & (i - 1 >= base_row)
        r = jnp.clip(i - 1 - base_row, 0, S - 1)
        d = jnp.clip(i + j - 2 - base_row, 0, D - 1)
        mv = moves[d, r, lanes]
        hsrc = (mv & np.uint8(3)).astype(jnp.int32)
        e_ext = (mv & E_EXT_BIT) != 0
        f_ext = (mv & F_EXT_BIT) != 0
        in_h = gstate == 0
        op = jnp.where(in_h, hsrc, gstate)
        # Stop on H_ZERO; j <= 0 guards the clipped gather after a path
        # consumes the whole reference prefix (i <= 0 cannot hold inlevel).
        stop = inlevel & in_h & ((hsrc == H_ZERO) | (j <= 0))
        nw = inlevel & ~stop & (op == H_NW)
        go_w = inlevel & ~stop & (op == H_E)
        go_n = inlevel & ~stop & (op == H_F)
        xc = x_strip[r, lanes]
        yc = y_bn[lanes, jnp.clip(j - 1, 0, N - 1)]
        emit_x = jnp.where(go_w, GAP_BYTE, xc)
        emit_y = jnp.where(go_n, GAP_BYTE, yc)
        emitting = inlevel & ~stop
        slot = jnp.where(emitting, steps, Mbuf)  # out-of-range rows drop
        cx = cx.at[slot, lanes].set(emit_x, mode="drop")
        cy = cy.at[slot, lanes].set(emit_y, mode="drop")
        steps = jnp.where(emitting, steps + 1, steps)
        pos = jnp.where(nw, j, pos)
        gstate = jnp.where(
            nw,
            0,
            jnp.where(
                go_w,
                jnp.where(e_ext, 1, 0),
                jnp.where(go_n, jnp.where(f_ext, 2, 0), gstate),
            ),
        )
        i = i - jnp.where(nw | go_n, 1, 0)
        j = j - jnp.where(nw | go_w, 1, 0)
        active = active & ~stop
        return (i, j, pos, gstate, active, cx, cy, steps)

    return jax.lax.fori_loop(0, max_steps, body, state)


def decode_consensus(cx, cy, steps) -> List[Tuple[str, str]]:
    """Device buffers -> per-lane (consensus_x, consensus_y) strings.

    Vectorized: ONE transpose + ONE bytes->str decode per buffer, then B
    cheap string slices — the round-3 per-lane loop (B numpy column slices,
    each with its own .tobytes().decode) was the measured host bottleneck of
    the seed-and-extend path. latin-1 decoding is an exact byte passthrough
    (contents are ASCII consensus chars, '-' gaps, and NUL padding the
    slices drop).
    """
    cx = np.ascontiguousarray(np.asarray(cx).T)
    cy = np.ascontiguousarray(np.asarray(cy).T)
    S = cx.shape[1]
    sx = cx.tobytes().decode("latin-1")
    sy = cy.tobytes().decode("latin-1")
    return [
        (sx[b * S : b * S + k], sy[b * S : b * S + k])
        for b, k in enumerate(np.asarray(steps).tolist())
    ]
