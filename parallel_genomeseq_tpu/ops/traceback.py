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


def decode_consensus(cx, cy, steps) -> List[Tuple[str, str]]:
    """Device buffers -> per-lane (consensus_x, consensus_y) strings."""
    cx = np.asarray(cx)
    cy = np.asarray(cy)
    steps = np.asarray(steps)
    out = []
    for b in range(cx.shape[1]):
        k = int(steps[b])
        out.append(
            (
                cx[:k, b].tobytes().decode("ascii"),
                cy[:k, b].tobytes().decode("ascii"),
            )
        )
    return out
