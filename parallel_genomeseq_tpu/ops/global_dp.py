"""Device-native Needleman-Wunsch (global) DP — the NW member of the
SW/NW/Hirschberg method family, on the accelerator.

The reference has no NW implementation; this completes the family the north
star names, with the same declarative ScoringConfig as the local aligner
(semantics: no zero floor, boundary row/column seeded with gap costs,
score fixed at H(m, n) — oracle: ops/oracle.nw_matrix).

Formulation — rows, not diagonals: global alignment wants the LAST ROW (for
Hirschberg's divide step) rather than a running argmax, and the within-row
west-gap chain W[j] = max(u[j], W[j-1] - g) is a prefix max of u[j] + g*j
(linear gaps), so one ``lax.cummax`` per row replaces the sequential chain.
A ``lax.scan`` over the M read rows then does exactly m*n cell updates —
no diagonal-rectangle overhead — with every row a full (B, N) vector op.

Used by models/hirschberg.py to push the O(n)-space divide-and-conquer's
row sweeps (99% of its time) onto the device for long sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import ScoringConfig
from ..utils.encoding import to_bytes


@jax.jit
def _nw_lastrow_scan(x_mb, y_bn, m, table, gap):
    """Last NW row for B lanes.

    x_mb:  (M, B) uint8 read chars (row-major scan input; pad rows beyond
           each lane's true m are computed but masked out of the capture).
    y_bn:  (B, N) uint8 reference chars.
    m:     (B,) int32 true read lengths (<= M).
    table: (256, 256) score lookup in the DP dtype.
    gap:   scalar gap penalty (DP dtype).

    Returns (B, N + 1): H(m_b, j) for j = 0..N. Columns beyond a lane's
    true n are garbage for that lane (dependencies only flow left-to-right,
    so they never contaminate j <= n); callers slice what they need.
    """
    M, B = x_mb.shape
    N = y_bn.shape[1]
    dtype = table.dtype
    jidx = jnp.arange(N + 1, dtype=dtype)
    gj = gap * jidx[None, :]  # (1, N+1)
    prev0 = jnp.broadcast_to(-gj, (B, N + 1)).astype(dtype)

    def step(carry, inp):
        prev, last = carry
        xc, i1 = inp  # row chars (B,), 1-based row index
        s = table[xc[:, None], y_bn]  # (B, N)
        u1 = jnp.maximum(prev[:, :-1] + s, prev[:, 1:] - gap)
        u0 = jnp.full((B, 1), -gap, dtype) * i1.astype(dtype)
        u = jnp.concatenate([u0, u1], axis=1)
        cur = jax.lax.cummax(u + gj, axis=1) - gj
        last = jnp.where((i1 == m)[:, None], cur, last)
        return (cur, last), None

    rows = (x_mb, jnp.arange(1, M + 1, dtype=jnp.int32))
    (_, last), _ = jax.lax.scan(step, (prev0, prev0), rows)
    return last


def _round_up(v: int, mult: int) -> int:
    return ((v + mult - 1) // mult) * mult


def _pow2_bucket(v: int, floor: int = 64) -> int:
    b = floor
    while b < v:
        b *= 2
    return b


def nw_lastrow_batch(xs, ys, cfg: ScoringConfig = ScoringConfig()):
    """Last NW rows for a ragged batch: xs/ys are lists of byte arrays (or
    strings). Returns a list of numpy (len(ys[k]) + 1,) vectors. Shapes are
    padded to power-of-two buckets so Hirschberg's shrinking recursion
    reuses O(log) compiled programs instead of one per subproblem."""
    xb = [to_bytes(x) if isinstance(x, str) else np.asarray(x, np.uint8)
          for x in xs]
    yb = [to_bytes(y) if isinstance(y, str) else np.asarray(y, np.uint8)
          for y in ys]
    B = len(xb)
    M = _pow2_bucket(max(1, max(len(v) for v in xb)))
    N = _pow2_bucket(max(1, max(len(v) for v in yb)))
    x_mb = np.zeros((M, B), np.uint8)
    y_bn = np.zeros((B, N), np.uint8)
    for k, v in enumerate(xb):
        x_mb[: len(v), k] = v
    for k, v in enumerate(yb):
        y_bn[k, : len(v)] = v
    m = np.array([len(v) for v in xb], np.int32)
    dt = jnp.float32 if not cfg.is_integral else jnp.int32
    table = jnp.asarray(cfg.byte_table().astype(dt))
    gap = jnp.asarray(cfg.gap_penalty, dt)
    last = np.asarray(_nw_lastrow_scan(x_mb, y_bn, m, table, gap))
    return [last[k, : len(yb[k]) + 1] for k in range(B)]


def nw_score_batch(xs, ys, cfg: ScoringConfig = ScoringConfig()):
    """Global alignment scores H(m, n) for a ragged batch, on device."""
    rows = nw_lastrow_batch(xs, ys, cfg)
    return np.array([r[-1] for r in rows])
