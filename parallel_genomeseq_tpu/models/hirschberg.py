"""Hirschberg linear-space global alignment (the third member of the
SW/NW/Hirschberg method family named in this project's north star).

Divide and conquer: the optimal global alignment path through (mid, k*) is
found from a forward NW last-row over x[:mid] and a backward NW last-row
over the reversed second half; recurse on the two sub-problems. Memory is
O(n) regardless of sequence lengths — the enabler for exact long-read
global alignment where a full DP matrix (or move-code tensor) would be
quadratic.

Each DP row is fully vectorized: the within-row west-gap chain
W[j] = max(u[j], W[j-1] - g) is a prefix-max of u[j] + g*j (shifted by
-g*j), so a row costs one ``np.maximum.accumulate`` instead of a scalar
loop — the same dependency-untangling idea as the wavefront kernels, applied
along rows on the host.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..ops.oracle import _as_bytes, nw_align
from ..utils.config import ScoringConfig
from ..utils.result import AlignResult


def _nw_lastrow(xb: np.ndarray, yb: np.ndarray, tab, g: float) -> np.ndarray:
    """Last row of the NW matrix of xb vs yb, O(len(yb)) space."""
    n = len(yb)
    j_idx = np.arange(n + 1)
    prev = -g * j_idx.astype(np.float64)  # row 0 boundary
    for i in range(1, len(xb) + 1):
        s = tab[xb[i - 1], yb]  # (n,)
        u = np.empty(n + 1)
        u[0] = -g * i  # west-boundary start of the prefix chain
        u[1:] = np.maximum(prev[:-1] + s, prev[1:] - g)
        v = u + g * j_idx
        prev = np.maximum.accumulate(v) - g * j_idx
    return prev


# Subproblems with at least this many DP cells run their row sweeps on the
# device (one 2-lane batched last-row scan for the forward+backward halves);
# smaller ones stay on the vectorized host path where dispatch overhead
# would dominate. The top few recursion levels hold ~all the work, so this
# puts the O(mn) compute on the accelerator while the O(log) tail stays host.
DEVICE_CELLS = 1 << 21


def hirschberg_align(x, y, cfg: ScoringConfig = ScoringConfig(),
                     device_cells: int = DEVICE_CELLS) -> AlignResult:
    """Linear-space global alignment; same score and alignment quality as
    the quadratic-space NW oracle. Long sequences' row sweeps run on device
    (ops/global_dp.nw_lastrow_batch); set device_cells=0 to force the device
    path, or a huge value to force host numpy."""
    from ..ops.global_dp import nw_lastrow_batch

    xb, yb = _as_bytes(x), _as_bytes(y)
    tab = cfg.byte_table().astype(np.float64)
    g = float(cfg.gap_penalty)

    def lastrows(xs: np.ndarray, ys: np.ndarray, mid: int):
        if len(xs) * len(ys) >= max(device_cells, 1):
            fwd, bwd = nw_lastrow_batch(
                [xs[:mid], xs[mid:][::-1]], [ys, ys[::-1]], cfg
            )
            return np.asarray(fwd, np.float64), np.asarray(bwd, np.float64)[::-1]
        return (
            _nw_lastrow(xs[:mid], ys, tab, g),
            _nw_lastrow(xs[mid:][::-1], ys[::-1], tab, g)[::-1],
        )

    def rec(xs: np.ndarray, ys: np.ndarray) -> Tuple[str, str]:
        if len(xs) == 0:
            return "-" * len(ys), ys.tobytes().decode("ascii")
        if len(ys) == 0:
            return xs.tobytes().decode("ascii"), "-" * len(xs)
        if len(xs) == 1:
            r = nw_align(xs, ys, cfg)
            # oracle consensus is reversed (reference convention); restore
            return r.consensus_x[::-1], r.consensus_y[::-1]
        mid = len(xs) // 2
        fwd, bwd = lastrows(xs, ys, mid)
        k = int(np.argmax(fwd + bwd))
        lx, ly = rec(xs[:mid], ys[:k])
        rx, ry = rec(xs[mid:], ys[k:])
        return lx + rx, ly + ry

    cx, cy = rec(xb, yb)
    if len(xb) * len(yb) >= max(device_cells, 1):
        from ..ops.global_dp import nw_score_batch

        score = float(nw_score_batch([xb], [yb], cfg)[0])
    else:
        score = float(_nw_lastrow(xb, yb, tab, g)[-1])
    # Store reversed, matching the reference's push_back-order convention.
    return AlignResult(
        score=score, pos=1, consensus_x=cx[::-1], consensus_y=cy[::-1],
        max_i=len(xb), max_j=len(yb),
    )


def alignment_score(cx: str, cy: str, cfg: ScoringConfig) -> float:
    """Score of an explicit alignment (consensus strings, forward order)."""
    tab = cfg.byte_table().astype(np.float64)
    g = float(cfg.gap_penalty)
    s = 0.0
    for a, b in zip(cx, cy):
        if a == "-" or b == "-":
            s -= g
        else:
            s += tab[ord(a), ord(b)]
    return s
