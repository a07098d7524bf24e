"""Pallas TPU anti-diagonal wavefront kernel — the performance core.

TPU-native successor of the reference's skewed AVX2 kernel
(Similarity_Matrix_Skewed::iterate, src/aligner/similaritymatrix.cpp:386-561).
Where the reference packs 32 uint8 cells of one alignment's diagonal into an
AVX2 register, this kernel keeps whole diagonals of B independent alignments
resident in VMEM: a (M, B) tile holds diagonal cells of M read positions
(sublanes) x B batch lanes, so every VPU op advances 128 alignments at once.

Design notes:
- Diagonal-major recurrence identical to ops/scan_dp.py: cell (r, d) =
  DP(i=r+1, j=d-r+1); north/west come from the previous diagonal, north-west
  from two diagonals back. Each step shifts the carries one sublane down via
  a fused static shift+insert (`_shift_down`); the shift of H_{d-2} is last
  step's shift of H_{d-1}, re-used. When scores and diagonal indices fit
  int16 (match*M and M+N <= NARROW_BOUND) the whole recurrence runs in int16
  — two values per 32-bit vreg slot, ~2x VPU throughput.
- The reference-window characters a diagonal needs shift down by one row per
  step with one new char entering at row 0 (the TPU analog of the
  reference's reversed inv_sequence_y slices,
  src/aligner/similaritymatrix.cpp:283-285,406-414). The loop runs in blocks
  of 8 diagonals: one sublane-aligned (8, B) load per block, then 8
  statically-unrolled steps with static row selects — no per-step dynamic
  memory access survives in the hot loop.
- Invalid cells (j < 1, i > m_b, j > n_b) are stored as 0: boundary
  condition + exact running argmax in one mask.
- Scores are exact int32 (no uint8 saturation): a 125-bp perfect match keeps
  its true 375, where the reference's fast path clamps at 255.
- Outputs are the elementwise (best, best-diagonal) planes; the tiny final
  reduction (score, i, j with the column-major tie-break) runs in XLA
  (scan_dp._reduce_best).

Batch lanes beyond 128 are handled by a sequential grid over 128-lane
blocks; each block's problem is independent (reads x reference chunks), the
TPU analog of the reference's OMP-over-pieces loop
(src/aligner/plocalaligner.cpp:110-115).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import ScoringConfig, Semantics
from .scan_dp import _INT32_MAX, _reduce_best

LANE = 128  # lanes per grid block (VPU lane width)
UNROLL = 8  # diagonals per aligned ref-char block
MAX_M = 2048  # diagonal-axis cap: 5 int32 carries x M x 128 lanes must fit VMEM


class EnvelopeError(ValueError):
    """A batch shape/config falls outside a Pallas kernel's envelope (e.g.
    strip-length reads with substitution scoring, or scores exceeding the
    strip kernel's int16 boundary bound). Callers with a general fallback
    (parallel/chunking.py) catch exactly this — a genuine contract bug still
    raises loudly instead of silently rerouting to the scan engine."""


def _round_up(v: int, mult: int) -> int:
    return ((v + mult - 1) // mult) * mult


def _pick_slot(ndiag: int, max_score: int) -> int:
    """Power-of-two slot for packed argmax tracking, or 0 when the packed
    value (max_score * slot + slot - 1) could overflow int32."""
    slot = 1
    while slot < ndiag:
        slot *= 2
    if (max_score + 1) * slot - 1 <= 2**31 - 1:
        return slot
    return 0


def _shift_down(h, first_row):
    """Shift sublanes down by one, inserting first_row at row 0 — one fused
    static-shift op (vs pltpu.roll + a row-0 select, and unlike
    tpu.dynamic_rotate it lowers for 16-bit data too)."""
    return jnp.concatenate([first_row, h[:-1, :]], axis=0)


def _make_body(score_of_window, y_ref, M: int, B: int, dtype=jnp.int32,
               slot: int = 0, arith_argmax: bool = False):
    """Shared recurrence: returns the outer-loop body over UNROLL-step blocks.

    score_of_window(ywin) -> (M, B) int32 substitution scores for the current
    diagonal's character pairs.

    slot > 0 enables packed argmax tracking: every DP value (scores, gap)
    is pre-scaled by ``slot`` (a power of two > number of diagonals), so the
    running (score, diagonal) argmax is a single integer
    ``max(best, hd + (slot-1-d))`` — one add + one max per cell instead of
    compare + two selects, with the same tie-break (equal scores keep the
    smallest d, since larger slot-1-d wins the max). The caller divides the
    scaled carries back out of the packed plane.

    No validity mask: out-of-range cells need no explicit zeroing. The j < 1
    region stays exactly 0 by propagation (its window chars are initial
    zeros, which never match real sequence bytes, so every path value there
    is max(<=0, 0) = 0 — the DP boundary for free). Cells beyond the true
    read/ref lengths see pad-byte mismatches (X_PAD=1 vs Y_PAD=2 vs ASCII
    never match), so with integral gap >= 1 and negative mismatch every step
    away from the valid region strictly decreases the value — such cells can
    never tie or beat the valid maximum, keeping score AND argmax exact.
    The engine enforces the preconditions (PallasEngine guards).
    """
    zrow = jnp.zeros((1, B), dtype)

    def outer(o, carry, *, gap, track_pos=True):
        h1, s2, best, bestd, ywin = carry
        base = pl.multiple_of(o * UNROLL, UNROLL)
        blk = y_ref[pl.ds(base, UNROLL), :].astype(dtype)  # (8, B)
        for k in range(UNROLL):
            d = o * UNROLL + k
            yc = blk[k : k + 1, :]  # static row
            ywin = _shift_down(ywin, yc)
            sc = score_of_window(ywin)
            s1 = _shift_down(h1, zrow)
            # max(h1,s1)-gap == max(h1-gap, s1-gap): one fewer op per cell.
            hd = jnp.maximum(
                jnp.maximum(s2 + sc, jnp.maximum(h1, s1) - gap), 0
            )
            if slot:
                best = jnp.maximum(best, hd + (slot - 1 - d))
            elif arith_argmax and track_pos:
                # Compare-free argmax for the narrow (int16) recurrence:
                # v5e Mosaic rejects packed 16-bit cmpi, so the strict
                # hd > best predicate is computed arithmetically as a 0/1
                # value (hd - best fits int16: both bounded by NARROW_BOUND).
                # Same tie-break as the compare path: equal scores keep the
                # earliest diagonal.
                gt = jnp.minimum(
                    jnp.maximum(hd - best, np.asarray(0, dtype)),
                    np.asarray(1, dtype),
                )
                best = jnp.maximum(best, hd)
                d16 = jax.lax.convert_element_type(d, dtype)
                bestd = bestd + (d16 - bestd) * gt
            elif track_pos:
                upd = hd > best
                best = jnp.where(upd, hd, best)
                bestd = jnp.where(upd, d, bestd)
            else:
                # Score-only mode (chunked winner selection): skip the
                # argmax bookkeeping, ~15% fewer ops in the hot loop.
                best = jnp.maximum(best, hd)
            s2 = s1
            h1 = hd
        return h1, s2, best, bestd, ywin

    return outer


def _kernel_uniform(x_ref, y_ref, best_ref, bestd_ref,
                    *, nblk: int, match: int, mismatch: int, gap: int,
                    track_pos: bool = True, dtype=jnp.int32, slot: int = 0):
    M, B = x_ref.shape
    x = x_ref[:].astype(dtype)
    s = slot or 1
    mt = np.asarray(match * s, dtype)
    mm = np.asarray(mismatch * s, dtype)
    narrow = dtype == jnp.int16

    if narrow:
        # Compare-free char match for the packed int16 path (v5e Mosaic
        # rejects packed 16-bit cmpi): min(|x - y|, 1) is 0 iff the bytes
        # match, so score = match - (match - mismatch) * that 0/1 value —
        # max/min/mul only, all of which lower for packed i16.
        dd = np.asarray(match - mismatch, dtype)
        one = np.asarray(1, dtype)

        def score_of_window(ywin):
            diff = x - ywin
            mis01 = jnp.minimum(jnp.maximum(diff, -diff), one)
            return mt - dd * mis01
    else:

        def score_of_window(ywin):
            return jnp.where(x == ywin, mt, mm)

    outer = _make_body(score_of_window, y_ref, M, B, dtype=dtype, slot=slot,
                       arith_argmax=narrow)
    zeros = jnp.zeros((M, B), dtype)
    init = (zeros, zeros, zeros, zeros, zeros)
    _, _, best, bestd, _ = jax.lax.fori_loop(
        0, nblk,
        functools.partial(
            outer, gap=np.asarray(gap * s, dtype), track_pos=track_pos
        ),
        init,
    )
    if slot:
        # Unpack once: high part is the scaled score, low part the
        # tie-break complement of the diagonal index.
        best_ref[:] = best // slot
        bestd_ref[:] = (slot - 1) - (best % slot)
    else:
        best_ref[:] = best
        bestd_ref[:] = bestd


def _kernel_uniform_affine(x_ref, y_ref, best_ref, bestd_ref,
                           *, nblk: int, match: int, mismatch: int,
                           gap: int, gopen: int, track_pos: bool = True,
                           slot: int = 0):
    """Affine-gap (Gotoh) uniform-scoring kernel — extension beyond the
    reference (linear gaps only). Two extra carried diagonals E (west gap
    runs) and F (north gap runs):

        E_d = max(H_{d-1} - open, E_{d-1}) - extend
        F_d = max(shift(H_{d-1}) - open, shift(F_{d-1})) - extend
        H_d = max(H_{d-2}shift + s, E_d, F_d, 0)

    Mask-free like _kernel_uniform: the j < 1 region's E/F chains start at 0
    and stay strictly negative (E >= -(open+extend) since H >= 0 — also the
    overflow floor), so they can inflate true boundary values only while
    negative, which max(..., 0) in H ignores; pad-region decay (mismatch < 0,
    extend >= 1) keeps score and argmax exact. Same slot-packed argmax as the
    linear kernel (all operands pre-scaled by ``slot``)."""
    M, B = x_ref.shape
    x = x_ref[:].astype(jnp.int32)
    s = slot or 1
    mt = np.asarray(match * s, jnp.int32)
    mm = np.asarray(mismatch * s, jnp.int32)
    gp = np.asarray(gap * s, jnp.int32)
    go = np.asarray(gopen * s, jnp.int32)
    zrow = jnp.zeros((1, B), jnp.int32)

    def outer(o, carry):
        h1, s2, e1, f1, best, bestd, ywin = carry
        base = pl.multiple_of(o * UNROLL, UNROLL)
        blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
        for k in range(UNROLL):
            d = o * UNROLL + k
            yc = blk[k : k + 1, :]
            ywin = _shift_down(ywin, yc)
            sc = jnp.where(x == ywin, mt, mm)
            s1 = _shift_down(h1, zrow)
            f1s = _shift_down(f1, zrow)
            e_d = jnp.maximum(h1 - go, e1) - gp
            f_d = jnp.maximum(s1 - go, f1s) - gp
            hd = jnp.maximum(
                jnp.maximum(s2 + sc, e_d), jnp.maximum(f_d, 0)
            )
            if slot:
                best = jnp.maximum(best, hd + (slot - 1 - d))
            elif track_pos:
                upd = hd > best
                best = jnp.where(upd, hd, best)
                bestd = jnp.where(upd, d, bestd)
            else:
                best = jnp.maximum(best, hd)
            s2 = s1
            e1 = e_d
            f1 = f_d
            h1 = hd
        return h1, s2, e1, f1, best, bestd, ywin

    zeros = jnp.zeros((M, B), jnp.int32)
    init = (zeros, zeros, zeros, zeros, zeros, zeros, zeros)
    _, _, _, _, best, bestd, _ = jax.lax.fori_loop(0, nblk, outer, init)
    if slot:
        best_ref[:] = best // slot
        bestd_ref[:] = (slot - 1) - (best % slot)
    else:
        best_ref[:] = best
        bestd_ref[:] = bestd


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap", "gopen", "interpret", "track_pos"),
)
def _call_uniform_affine(xs, ys, *, match, mismatch, gap, gopen, interpret,
                         track_pos=True):
    M, B = xs.shape
    Ny = ys.shape[0]
    nblk = (M + Ny + UNROLL - 2) // UNROLL
    nblk = min(nblk, Ny // UNROLL)
    slot = _pick_slot(nblk * UNROLL, match * M) if track_pos else 0
    kernel = functools.partial(
        _kernel_uniform_affine, nblk=nblk, match=match, mismatch=mismatch,
        gap=gap, gopen=gopen, track_pos=track_pos, slot=slot,
    )
    tail, out_specs = _common_specs(M, Ny)
    x_spec = pl.BlockSpec((M, LANE), lambda b: (0, b), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // LANE,),
        in_specs=[x_spec] + tail,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=20 * (M + Ny) * M * B, bytes_accessed=M * B * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)


PROF_WORDS = 8  # packed profile words per row: 4 biased score bytes each
PROF_CODES = 4 * PROF_WORDS  # compact y-code space (0 = invalid/pad)


def _packed_luts(matrix, alphabet_bytes):
    """Host-side LUTs for the packed profile representation.

    y bytes are re-encoded to compact codes (0 = invalid/pad, c+1 =
    alphabet[c]); packed_lut[xbyte, w] packs the biased scores
    (S[x, alphabet[4w+k-1]] - worst, one byte per k) of y codes 4w..4w+3
    into one int32 word. Code 0 and codes beyond the alphabet hold byte 0 ==
    worst, and any x byte outside the alphabet maps to an all-zero row, so
    the mask-free pad-decay argument of _make_body carries over unchanged
    (j < 1 window zeros decode as code 0 -> worst).

    The packed form replaces round-3's A-way compare+select chain (~2A VPU
    ops per cell for A ~ 24 protein letters) with a depth-3 word-select tree
    plus a byte extract (~19 ops), and shrinks the profile VMEM footprint
    A/8-fold. Returns (packed_lut (256, 8) int32, encode_lut (256,) uint8).
    """
    S = np.asarray(matrix).astype(np.int64)
    A = len(alphabet_bytes)
    worst = int(S.min())
    if A + 1 > PROF_CODES:
        raise EnvelopeError(
            f"alphabet size {A} exceeds the packed profile's "
            f"{PROF_CODES - 1}-code space"
        )
    if int(S.max()) - worst > 255:
        raise EnvelopeError(
            "substitution matrix span exceeds the packed profile's byte "
            "range (max - min > 255)"
        )
    biased = np.zeros((256, PROF_CODES), np.int64)  # [xbyte, ycode]
    for ci, cb in enumerate(alphabet_bytes):
        for ri, rb in enumerate(alphabet_bytes):
            biased[rb, ci + 1] = S[ri, ci] - worst
    packed = np.zeros((256, PROF_WORDS), np.int64)
    for w in range(PROF_WORDS):
        for k in range(4):
            packed[:, w] |= biased[:, 4 * w + k] << (8 * k)
    packed_lut = ((packed + 2**31) % 2**32 - 2**31).astype(np.int32)
    encode_lut = np.zeros(256, np.uint8)
    for ci, cb in enumerate(alphabet_bytes):
        encode_lut[cb] = ci + 1
    return packed_lut, encode_lut


# Byte extraction from the selected packed word: True = variable-amount
# vector shift (word >> ((code & 3) * 8), ~4 ops — arith.shrsi on int32
# vectors; NOT the packed-i16 shift that is a proven v5e Mosaic dead end),
# False = two constant-shift selects (~9 ops, lowers everywhere).
PACKED_VARSHIFT = True


def _packed_sow(pprof_ref, worst: int, slot: int, ncodes: int = PROF_CODES):
    """score_of_window closure over a packed profile block (8, S, B).

    ywin carries compact y codes (0..31). Selection = binary tree on code
    bits 4/3/2 over the packed words (<= 7 selects), then byte extraction
    by the low 2 bits (see PACKED_VARSHIFT). Biased bytes are unscaled in
    VMEM; the slot scale is applied at extraction
    (v * s + worst * s == score * s).

    ncodes (static) = number of reachable codes (alphabet + pad). Words
    whose codes can never occur are pruned from the tree — their loads AND
    their selects disappear (e.g. the 24-letter protein alphabet + pad uses
    25 codes = 7 words, dropping word 7 and one select; a DNA-sized custom
    matrix collapses to 2 words and a single select)."""
    W, S_, B = pprof_ref.shape
    nw = min(W, (max(ncodes, 1) + 3) // 4)
    # Measured dead end (2026-08-21, probe_shared_tree.py): loading ONE
    # lane column per word for shared-query profiles (and broadcasting in
    # the selects) changes nothing — ~72 GCUPS padded either way. The
    # kernel's bound includes the per-lane (M, B) select-tree
    # intermediates, which narrow loads cannot reduce; only fewer WORDS
    # help (probe_small_alphabet.py: 2 words -> 199.5 GCUPS).
    pw = [pprof_ref[w] for w in range(nw)]
    s = slot or 1
    worst_s = np.asarray(worst * s, jnp.int32)
    sfac = np.asarray(s, jnp.int32)
    c255 = np.asarray(255, jnp.int32)

    def sow(ywin):
        t = pw
        for stride, cbit in ((4, 16), (2, 8), (1, 4)):
            if len(t) <= stride:
                continue  # every high branch unreachable at this level
            cond = (ywin & cbit) != 0
            t = [
                jnp.where(cond, t[i + stride], t[i])
                if i + stride < len(t)
                else t[i]
                for i in range(stride)
            ]
        word = t[0]
        if PACKED_VARSHIFT:
            v = (word >> ((ywin & 3) << 3)) & c255
        else:
            t = jnp.where((ywin & 2) != 0, word >> 16, word)
            v = jnp.where((ywin & 1) != 0, t >> 8, t) & c255
        if s == 1:
            return v + worst_s
        return v * sfac + worst_s

    return sow, (S_, B)


def _kernel_profile(pprof_ref, y_ref, best_ref, bestd_ref,
                    *, nblk: int, worst: int, gap: int, slot: int = 0,
                    ncodes: int = PROF_CODES):
    """Substitution-matrix scoring via PACKED per-read score profiles (see
    _packed_luts): y_ref holds compact codes, pprof_ref the (8, M, B) packed
    words — no gathers in the hot loop, ~19 VPU ops per cell regardless of
    alphabet size (the round-3 A-way selector cost ~2A)."""
    W, M, B = pprof_ref.shape
    s = slot or 1
    score_of_window, _ = _packed_sow(pprof_ref, worst, slot, ncodes)
    outer = _make_body(score_of_window, y_ref, M, B, slot=slot)
    zeros = jnp.zeros((M, B), jnp.int32)
    init = (zeros, zeros, zeros, zeros, zeros)
    _, _, best, bestd, _ = jax.lax.fori_loop(
        0, nblk, functools.partial(outer, gap=gap * s), init
    )
    if slot:
        best_ref[:] = best // slot
        bestd_ref[:] = (slot - 1) - (best % slot)
    else:
        best_ref[:] = best
        bestd_ref[:] = bestd


def _kernel_profile_affine(pprof_ref, y_ref, best_ref, bestd_ref,
                           *, nblk: int, worst: int, gap: int, gopen: int,
                           slot: int = 0, ncodes: int = PROF_CODES):
    """Affine-gap (Gotoh) kernel with substitution-matrix scoring via
    PACKED per-read score profiles — the exact swps3 protein configuration
    (BLOSUM + open/extend gaps, e.g. 12/2) on the fast path. Same H/E/F
    carries and mask-free argument as _kernel_uniform_affine; same packed
    word-select as _kernel_profile (no gathers in the hot loop)."""
    W, M, B = pprof_ref.shape
    s = slot or 1
    sow, _ = _packed_sow(pprof_ref, worst, slot, ncodes)
    gp = np.asarray(gap * s, jnp.int32)
    go = np.asarray(gopen * s, jnp.int32)
    zrow = jnp.zeros((1, B), jnp.int32)

    def outer(o, carry):
        h1, s2, e1, f1, best, bestd, ywin = carry
        base = pl.multiple_of(o * UNROLL, UNROLL)
        blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
        for k in range(UNROLL):
            d = o * UNROLL + k
            yc = blk[k : k + 1, :]
            ywin = _shift_down(ywin, yc)
            sc = sow(ywin)
            s1 = _shift_down(h1, zrow)
            f1s = _shift_down(f1, zrow)
            e_d = jnp.maximum(h1 - go, e1) - gp
            f_d = jnp.maximum(s1 - go, f1s) - gp
            hd = jnp.maximum(
                jnp.maximum(s2 + sc, e_d), jnp.maximum(f_d, 0)
            )
            if slot:
                best = jnp.maximum(best, hd + (slot - 1 - d))
            else:
                upd = hd > best
                best = jnp.where(upd, hd, best)
                bestd = jnp.where(upd, d, bestd)
            s2 = s1
            e1 = e_d
            f1 = f_d
            h1 = hd
        return h1, s2, e1, f1, best, bestd, ywin

    zeros = jnp.zeros((M, B), jnp.int32)
    init = (zeros, zeros, zeros, zeros, zeros, zeros, zeros)
    _, _, _, _, best, bestd, _ = jax.lax.fori_loop(0, nblk, outer, init)
    if slot:
        best_ref[:] = best // slot
        bestd_ref[:] = (slot - 1) - (best % slot)
    else:
        best_ref[:] = best
        bestd_ref[:] = bestd


@functools.partial(
    jax.jit,
    static_argnames=("worst", "best_sub", "gap", "gopen", "interpret", "shared", "ncodes"),
)
def _call_profile_affine(pprof, ys, *, worst, best_sub, gap, gopen,
                         interpret, shared=False, ncodes=PROF_CODES):
    W, M, B_p = pprof.shape
    Ny, B = ys.shape
    nblk = (M + Ny + UNROLL - 2) // UNROLL
    nblk = min(nblk, Ny // UNROLL)
    slot = _pick_slot(nblk * UNROLL, max(best_sub, 1) * M)
    kernel = functools.partial(
        _kernel_profile_affine, nblk=nblk, worst=worst,
        gap=gap, gopen=gopen, slot=slot, ncodes=ncodes,
    )
    tail, out_specs = _common_specs(M, Ny)
    if shared:
        p_spec = pl.BlockSpec((W, M, LANE), lambda b: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        p_spec = pl.BlockSpec((W, M, LANE), lambda b: (0, 0, b),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // LANE,),
        in_specs=[p_spec] + tail,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=27 * (M + Ny) * M * B, bytes_accessed=M * B * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pprof, ys)


def _kernel_uniform_moves(x_ref, y_ref, best_ref, bestd_ref, moves_ref,
                          h1_s, s2_s, best_s, bestd_s, ywin_s,
                          *, match: int, mismatch: int, gap: int):
    """Uniform kernel that also emits per-cell traceback move/stop codes.

    Grid is (lane blocks, diagonal blocks); recurrence carries live in VMEM
    scratch across the diagonal-block dimension, and each grid step writes
    its UNROLL move planes straight to the (D, M, B) output — the Pallas
    replacement for the scan path's emit_moves (same 3-bit encoding,
    ops/scan_dp.py MOVE_*/STOP_BIT).
    """
    M, B = x_ref.shape
    o = pl.program_id(1)
    x = x_ref[:].astype(jnp.int32)
    zrow = jnp.zeros((1, B), jnp.int32)

    @pl.when(o == 0)
    def _():
        z = jnp.zeros((M, B), jnp.int32)
        h1_s[:] = z
        s2_s[:] = z
        best_s[:] = z
        bestd_s[:] = z
        ywin_s[:] = z

    h1, s2 = h1_s[:], s2_s[:]
    best, bestd = best_s[:], bestd_s[:]
    ywin = ywin_s[:]
    base = pl.multiple_of(o * UNROLL, UNROLL)
    blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
    for k in range(UNROLL):
        d = o * UNROLL + k
        yc = blk[k : k + 1, :]
        ywin = _shift_down(ywin, yc)
        sc = jnp.where(x == ywin, match, mismatch)
        s1 = _shift_down(h1, zrow)
        hd = jnp.maximum(
            jnp.maximum(s2 + sc, jnp.maximum(h1, s1) - gap), 0
        )
        n1, n2, n3 = s2, h1, s1  # nw, west, north
        nw_mv = (n1 >= n2) & (n1 >= n3)
        w_mv = (n2 >= n1) & (n2 >= n3)
        mv = jnp.where(nw_mv, 0, jnp.where(w_mv, 1, 2))
        stop = (n1 == 0) | (n2 == 0) | (n3 == 0)
        mv = mv + jnp.where(stop, 4, 0)
        moves_ref[k] = mv.astype(jnp.uint8)
        upd = hd > best
        best = jnp.where(upd, hd, best)
        bestd = jnp.where(upd, d, bestd)
        s2 = s1
        h1 = hd
    h1_s[:] = h1
    s2_s[:] = s2
    best_s[:] = best
    bestd_s[:] = bestd
    ywin_s[:] = ywin
    best_ref[:] = best
    bestd_ref[:] = bestd


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap", "interpret"))
def _call_uniform_moves(xs, ys, *, match, mismatch, gap, interpret):
    M, B = xs.shape
    Ny = ys.shape[0]
    nblk = min((M + Ny + UNROLL - 2) // UNROLL, Ny // UNROLL)
    kernel = functools.partial(
        _kernel_uniform_moves, match=match, mismatch=mismatch, gap=gap
    )
    best, bestd, moves = pl.pallas_call(
        kernel,
        grid=(B // LANE, nblk),
        in_specs=[
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((UNROLL, M, LANE), lambda b, o: (o, 0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((nblk * UNROLL, M, B), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((M, LANE), jnp.int32)] * 5,
        cost_estimate=pl.CostEstimate(
            flops=20 * (M + Ny) * M * B, bytes_accessed=(M + Ny) * M * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)
    return best, bestd, moves


def _affine_moves_body(score_of, y_ref, best_ref, bestd_ref, moves_ref,
                       h1_s, s2_s, e1_s, f1_s, best_s, bestd_s, ywin_s,
                       *, M: int, B: int, gap: int, gopen: int):
    """Shared body of the single-strip affine (Gotoh) score+moves kernels:
    the affine recurrence of _kernel_uniform_affine plus scan_dp's
    H/E/F-state move-code emission (same codes the strip replay kernels
    emit; walk_moves_affine consumes them). Row 0's incoming H is 0 and
    its incoming F is the 'no run' init (anything <= -gopen makes the
    open branch win exactly — see _strips_body)."""
    from .scan_dp import E_EXT_BIT, F_EXT_BIT, H_E, H_F, H_NW, H_ZERO

    o = pl.program_id(1)
    gp = np.asarray(gap, jnp.int32)
    go = np.asarray(gopen, jnp.int32)
    zrow = jnp.zeros((1, B), jnp.int32)
    frow0 = jnp.full((1, B), -(gopen + gap + 1), jnp.int32)

    @pl.when(o == 0)
    def _():
        z = jnp.zeros((M, B), jnp.int32)
        h1_s[:] = z
        s2_s[:] = z
        e1_s[:] = z
        f1_s[:] = z
        best_s[:] = z
        bestd_s[:] = z
        ywin_s[:] = z

    h1, s2, e1, f1 = h1_s[:], s2_s[:], e1_s[:], f1_s[:]
    best, bestd = best_s[:], bestd_s[:]
    ywin = ywin_s[:]
    base = pl.multiple_of(o * UNROLL, UNROLL)
    blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
    for k in range(UNROLL):
        d = o * UNROLL + k
        yc = blk[k : k + 1, :]
        ywin = _shift_down(ywin, yc)
        sc = score_of(ywin)
        s1 = _shift_down(h1, zrow)
        f1s = _shift_down(f1, frow0)
        e_open = h1 - go
        f_open = s1 - go
        e_d = jnp.maximum(e_open, e1) - gp
        f_d = jnp.maximum(f_open, f1s) - gp
        diag = s2 + sc
        hd = jnp.maximum(jnp.maximum(diag, e_d), jnp.maximum(f_d, 0))
        # Same code priority as scan_dp._wavefront_affine: ZERO > NW > E >
        # F; codes built in int32, cast once (v5e sub-word relayout gotcha).
        h_src = jnp.where(
            hd == 0,
            int(H_ZERO),
            jnp.where(hd == diag, int(H_NW),
                      jnp.where(hd == e_d, int(H_E), int(H_F))),
        )
        e_ext = e1 >= e_open
        f_ext = f1s >= f_open
        mv = (
            h_src
            + jnp.where(e_ext, int(E_EXT_BIT), 0)
            + jnp.where(f_ext, int(F_EXT_BIT), 0)
        )
        moves_ref[k] = mv.astype(jnp.uint8)
        upd = hd > best
        best = jnp.where(upd, hd, best)
        bestd = jnp.where(upd, d, bestd)
        s2 = s1
        e1 = e_d
        f1 = f_d
        h1 = hd
    h1_s[:] = h1
    s2_s[:] = s2
    e1_s[:] = e1
    f1_s[:] = f1
    best_s[:] = best
    bestd_s[:] = bestd
    ywin_s[:] = ywin
    best_ref[:] = best
    bestd_ref[:] = bestd


def _kernel_uniform_affine_moves(x_ref, y_ref, best_ref, bestd_ref,
                                 moves_ref, h1_s, s2_s, e1_s, f1_s, best_s,
                                 bestd_s, ywin_s, *, match: int,
                                 mismatch: int, gap: int, gopen: int):
    M, B = x_ref.shape
    x = x_ref[:].astype(jnp.int32)
    _affine_moves_body(
        lambda ywin: jnp.where(x == ywin, match, mismatch),
        y_ref, best_ref, bestd_ref, moves_ref,
        h1_s, s2_s, e1_s, f1_s, best_s, bestd_s, ywin_s,
        M=M, B=B, gap=gap, gopen=gopen,
    )


def _kernel_profile_affine_moves(pprof_ref, y_ref, best_ref, bestd_ref,
                                 moves_ref, h1_s, s2_s, e1_s, f1_s, best_s,
                                 bestd_s, ywin_s, *, worst: int, gap: int,
                                 gopen: int, ncodes: int = PROF_CODES):
    sow, (M, B) = _packed_sow(pprof_ref, worst, 0, ncodes)
    _affine_moves_body(
        sow, y_ref, best_ref, bestd_ref, moves_ref,
        h1_s, s2_s, e1_s, f1_s, best_s, bestd_s, ywin_s,
        M=M, B=B, gap=gap, gopen=gopen,
    )


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap", "gopen", "interpret"),
)
def _call_uniform_affine_moves(xs, ys, *, match, mismatch, gap, gopen,
                               interpret):
    M, B = xs.shape
    Ny = ys.shape[0]
    nblk = min((M + Ny + UNROLL - 2) // UNROLL, Ny // UNROLL)
    kernel = functools.partial(
        _kernel_uniform_affine_moves, match=match, mismatch=mismatch,
        gap=gap, gopen=gopen,
    )
    best, bestd, moves = pl.pallas_call(
        kernel,
        grid=(B // LANE, nblk),
        in_specs=[
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((UNROLL, M, LANE), lambda b, o: (o, 0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((nblk * UNROLL, M, B), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((M, LANE), jnp.int32)] * 7,
        cost_estimate=pl.CostEstimate(
            flops=26 * (M + Ny) * M * B, bytes_accessed=(M + Ny) * M * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)
    return best, bestd, moves


@functools.partial(
    jax.jit, static_argnames=("worst", "gap", "gopen", "interpret", "ncodes")
)
def _call_profile_affine_moves(pprof, ycodes, *, worst, gap, gopen,
                               interpret, ncodes=PROF_CODES):
    W, M, B = pprof.shape
    Ny = ycodes.shape[0]
    nblk = min((M + Ny + UNROLL - 2) // UNROLL, Ny // UNROLL)
    kernel = functools.partial(
        _kernel_profile_affine_moves, worst=worst, gap=gap, gopen=gopen,
        ncodes=ncodes,
    )
    best, bestd, moves = pl.pallas_call(
        kernel,
        grid=(B // LANE, nblk),
        in_specs=[
            pl.BlockSpec((W, M, LANE), lambda b, o: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((UNROLL, M, LANE), lambda b, o: (o, 0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((nblk * UNROLL, M, B), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((M, LANE), jnp.int32)] * 7,
        cost_estimate=pl.CostEstimate(
            flops=33 * (M + Ny) * M * B, bytes_accessed=(M + Ny) * M * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pprof, ycodes)
    return best, bestd, moves


def _kernel_profile_moves(pprof_ref, y_ref, best_ref, bestd_ref, moves_ref,
                          h1_s, s2_s, best_s, bestd_s, ywin_s,
                          *, worst: int, gap: int, ncodes: int = PROF_CODES):
    """Substitution-matrix kernel that also emits per-cell traceback
    move/stop codes — the packed-profile sibling of _kernel_uniform_moves
    (same 3-bit scan_dp encoding; the greedy-walk code priorities are
    scoring-independent), so BLOSUM traceback runs fused on Pallas instead
    of the scan engine's emit_moves sweep (the --traceback-all hot path)."""
    sow, (M, B) = _packed_sow(pprof_ref, worst, 0, ncodes)
    o = pl.program_id(1)
    zrow = jnp.zeros((1, B), jnp.int32)

    @pl.when(o == 0)
    def _():
        z = jnp.zeros((M, B), jnp.int32)
        h1_s[:] = z
        s2_s[:] = z
        best_s[:] = z
        bestd_s[:] = z
        ywin_s[:] = z

    h1, s2 = h1_s[:], s2_s[:]
    best, bestd = best_s[:], bestd_s[:]
    ywin = ywin_s[:]
    base = pl.multiple_of(o * UNROLL, UNROLL)
    blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
    for k in range(UNROLL):
        d = o * UNROLL + k
        yc = blk[k : k + 1, :]
        ywin = _shift_down(ywin, yc)
        sc = sow(ywin)
        s1 = _shift_down(h1, zrow)
        hd = jnp.maximum(
            jnp.maximum(s2 + sc, jnp.maximum(h1, s1) - gap), 0
        )
        n1, n2, n3 = s2, h1, s1  # nw, west, north
        nw_mv = (n1 >= n2) & (n1 >= n3)
        w_mv = (n2 >= n1) & (n2 >= n3)
        mv = jnp.where(nw_mv, 0, jnp.where(w_mv, 1, 2))
        stop = (n1 == 0) | (n2 == 0) | (n3 == 0)
        mv = mv + jnp.where(stop, 4, 0)
        moves_ref[k] = mv.astype(jnp.uint8)
        upd = hd > best
        best = jnp.where(upd, hd, best)
        bestd = jnp.where(upd, d, bestd)
        s2 = s1
        h1 = hd
    h1_s[:] = h1
    s2_s[:] = s2
    best_s[:] = best
    bestd_s[:] = bestd
    ywin_s[:] = ywin
    best_ref[:] = best
    bestd_ref[:] = bestd


@functools.partial(
    jax.jit, static_argnames=("worst", "gap", "interpret", "ncodes")
)
def _call_profile_moves(pprof, ycodes, *, worst, gap, interpret,
                        ncodes=PROF_CODES):
    W, M, B = pprof.shape
    Ny = ycodes.shape[0]
    nblk = min((M + Ny + UNROLL - 2) // UNROLL, Ny // UNROLL)
    kernel = functools.partial(
        _kernel_profile_moves, worst=worst, gap=gap, ncodes=ncodes
    )
    best, bestd, moves = pl.pallas_call(
        kernel,
        grid=(B // LANE, nblk),
        in_specs=[
            pl.BlockSpec((W, M, LANE), lambda b, o: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((UNROLL, M, LANE), lambda b, o: (o, 0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((nblk * UNROLL, M, B), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((M, LANE), jnp.int32)] * 5,
        cost_estimate=pl.CostEstimate(
            flops=27 * (M + Ny) * M * B, bytes_accessed=(M + Ny) * M * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pprof, ycodes)
    return best, bestd, moves


def _common_specs(M, Ny):
    tail = [
        pl.BlockSpec((Ny, LANE), lambda b: (0, b), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((M, LANE), lambda b: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((M, LANE), lambda b: (0, b), memory_space=pltpu.VMEM),
    ]
    return tail, out_specs


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap", "interpret", "track_pos", "narrow"),
)
def _call_uniform(xs, ys, *, match, mismatch, gap, interpret, track_pos=True,
                  narrow=False):
    """narrow=True runs the whole recurrence in int16 (2 values packed per
    32-bit vreg slot -> up to 2x VPU throughput); callers must guarantee
    match * M <= NARROW_BOUND and M + Ny <= NARROW_BOUND so neither scores
    nor diagonal indices can overflow."""
    M, B = xs.shape
    Ny = ys.shape[0]
    D = M + (Ny - M) - 1  # true diagonals; ys rows are padded to M + N
    nblk = (M + Ny + UNROLL - 2) // UNROLL  # covers all diagonals
    nblk = min(nblk, Ny // UNROLL)  # aligned loads must stay in bounds
    dtype = jnp.int16 if narrow else jnp.int32
    slot = (
        _pick_slot(nblk * UNROLL, match * M)
        if (track_pos and not narrow) else 0
    )
    kernel = functools.partial(
        _kernel_uniform, nblk=nblk, match=match, mismatch=mismatch, gap=gap,
        track_pos=track_pos, dtype=dtype, slot=slot,
    )
    tail, out_specs = _common_specs(M, Ny)
    x_spec = pl.BlockSpec((M, LANE), lambda b: (0, b), memory_space=pltpu.VMEM)
    best, bestd = pl.pallas_call(
        kernel,
        grid=(B // LANE,),
        in_specs=[x_spec] + tail,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((M, B), dtype),
            jax.ShapeDtypeStruct((M, B), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * (M + Ny) * M * B, bytes_accessed=M * B * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)
    return best.astype(jnp.int32), bestd.astype(jnp.int32)


@jax.jit
def _profile_gather(xs, packed_lut):
    """(M, B) uint8 query block + (256, 8) int32 packed LUT -> (8, M, B)
    int32 packed substitution profile, gathered in XLA on device (the
    per-shard mesh path, score_lanes_profile_jit, uses the same pattern).
    Keeping the gather on device means only the raw bytes cross the host
    link (the round-3 root cause of the 0.55 s/batch UNIPROT stall)."""
    return jnp.transpose(packed_lut[xs.astype(jnp.int32)], (2, 0, 1))


@jax.jit
def _encode_y(ys, encode_lut):
    """(Ny, B) raw reference bytes -> compact y codes (uint8, 0 = pad or
    out-of-alphabet), gathered in XLA on device."""
    return encode_lut[ys.astype(jnp.int32)]


@functools.partial(
    jax.jit, static_argnames=("worst", "best_sub", "gap", "interpret", "shared", "ncodes")
)
def _call_profile(pprof, ys, *, worst, best_sub, gap, interpret,
                  shared=False, ncodes=PROF_CODES):
    """shared=True: pprof is a single (8, M, LANE) block reused by every
    lane block (all lanes share one query — the UNIPROT database scan),
    saving the (8, M, B) broadcast in HBM."""
    W, M, B_p = pprof.shape
    Ny, B = ys.shape
    nblk = (M + Ny + UNROLL - 2) // UNROLL
    nblk = min(nblk, Ny // UNROLL)
    slot = _pick_slot(nblk * UNROLL, max(best_sub, 1) * M)
    kernel = functools.partial(
        _kernel_profile, nblk=nblk, worst=worst, gap=gap,
        slot=slot, ncodes=ncodes,
    )
    tail, out_specs = _common_specs(M, Ny)
    if shared:
        p_spec = pl.BlockSpec((W, M, LANE), lambda b: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        p_spec = pl.BlockSpec((W, M, LANE), lambda b: (0, 0, b),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // LANE,),
        in_specs=[p_spec] + tail,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=21 * (M + Ny) * M * B, bytes_accessed=M * B * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pprof, ys)


# ---------------------------------------------------------------------------
# Strip-mode kernel: reads longer than MAX_M are processed in strips of
# STRIP_S rows. Strips are sequential (grid dim) and hand the DP boundary row
# between each other through a persistent VMEM scratch buffer — the TPU
# analog of blocked wavefront DP. The boundary row is stored int16 (H values
# are bounded by match * read_len; the engine guards the bound).
# ---------------------------------------------------------------------------

STRIP_S = 256  # rows per strip (multiple of 8)
# Fused moves-kernel envelopes: Mosaic's scoped-VMEM stack holds the
# unrolled per-step temporaries — the linear profile kernel measured
# 17.91 MB at M=640 on v5e (> the 16.00 MB scoped limit; the compile
# error names it) and compiles+verifies at M=512. The affine variants
# carry more live state (E/F chains), so their envelopes are tighter;
# all three bounds verified by hardware compiles.
PROFILE_MOVES_MAX_M = 512
AFFINE_MOVES_MAX_M = 1024
PROFILE_AFFINE_MOVES_MAX_M = 384
STRIP_S_PA = 128  # half-height strips for the VMEM-heavy profile-affine kernel
STRIP_PADW = (STRIP_S - 2) % 8  # write offset making boundary stores aligned
INT16_BOUND = 32000
NARROW_BOUND = 30000  # int16 kernel: max score (match*M) and max diagonal index
# Packed-int16 recurrence (2 cells per 32-bit vreg slot, the TPU analog of
# the reference's sub-word lane packing, similaritymatrix.cpp:75-81): a
# MEASURED DEAD END on v5e Mosaic. Three workaround generations, each with
# its hardware error on vector<8x128x2xi16>:
#   1. direct compares (round 1): arith.cmpi "Target does not support this
#      comparison" — hit by both the char-match and argmax compares;
#   2. compare-free arithmetic (this file: match via min(|x-y|,1), argmax
#      via a 0/1 multiply — interpret-verified exact): arith.maxsi "failed
#      to legalize" — the recurrence's own max ops don't lower either (the
#      round-1 note missed this because legalization stops at the first
#      error);
#   3. bit-trick max b + ((a-b) & ~((a-b)>>15)) to avoid maxsi entirely:
#      arith.shrsi "failed to legalize".
# With no packed-i16 max, compare, or shift, the SW recurrence cannot be
# expressed; packed int8 is strictly narrower support. The arithmetic paths
# below stay (interpret-verified) so flipping NARROW_ENABLED on a Mosaic
# generation with packed-i16 max support is a one-line change.
NARROW_ENABLED = False


def _uniform_sow(x_ref, match: int, mismatch: int, slot: int):
    """score_of_window closure for uniform match/mismatch scoring."""
    x = x_ref[:].astype(jnp.int32)
    s = slot or 1
    mt = np.asarray(match * s, jnp.int32)
    mm = np.asarray(mismatch * s, jnp.int32)
    return lambda ywin: jnp.where(x == ywin, mt, mm), x_ref.shape


def _kernel_strips(x_ref, y_ref, best_ref, bestd_ref,
                   lastrow_ref, *, nblk: int, match: int, mismatch: int,
                   gap: int, slot: int = 0):
    sow, shape = _uniform_sow(x_ref, match, mismatch, slot)
    _strips_body(sow, shape, y_ref, best_ref, bestd_ref, None, lastrow_ref,
                 nblk=nblk, gap=gap, slot=slot)


def _kernel_strips_profile(pprof_ref, y_ref, best_ref, bestd_ref,
                           lr_hi_ref, lr_lo_ref, *, nblk: int, worst: int,
                           gap: int, slot: int = 0,
                           ncodes: int = PROF_CODES):
    """Substitution-matrix strip kernel: long protein queries (> MAX_M
    residues, e.g. titin-class) stay on the Pallas fast path instead of
    falling back to the scan engine (the UNIPROT custom-scoring requirement,
    src/mpi_sw_solve_uniprot.cpp:120-123). Packed profile (see _packed_luts).

    Boundary rows (values up to best_sub * M, beyond int16) are carried as
    an int16 hi/lo PAIR (see _rows_init): any 32-bit persistent scratch
    buffer faults the v5e TPU worker at first execution — bisected on
    hardware by benchmarks/probe_pa_bisect.py (2026-08-20: int32 AND
    float32 scratches crash across uniform/profile/affine strip kernels;
    every int16 configuration passes, and the int16-pair fix passed with
    this exact kernel)."""
    sow, shape = _packed_sow(pprof_ref, worst, slot, ncodes)
    _strips_body(sow, shape, y_ref, best_ref, bestd_ref, None,
                 (lr_hi_ref, lr_lo_ref), nblk=nblk, gap=gap, slot=slot)


def _kernel_strips_affine(x_ref, y_ref, best_ref, bestd_ref,
                          lastrow_ref, flastrow_ref, *, nblk: int,
                          match: int, mismatch: int, gap: int, gopen: int,
                          slot: int = 0):
    """Affine-gap strip kernel: long reads (> MAX_M) with open/extend gaps
    stay on the Pallas fast path (score + argmax; affine traceback beyond
    MAX_M is not supported — the checkpointed strip traceback is linear-gap
    only)."""
    sow, shape = _uniform_sow(x_ref, match, mismatch, slot)
    _strips_body(sow, shape, y_ref, best_ref, bestd_ref, None, lastrow_ref,
                 nblk=nblk, gap=gap, slot=slot, gopen=gopen,
                 flastrow_ref=flastrow_ref)


def _kernel_strips_profile_affine(pprof_ref, y_ref, best_ref, bestd_ref,
                                  lr_hi_ref, lr_lo_ref, flr_hi_ref,
                                  flr_lo_ref, *, nblk: int,
                                  worst: int, gap: int, gopen: int,
                                  slot: int = 0, ncodes: int = PROF_CODES):
    """Affine + substitution-matrix strip kernel: titin-class protein
    queries with open/extend gaps stay on the Pallas fast path. Packed
    profile scoring of _kernel_strips_profile + dual H/F boundary rows,
    each carried as an int16 hi/lo pair (see _kernel_strips_profile: the
    rounds-2/3 worker crashes of this kernel were the 32-bit-scratch v5e
    Mosaic fault, root-caused and fixed by benchmarks/probe_pa_bisect.py
    2026-08-20 — NOT a VMEM overrun and NOT specific to this kernel)."""
    sow, shape = _packed_sow(pprof_ref, worst, slot, ncodes)
    _strips_body(sow, shape, y_ref, best_ref, bestd_ref, None,
                 (lr_hi_ref, lr_lo_ref), nblk=nblk, gap=gap, slot=slot,
                 gopen=gopen, flastrow_ref=(flr_hi_ref, flr_lo_ref))


def _kernel_strips_ckpt(x_ref, y_ref, best_ref, bestd_ref, rows_ref,
                        lastrow_ref, *, nblk: int, match: int, mismatch: int,
                        gap: int, slot: int = 0):
    """Strip kernel that also CHECKPOINTS each strip's boundary row to the
    (nstrips, Nlr, B) rows output — the activation-checkpointing trick that
    makes traceback on strip-length reads possible: the walk later replays
    one strip at a time from its stored incoming row (exact DP values)
    instead of materializing the O(D*M*B) move tensor of the whole sweep."""
    sow, shape = _uniform_sow(x_ref, match, mismatch, slot)
    _strips_body(sow, shape, y_ref, best_ref, bestd_ref, rows_ref, lastrow_ref,
                 nblk=nblk, gap=gap, slot=slot)


def _kernel_strips_affine_ckpt(x_ref, y_ref, best_ref, bestd_ref, rows_ref,
                               frows_ref, lastrow_ref, flastrow_ref, *,
                               nblk: int, match: int, mismatch: int,
                               gap: int, gopen: int, slot: int = 0):
    """Affine strip kernel that checkpoints BOTH boundary rows per strip:
    H (like _kernel_strips_ckpt) and F — the north-gap-run values the affine
    traceback replay needs at each strip's row 0 (E is row-internal and
    never crosses a strip edge, so it needs no checkpoint)."""
    sow, shape = _uniform_sow(x_ref, match, mismatch, slot)
    _strips_body(sow, shape, y_ref, best_ref, bestd_ref, rows_ref, lastrow_ref,
                 nblk=nblk, gap=gap, slot=slot, gopen=gopen,
                 flastrow_ref=flastrow_ref, frows_ref=frows_ref)


def _rows_init(ref, val: int):
    """Initialize a boundary-row buffer: a single int16/int32 ref, or an
    (hi, lo) int16 PAIR encoding v = hi * 2**15 + lo, lo in [0, 2**15) —
    the workaround for the v5e Mosaic fault with 32-bit persistent
    scratch buffers (any int32 OR float32 boundary-row scratch crashes the
    TPU worker at first execution; every 16-bit configuration passes —
    bisected by benchmarks/probe_pa_bisect.py, 2026-08-20)."""
    if isinstance(ref, tuple):
        vh, vl = divmod(val, 1 << 15)
        ref[0][:] = jnp.full_like(ref[0], vh)
        ref[1][:] = jnp.full_like(ref[1], vl)
    else:
        ref[:] = jnp.full_like(ref, val)


def _rows_load(ref, base, count):
    """Load boundary rows as int32 (see _rows_init for the pair encoding)."""
    if isinstance(ref, tuple):
        hi = ref[0][pl.ds(base, count), :].astype(jnp.int32)
        lo = ref[1][pl.ds(base, count), :].astype(jnp.int32)
        return (hi << 15) + lo
    return ref[pl.ds(base, count), :].astype(jnp.int32)


def _rows_store(ref, p0, count, st):
    """Store int32 boundary rows (see _rows_init for the pair encoding;
    st >> 15 is the arithmetic shift, so hi carries the sign and lo stays
    in [0, 2**15) — exact for |v| < 2**30)."""
    if isinstance(ref, tuple):
        h = st >> 15
        ref[0][pl.ds(p0, count), :] = h.astype(jnp.int16)
        ref[1][pl.ds(p0, count), :] = (st - (h << 15)).astype(jnp.int16)
    else:
        ref[pl.ds(p0, count), :] = st.astype(ref.dtype)


def _strips_body(score_of_window, shape, y_ref, best_ref, bestd_ref, rows_ref,
                 lastrow_ref, *, nblk: int, gap: int, slot: int = 0,
                 gopen: int = 0, flastrow_ref=None, frows_ref=None):
    """One strip of the blocked wavefront.

    Per local step d' (diagonal within the strip), the row-0 north/north-west
    neighbors come from the previous strip's last row: s1[0] <- lastrow[d'+1]
    and, via the carried shift, s2[0] <- lastrow[d']. The strip's own last
    row is staged 8 steps at a time and stored back for the next strip.
    Reads of lastrow always target rows >= current j while writes lag by
    STRIP_S rows, so a single buffer serves both directions.

    slot > 0 enables the packed argmax (see _make_body): carries run
    slot-scaled, the int16 boundary rows stay unscaled (scaled on load,
    divided back on store — exact, every carried value is a slot multiple).

    gopen > 0 selects the affine (Gotoh) recurrence. E (west gap runs) is
    row-internal, so it never crosses a strip edge and needs no boundary
    state; F (north gap runs) crosses rows, so a second boundary row
    ``flastrow_ref`` hands each strip the previous strip's last-row F values
    with the same staging/indexing as H. F is bounded below by
    -(gopen + gap) (H >= 0), so it fits the int16 boundary rows whenever H
    does.
    """
    S, B = shape
    s_idx = pl.program_id(1)
    sl = slot or 1
    gp = gap * sl
    go = gopen * sl
    affine = gopen > 0
    # Strip height comes from the block shape; the boundary-store write
    # offset keeps stores UNROLL-aligned for any S that is a multiple of 8.
    padw = (S - 2) % 8

    @pl.when(s_idx == 0)
    def _():
        _rows_init(lastrow_ref, 0)
        if affine:
            # Row-0 boundary: F(0, j) is "no run" — anything <= -gopen works
            # (max(H(0,j) - go, F0) then picks the open branch exactly).
            _rows_init(flastrow_ref, -(gopen + gap + 1))

    zeros = jnp.zeros((S, B), jnp.int32)

    def outer(o, carry):
        if affine:
            h1, s2, e1, f1, best, bestd, ywin = carry
        else:
            h1, s2, best, bestd, ywin = carry
            e1 = f1 = None
        base = pl.multiple_of(o * UNROLL, UNROLL)
        blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
        rblk = _rows_load(lastrow_ref, base, 2 * UNROLL)
        if slot:
            rblk = rblk * slot
        if affine:
            frblk = _rows_load(flastrow_ref, base, 2 * UNROLL)
            if slot:
                frblk = frblk * slot
        # Per-step boundary rows collect into python lists (static index —
        # no masked staging select in the loop) and store as one aligned
        # 8-row block below.
        stage_rows = []
        fstage_rows = []
        for k in range(UNROLL):
            d = o * UNROLL + k
            yc = blk[k : k + 1, :]
            ywin = _shift_down(ywin, yc)
            sc = score_of_window(ywin)
            # Boundary insert: lastrow[j = d + 1] at p = j + padw.
            north0 = rblk[k + padw + 1 : k + padw + 2, :]
            s1 = _shift_down(h1, north0)
            if affine:
                fnorth0 = frblk[k + padw + 1 : k + padw + 2, :]
                f1s = _shift_down(f1, fnorth0)
                e_d = jnp.maximum(h1 - go, e1) - gp
                f_d = jnp.maximum(s1 - go, f1s) - gp
                hd = jnp.maximum(
                    jnp.maximum(s2 + sc, e_d), jnp.maximum(f_d, 0)
                )
            else:
                hd = jnp.maximum(
                    jnp.maximum(s2 + sc, jnp.maximum(h1, s1) - gp), 0
                )
            if slot:
                best = jnp.maximum(best, hd + (slot - 1 - d))
            else:
                upd = hd > best
                best = jnp.where(upd, hd, best)
                bestd = jnp.where(upd, d, bestd)
            # This step's strip-last-row cell (j = d - S + 2), static slice.
            stage_rows.append(hd[S - 1 : S, :])
            if affine:
                fstage_rows.append(f_d[S - 1 : S, :])
                e1 = e_d
                f1 = f_d
            s2 = s1
            h1 = hd
        # Store the staged 8 rows: j in [o*8 - S + 2, o*8 - S + 9] at
        # p = j + padw, aligned by construction of padw.
        p0 = o * UNROLL - S + 2 + padw
        stage = jnp.concatenate(stage_rows, axis=0)
        fstage = jnp.concatenate(fstage_rows, axis=0) if affine else None

        @pl.when(p0 >= 0)
        def _():
            st = stage // slot if slot else stage
            _rows_store(lastrow_ref, pl.multiple_of(p0, UNROLL), UNROLL, st)
            if affine:
                fst = fstage // slot if slot else fstage
                _rows_store(flastrow_ref, pl.multiple_of(p0, UNROLL), UNROLL,
                            fst)

        if affine:
            return h1, s2, e1, f1, best, bestd, ywin
        return h1, s2, best, bestd, ywin

    if affine:
        init = (zeros, zeros, zeros, zeros, zeros, zeros, zeros)
        out = jax.lax.fori_loop(0, nblk, outer, init)
        best, bestd = out[4], out[5]
    else:
        _, _, best, bestd, _ = jax.lax.fori_loop(
            0, nblk, outer, (zeros, zeros, zeros, zeros, zeros)
        )
    if slot:
        best_ref[:] = best // slot
        bestd_ref[:] = (slot - 1) - (best % slot)
    else:
        best_ref[:] = best
        bestd_ref[:] = bestd
    if rows_ref is not None:
        # Snapshot this strip's boundary-row state: exactly what the next
        # strip's reads would observe (all strips write the same p-range;
        # positions above it stay 0 from the s_idx == 0 init). Pair-encoded
        # rows (profile kernels, see _rows_init) snapshot both planes.
        if isinstance(rows_ref, tuple):
            rows_ref[0][0] = lastrow_ref[0][:]
            rows_ref[1][0] = lastrow_ref[1][:]
        else:
            rows_ref[0] = lastrow_ref[:]
    if frows_ref is not None:
        if isinstance(frows_ref, tuple):
            frows_ref[0][0] = flastrow_ref[0][:]
            frows_ref[1][0] = flastrow_ref[1][:]
        else:
            frows_ref[0] = flastrow_ref[:]


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap", "interpret"))
def _call_strips(xs, ys, *, match, mismatch, gap, interpret):
    M, B = xs.shape
    Ny = ys.shape[0]
    S = STRIP_S
    nstrips = M // S
    nblk = Ny // UNROLL  # covers all S + N - 1 strip diagonals by padding
    # Packed bound uses the engine's strip-mode score cap (match * read_len
    # <= INT16_BOUND), not match * padded-M, which can exceed it.
    slot = _pick_slot(nblk * UNROLL, INT16_BOUND)
    kernel = functools.partial(
        _kernel_strips, nblk=nblk, match=match, mismatch=mismatch, gap=gap,
        slot=slot,
    )
    Nlr = Ny + 4 * UNROLL
    best, bestd = pl.pallas_call(
        kernel,
        grid=(B // LANE, nstrips),
        in_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((Nlr, LANE), jnp.int16)],
        cost_estimate=pl.CostEstimate(
            flops=16 * (M // S) * (S + Ny) * S * B,
            bytes_accessed=M * B * 16, transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)
    return best, bestd


@functools.partial(
    jax.jit, static_argnames=("match", "mismatch", "gap", "gopen", "interpret")
)
def _call_strips_affine(xs, ys, *, match, mismatch, gap, gopen, interpret):
    M, B = xs.shape
    Ny = ys.shape[0]
    S = STRIP_S
    nstrips = M // S
    nblk = Ny // UNROLL
    slot = _pick_slot(nblk * UNROLL, INT16_BOUND)
    kernel = functools.partial(
        _kernel_strips_affine, nblk=nblk, match=match, mismatch=mismatch,
        gap=gap, gopen=gopen, slot=slot,
    )
    Nlr = Ny + 4 * UNROLL
    best, bestd = pl.pallas_call(
        kernel,
        grid=(B // LANE, nstrips),
        in_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # F boundary rows
        ],
        cost_estimate=pl.CostEstimate(
            flops=22 * (M // S) * (S + Ny) * S * B,
            bytes_accessed=M * B * 16, transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)
    return best, bestd


@functools.partial(
    jax.jit,
    static_argnames=("worst", "best_sub", "gap", "interpret", "ncodes",
                     "shared"),
)
def _call_strips_profile(pprof, ys, *, worst, best_sub, gap, interpret,
                         ncodes=PROF_CODES, shared=False):
    """shared=True: pprof is a single (W, M, LANE) block reused by every
    lane block (all lanes share one query — the strips-capable resident
    database scan)."""
    W, M, B_p = pprof.shape
    Ny, B = ys.shape
    S = STRIP_S
    nstrips = M // S
    nblk = Ny // UNROLL
    # Boundary rows exceed int16 here (protein substitution maxima times
    # strip-length queries), and 32-bit scratch faults the v5e worker (see
    # _kernel_strips_profile), so they ride an int16 hi/lo pair; slot
    # packing engages only when the packed value still fits.
    slot = _pick_slot(nblk * UNROLL, max(best_sub, 1) * M)
    kernel = functools.partial(
        _kernel_strips_profile, nblk=nblk, worst=worst,
        gap=gap, slot=slot, ncodes=ncodes,
    )
    Nlr = Ny + 4 * UNROLL
    if shared:
        p_spec = pl.BlockSpec((W, S, LANE), lambda b, s: (0, s, 0),
                              memory_space=pltpu.VMEM)
    else:
        p_spec = pl.BlockSpec((W, S, LANE), lambda b, s: (0, s, b),
                              memory_space=pltpu.VMEM)
    best, bestd = pl.pallas_call(
        kernel,
        grid=(B // LANE, nstrips),
        in_specs=[
            p_spec,
            pl.BlockSpec((Ny, LANE), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows, hi
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows, lo
        ],
        cost_estimate=pl.CostEstimate(
            flops=23 * (M // S) * (S + Ny) * S * B,
            bytes_accessed=M * B * 16 * W, transcendentals=0,
        ),
        interpret=interpret,
    )(pprof, ys)
    return best, bestd


@functools.partial(
    jax.jit,
    static_argnames=("worst", "best_sub", "gap", "gopen", "interpret",
                     "ncodes", "shared"),
)
def _call_strips_profile_affine(pprof, ys, *, worst, best_sub, gap,
                                gopen, interpret, ncodes=PROF_CODES,
                                shared=False):
    W, M, B_p = pprof.shape
    Ny, B = ys.shape
    # The rounds-2/3 worker crashes of this kernel were NOT VMEM pressure:
    # probe_pa_bisect.py (2026-08-20) bisected them to 32-bit boundary-row
    # scratch (int32 and float32 both fault; int16 passes), fixed by the
    # hi/lo int16 pairs below. S stays at the half-height 128 from the
    # VMEM-hypothesis era — shrinking buffers never hurt; raising it back
    # is a perf experiment, not a correctness one.
    S = STRIP_S_PA
    nstrips = M // S
    nblk = Ny // UNROLL
    slot = _pick_slot(nblk * UNROLL, max(best_sub, 1) * M)
    kernel = functools.partial(
        _kernel_strips_profile_affine, nblk=nblk,
        worst=worst, gap=gap, gopen=gopen, slot=slot, ncodes=ncodes,
    )
    Nlr = Ny + 4 * UNROLL
    if shared:
        p_spec = pl.BlockSpec((W, S, LANE), lambda b, s: (0, s, 0),
                              memory_space=pltpu.VMEM)
    else:
        p_spec = pl.BlockSpec((W, S, LANE), lambda b, s: (0, s, b),
                              memory_space=pltpu.VMEM)
    best, bestd = pl.pallas_call(
        kernel,
        grid=(B // LANE, nstrips),
        in_specs=[
            p_spec,
            pl.BlockSpec((Ny, LANE), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows, hi
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows, lo
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # F boundary rows, hi
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # F boundary rows, lo
        ],
        cost_estimate=pl.CostEstimate(
            flops=29 * (M // S) * (S + Ny) * S * B,
            bytes_accessed=M * B * 16 * W, transcendentals=0,
        ),
        interpret=interpret,
    )(pprof, ys)
    return best, bestd


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap", "interpret"))
def _call_strips_ckpt(xs, ys, *, match, mismatch, gap, interpret):
    """Strip scoring pass that also returns the (nstrips, Nlr, B) int16
    boundary-row checkpoints (see _kernel_strips_ckpt)."""
    M, B = xs.shape
    Ny = ys.shape[0]
    S = STRIP_S
    nstrips = M // S
    nblk = Ny // UNROLL
    slot = _pick_slot(nblk * UNROLL, INT16_BOUND)
    kernel = functools.partial(
        _kernel_strips_ckpt, nblk=nblk, match=match, mismatch=mismatch,
        gap=gap, slot=slot,
    )
    Nlr = Ny + 4 * UNROLL
    best, bestd, rows = pl.pallas_call(
        kernel,
        grid=(B // LANE, nstrips),
        in_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nlr, LANE), lambda b, s: (s, 0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((nstrips, Nlr, B), jnp.int16),
        ],
        scratch_shapes=[pltpu.VMEM((Nlr, LANE), jnp.int16)],
        cost_estimate=pl.CostEstimate(
            flops=16 * (M // S) * (S + Ny) * S * B,
            bytes_accessed=M * B * 16 + (M // S) * Nlr * B * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)
    return best, bestd, rows


@functools.partial(
    jax.jit, static_argnames=("match", "mismatch", "gap", "gopen", "interpret")
)
def _call_strips_affine_ckpt(xs, ys, *, match, mismatch, gap, gopen, interpret):
    """Affine strip scoring pass that also returns the (nstrips, Nlr, B)
    int16 H and F boundary-row checkpoints (see _kernel_strips_affine_ckpt)."""
    M, B = xs.shape
    Ny = ys.shape[0]
    S = STRIP_S
    nstrips = M // S
    nblk = Ny // UNROLL
    slot = _pick_slot(nblk * UNROLL, INT16_BOUND)
    kernel = functools.partial(
        _kernel_strips_affine_ckpt, nblk=nblk, match=match, mismatch=mismatch,
        gap=gap, gopen=gopen, slot=slot,
    )
    Nlr = Ny + 4 * UNROLL
    best, bestd, rows, frows = pl.pallas_call(
        kernel,
        grid=(B // LANE, nstrips),
        in_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nlr, LANE), lambda b, s: (s, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nlr, LANE), lambda b, s: (s, 0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((nstrips, Nlr, B), jnp.int16),
            jax.ShapeDtypeStruct((nstrips, Nlr, B), jnp.int16),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # F boundary rows
        ],
        cost_estimate=pl.CostEstimate(
            flops=22 * (M // S) * (S + Ny) * S * B,
            bytes_accessed=M * B * 16 + 2 * (M // S) * Nlr * B * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)
    return best, bestd, rows, frows


def _kernel_strips_profile_ckpt(pprof_ref, y_ref, best_ref, bestd_ref,
                                rows_hi_ref, rows_lo_ref, lr_hi_ref,
                                lr_lo_ref, *, nblk: int, worst: int,
                                gap: int, slot: int = 0,
                                ncodes: int = PROF_CODES):
    """Substitution-matrix strip kernel that CHECKPOINTS each strip's
    boundary row (as the int16 hi/lo pair planes the profile kernels carry,
    see _rows_init) — the profile sibling of _kernel_strips_ckpt, enabling
    traceback for titin-class BLOSUM queries on the Pallas fast path."""
    sow, shape = _packed_sow(pprof_ref, worst, slot, ncodes)
    _strips_body(sow, shape, y_ref, best_ref, bestd_ref,
                 (rows_hi_ref, rows_lo_ref), (lr_hi_ref, lr_lo_ref),
                 nblk=nblk, gap=gap, slot=slot)


def _kernel_strips_profile_affine_ckpt(pprof_ref, y_ref, best_ref, bestd_ref,
                                       rows_hi_ref, rows_lo_ref, frows_hi_ref,
                                       frows_lo_ref, lr_hi_ref, lr_lo_ref,
                                       flr_hi_ref, flr_lo_ref, *, nblk: int,
                                       worst: int, gap: int, gopen: int,
                                       slot: int = 0,
                                       ncodes: int = PROF_CODES):
    """Affine + substitution-matrix strip kernel checkpointing BOTH the H
    and the F boundary-row pairs per strip (E is row-internal and never
    crosses a strip edge) — the profile sibling of
    _kernel_strips_affine_ckpt."""
    sow, shape = _packed_sow(pprof_ref, worst, slot, ncodes)
    _strips_body(sow, shape, y_ref, best_ref, bestd_ref,
                 (rows_hi_ref, rows_lo_ref), (lr_hi_ref, lr_lo_ref),
                 nblk=nblk, gap=gap, slot=slot, gopen=gopen,
                 flastrow_ref=(flr_hi_ref, flr_lo_ref),
                 frows_ref=(frows_hi_ref, frows_lo_ref))


@functools.partial(
    jax.jit, static_argnames=("worst", "best_sub", "gap", "interpret", "ncodes")
)
def _call_strips_profile_ckpt(pprof, ys, *, worst, best_sub, gap, interpret,
                              ncodes=PROF_CODES):
    """Profile strip scoring pass that also returns the (nstrips, Nlr, B)
    int16 hi/lo boundary-row checkpoint planes (see
    _kernel_strips_profile_ckpt)."""
    W, M, B = pprof.shape
    Ny = ys.shape[0]
    S = STRIP_S
    nstrips = M // S
    nblk = Ny // UNROLL
    slot = _pick_slot(nblk * UNROLL, max(best_sub, 1) * M)
    kernel = functools.partial(
        _kernel_strips_profile_ckpt, nblk=nblk, worst=worst, gap=gap,
        slot=slot, ncodes=ncodes,
    )
    Nlr = Ny + 4 * UNROLL
    row_spec = pl.BlockSpec((1, Nlr, LANE), lambda b, s: (s, 0, b),
                            memory_space=pltpu.VMEM)
    best, bestd, rows_hi, rows_lo = pl.pallas_call(
        kernel,
        grid=(B // LANE, nstrips),
        in_specs=[
            pl.BlockSpec((W, S, LANE), lambda b, s: (0, s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((nstrips, Nlr, B), jnp.int16),
            jax.ShapeDtypeStruct((nstrips, Nlr, B), jnp.int16),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows, hi
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows, lo
        ],
        cost_estimate=pl.CostEstimate(
            flops=23 * (M // S) * (S + Ny) * S * B,
            bytes_accessed=M * B * 16 * W + 2 * (M // S) * Nlr * B * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pprof, ys)
    return best, bestd, rows_hi, rows_lo


@functools.partial(
    jax.jit,
    static_argnames=("worst", "best_sub", "gap", "gopen", "interpret", "ncodes"),
)
def _call_strips_profile_affine_ckpt(pprof, ys, *, worst, best_sub, gap,
                                     gopen, interpret, ncodes=PROF_CODES):
    """Affine profile strip scoring pass that also returns the H and F
    int16 hi/lo boundary-row checkpoint planes (see
    _kernel_strips_profile_affine_ckpt)."""
    W, M, B = pprof.shape
    Ny = ys.shape[0]
    S = STRIP_S_PA
    nstrips = M // S
    nblk = Ny // UNROLL
    slot = _pick_slot(nblk * UNROLL, max(best_sub, 1) * M)
    kernel = functools.partial(
        _kernel_strips_profile_affine_ckpt, nblk=nblk, worst=worst, gap=gap,
        gopen=gopen, slot=slot, ncodes=ncodes,
    )
    Nlr = Ny + 4 * UNROLL
    row_spec = pl.BlockSpec((1, Nlr, LANE), lambda b, s: (s, 0, b),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((nstrips, Nlr, B), jnp.int16)
    best, bestd, rows_hi, rows_lo, frows_hi, frows_lo = pl.pallas_call(
        kernel,
        grid=(B // LANE, nstrips),
        in_specs=[
            pl.BlockSpec((W, S, LANE), lambda b, s: (0, s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
            row_spec,
            row_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            jax.ShapeDtypeStruct((M, B), jnp.int32),
            row_shape,
            row_shape,
            row_shape,
            row_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows, hi
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # H boundary rows, lo
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # F boundary rows, hi
            pltpu.VMEM((Nlr, LANE), jnp.int16),  # F boundary rows, lo
        ],
        cost_estimate=pl.CostEstimate(
            flops=29 * (M // S) * (S + Ny) * S * B,
            bytes_accessed=M * B * 16 * W + 4 * (M // S) * Nlr * B * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pprof, ys)
    return best, bestd, rows_hi, rows_lo, frows_hi, frows_lo


def _kernel_strip_moves(x_ref, y_ref, rowin_ref, moves_ref, h1_s, s2_s, ywin_s,
                        *, match: int, mismatch: int, gap: int):
    """Replay ONE strip's recurrence from its checkpointed incoming boundary
    row, emitting per-cell traceback move/stop codes (scan_dp MOVE_*/STOP_BIT
    encoding). Because the boundary row is the exact forward-pass handoff,
    the recomputed neighbor values — including row 0's north/north-west
    inserts from rowin — equal the full-matrix DP values, so the greedy walk
    over these codes matches the reference's dense-matrix walk
    (src/aligner/smithwaterman.cpp:41-78) bit for bit."""
    S, B = x_ref.shape
    o = pl.program_id(1)
    x = x_ref[:].astype(jnp.int32)

    @pl.when(o == 0)
    def _():
        z = jnp.zeros((S, B), jnp.int32)
        h1_s[:] = z
        s2_s[:] = z
        ywin_s[:] = z

    h1, s2, ywin = h1_s[:], s2_s[:], ywin_s[:]
    base = pl.multiple_of(o * UNROLL, UNROLL)
    blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
    rblk = rowin_ref[pl.ds(base, 2 * UNROLL), :].astype(jnp.int32)
    for k in range(UNROLL):
        yc = blk[k : k + 1, :]
        ywin = _shift_down(ywin, yc)
        sc = jnp.where(x == ywin, match, mismatch)
        north0 = rblk[k + STRIP_PADW + 1 : k + STRIP_PADW + 2, :]
        s1 = _shift_down(h1, north0)
        hd = jnp.maximum(
            jnp.maximum(s2 + sc, jnp.maximum(h1, s1) - gap), 0
        )
        n1, n2, n3 = s2, h1, s1  # nw, west, north
        nw_mv = (n1 >= n2) & (n1 >= n3)
        w_mv = (n2 >= n1) & (n2 >= n3)
        mv = jnp.where(nw_mv, 0, jnp.where(w_mv, 1, 2))
        stop = (n1 == 0) | (n2 == 0) | (n3 == 0)
        mv = mv + jnp.where(stop, 4, 0)
        moves_ref[k] = mv.astype(jnp.uint8)
        s2 = s1
        h1 = hd
    h1_s[:] = h1
    s2_s[:] = s2
    ywin_s[:] = ywin


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap", "interpret"))
def _call_strip_moves(x_strip, ys, rowin, *, match, mismatch, gap, interpret):
    S, B = x_strip.shape
    Ny = ys.shape[0]
    nblk = Ny // UNROLL
    kernel = functools.partial(
        _kernel_strip_moves, match=match, mismatch=mismatch, gap=gap
    )
    Nlr = rowin.shape[0]
    moves = pl.pallas_call(
        kernel,
        grid=(B // LANE, nblk),
        in_specs=[
            pl.BlockSpec((S, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Nlr, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (UNROLL, S, LANE), lambda b, o: (o, 0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * UNROLL, S, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((S, LANE), jnp.int32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=20 * (S + Ny) * S * B, bytes_accessed=(S + Ny) * S * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_strip, ys, rowin)
    return moves


def _kernel_strip_affine_moves(x_ref, y_ref, rowin_ref, frowin_ref, moves_ref,
                               h1_s, s2_s, e1_s, f1_s, ywin_s,
                               *, match: int, mismatch: int, gap: int,
                               gopen: int):
    """Replay ONE strip's affine (Gotoh) recurrence from its checkpointed
    incoming H and F boundary rows, emitting the H/E/F state-machine move
    codes of scan_dp._wavefront_affine (H_NW/H_E/H_F/H_ZERO + E/F extend
    bits). The H/E/F values recomputed here equal the full-matrix DP values
    on every cell the walk can visit: H is exact everywhere (same mask-free
    recurrence as the scoring pass), and E/F deviate from the masked scan
    values only while strictly negative (boundary-region chains start at 0
    instead of -inf and decay by gap each step), where neither the H-source
    comparison (needs E/F == H > 0) nor a walked gap run (visits only cells
    with E/F > 0 along the run) can observe them."""
    from .scan_dp import E_EXT_BIT, F_EXT_BIT, H_E, H_F, H_NW, H_ZERO

    S, B = x_ref.shape
    o = pl.program_id(1)
    x = x_ref[:].astype(jnp.int32)
    gp = np.asarray(gap, jnp.int32)
    go = np.asarray(gopen, jnp.int32)

    @pl.when(o == 0)
    def _():
        z = jnp.zeros((S, B), jnp.int32)
        h1_s[:] = z
        s2_s[:] = z
        e1_s[:] = z
        f1_s[:] = z
        ywin_s[:] = z

    h1, s2, e1, f1 = h1_s[:], s2_s[:], e1_s[:], f1_s[:]
    ywin = ywin_s[:]
    base = pl.multiple_of(o * UNROLL, UNROLL)
    blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
    rblk = rowin_ref[pl.ds(base, 2 * UNROLL), :].astype(jnp.int32)
    frblk = frowin_ref[pl.ds(base, 2 * UNROLL), :].astype(jnp.int32)
    for k in range(UNROLL):
        yc = blk[k : k + 1, :]
        ywin = _shift_down(ywin, yc)
        sc = jnp.where(x == ywin, match, mismatch)
        north0 = rblk[k + STRIP_PADW + 1 : k + STRIP_PADW + 2, :]
        s1 = _shift_down(h1, north0)
        fnorth0 = frblk[k + STRIP_PADW + 1 : k + STRIP_PADW + 2, :]
        f1s = _shift_down(f1, fnorth0)
        e_open = h1 - go
        f_open = s1 - go
        e_d = jnp.maximum(e_open, e1) - gp
        f_d = jnp.maximum(f_open, f1s) - gp
        diag = s2 + sc
        hd = jnp.maximum(jnp.maximum(diag, e_d), jnp.maximum(f_d, 0))
        # Same code priority as scan_dp._wavefront_affine: ZERO > NW > E >
        # F. Codes are built in int32 and cast once — Mosaic rejects
        # jnp.where with sub-word branch values here (i1 -> 8-bit relayout
        # "Invalid relayout ... vector<256x128xi1>", observed on v5e).
        h_src = jnp.where(
            hd == 0,
            int(H_ZERO),
            jnp.where(hd == diag, int(H_NW),
                      jnp.where(hd == e_d, int(H_E), int(H_F))),
        )
        e_ext = e1 >= e_open
        f_ext = f1s >= f_open
        mv = (
            h_src
            + jnp.where(e_ext, int(E_EXT_BIT), 0)
            + jnp.where(f_ext, int(F_EXT_BIT), 0)
        )
        moves_ref[k] = mv.astype(jnp.uint8)
        s2 = s1
        e1 = e_d
        f1 = f_d
        h1 = hd
    h1_s[:] = h1
    s2_s[:] = s2
    e1_s[:] = e1
    f1_s[:] = f1
    ywin_s[:] = ywin


@functools.partial(
    jax.jit, static_argnames=("match", "mismatch", "gap", "gopen", "interpret")
)
def _call_strip_affine_moves(x_strip, ys, rowin, frowin, *, match, mismatch,
                             gap, gopen, interpret):
    S, B = x_strip.shape
    Ny = ys.shape[0]
    nblk = Ny // UNROLL
    kernel = functools.partial(
        _kernel_strip_affine_moves, match=match, mismatch=mismatch, gap=gap,
        gopen=gopen,
    )
    Nlr = rowin.shape[0]
    moves = pl.pallas_call(
        kernel,
        grid=(B // LANE, nblk),
        in_specs=[
            pl.BlockSpec((S, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Nlr, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Nlr, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (UNROLL, S, LANE), lambda b, o: (o, 0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * UNROLL, S, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((S, LANE), jnp.int32)] * 5,
        cost_estimate=pl.CostEstimate(
            flops=26 * (S + Ny) * S * B, bytes_accessed=(S + Ny) * S * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_strip, ys, rowin, frowin)
    return moves


def _kernel_strip_profile_moves(pprof_ref, y_ref, rin_hi_ref, rin_lo_ref,
                                moves_ref, h1_s, s2_s, ywin_s,
                                *, worst: int, gap: int,
                                ncodes: int = PROF_CODES):
    """Replay ONE strip's substitution-matrix recurrence from its
    checkpointed incoming boundary-row pair, emitting the same per-cell
    move/stop codes as _kernel_strip_moves (the walk is scoring-agnostic;
    only the score-of-window closure differs). The boundary pair decodes to
    the exact forward-pass H values, so the greedy walk over these codes
    matches the dense-matrix walk bit for bit."""
    sow, (S, B) = _packed_sow(pprof_ref, worst, 0, ncodes)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _():
        z = jnp.zeros((S, B), jnp.int32)
        h1_s[:] = z
        s2_s[:] = z
        ywin_s[:] = z

    h1, s2, ywin = h1_s[:], s2_s[:], ywin_s[:]
    base = pl.multiple_of(o * UNROLL, UNROLL)
    blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
    rblk = _rows_load((rin_hi_ref, rin_lo_ref), base, 2 * UNROLL)
    for k in range(UNROLL):
        yc = blk[k : k + 1, :]
        ywin = _shift_down(ywin, yc)
        sc = sow(ywin)
        north0 = rblk[k + STRIP_PADW + 1 : k + STRIP_PADW + 2, :]
        s1 = _shift_down(h1, north0)
        hd = jnp.maximum(
            jnp.maximum(s2 + sc, jnp.maximum(h1, s1) - gap), 0
        )
        n1, n2, n3 = s2, h1, s1  # nw, west, north
        nw_mv = (n1 >= n2) & (n1 >= n3)
        w_mv = (n2 >= n1) & (n2 >= n3)
        mv = jnp.where(nw_mv, 0, jnp.where(w_mv, 1, 2))
        stop = (n1 == 0) | (n2 == 0) | (n3 == 0)
        mv = mv + jnp.where(stop, 4, 0)
        moves_ref[k] = mv.astype(jnp.uint8)
        s2 = s1
        h1 = hd
    h1_s[:] = h1
    s2_s[:] = s2
    ywin_s[:] = ywin


@functools.partial(
    jax.jit, static_argnames=("worst", "gap", "interpret", "ncodes")
)
def _call_strip_profile_moves(pprof_strip, ys, rin_hi, rin_lo, *, worst,
                              gap, interpret, ncodes=PROF_CODES):
    W, S, B = pprof_strip.shape
    Ny = ys.shape[0]
    nblk = Ny // UNROLL
    kernel = functools.partial(
        _kernel_strip_profile_moves, worst=worst, gap=gap, ncodes=ncodes
    )
    Nlr = rin_hi.shape[0]
    row_spec = pl.BlockSpec((Nlr, LANE), lambda b, o: (0, b),
                            memory_space=pltpu.VMEM)
    moves = pl.pallas_call(
        kernel,
        grid=(B // LANE, nblk),
        in_specs=[
            pl.BlockSpec((W, S, LANE), lambda b, o: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec(
            (UNROLL, S, LANE), lambda b, o: (o, 0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * UNROLL, S, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((S, LANE), jnp.int32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=27 * (S + Ny) * S * B, bytes_accessed=(S + Ny) * S * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pprof_strip, ys, rin_hi, rin_lo)
    return moves


def _kernel_strip_profile_affine_moves(pprof_ref, y_ref, rin_hi_ref,
                                       rin_lo_ref, frin_hi_ref, frin_lo_ref,
                                       moves_ref, h1_s, s2_s, e1_s, f1_s,
                                       ywin_s, *, worst: int, gap: int,
                                       gopen: int, ncodes: int = PROF_CODES):
    """Replay ONE strip's affine (Gotoh) substitution-matrix recurrence
    from its checkpointed H and F boundary-row pairs, emitting scan_dp's
    affine move codes — the profile sibling of _kernel_strip_affine_moves
    (whose E/F-deviation argument is score-independent and carries over:
    H >= 0 everywhere and boundary-region E/F chains deviate only while
    strictly negative, where neither the H-source comparison nor a walked
    gap run can observe them)."""
    from .scan_dp import E_EXT_BIT, F_EXT_BIT, H_E, H_F, H_NW, H_ZERO

    sow, (S, B) = _packed_sow(pprof_ref, worst, 0, ncodes)
    o = pl.program_id(1)
    gp = np.asarray(gap, jnp.int32)
    go = np.asarray(gopen, jnp.int32)

    @pl.when(o == 0)
    def _():
        z = jnp.zeros((S, B), jnp.int32)
        h1_s[:] = z
        s2_s[:] = z
        e1_s[:] = z
        f1_s[:] = z
        ywin_s[:] = z

    h1, s2, e1, f1 = h1_s[:], s2_s[:], e1_s[:], f1_s[:]
    ywin = ywin_s[:]
    base = pl.multiple_of(o * UNROLL, UNROLL)
    blk = y_ref[pl.ds(base, UNROLL), :].astype(jnp.int32)
    rblk = _rows_load((rin_hi_ref, rin_lo_ref), base, 2 * UNROLL)
    frblk = _rows_load((frin_hi_ref, frin_lo_ref), base, 2 * UNROLL)
    for k in range(UNROLL):
        yc = blk[k : k + 1, :]
        ywin = _shift_down(ywin, yc)
        sc = sow(ywin)
        north0 = rblk[k + STRIP_PADW + 1 : k + STRIP_PADW + 2, :]
        s1 = _shift_down(h1, north0)
        fnorth0 = frblk[k + STRIP_PADW + 1 : k + STRIP_PADW + 2, :]
        f1s = _shift_down(f1, fnorth0)
        e_open = h1 - go
        f_open = s1 - go
        e_d = jnp.maximum(e_open, e1) - gp
        f_d = jnp.maximum(f_open, f1s) - gp
        diag = s2 + sc
        hd = jnp.maximum(jnp.maximum(diag, e_d), jnp.maximum(f_d, 0))
        # Same code priority as scan_dp._wavefront_affine: ZERO > NW > E >
        # F; codes built in int32, cast once (the v5e sub-word relayout
        # gotcha — see _kernel_strip_affine_moves).
        h_src = jnp.where(
            hd == 0,
            int(H_ZERO),
            jnp.where(hd == diag, int(H_NW),
                      jnp.where(hd == e_d, int(H_E), int(H_F))),
        )
        e_ext = e1 >= e_open
        f_ext = f1s >= f_open
        mv = (
            h_src
            + jnp.where(e_ext, int(E_EXT_BIT), 0)
            + jnp.where(f_ext, int(F_EXT_BIT), 0)
        )
        moves_ref[k] = mv.astype(jnp.uint8)
        s2 = s1
        e1 = e_d
        f1 = f_d
        h1 = hd
    h1_s[:] = h1
    s2_s[:] = s2
    e1_s[:] = e1
    f1_s[:] = f1
    ywin_s[:] = ywin


@functools.partial(
    jax.jit, static_argnames=("worst", "gap", "gopen", "interpret", "ncodes")
)
def _call_strip_profile_affine_moves(pprof_strip, ys, rin_hi, rin_lo,
                                     frin_hi, frin_lo, *, worst, gap, gopen,
                                     interpret, ncodes=PROF_CODES):
    W, S, B = pprof_strip.shape
    Ny = ys.shape[0]
    nblk = Ny // UNROLL
    kernel = functools.partial(
        _kernel_strip_profile_affine_moves, worst=worst, gap=gap,
        gopen=gopen, ncodes=ncodes,
    )
    Nlr = rin_hi.shape[0]
    row_spec = pl.BlockSpec((Nlr, LANE), lambda b, o: (0, b),
                            memory_space=pltpu.VMEM)
    moves = pl.pallas_call(
        kernel,
        grid=(B // LANE, nblk),
        in_specs=[
            pl.BlockSpec((W, S, LANE), lambda b, o: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, LANE), lambda b, o: (0, b), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec(
            (UNROLL, S, LANE), lambda b, o: (o, 0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * UNROLL, S, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((S, LANE), jnp.int32)] * 5,
        cost_estimate=pl.CostEstimate(
            flops=33 * (S + Ny) * S * B, bytes_accessed=(S + Ny) * S * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pprof_strip, ys, rin_hi, rin_lo, frin_hi, frin_lo)
    return moves


@functools.partial(jax.jit, static_argnames=("strip_s",))
def _reduce_best_strips(best, bestd, m, n, *, strip_s: int = STRIP_S):
    """Per-lane (score, i, j) from strip-local diagonal indices: cell at
    global row r has i = r + 1, j = bestd - (r % strip_s) + 1. Tie-break
    matches _reduce_best: min j, then min i."""
    M, B = best.shape
    rr = jax.lax.broadcasted_iota(jnp.int32, (M, B), 0)
    jj = bestd - (rr % strip_s) + 1
    score = jnp.max(best, axis=0)
    key = jj * (M + 2) + rr + 1
    key = jnp.where(best == score[None, :], key, _INT32_MAX)
    r_star = jnp.argmin(key, axis=0)
    lanes = jnp.arange(B)
    i_star = r_star + 1
    j_star = jj[r_star, lanes]
    nonzero = score > 0
    return (
        score,
        jnp.where(nonzero, i_star, 0),
        jnp.where(nonzero, j_star, 0),
    )


def score_lanes_jit(x_lanes, y_lanes, *, match: int, mismatch: int, gap: int,
                    interpret: bool, gopen: int = 0):
    """Traceable batch scorer for use INSIDE jit / shard_map (the per-shard
    compute of the distributed mesh aligner). Unlike PallasEngine.prepare,
    all padding is pure jnp, so the call composes with collectives.

    x_lanes: (B0, M0) uint8 reads padded with X_PAD; y_lanes: (B0, N0) uint8
    references padded with Y_PAD. Single-strip geometry only (M0 <= MAX_M).
    gopen > 0 selects the affine (Gotoh) kernel. Returns (score, i, j), each
    (B0,) int32 — same contract/tie-break as PallasEngine.score_batch.
    """
    B0, M0 = x_lanes.shape
    N0 = y_lanes.shape[1]
    if M0 > MAX_M:
        raise ValueError("score_lanes_jit is single-strip only (M0 <= MAX_M)")
    M = _round_up(max(M0, 8), 8)
    Ny = _round_up(max(N0, 8) + M + UNROLL, UNROLL)
    B = _round_up(max(B0, LANE), LANE)
    xs = jnp.full((M, B), 1, jnp.uint8).at[:M0, :B0].set(x_lanes.T)  # X_PAD
    ys = jnp.full((Ny, B), 2, jnp.uint8).at[:N0, :B0].set(y_lanes.T)  # Y_PAD
    if gopen:
        best, bestd = _call_uniform_affine(
            xs, ys, match=match, mismatch=mismatch, gap=gap, gopen=gopen,
            interpret=interpret,
        )
    else:
        best, bestd = _call_uniform(
            xs, ys, match=match, mismatch=mismatch, gap=gap, interpret=interpret
        )
    score, i, j = _reduce_best(best, bestd)
    return score[:B0], i[:B0], j[:B0]


def score_lanes_profile_jit(x_lanes, y_lanes, packed_lut, encode_lut, *,
                            worst: int, best_sub: int, gap: int,
                            interpret: bool, gopen: int = 0,
                            ncodes: int = PROF_CODES):
    """Traceable substitution-matrix batch scorer for use INSIDE jit /
    shard_map — the profile sibling of score_lanes_jit, so MeshAligner can
    run BLOSUM-class scoring (the UNIPROT workload,
    src/mpi_sw_solve_uniprot.cpp:120-123) on the Pallas per-shard path.

    packed_lut / encode_lut: the (256, 8) int32 / (256,) uint8 LUT pair from
    _packed_luts (out-of-alphabet bytes — including the X_PAD/Y_PAD bytes —
    decode to worst, which keeps the mask-free pad-decay argument intact).
    The packed (8, M, B) profile and compact y codes are gathered in XLA
    outside the kernel, exactly like PallasEngine.score_prepared's device
    path. gopen > 0 selects the affine kernel. Returns (score, i, j), each
    (B0,) int32.
    """
    B0, M0 = x_lanes.shape
    N0 = y_lanes.shape[1]
    if M0 > MAX_M:
        raise ValueError(
            "score_lanes_profile_jit is single-strip only (M0 <= MAX_M)"
        )
    M = _round_up(max(M0, 8), 8)
    Ny = _round_up(max(N0, 8) + M + UNROLL, UNROLL)
    B = _round_up(max(B0, LANE), LANE)
    xs = jnp.full((M, B), 1, jnp.uint8).at[:M0, :B0].set(x_lanes.T)  # X_PAD
    ys = jnp.full((Ny, B), 2, jnp.uint8).at[:N0, :B0].set(y_lanes.T)  # Y_PAD
    pprof = jnp.transpose(packed_lut[xs.astype(jnp.int32)], (2, 0, 1))
    ycodes = encode_lut[ys.astype(jnp.int32)]
    if gopen:
        best, bestd = _call_profile_affine(
            pprof, ycodes, worst=worst, best_sub=best_sub,
            gap=gap, gopen=gopen, interpret=interpret, ncodes=ncodes,
        )
    else:
        best, bestd = _call_profile(
            pprof, ycodes, worst=worst, best_sub=best_sub,
            gap=gap, interpret=interpret, ncodes=ncodes,
        )
    score, i, j = _reduce_best(best, bestd)
    return score[:B0], i[:B0], j[:B0]


@functools.partial(
    jax.jit,
    static_argnames=("N", "worst", "best_sub", "gap", "gopen", "interpret",
                     "ncodes"),
)
def score_db_slab_jit(slab_codes, row0, lens, pprof,
                      *, N: int, worst: int, best_sub: int, gap: int,
                      gopen: int, interpret: bool,
                      ncodes: int = PROF_CODES):
    """Score one batch of database entries SLICED from a device-resident
    pre-transposed, pre-ENCODED slab — the TPU-native replacement for the
    reference's per-rank file loop (src/mpi_sw_solve_uniprot.cpp:95-138).

    The whole database is length-bucketed into batches on the host, each
    batch laid out as a transposed (N_batch, B) uint8 block (lane b = one
    entry) of COMPACT Y CODES (encode_lut applied host-side; 0 = pad), the
    blocks concatenated row-wise and uploaded ONCE. The query's packed
    profile is also computed once outside. Each batch then runs ONE
    dynamic_slice plus the DP kernel — zero device gathers. (The round-4
    first cut gathered per-byte windows from an unpadded flat array:
    benchmarks/probe_uniprot_phase.py measured that elementwise gather at
    ~79 of ~86 ms/batch; a raw-byte slab still spent ~48 ms/batch in the
    per-byte encode_lut gather + per-call profile gather this version
    hoists out.)

    slab_codes: (R, B) uint8 resident DB, compact y codes. row0: scalar
    int32 first slab row of this batch. lens: (B,) int32 true entry
    lengths (0 = pad lane). pprof: (PROF_WORDS, M, LANE) int32 packed
    query profile (shared across lanes), M a multiple of 8. N: static
    padded window length of this batch (>= lens.max(); the slab must
    carry >= Ny - N extra rows after the last batch so the slice stays in
    bounds). Returns (score, i, j), each (B,) int32 — identical to
    score_batch on the same (query, entry) pairs.
    """
    B = slab_codes.shape[1]
    M = pprof.shape[1]
    Ny = _round_up(max(N, 8) + M + UNROLL, UNROLL)
    ys_raw = jax.lax.dynamic_slice(slab_codes, (row0, 0), (Ny, B))
    t = jnp.arange(Ny, dtype=jnp.int32)[:, None]
    # Rows beyond this batch's own block belong to the NEXT batch; the
    # length mask turns every row >= len into code 0 (pad -> worst under
    # _packed_sow), so they never score.
    ycodes = jnp.where(t < lens[None, :], ys_raw, np.uint8(0))
    if gopen:
        best, bestd = _call_profile_affine(
            pprof, ycodes, worst=worst, best_sub=best_sub, gap=gap,
            gopen=gopen, interpret=interpret, shared=True, ncodes=ncodes,
        )
    else:
        best, bestd = _call_profile(
            pprof, ycodes, worst=worst, best_sub=best_sub, gap=gap,
            interpret=interpret, shared=True, ncodes=ncodes,
        )
    score, i, j = _reduce_best(best, bestd)
    return score, i, j


def score_db_slab_strips_jit(slab_codes, row0, lens, pprof,
                             *, N: int, worst: int, best_sub: int, gap: int,
                             gopen: int, interpret: bool,
                             ncodes: int = PROF_CODES):
    """score_db_slab_jit for TITIN-CLASS queries (M > MAX_M): the window
    sliced from the resident slab runs through the strip kernels instead of
    the single-strip profile kernel, so long queries keep the
    zero-per-batch-transfer slab path instead of falling back to the
    per-batch-upload loop (VERDICT r4 item 5). pprof's M must be a multiple
    of the strip height (STRIP_S, or STRIP_S_PA when gopen > 0); the strip
    window only needs S + N rows, so the slab's existing M-sized tail
    covers it. Same (score, i, j) contract as score_db_slab_jit."""
    B = slab_codes.shape[1]
    M = pprof.shape[1]
    S = STRIP_S_PA if gopen else STRIP_S
    Ny = _round_up(max(N, 8) + S + 2 * UNROLL, UNROLL)
    ys_raw = jax.lax.dynamic_slice(slab_codes, (row0, 0), (Ny, B))
    t = jnp.arange(Ny, dtype=jnp.int32)[:, None]
    ycodes = jnp.where(t < lens[None, :], ys_raw, np.uint8(0))
    if gopen:
        best, bestd = _call_strips_profile_affine(
            pprof, ycodes, worst=worst, best_sub=best_sub, gap=gap,
            gopen=gopen, interpret=interpret, shared=True, ncodes=ncodes,
        )
    else:
        best, bestd = _call_strips_profile(
            pprof, ycodes, worst=worst, best_sub=best_sub, gap=gap,
            interpret=interpret, shared=True, ncodes=ncodes,
        )
    return _reduce_best_strips(best, bestd, None, None, strip_s=S)


@functools.partial(
    jax.jit,
    static_argnames=("k", "N", "worst", "best_sub", "gap", "gopen",
                     "interpret", "ncodes", "strips"),
)
def score_db_slab_group_jit(slab_codes, g0, row0_all, lens_all, pprof,
                            *, k: int, N: int, worst: int, best_sub: int,
                            gap: int, gopen: int, interpret: bool,
                            ncodes: int = PROF_CODES, strips: bool = False):
    """Score a GROUP of k same-shape batches in ONE dispatch via lax.scan.

    The per-batch dispatch of score_db_slab_jit costs ~12 ms of host/tunnel
    overhead per batch on this rig even with everything device-resident
    (69 dispatches dominated the 1.4-1.6 s warm full-DB scan). Batches are
    length-sorted, so equal padded-N batches form contiguous runs; scanning
    a run inside one program cuts the dispatch count to the number of
    (N, k) groups and returns the whole group's results in one fetch.

    g0: scalar int32 first batch index of this group. row0_all: (nb,)
    int32 resident per-batch slab row offsets. lens_all: (nb, B) int32
    resident per-batch entry lengths. Returns (score, i, j), each (k, B)
    int32 — row g is identical to score_db_slab_jit on batch g0 + g.
    """
    B = slab_codes.shape[1]
    row0s = jax.lax.dynamic_slice_in_dim(row0_all, g0, k)
    lens_k = jax.lax.dynamic_slice_in_dim(lens_all, g0, k)

    def step(_, inp):
        row0, lens = inp
        fn = score_db_slab_strips_jit if strips else score_db_slab_jit
        out = fn(
            slab_codes, row0, lens, pprof, N=N, worst=worst,
            best_sub=best_sub, gap=gap, gopen=gopen, interpret=interpret,
            ncodes=ncodes,
        )
        return 0, out

    _, (score, i, j) = jax.lax.scan(step, 0, (row0s, lens_k))
    return score, i, j


def _make_repeat(call_fn):
    """Build a jitted K-iteration repeat wrapper around a single-strip
    scoring call: ONE device dispatch runs the kernel K times via lax.scan,
    each iteration on a row-rolled copy of the reference block (the traced
    roll shift makes every body iteration's input distinct, so XLA can
    neither hoist the kernel out of the loop nor CSE iterations), and the
    returned scalar folds every iteration's scores in (nothing is dead).

    This exists for benchmarking: timing two dispatches with different K
    and differencing gives a kernel-rate estimate in which the
    host<->device round trip appears exactly ONCE per dispatch — immune to
    the tunnel-RTT drift that poisoned four generations of host-side
    marginal estimators on this rig (see bench.py kernel_repeat_estimate
    and CLAUDE.md "ESTIMATOR SAGA")."""

    @functools.partial(jax.jit, static_argnames=("K", "kw"))
    def rep(a0, a1, *, K, kw):
        kwd = dict(kw)

        def body(acc, k):
            a1k = jnp.roll(a1, k, axis=0)
            best, _ = call_fn(a0, a1k, **kwd)
            return acc + jnp.max(best).astype(jnp.int32), None

        acc, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(K, dtype=jnp.int32)
        )
        return acc

    return rep


_REPEAT_CACHE = {}


def _repeat_call(call_fn, a0, a1, K, **kw):
    rep = _REPEAT_CACHE.get(call_fn)
    if rep is None:
        rep = _REPEAT_CACHE[call_fn] = _make_repeat(call_fn)
    return rep(a0, a1, K=K, kw=tuple(sorted(kw.items())))


class PallasEngine:
    """Drop-in score engine with the ScanEngine result contract.

    Exact-int32 semantics only (the production mode). Traceback is done by
    re-running the winner window through the scan path (the architecture the
    reference uses: traceback-free fast sweep + full aligner on the winner,
    src/aligner/plocalaligner.cpp:106-143).
    """

    def __init__(self, cfg: ScoringConfig = ScoringConfig(), interpret: Optional[bool] = None):
        if cfg.semantics == Semantics.SAT_UINT8:
            raise ValueError(
                "PallasEngine computes exact int32; use ScanEngine for sat_uint8 parity"
            )
        if not cfg.is_integral:
            raise ValueError("PallasEngine requires integral scoring parameters")
        # Mask-free kernel preconditions (see _make_body): strictly negative
        # mismatch / off-worst scores and gap >= 1 guarantee out-of-range
        # cells decay strictly below any valid maximum.
        if int(cfg.gap_penalty) < 1:
            raise ValueError("PallasEngine requires gap_penalty >= 1 (use ScanEngine)")
        if cfg.is_uniform:
            if int(cfg.mismatch) >= 0:
                raise ValueError("PallasEngine requires mismatch < 0 (use ScanEngine)")
        else:
            if int(np.asarray(cfg.matrix).min()) >= 0:
                raise ValueError("PallasEngine requires a negative worst matrix entry (use ScanEngine)")
        self.cfg = cfg
        self._lut_dev = None
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        # Per-kernel-family miscompile gates; interpret mode is trusted.
        self._checked = (
            {"uniform", "profile", "strips", "strips_profile", "moves",
             "affine", "affine_profile", "strips_affine",
             "strips_profile_affine"}
            if interpret else set()
        )
        from ..utils.platform import setup_cache

        setup_cache()

    def self_check(self):
        """Golden check against the scan engine after first compile.

        The remote TPU compile service has been observed to occasionally
        produce a wrong executable; this turns silent corruption into a loud
        failure (raises RuntimeError). Runs once per engine instance.
        """
        from .scan_dp import ScanEngine

        rng = np.random.default_rng(12345)
        x = rng.integers(65, 69, (4, 96)).astype(np.uint8)
        y = rng.integers(65, 69, (4, 480)).astype(np.uint8)
        m = np.full(4, 96)
        n = np.full(4, 480)
        got = self.score_prepared(self.prepare(x, y, m, n))
        want = ScanEngine(self.cfg).score_batch(x, y, m, n)
        for k in ("score", "i", "j"):
            g, w = np.asarray(got[k]), np.asarray(want[k])
            if not (g == w).all():
                raise RuntimeError(
                    f"Pallas kernel self-check FAILED ({k}: {g.tolist()} != "
                    f"{w.tolist()}): suspected miscompile — retry in a fresh "
                    "process or clear the JAX compilation cache"
                )
        self._checked.add("uniform" if self.cfg.is_uniform else "profile")

    def _verify_first(self, x_bm, y_bn, m, n, res, need_pos: bool, path: str):
        """Miscompile gate without the extra compile: the FIRST real batch's
        results are verified on two lanes against the vectorized numpy
        oracle (ops/oracle.sw_score_fast, ~50ms/lane). Unlike self_check(),
        this adds no dedicated small-shape kernel compile — on the remote
        compile service a whole extra program costs minutes of startup."""
        from .oracle import sw_affine_score_fast, sw_score_fast

        fast = sw_affine_score_fast if self.cfg.is_affine else sw_score_fast
        m = np.asarray(m)
        n = np.asarray(n)
        B0 = x_bm.shape[0]
        for k in {0, B0 - 1}:
            want = fast(x_bm[k, : m[k]], y_bn[k, : n[k]], self.cfg)
            got_s = int(np.asarray(res["score"])[k])
            got = (
                (got_s, int(np.asarray(res["i"])[k]), int(np.asarray(res["j"])[k]))
                if need_pos else (got_s,)
            )
            if got != want[: len(got)]:
                raise RuntimeError(
                    f"Pallas kernel first-batch check FAILED (lane {k}: "
                    f"{got} != oracle {want[:len(got)]}): suspected "
                    "miscompile — retry in a fresh process or clear the JAX "
                    "compilation cache"
                )
        self._checked.add(path)

    def score_batch(self, x_bm, y_bn, m, n, need_pos: bool = True):
        x_bm = np.asarray(x_bm, np.uint8)
        y_bn = np.asarray(y_bn, np.uint8)
        prep = self.prepare(x_bm, y_bn, m, n)
        res = self.score_prepared(prep, need_pos=need_pos)
        uni = self.cfg.is_uniform
        if prep["strips"]:
            if self.cfg.is_affine:
                path = "strips_affine" if uni else "strips_profile_affine"
            else:
                path = "strips" if uni else "strips_profile"
        elif self.cfg.is_affine:
            path = "affine" if uni else "affine_profile"
        else:
            path = "uniform" if uni else "profile"
        if path not in self._checked:
            self._verify_first(x_bm, y_bn, m, n, res, need_pos, path)
        return res

    def score_batch_moves(self, x_bm, y_bn, m, n):
        """Score + argmax + per-cell traceback move codes in one kernel pass
        (uniform OR substitution-matrix scoring, linear gaps, single-strip
        reads). Returns PADDED arrays — 'score'/'i'/'j' of length Bpad and
        'moves' (Dpad, Mpad, Bpad) — plus 'B0'; pad lanes have i == 0
        (inactive for the walk)."""
        x_bm = np.asarray(x_bm, np.uint8)
        y_bn = np.asarray(y_bn, np.uint8)
        if x_bm.shape[1] > MAX_M:
            raise EnvelopeError("moves kernel supports single-strip reads only")
        prep = self.prepare(x_bm, y_bn, m, n)
        M_pad = prep["args"][0].shape[-2]
        if self.cfg.is_affine:
            # Fused affine (Gotoh) moves: H/E/F state codes in one pass
            # (walk_moves_affine consumes them). VMEM envelopes measured
            # on v5e like the linear profile kernel's (Mosaic scoped-stack
            # holds the unrolled temporaries).
            if self.cfg.is_uniform:
                if M_pad > AFFINE_MOVES_MAX_M:
                    raise EnvelopeError(
                        f"uniform affine moves kernel at M={M_pad} exceeds "
                        f"the scoped-VMEM envelope (M <= "
                        f"{AFFINE_MOVES_MAX_M}); use scan emit_moves"
                    )
                best, bestd, moves = _call_uniform_affine_moves(
                    *prep["args"],
                    match=int(self.cfg.match),
                    mismatch=int(self.cfg.mismatch),
                    gap=int(self.cfg.gap_penalty),
                    gopen=int(self.cfg.gap_open), interpret=self.interpret,
                )
                path = "affine_moves"
            else:
                if M_pad > PROFILE_AFFINE_MOVES_MAX_M:
                    raise EnvelopeError(
                        f"profile affine moves kernel at M={M_pad} exceeds "
                        f"the scoped-VMEM envelope (M <= "
                        f"{PROFILE_AFFINE_MOVES_MAX_M}); use scan "
                        "emit_moves"
                    )
                xs, ys = prep["args"]
                plut, elut = self._lut()
                pprof = _profile_gather(jnp.asarray(xs), plut)
                ycodes = _encode_y(jnp.asarray(ys), elut)
                S = np.asarray(self.cfg.matrix).astype(np.int32)
                best, bestd, moves = _call_profile_affine_moves(
                    pprof, ycodes, worst=int(S.min()),
                    gap=int(self.cfg.gap_penalty),
                    gopen=int(self.cfg.gap_open), interpret=self.interpret,
                    ncodes=self._ncodes(),
                )
                path = "profile_affine_moves"
        elif self.cfg.is_uniform:
            best, bestd, moves = _call_uniform_moves(
                *prep["args"],
                match=int(self.cfg.match), mismatch=int(self.cfg.mismatch),
                gap=int(self.cfg.gap_penalty), interpret=self.interpret,
            )
            path = "moves"
        else:
            # Packed-profile moves: BLOSUM traceback fused on Pallas (the
            # --traceback-all hot path; scan emit_moves is the fallback
            # for affine-matrix configs and larger M). VMEM envelope:
            # Mosaic's scoped stack holds the unrolled select-tree
            # temporaries of all 8 steps — measured 17.91 MB at M=640 on
            # v5e (> the 16.00 MB scoped limit; compile error names it),
            # so the envelope is M <= PROFILE_MOVES_MAX_M = 512.
            if M_pad > PROFILE_MOVES_MAX_M:
                raise EnvelopeError(
                    f"profile moves kernel at M={M_pad} exceeds the v5e "
                    f"scoped-VMEM envelope (M <= {PROFILE_MOVES_MAX_M}); "
                    "use the scan engine's emit_moves or strip-length "
                    "traceback"
                )
            xs, ys = prep["args"]
            plut, elut = self._lut()
            pprof = _profile_gather(jnp.asarray(xs), plut)
            ycodes = _encode_y(jnp.asarray(ys), elut)
            S = np.asarray(self.cfg.matrix).astype(np.int32)
            best, bestd, moves = _call_profile_moves(
                pprof, ycodes, worst=int(S.min()),
                gap=int(self.cfg.gap_penalty), interpret=self.interpret,
                ncodes=self._ncodes(),
            )
            path = "profile_moves"
        score, i, j = _reduce_best(best, bestd)
        res = {
            "score": score, "i": i, "j": j, "moves": moves, "B0": prep["B0"],
        }
        if path not in self._checked:
            self._verify_first(x_bm, y_bn, m, n, res, need_pos=True, path=path)
        return res

    def score_batch_strip_moves(self, x_bm, y_bn, m, n, *,
                                max_steps: int, west_slack: int = 256):
        """Score + argmax + full greedy traceback for STRIP-length reads
        (M > MAX_M), in O(M/S * N * B) checkpoint memory instead of the
        O(D * M * B) move tensor a single emit_moves pass would need (~40 GB
        at the solve_big winner shape).

        Three stages, matching the reference's dense-matrix calculateScore
        semantics (src/aligner/smithwaterman.cpp:81-108) exactly:
        1. checkpointing strip sweep: (score, i, j) + per-strip boundary rows;
        2. per strip level (top down), replay that strip's moves from its
           checkpointed incoming row — exact DP values — with
           _kernel_strip_moves (one transient (D, S, B) uint8 tensor);
        3. a jitted lockstep walk advances every lane currently inside the
           level; lanes crossing the strip's top edge resume next level.

        Returns PADDED per-lane arrays: 'score'/'i'/'j'/'pos'/'steps' of
        length Bpad plus consensus byte buffers 'cx'/'cy' (max_steps, Bpad),
        and 'B0'. Uniform scoring only (the strip kernel's envelope).
        """
        from .traceback import walk_strip_level

        if not self.cfg.is_uniform:
            return self._strip_profile_moves(
                x_bm, y_bn, m, n, max_steps=max_steps,
                west_slack=west_slack, affine=False,
            )
        x_bm = np.asarray(x_bm, np.uint8)
        y_bn = np.asarray(y_bn, np.uint8)
        prep = self.prepare(x_bm, y_bn, m, n)
        if not prep["strips"]:
            raise EnvelopeError(
                "score_batch_strip_moves is for strip-length reads "
                "(M > MAX_M); use score_batch_moves"
            )
        xs, ys = prep["args"]
        match = int(self.cfg.match)
        mismatch = int(self.cfg.mismatch)
        gap = int(self.cfg.gap_penalty)
        best, bestd, rows = _call_strips_ckpt(
            xs, ys, match=match, mismatch=mismatch, gap=gap,
            interpret=self.interpret,
        )
        score, i, j = _reduce_best_strips(best, bestd, None, None)
        res = {"score": score, "i": i, "j": j}
        if "strips" not in self._checked:
            self._verify_first(x_bm, y_bn, m, n, res, need_pos=True,
                               path="strips")

        M, B = xs.shape
        S = STRIP_S
        nstrips = M // S
        y_walk = jnp.asarray(ys.T)  # (B, Ny), pad bytes beyond true n
        i = jnp.asarray(i, jnp.int32)
        j = jnp.asarray(j, jnp.int32)
        state = (
            i, j, jnp.zeros((B,), jnp.int32), i > 0,
            jnp.zeros((max_steps, B), jnp.uint8),
            jnp.zeros((max_steps, B), jnp.uint8),
            jnp.zeros((B,), jnp.int32),
        )
        zero_row = np.zeros(rows.shape[1:], np.int16)
        import time as _time

        level_us = [0.0] * nstrips  # top strip first (walk order)
        for s in range(nstrips - 1, -1, -1):
            t_lvl = _time.perf_counter()
            ih = np.asarray(state[0])
            ah = np.asarray(state[3])
            if not (ah & (ih - 1 >= s * S)).any():
                continue
            rowin = rows[s - 1] if s > 0 else zero_row
            moves = _call_strip_moves(
                xs[s * S : (s + 1) * S], ys, rowin,
                match=match, mismatch=mismatch, gap=gap,
                interpret=self.interpret,
            )
            x_strip = jnp.asarray(xs[s * S : (s + 1) * S])
            while True:
                state = walk_strip_level(
                    moves, x_strip, y_walk, s * S, state,
                    max_steps=S + west_slack,
                )
                ih = np.asarray(state[0])
                ah = np.asarray(state[3])
                # Rare: a lane spent > west_slack gap moves inside this
                # strip; rerun the level (progress is guaranteed per step).
                if not (ah & (ih - 1 >= s * S)).any():
                    break
            del moves
            level_us[nstrips - 1 - s] = (_time.perf_counter() - t_lvl) * 1e6
        _, _, pos, _, cx, cy, steps = state
        return {
            "score": score, "i": res["i"], "j": res["j"], "pos": pos,
            "cx": cx, "cy": cy, "steps": steps, "B0": prep["B0"],
            "level_us": tuple(level_us),
        }

    def score_batch_strip_affine_moves(self, x_bm, y_bn, m, n, *,
                                       max_steps: int, west_slack: int = 256):
        """Affine (Gotoh) score + argmax + full state-machine traceback for
        STRIP-length reads — removes the linear-only limitation of
        score_batch_strip_moves. Same three-stage architecture:
        1. checkpointing affine strip sweep storing BOTH the H and the F
           boundary rows per strip (E is row-internal, no checkpoint needed);
        2. per strip level (top down), replay the strip's H/E/F recurrence
           from its checkpointed incoming rows with _kernel_strip_affine_moves,
           emitting scan_dp's affine move codes;
        3. a jitted lockstep affine walk (traceback.walk_strip_level_affine)
           carries the per-lane H/E/F machine state across strip levels, so
           gap runs crossing a strip edge resume correctly.

        Returns the same PADDED dict as score_batch_strip_moves. Uniform
        affine scoring only (the strips-affine kernel's envelope).
        """
        from .traceback import walk_strip_level_affine

        if not self.cfg.is_affine:
            raise EnvelopeError(
                "score_batch_strip_affine_moves requires affine scoring; "
                "use score_batch_strip_moves for linear gaps"
            )
        if not self.cfg.is_uniform:
            return self._strip_profile_moves(
                x_bm, y_bn, m, n, max_steps=max_steps,
                west_slack=west_slack, affine=True,
            )
        x_bm = np.asarray(x_bm, np.uint8)
        y_bn = np.asarray(y_bn, np.uint8)
        prep = self.prepare(x_bm, y_bn, m, n)
        if not prep["strips"]:
            raise EnvelopeError(
                "score_batch_strip_affine_moves is for strip-length reads "
                "(M > MAX_M); single-strip affine traceback uses the scan "
                "engine's move codes"
            )
        xs, ys = prep["args"]
        match = int(self.cfg.match)
        mismatch = int(self.cfg.mismatch)
        gap = int(self.cfg.gap_penalty)
        gopen = int(self.cfg.gap_open)
        best, bestd, rows, frows = _call_strips_affine_ckpt(
            xs, ys, match=match, mismatch=mismatch, gap=gap, gopen=gopen,
            interpret=self.interpret,
        )
        score, i, j = _reduce_best_strips(best, bestd, None, None)
        res = {"score": score, "i": i, "j": j}
        if "strips_affine" not in self._checked:
            self._verify_first(x_bm, y_bn, m, n, res, need_pos=True,
                               path="strips_affine")

        M, B = xs.shape
        S = STRIP_S
        nstrips = M // S
        y_walk = jnp.asarray(ys.T)
        i = jnp.asarray(i, jnp.int32)
        j = jnp.asarray(j, jnp.int32)
        state = (
            i, j, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
            i > 0,
            jnp.zeros((max_steps, B), jnp.uint8),
            jnp.zeros((max_steps, B), jnp.uint8),
            jnp.zeros((B,), jnp.int32),
        )
        zero_row = np.zeros(rows.shape[1:], np.int16)
        # Strip 0's incoming F row is the forward pass's "no run" init value
        # (see _strips_body): anything <= -gopen makes the open branch win.
        nof_row = np.full(frows.shape[1:], -(gopen + gap + 1), np.int16)
        import time as _time

        level_us = [0.0] * nstrips  # top strip first (walk order)
        for s in range(nstrips - 1, -1, -1):
            t_lvl = _time.perf_counter()
            ih = np.asarray(state[0])
            ah = np.asarray(state[4])
            if not (ah & (ih - 1 >= s * S)).any():
                continue
            rowin = rows[s - 1] if s > 0 else zero_row
            frowin = frows[s - 1] if s > 0 else nof_row
            moves = _call_strip_affine_moves(
                xs[s * S : (s + 1) * S], ys, rowin, frowin,
                match=match, mismatch=mismatch, gap=gap, gopen=gopen,
                interpret=self.interpret,
            )
            x_strip = jnp.asarray(xs[s * S : (s + 1) * S])
            while True:
                state = walk_strip_level_affine(
                    moves, x_strip, y_walk, s * S, state,
                    max_steps=S + west_slack,
                )
                ih = np.asarray(state[0])
                ah = np.asarray(state[4])
                # Rare: a lane spent > west_slack gap moves inside this
                # strip; rerun the level (progress is guaranteed per step).
                if not (ah & (ih - 1 >= s * S)).any():
                    break
            del moves
            level_us[nstrips - 1 - s] = (_time.perf_counter() - t_lvl) * 1e6
        _, _, pos, _, _, cx, cy, steps = state
        return {
            "score": score, "i": res["i"], "j": res["j"], "pos": pos,
            "cx": cx, "cy": cy, "steps": steps, "B0": prep["B0"],
            "level_us": tuple(level_us),
        }

    def _strip_profile_moves(self, x_bm, y_bn, m, n, *, max_steps: int,
                             west_slack: int, affine: bool):
        """Substitution-matrix strip traceback (linear or affine): the
        profile sibling of score_batch_strip_moves /
        score_batch_strip_affine_moves, closing the last fast-path gap —
        a > MAX_M BLOSUM query (titin-class) now gets consensus on Pallas
        instead of the scan fallback. Same three-stage architecture; the
        boundary-row checkpoints ride the int16 hi/lo pair planes the
        profile strip kernels already carry (probe_pa_bisect.py: any
        32-bit persistent scratch faults the v5e worker)."""
        from .traceback import walk_strip_level, walk_strip_level_affine

        x_bm = np.asarray(x_bm, np.uint8)
        y_bn = np.asarray(y_bn, np.uint8)
        prep = self.prepare(x_bm, y_bn, m, n)
        if not prep["strips"]:
            raise EnvelopeError(
                "strip traceback is for strip-length reads (M > MAX_M); "
                "single-strip matrix traceback uses the scan engine's "
                "move codes"
            )
        xs, ys = prep["args"]
        plut, elut = self._lut()
        pprof = _profile_gather(jnp.asarray(xs), plut)
        ycodes = _encode_y(jnp.asarray(ys), elut)
        Smat = np.asarray(self.cfg.matrix).astype(np.int32)
        worst, best_sub = int(Smat.min()), int(Smat.max())
        gap = int(self.cfg.gap_penalty)
        gopen = int(self.cfg.gap_open)
        ncodes = self._ncodes()
        if affine:
            (best, bestd, rows_hi, rows_lo, frows_hi,
             frows_lo) = _call_strips_profile_affine_ckpt(
                pprof, ycodes, worst=worst, best_sub=best_sub, gap=gap,
                gopen=gopen, interpret=self.interpret, ncodes=ncodes,
            )
            S = STRIP_S_PA
        else:
            best, bestd, rows_hi, rows_lo = _call_strips_profile_ckpt(
                pprof, ycodes, worst=worst, best_sub=best_sub, gap=gap,
                interpret=self.interpret, ncodes=ncodes,
            )
            S = STRIP_S
        score, i, j = _reduce_best_strips(best, bestd, None, None, strip_s=S)
        res = {"score": score, "i": i, "j": j}
        path = "strips_profile_affine" if affine else "strips_profile"
        if path not in self._checked:
            self._verify_first(x_bm, y_bn, m, n, res, need_pos=True,
                               path=path)

        M, B = xs.shape
        nstrips = M // S
        y_walk = jnp.asarray(ys.T)  # raw bytes for consensus emission
        i = jnp.asarray(i, jnp.int32)
        j = jnp.asarray(j, jnp.int32)
        zb = jnp.zeros((B,), jnp.int32)
        bufs = (jnp.zeros((max_steps, B), jnp.uint8),
                jnp.zeros((max_steps, B), jnp.uint8))
        if affine:
            state = (i, j, zb, zb, i > 0, bufs[0], bufs[1], zb)
            a_idx = 4
        else:
            state = (i, j, zb, i > 0, bufs[0], bufs[1], zb)
            a_idx = 3
        zero_row = np.zeros(rows_hi.shape[1:], np.int16)
        if affine:
            # Strip 0's incoming F row is the forward init value, encoded
            # as the same hi/lo pair split _rows_store applies.
            f0 = -(gopen + gap + 1)
            fh0, fl0 = divmod(f0, 1 << 15)
            nof_hi = np.full(frows_hi.shape[1:], fh0, np.int16)
            nof_lo = np.full(frows_lo.shape[1:], fl0, np.int16)
        import time as _time

        level_us = [0.0] * nstrips  # top strip first (walk order)
        for s in range(nstrips - 1, -1, -1):
            t_lvl = _time.perf_counter()
            ih = np.asarray(state[0])
            ah = np.asarray(state[a_idx])
            if not (ah & (ih - 1 >= s * S)).any():
                continue
            rin_hi = rows_hi[s - 1] if s > 0 else zero_row
            rin_lo = rows_lo[s - 1] if s > 0 else zero_row
            pprof_strip = pprof[:, s * S : (s + 1) * S, :]
            if affine:
                frin_hi = frows_hi[s - 1] if s > 0 else nof_hi
                frin_lo = frows_lo[s - 1] if s > 0 else nof_lo
                moves = _call_strip_profile_affine_moves(
                    pprof_strip, ycodes, rin_hi, rin_lo, frin_hi, frin_lo,
                    worst=worst, gap=gap, gopen=gopen,
                    interpret=self.interpret, ncodes=ncodes,
                )
            else:
                moves = _call_strip_profile_moves(
                    pprof_strip, ycodes, rin_hi, rin_lo,
                    worst=worst, gap=gap, interpret=self.interpret,
                    ncodes=ncodes,
                )
            x_strip = jnp.asarray(xs[s * S : (s + 1) * S])
            walk = walk_strip_level_affine if affine else walk_strip_level
            while True:
                state = walk(
                    moves, x_strip, y_walk, s * S, state,
                    max_steps=S + west_slack,
                )
                ih = np.asarray(state[0])
                ah = np.asarray(state[a_idx])
                # Rare: a lane spent > west_slack gap moves inside this
                # strip; rerun the level (progress is guaranteed per step).
                if not (ah & (ih - 1 >= s * S)).any():
                    break
            del moves
            level_us[nstrips - 1 - s] = (_time.perf_counter() - t_lvl) * 1e6
        pos, cx, cy, steps = state[2], state[-3], state[-2], state[-1]
        return {
            "score": score, "i": res["i"], "j": res["j"], "pos": pos,
            "cx": cx, "cy": cy, "steps": steps, "B0": prep["B0"],
            "level_us": tuple(level_us),
        }

    def prepare(self, x_bm, y_bn, m, n, device: bool = False):
        """Pad/transpose inputs into kernel layout. With device=True the
        arrays are uploaded once (device-resident benchmarking / pipelines),
        avoiding a host->device transfer per invocation."""
        x_bm = np.asarray(x_bm, np.uint8)
        y_bn = np.asarray(y_bn, np.uint8)
        B0, M0 = x_bm.shape
        N0 = y_bn.shape[1]
        strips = M0 > MAX_M
        if strips:
            # The rounds-2/3 hardware gate on the affine+matrix strip kernel
            # is REMOVED: the worker crashes were root-caused (2026-08-20,
            # benchmarks/probe_pa_bisect.py) to 32-bit persistent boundary-
            # row scratch — a v5e Mosaic fault hitting int32 AND float32
            # scratches in EVERY strip kernel flavor, not this kernel
            # specifically — and fixed by carrying boundary rows as int16
            # hi/lo pairs (recorded passing runs: probe_pa_bisect.py
            # profile_i16pair and probe_profile_affine_strips.py).
            if self.cfg.is_uniform:
                # The uniform kernels keep single int16 boundary rows.
                if int(self.cfg.match) * M0 > INT16_BOUND:
                    raise EnvelopeError(
                        f"match * read_len = {int(self.cfg.match) * M0} "
                        f"exceeds the strip kernel's int16 boundary-row "
                        f"bound {INT16_BOUND}; use the scan engine"
                    )
            else:
                # Profile strip kernels: int16-PAIR rows are exact for
                # |v| < 2**30 (v = hi * 2**15 + lo).
                best_sub = int(np.asarray(self.cfg.matrix).max())
                if max(best_sub, 1) * M0 >= 2**30:
                    raise EnvelopeError(
                        f"best_sub * read_len = {best_sub * M0} exceeds the "
                        "int16-pair boundary-row bound 2**30; use the scan "
                        "engine"
                    )
            M = _round_up(max(M0, STRIP_S), STRIP_S)
            # Strip diagonals run to S + N - 1; y rows must cover the aligned
            # block loads (nblk = Ny // UNROLL).
            Ny = _round_up(max(N0, 8) + STRIP_S + 2 * UNROLL, UNROLL)
        else:
            M = _round_up(max(M0, 8), 8)
            # Ref-char rows padded to cover every aligned diagonal-block load:
            # nblk * UNROLL rows are touched, nblk = ceil((M + N) / UNROLL).
            Ny = _round_up(max(N0, 8) + M + UNROLL, UNROLL)
        B = _round_up(max(B0, LANE), LANE)
        xs = np.full((M, B), 1, np.uint8)  # X_PAD
        xs[:M0, :B0] = x_bm.T
        ys = np.full((Ny, B), 2, np.uint8)  # Y_PAD
        ys[:N0, :B0] = y_bn.T
        # Substitution-matrix scoring ships the raw (M, B) uint8 query block;
        # the (8, M, B) packed int32 profile AND the compact y codes are
        # gathered in XLA ON DEVICE inside score_prepared (same pattern as
        # score_lanes_profile_jit). Gathering on host would multiply the
        # per-batch host->device transfer by sizeof(int32) * words (the
        # round-3 root cause of solve_uniprot's 0.55 s/batch stall).
        first = xs
        from ..utils.logging import vlog

        vlog(
            f"pallas prepare: mode={'strips' if strips else 'single'} "
            f"M={M} Ny={Ny} B={B} (B0={B0})"
        )
        args = [first, ys]
        if device:
            args = [jax.device_put(a) for a in args]
            if not self.cfg.is_uniform:
                # Device-resident prep: gather the packed profile and encode
                # the y codes once up front so repeated score_prepared calls
                # (benchmarks, pipelines that re-score one batch) pay the
                # gathers a single time.
                plut, elut = self._lut()
                args = [_profile_gather(args[0], plut),
                        _encode_y(args[1], elut)]
        return {"args": args, "B0": B0, "strips": strips,
                "m": np.asarray(m, np.int32), "n": np.asarray(n, np.int32)}

    def _ncodes(self) -> int:
        """Reachable compact-code count (alphabet + pad code 0) — static
        arg that lets _packed_sow prune unreachable select-tree branches
        and their word loads."""
        return len(self.cfg.alphabet) + 1

    def _lut(self):
        """Packed-profile LUT pair (see _packed_luts), device-resident
        (built once per engine). Unknown residues score as the matrix
        minimum; y bytes re-encode to compact codes with 0 = invalid."""
        if self._lut_dev is None:
            alpha = tuple(self.cfg.alphabet.encode("ascii"))
            plut, elut = _packed_luts(self.cfg.matrix, alpha)
            self._lut_dev = (jax.device_put(plut), jax.device_put(elut))
        return self._lut_dev

    def score_prepared(self, prep, need_pos: bool = True):
        args = prep["args"]
        if not self.cfg.is_uniform and args[0].ndim == 2:
            # Device-side LUT gathers: (M, B) uint8 -> (8, M, B) int32
            # packed score profile + (Ny, B) compact y codes (cheap VPU
            # work; keeps the host->device transfer at one byte per query
            # cell). Device-resident preps arrive pre-gathered (ndim == 3).
            plut, elut = self._lut()
            args = [_profile_gather(args[0], plut), _encode_y(args[1], elut)]
        B0 = prep["B0"]
        if prep.get("strips"):
            if self.cfg.is_uniform and self.cfg.is_affine:
                best, bestd = _call_strips_affine(
                    *args,
                    match=int(self.cfg.match), mismatch=int(self.cfg.mismatch),
                    gap=int(self.cfg.gap_penalty), gopen=int(self.cfg.gap_open),
                    interpret=self.interpret,
                )
            elif self.cfg.is_uniform:
                best, bestd = _call_strips(
                    *args,
                    match=int(self.cfg.match), mismatch=int(self.cfg.mismatch),
                    gap=int(self.cfg.gap_penalty), interpret=self.interpret,
                )
            elif self.cfg.is_affine:
                S = np.asarray(self.cfg.matrix).astype(np.int32)
                best, bestd = _call_strips_profile_affine(
                    *args,
                    worst=int(S.min()), best_sub=int(S.max()),
                    gap=int(self.cfg.gap_penalty), gopen=int(self.cfg.gap_open),
                    interpret=self.interpret, ncodes=self._ncodes(),
                )
            else:
                S = np.asarray(self.cfg.matrix).astype(np.int32)
                best, bestd = _call_strips_profile(
                    *args,
                    worst=int(S.min()), best_sub=int(S.max()),
                    gap=int(self.cfg.gap_penalty),
                    interpret=self.interpret, ncodes=self._ncodes(),
                )
            strip_s = (
                STRIP_S_PA
                if (self.cfg.is_affine and not self.cfg.is_uniform)
                else STRIP_S
            )
            score, i, j = _reduce_best_strips(
                best, bestd, None, None, strip_s=strip_s
            )
            return {"score": score[:B0], "i": i[:B0], "j": j[:B0]}
        if self.cfg.is_affine and self.cfg.is_uniform:
            best, bestd = _call_uniform_affine(
                *args,
                match=int(self.cfg.match), mismatch=int(self.cfg.mismatch),
                gap=int(self.cfg.gap_penalty), gopen=int(self.cfg.gap_open),
                interpret=self.interpret, track_pos=need_pos,
            )
        elif self.cfg.is_affine:
            S = np.asarray(self.cfg.matrix).astype(np.int32)
            best, bestd = _call_profile_affine(
                *args,
                worst=int(S.min()), best_sub=int(S.max()),
                gap=int(self.cfg.gap_penalty), gopen=int(self.cfg.gap_open),
                interpret=self.interpret, ncodes=self._ncodes(),
            )
        elif self.cfg.is_uniform:
            M, Ny = args[0].shape[0], args[1].shape[0]
            narrow = (
                NARROW_ENABLED
                and int(self.cfg.match) * M <= NARROW_BOUND
                and M + Ny <= NARROW_BOUND
            )
            best, bestd = _call_uniform(
                *args,
                match=int(self.cfg.match), mismatch=int(self.cfg.mismatch),
                gap=int(self.cfg.gap_penalty), interpret=self.interpret,
                track_pos=need_pos, narrow=narrow,
            )
        else:
            S = np.asarray(self.cfg.matrix).astype(np.int32)
            best, bestd = _call_profile(
                *args, worst=int(S.min()),
                best_sub=int(S.max()),
                gap=int(self.cfg.gap_penalty), interpret=self.interpret,
                ncodes=self._ncodes(),
            )
        if not need_pos:
            # Score-only kernels don't track argmax; i/j are not meaningful.
            score = jnp.max(best, axis=0)
            z = jnp.zeros_like(score)
            return {"score": score[:B0], "i": z[:B0], "j": z[:B0]}
        score, i, j = _reduce_best(best, bestd)
        return {"score": score[:B0], "i": i[:B0], "j": j[:B0]}

    def score_repeated(self, prep, K: int):
        """K back-to-back kernel executions in ONE device dispatch (see
        _make_repeat): the on-device benchmarking loop, covering all eight
        kernel families (uniform/profile x linear/affine x single/strips).
        Returns a scalar device array whose value depends on every
        iteration (fetch it to sync). prep should be device-resident
        (prepare(..., device=True)) so no host transfer is timed."""
        args = prep["args"]
        strips = bool(prep.get("strips"))
        if self.cfg.is_uniform:
            kw = dict(match=int(self.cfg.match),
                      mismatch=int(self.cfg.mismatch),
                      gap=int(self.cfg.gap_penalty),
                      interpret=self.interpret)
            if self.cfg.is_affine:
                fn = _call_strips_affine if strips else _call_uniform_affine
                return _repeat_call(fn, *args, K,
                                    gopen=int(self.cfg.gap_open), **kw)
            fn = _call_strips if strips else _call_uniform
            return _repeat_call(fn, *args, K, **kw)
        if args[0].ndim == 2:
            plut, elut = self._lut()
            args = [_profile_gather(args[0], plut), _encode_y(args[1], elut)]
        S = np.asarray(self.cfg.matrix).astype(np.int32)
        kw = dict(worst=int(S.min()), best_sub=int(S.max()),
                  gap=int(self.cfg.gap_penalty), interpret=self.interpret,
                  ncodes=self._ncodes())
        if self.cfg.is_affine:
            fn = (_call_strips_profile_affine if strips
                  else _call_profile_affine)
            return _repeat_call(fn, *args, K,
                                gopen=int(self.cfg.gap_open), **kw)
        fn = _call_strips_profile if strips else _call_profile
        return _repeat_call(fn, *args, K, **kw)
