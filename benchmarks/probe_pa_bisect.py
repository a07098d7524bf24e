#!/usr/bin/env python
"""Bisect of the strip-kernel TPU worker crash — CONCLUDED 2026-08-20.

The affine + substitution-matrix strip kernel crashed the v5e worker at
first execution in rounds 2-3 while its parents seemed fine. This probe
built minimal feature-pair kernels between the parents and the crasher and
ran each in an expendable process. Hardware verdicts (v5e, 2026-08-20):

  CRASH  profile_deadf       profile strips + dead 2nd i32 scratch, slot=0
  CRASH  profile_slot0       profile strips, 1x i32 scratch, slot=0, S=128
  CRASH  profile_slotauto    same but packed argmax (slot=4096)
  CRASH  profile_s256        the then-PRODUCTION linear-profile config
                             (S=256, i32 scratch) — latent, never HW-run
  CRASH  profile_f32         float32 scratch instead of int32
  CRASH  affine_i32          uniform affine, 2x i32 scratch (no profile!)
  CRASH  affine_i32_slotauto / affine_i32_s256 / affine_f32 (2x f32)
  CRASH  pa_slotauto / pa_f32 (the combined kernel, i32 / f32 rows)
  PASS   uniform_slot0       uniform strips, i16 scratch, compare argmax
  PASS   profile_outrow      i32 rows via a PERSISTENT OUTPUT block
  PASS   profile_i16pair     rows as int16 hi/lo pair scratches  <- the fix

Root cause: ANY 32-bit (int32 or float32) persistent VMEM scratch buffer
for the boundary rows faults v5e Mosaic at first execution — independent of
scoring mode, slot packing, strip height, or scratch count; int16 scratch
and 32-bit grid-mapped OUTPUTS both work. Not a VMEM overrun (disproven
round 3: ~5 MB at S=128 still crashed). Production fix: boundary rows ride
int16 hi/lo pairs (v = hi * 2**15 + lo — _rows_init/_rows_load/_rows_store
in ops/wavefront_pallas.py), exact for |v| < 2**30; the prepare() gate is
removed. The crashing variants keep probe-local kernels with a single
32-bit scratch so the fault stays reproducible on future Mosaic versions.

Usage: `python probe_pa_bisect.py <variant>` (expendable process) or `all`
(subprocess per variant, prints a table). PGS_PROBE_INTERPRET=1 validates
every variant's numerics on CPU. Every variant oracle-checks its scores,
so a silent miscompile also fails loudly.

Reference requirement behind the kernel: titin-class queries with BLOSUM +
open/extend gaps, src/mpi_sw_solve_uniprot.cpp:120-123.
"""

import functools
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# PGS_PROBE_INTERPRET=1: run every variant in Pallas interpret mode on CPU —
# validates the probe kernels' numerics without hardware (the crash itself
# only reproduces on the real chip).
INTERP = os.environ.get("PGS_PROBE_INTERPRET") == "1"


def _build_inputs(M, N, B, affine):
    from parallel_genomeseq_tpu.ops.substitution import ALPHABET, blosum_config

    cfg = blosum_config(
        "blosum50", gap_penalty=2.0, gap_open=10.0 if affine else 0.0
    )
    rng = np.random.default_rng(7)
    aa = np.frombuffer(ALPHABET.encode(), np.uint8)[:20]
    x = rng.choice(aa, (B, M)).astype(np.uint8)
    y = rng.choice(aa, (B, N)).astype(np.uint8)
    x[0, 600:680] = y[0, 100:180]  # planted region: non-trivial argmax
    return cfg, x, y


def _oracle_check(cfg, x, y, score, lanes=(0, 1, 127)):
    from parallel_genomeseq_tpu.ops.oracle import (
        sw_affine_score_fast,
        sw_score_fast,
    )

    fast = sw_affine_score_fast if cfg.is_affine else sw_score_fast
    for b in lanes:
        want = fast(x[b], y[b], cfg)[0]
        got = int(score[b])
        assert got == want, f"lane {b}: kernel {got} != oracle {want}"


def _prep(cfg, x, y, S):
    """Pad to strip layout and build the packed profile + y codes on host
    (probe-local; mirrors PallasEngine.prepare's strip branch)."""
    import jax.numpy as jnp

    from parallel_genomeseq_tpu.ops.substitution import ALPHABET
    from parallel_genomeseq_tpu.ops.wavefront_pallas import (
        UNROLL,
        _packed_luts,
        _round_up,
    )

    B0, M0 = x.shape
    N0 = y.shape[1]
    M = _round_up(max(M0, S), S)
    Ny = _round_up(max(N0, 8) + S + 2 * UNROLL, UNROLL)
    B = _round_up(max(B0, 128), 128)
    xs = np.full((M, B), 1, np.uint8)
    xs[:M0, :B0] = x.T
    ys = np.full((Ny, B), 2, np.uint8)
    ys[:N0, :B0] = y.T
    plut, elut = _packed_luts(np.asarray(cfg.matrix), ALPHABET.encode())
    pprof = jnp.transpose(jnp.asarray(plut)[xs.astype(np.int32)], (2, 0, 1))
    ycodes = jnp.asarray(elut)[ys.astype(np.int32)]
    return pprof, ycodes, M, Ny, B


def _reduce(best, bestd, m, n, S, B0):
    from parallel_genomeseq_tpu.ops.wavefront_pallas import _reduce_best_strips

    score, i, j = _reduce_best_strips(best, bestd, m, n, strip_s=S)
    return np.asarray(score)[:B0]


def variant_profile_deadf(M=2560, N=2048, B=128, S=128):
    """Packed-profile LINEAR strip kernel + one EXTRA dead int32 scratch."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import parallel_genomeseq_tpu.ops.wavefront_pallas as wp

    cfg, x, y = _build_inputs(M, N, B, affine=False)
    pprof, ycodes, Mp, Ny, Bp = _prep(cfg, x, y, S)
    worst = int(np.asarray(cfg.matrix).min())
    gap = int(cfg.gap_penalty)
    nstrips = Mp // S
    nblk = Ny // wp.UNROLL
    Nlr = Ny + 4 * wp.UNROLL

    def kernel(pprof_ref, y_ref, best_ref, bestd_ref, lastrow_ref, dead_ref):
        # Touch the dead scratch exactly as the crasher touches flastrow at
        # init, then never again: isolates "second int32 scratch present".
        @pl.when(pl.program_id(1) == 0)
        def _():
            dead_ref[:] = jnp.full_like(dead_ref, -13)

        sow, shape = wp._packed_sow(pprof_ref, worst, 0)
        wp._strips_body(sow, shape, y_ref, best_ref, bestd_ref, None,
                        lastrow_ref, nblk=nblk, gap=gap, slot=0)

    best, bestd = pl.pallas_call(
        kernel,
        grid=(Bp // 128, nstrips),
        in_specs=[
            pl.BlockSpec((wp.PROF_WORDS, S, 128), lambda b, s: (0, s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, 128), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, 128), jnp.int32),
            pltpu.VMEM((Nlr, 128), jnp.int32),  # dead F-sized scratch
        ],
        interpret=INTERP,
    )(pprof, ycodes)
    m = np.full(Bp, M, np.int32)
    n = np.full(Bp, N, np.int32)
    score = _reduce(best, bestd, m, n, S, B)
    _oracle_check(cfg, x, y, score)
    return score


def _profile_linear_strips(M, N, B, S, slot_mode, sdt=None):
    """Packed-profile LINEAR strip kernel, parameterized by slot mode."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import parallel_genomeseq_tpu.ops.wavefront_pallas as wp

    cfg, x, y = _build_inputs(M, N, B, affine=False)
    pprof, ycodes, Mp, Ny, Bp = _prep(cfg, x, y, S)
    worst = int(np.asarray(cfg.matrix).min())
    gap = int(cfg.gap_penalty)
    nstrips = Mp // S
    nblk = Ny // wp.UNROLL
    Nlr = Ny + 4 * wp.UNROLL
    best_sub = int(np.asarray(cfg.matrix).max())
    slot = 0 if slot_mode == 0 else wp._pick_slot(nblk * wp.UNROLL,
                                                  best_sub * Mp)
    print(f"slot={slot}", flush=True)

    # Probe-local kernel with a SINGLE boundary-row scratch of dtype sdt
    # (the production kernel now carries int16 hi/lo pairs; this variant
    # preserves the single-32-bit-scratch configuration under test).
    def kernel(pprof_ref, y_ref, best_ref, bestd_ref, lastrow_ref):
        sow, shape = wp._packed_sow(pprof_ref, worst, slot)
        wp._strips_body(sow, shape, y_ref, best_ref, bestd_ref, None,
                        lastrow_ref, nblk=nblk, gap=gap, slot=slot)
    best, bestd = pl.pallas_call(
        kernel,
        grid=(Bp // 128, nstrips),
        in_specs=[
            pl.BlockSpec((wp.PROF_WORDS, S, 128), lambda b, s: (0, s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, 128), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((Nlr, 128), sdt or jnp.int32)],
        interpret=INTERP,
    )(pprof, ycodes)
    m = np.full(Bp, M, np.int32)
    n = np.full(Bp, N, np.int32)
    score = _reduce(best, bestd, m, n, S, B)
    _oracle_check(cfg, x, y, score)
    return score


def variant_affine_i32(M=2560, N=2048, B=128, S=128, slot_mode=0, sdt=None):
    """Uniform AFFINE strip kernel with INT32 boundary scratches (the
    crasher's scratch dtype/count, no profile blocks)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import parallel_genomeseq_tpu.ops.wavefront_pallas as wp
    from parallel_genomeseq_tpu.utils.config import ScoringConfig

    cfg = ScoringConfig(match=3.0, mismatch=-1.0, gap_penalty=2.0, gap_open=10.0)
    rng = np.random.default_rng(7)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    x = rng.choice(acgt, (B, M)).astype(np.uint8)
    y = rng.choice(acgt, (B, N)).astype(np.uint8)
    x[0, 600:680] = y[0, 100:180]

    B0, M0 = x.shape
    N0 = y.shape[1]
    Mp = wp._round_up(max(M0, S), S)
    Ny = wp._round_up(max(N0, 8) + S + 2 * wp.UNROLL, wp.UNROLL)
    Bp = wp._round_up(max(B0, 128), 128)
    xs = np.full((Mp, Bp), 1, np.uint8)
    xs[:M0, :B0] = x.T
    ys = np.full((Ny, Bp), 2, np.uint8)
    ys[:N0, :B0] = y.T
    nstrips = Mp // S
    nblk = Ny // wp.UNROLL
    Nlr = Ny + 4 * wp.UNROLL
    slot = 0 if slot_mode == 0 else wp._pick_slot(nblk * wp.UNROLL,
                                                  int(cfg.match) * Mp)
    print(f"slot={slot}", flush=True)
    kernel = functools.partial(
        wp._kernel_strips_affine, nblk=nblk, match=int(cfg.match),
        mismatch=int(cfg.mismatch), gap=int(cfg.gap_penalty),
        gopen=int(cfg.gap_open), slot=slot,
    )
    best, bestd = pl.pallas_call(
        kernel,
        grid=(Bp // 128, nstrips),
        in_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, 128), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, 128), sdt or jnp.int32),  # H rows (crasher: i32)
            pltpu.VMEM((Nlr, 128), sdt or jnp.int32),  # F rows
        ],
        interpret=INTERP,
    )(xs, ys)
    m = np.full(Bp, M, np.int32)
    n = np.full(Bp, N, np.int32)
    score = _reduce(best, bestd, m, n, S, B)
    _oracle_check(cfg, x, y, score)
    return score


def variant_profile_affine(M=2560, N=2048, B=128):
    """The real combined kernel through the production engine path —
    crashed with 32-bit boundary rows, passes with the int16-pair fix."""
    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

    cfg, x, y = _build_inputs(M, N, B, affine=True)
    m = np.full(B, M, np.int32)
    n = np.full(B, N, np.int32)
    eng = PallasEngine(cfg, interpret=INTERP)
    res = eng.score_batch(x, y, m, n)  # first-batch oracle gate runs inside
    score = np.asarray(res["score"])
    _oracle_check(cfg, x, y, score)
    return score


def variant_uniform_slot0(M=2560, N=2048, B=128, S=256):
    """Uniform LINEAR strip kernel (the proven-on-hardware DNA kernel's
    exact configuration: S=256, int16 boundary rows) with ONLY slot forced
    to 0 — the minimal candidate repro if the compare-based argmax is the
    fault."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import parallel_genomeseq_tpu.ops.wavefront_pallas as wp
    from parallel_genomeseq_tpu.utils.config import ScoringConfig

    cfg = ScoringConfig(match=3.0, mismatch=-1.0, gap_penalty=2.0)
    rng = np.random.default_rng(7)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    x = rng.choice(acgt, (B, M)).astype(np.uint8)
    y = rng.choice(acgt, (B, N)).astype(np.uint8)
    x[0, 600:680] = y[0, 100:180]
    B0, M0 = x.shape
    N0 = y.shape[1]
    Mp = wp._round_up(max(M0, S), S)
    Ny = wp._round_up(max(N0, 8) + S + 2 * wp.UNROLL, wp.UNROLL)
    Bp = wp._round_up(max(B0, 128), 128)
    xs = np.full((Mp, Bp), 1, np.uint8)
    xs[:M0, :B0] = x.T
    ys = np.full((Ny, Bp), 2, np.uint8)
    ys[:N0, :B0] = y.T
    nstrips = Mp // S
    nblk = Ny // wp.UNROLL
    Nlr = Ny + 4 * wp.UNROLL
    kernel = functools.partial(
        wp._kernel_strips, nblk=nblk, match=int(cfg.match),
        mismatch=int(cfg.mismatch), gap=int(cfg.gap_penalty), slot=0,
    )
    best, bestd = pl.pallas_call(
        kernel,
        grid=(Bp // 128, nstrips),
        in_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, 128), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((Nlr, 128), jnp.int16)],
        interpret=INTERP,
    )(xs, ys)
    m = np.full(Bp, M, np.int32)
    n = np.full(Bp, N, np.int32)
    score = _reduce(best, bestd, m, n, S, B)
    _oracle_check(cfg, x, y, score)
    return score


def variant_pa_slotauto(M=2560, N=2048, B=128, S=128, sdt=None):
    """The combined profile-affine strip kernel with the packed argmax
    (slot > 0) instead of the hardcoded slot=0 of
    _call_strips_profile_affine — the candidate FIX if slot=0 is the
    fault."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import parallel_genomeseq_tpu.ops.wavefront_pallas as wp

    cfg, x, y = _build_inputs(M, N, B, affine=True)
    pprof, ycodes, Mp, Ny, Bp = _prep(cfg, x, y, S)
    worst = int(np.asarray(cfg.matrix).min())
    best_sub = int(np.asarray(cfg.matrix).max())
    nstrips = Mp // S
    nblk = Ny // wp.UNROLL
    Nlr = Ny + 4 * wp.UNROLL
    slot = wp._pick_slot(nblk * wp.UNROLL, best_sub * Mp)
    assert slot, "shape too large for packed argmax in this probe"
    print(f"slot={slot}", flush=True)
    gp, go = int(cfg.gap_penalty), int(cfg.gap_open)

    def kernel(pprof_ref, y_ref, best_ref, bestd_ref, lr_ref, flr_ref):
        sow, shape = wp._packed_sow(pprof_ref, worst, slot)
        wp._strips_body(sow, shape, y_ref, best_ref, bestd_ref, None,
                        lr_ref, nblk=nblk, gap=gp, slot=slot, gopen=go,
                        flastrow_ref=flr_ref)
    best, bestd = pl.pallas_call(
        kernel,
        grid=(Bp // 128, nstrips),
        in_specs=[
            pl.BlockSpec((wp.PROF_WORDS, S, 128), lambda b, s: (0, s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, 128), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, 128), sdt or jnp.int32),
            pltpu.VMEM((Nlr, 128), sdt or jnp.int32),
        ],
        interpret=INTERP,
    )(pprof, ycodes)
    m = np.full(Bp, M, np.int32)
    n = np.full(Bp, N, np.int32)
    score = _reduce(best, bestd, m, n, S, B)
    _oracle_check(cfg, x, y, score)
    return score


def variant_profile_slot0(**kw):
    return _profile_linear_strips(2560, 2048, 128, 128, slot_mode=0)


def variant_profile_slotauto(**kw):
    return _profile_linear_strips(2560, 2048, 128, 128, slot_mode="auto")


def variant_affine_i32_slotauto(**kw):
    return variant_affine_i32(slot_mode="auto")


def variant_profile_outrow(M=2560, N=2048, B=128, S=256, **kw):
    """Candidate fix A: int32 boundary rows in a PERSISTENT OUTPUT block
    (constant index map) instead of a VMEM scratch — 32-bit grid-mapped
    outputs (best/bestd) work on every kernel, so the fault may be specific
    to 32-bit scratch_shapes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import parallel_genomeseq_tpu.ops.wavefront_pallas as wp

    cfg, x, y = _build_inputs(M, N, B, affine=False)
    pprof, ycodes, Mp, Ny, Bp = _prep(cfg, x, y, S)
    worst = int(np.asarray(cfg.matrix).min())
    gap = int(cfg.gap_penalty)
    nstrips = Mp // S
    nblk = Ny // wp.UNROLL
    Nlr = Ny + 4 * wp.UNROLL
    best_sub = int(np.asarray(cfg.matrix).max())
    slot = wp._pick_slot(nblk * wp.UNROLL, best_sub * Mp)
    print(f"slot={slot}", flush=True)

    def kernel(pprof_ref, y_ref, best_ref, bestd_ref, lastrow_ref):
        sow, shape = wp._packed_sow(pprof_ref, worst, slot)
        wp._strips_body(sow, shape, y_ref, best_ref, bestd_ref, None,
                        lastrow_ref.at[0], nblk=nblk, gap=gap, slot=slot)

    best, bestd, _rows = pl.pallas_call(
        kernel,
        grid=(Bp // 128, nstrips),
        in_specs=[
            pl.BlockSpec((wp.PROF_WORDS, S, 128), lambda b, s: (0, s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, 128), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nlr, 128), lambda b, s: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Nlr, Bp), jnp.int32),
        ],
        interpret=INTERP,
    )(pprof, ycodes)
    m = np.full(Bp, M, np.int32)
    n = np.full(Bp, N, np.int32)
    score = _reduce(best, bestd, m, n, S, B)
    _oracle_check(cfg, x, y, score)
    return score


def variant_profile_i16pair(M=2560, N=2048, B=128, S=256, **kw):
    """Candidate fix B: the int32 boundary row split into TWO int16 scratch
    planes (v = hi * 2**15 + lo, lo in [0, 2**15)) — recombined in int32
    after load, split before store; every scratch buffer stays 16-bit (the
    dtype every passing strip kernel uses)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import parallel_genomeseq_tpu.ops.wavefront_pallas as wp

    cfg, x, y = _build_inputs(M, N, B, affine=False)
    pprof, ycodes, Mp, Ny, Bp = _prep(cfg, x, y, S)
    worst = int(np.asarray(cfg.matrix).min())
    gap = int(cfg.gap_penalty)
    nstrips = Mp // S
    nblk = Ny // wp.UNROLL
    Nlr = Ny + 4 * wp.UNROLL
    best_sub = int(np.asarray(cfg.matrix).max())
    slot = wp._pick_slot(nblk * wp.UNROLL, best_sub * Mp)
    print(f"slot={slot}", flush=True)

    def kernel(pprof_ref, y_ref, best_ref, bestd_ref, hi_ref, lo_ref):
        sow, shape = wp._packed_sow(pprof_ref, worst, slot)
        wp._strips_body(sow, shape, y_ref, best_ref, bestd_ref, None,
                        (hi_ref, lo_ref), nblk=nblk, gap=gap, slot=slot)

    best, bestd = pl.pallas_call(
        kernel,
        grid=(Bp // 128, nstrips),
        in_specs=[
            pl.BlockSpec((wp.PROF_WORDS, S, 128), lambda b, s: (0, s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, 128), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda b, s: (s, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Mp, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nlr, 128), jnp.int16),
            pltpu.VMEM((Nlr, 128), jnp.int16),
        ],
        interpret=INTERP,
    )(pprof, ycodes)
    m = np.full(Bp, M, np.int32)
    n = np.full(Bp, N, np.int32)
    score = _reduce(best, bestd, m, n, S, B)
    _oracle_check(cfg, x, y, score)
    return score


def variant_affine_i32_s256(**kw):
    # S=256 + dual int32 scratch + packed argmax: separates "S=128" from
    # "int32 scratch" (production affine = same but int16 scratch, passes).
    return variant_affine_i32(S=256, slot_mode="auto")


def variant_profile_s256(**kw):
    # The PRODUCTION linear-profile strips configuration (S=256, int32
    # scratch, auto slot) — never exercised on hardware before this probe.
    return _profile_linear_strips(2560, 2048, 128, 256, slot_mode="auto")


def variant_profile_f32(**kw):
    # Candidate fix: float32 boundary rows (exact for |v| < 2**24).
    import jax.numpy as jnp

    return _profile_linear_strips(2560, 2048, 128, 256, slot_mode="auto",
                                  sdt=jnp.float32)


def variant_affine_f32(**kw):
    import jax.numpy as jnp

    return variant_affine_i32(S=256, slot_mode="auto", sdt=jnp.float32)


def variant_pa_f32(**kw):
    # Candidate FIX for the combined kernel: f32 H/F boundary rows.
    import jax.numpy as jnp

    return variant_pa_slotauto(sdt=jnp.float32)


VARIANTS = {
    "profile_deadf": variant_profile_deadf,
    "profile_slot0": variant_profile_slot0,
    "profile_slotauto": variant_profile_slotauto,
    "affine_i32": variant_affine_i32,
    "affine_i32_slotauto": variant_affine_i32_slotauto,
    "affine_i32_s256": variant_affine_i32_s256,
    "profile_outrow": variant_profile_outrow,
    "profile_i16pair": variant_profile_i16pair,
    "profile_s256": variant_profile_s256,
    "profile_f32": variant_profile_f32,
    "affine_f32": variant_affine_f32,
    "uniform_slot0": variant_uniform_slot0,
    "pa_slotauto": variant_pa_slotauto,
    "pa_f32": variant_pa_f32,
    "profile_affine": variant_profile_affine,
}


def main(argv):
    name = argv[0] if argv else "all"
    if name == "all":
        results = {}
        for v in VARIANTS:
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable, __file__, v],
                capture_output=True, text=True, timeout=1800,
            )
            dt = time.perf_counter() - t0
            ok = r.returncode == 0
            results[v] = ok
            tail = (r.stdout + r.stderr).strip().splitlines()[-1:] or [""]
            print(f"{'PASS' if ok else 'FAIL':4s} {v:16s} ({dt:.0f}s) {tail[0][:120]}",
                  flush=True)
        print("bisect summary:", {v: ("pass" if ok else "FAIL")
                                  for v, ok in results.items()})
        return 0 if all(results.values()) else 1

    import jax

    if INTERP:
        jax.config.update("jax_platforms", "cpu")
    fn = VARIANTS[name]
    print(f"variant={name} backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    score = fn()
    print(f"PROBE PASS {name}: score[0]={int(score[0])} "
          f"({time.perf_counter() - t0:.1f}s incl. compile)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
