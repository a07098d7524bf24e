#!/usr/bin/env python
"""Probe: can the MXU replace the packed select-tree profile scorer?
(VERDICT r4 item 4: "attempt an MXU-shaped profile scorer".)

The profile kernels are bound at ~91 GCUPS (on-device repeat estimate) by
the per-lane select tree over 7 packed word planes
(probe_small_alphabet.py: a 2-word alphabet hits 199.5). The untried
structural alternative: score via matmul — one-hot(y-code) contracted
against the (M, A) query profile on the MXU.

Two measured stages, both with RTT-cancelling differencing:

  A. mxu_score:  per KD-diagonal block, build one-hot(codes) (A, KD*LANE)
                 in bf16 and run Px (M, A) @ OH on the MXU, per lane
                 block. Output is COLUMN-ALIGNED (per y char, all query
                 rows). Rate from differencing two N sizes (same program
                 family, min-over-repeats interleaved).
  B. baseline:   the production packed-profile kernel via
                 PallasEngine.score_repeated (on-device K-repeat loop) at
                 the UNIPROT workload shape — the number to beat.

How to read the result: stage A is an UPPER BOUND on an MXU scorer that
assumes diagonal delivery is free. It is not: the wavefront consumes
scores DIAGONALLY, and the shift-window trick that delivers y CODES
diagonally for free cannot carry scores (scores are row-dependent —
Px[i, .] shifted from row i-1 is wrong for row i), so an MXU scorer must
shear its column-aligned output, and a (rows, ring) barrel shear costs
O(ring/8) vector ops per produced cell (~10x the select tree). If stage
A does not decisively beat stage B even with free delivery, the MXU
reformulation is a measured dead end.

Reference hook: the reference's fast path cannot do matrix scoring at
all (src/aligner/similaritymatrix.cpp:389-392).
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def _min_time(fn, repeats=8):
    fn()  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main(M=144, B=5120, A=32, KD=32, N1=512, N2=2048, repeats=10):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_protein_inputs, kernel_estimate, kernel_repeat_estimate
    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import LANE, PallasEngine
    from parallel_genomeseq_tpu.utils.platform import setup_cache

    setup_cache()
    rng = np.random.default_rng(5)

    # ---- A. MXU matmul scorer (column-aligned output) ------------------
    # Px[i, a] = biased score of query row i vs code a. bf16 is exact for
    # the 0..255 biased BLOSUM span, and one-hot contractions have exactly
    # one nonzero term per output, so no rounding anywhere.
    px = rng.integers(0, 14, (M, A)).astype(np.float32)

    def make_mxu(N):
        nblk = N // KD

        def kernel(px_ref, codes_ref, out_ref, acc_s):
            o = pl.program_id(1)

            @pl.when(o == 0)
            def _():
                acc_s[:] = jnp.zeros_like(acc_s)

            base = pl.multiple_of(o * KD, KD)
            blk = codes_ref[pl.ds(base, KD), :]  # (KD, LANE) int32
            flat = blk.reshape(1, KD * LANE)
            oh = (flat == jax.lax.broadcasted_iota(
                jnp.int32, (A, KD * LANE), 0)).astype(jnp.bfloat16)
            sc = jnp.dot(px_ref[:].astype(jnp.bfloat16), oh,
                         preferred_element_type=jnp.float32)  # (M, KD*LANE)
            acc_s[:] = jnp.maximum(
                acc_s[:], jnp.max(sc.reshape(M, KD, LANE), axis=0))

            @pl.when(o == nblk - 1)
            def _():
                out_ref[:] = acc_s[:]

        f = pl.pallas_call(
            kernel,
            grid=(B // LANE, nblk),
            in_specs=[
                pl.BlockSpec((M, A), lambda b, o: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, LANE), lambda b, o: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((KD, LANE), lambda b, o: (0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((KD, B), jnp.float32),
            scratch_shapes=[pltpu.VMEM((KD, LANE), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * A * N * B,
                bytes_accessed=M * A * 4 + N * B * 4, transcendentals=0,
            ),
        )
        return jax.jit(lambda p, c: f(p, c))

    codes1 = rng.integers(1, 26, (N1, B)).astype(np.int32)
    codes2 = rng.integers(1, 26, (N2, B)).astype(np.int32)
    f1, f2 = make_mxu(N1), make_mxu(N2)
    px_d = jax.device_put(px)
    c1_d, c2_d = jax.device_put(codes1), jax.device_put(codes2)
    np.asarray(f1(px_d, c1_d))
    np.asarray(f2(px_d, c2_d))
    t1 = t2 = float("inf")
    for _ in range(repeats):  # interleaved min-timing (RTT is additive)
        t0 = time.perf_counter()
        np.asarray(f1(px_d, c1_d))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(px_d, c2_d))
        t2 = min(t2, time.perf_counter() - t0)
    dcells = M * (N2 - N1) * B
    rate_a = dcells / (t2 - t1)
    print(f"A. mxu_score  (col-aligned, N-differenced): "
          f"{rate_a/1e9:7.1f} Gcells/s "
          f"({2*A*rate_a/1e12:.1f} TFLOP/s bf16 effective)")

    # ---- B. production packed select-tree kernel (the number to beat) --
    cfg = blosum_config("blosum50", gap_penalty=2.0)
    eng = PallasEngine(cfg)
    _, _, prep_b, c_big = kernel_estimate(eng, builder=build_protein_inputs)
    rate_b = kernel_repeat_estimate(eng, prep_b, c_big) * 1e9
    print(f"B. production profile kernel (on-device repeat): "
          f"{rate_b/1e9:7.1f} Gcells/s")
    print(f"A/B ratio: {rate_a/rate_b:.2f}x — stage A assumes FREE diagonal "
          "delivery; the shear an MXU scorer actually needs costs ~10x the "
          "select tree (module docstring). Verdict: "
          + ("MXU scoring does not even win with free delivery — dead end."
             if rate_a < 1.3 * rate_b else
             "MXU scoring wins with free delivery; the shear remains the "
             "blocker — a full kernel would need a structurally different "
             "(column-DP / Farrar-style lazy-F) formulation."))


if __name__ == "__main__":
    main()
