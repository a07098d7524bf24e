#!/usr/bin/env python
"""Probe: strip-kernel GCUPS via the ON-DEVICE repeat loop.

The long-read (solve_big) strip kernels were previously priced only by
host-side estimators (~180-210 GCUPS e2e/marginal at 10 kb x 21 kb,
tunnel-RTT-sensitive). This probe times them with score_repeated —
K kernel iterations in one dispatch, RTT cancelling exactly in
t(K2) - t(K1) — for the uniform linear and affine strip kernels at the
sw_solve_big workload shape (src/sw_solve_big.cpp:82-88 methodology).

Usage: python benchmarks/probe_strips_repeat.py [--m 10000 --n 21000 -B 128]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=10000)
    ap.add_argument("--n", type=int, default=21000)
    ap.add_argument("-B", type=int, default=128)
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine
    from parallel_genomeseq_tpu.utils.config import ScoringConfig
    from parallel_genomeseq_tpu.utils.platform import setup_cache

    setup_cache()
    rng = np.random.default_rng(9)
    dna = np.frombuffer(b"ACGT", np.uint8)
    B, M, N = args.B, args.m, args.n
    xs = rng.choice(dna, (B, M)).astype(np.uint8)
    ys = rng.choice(dna, (B, N)).astype(np.uint8)
    ys[0, 500 : 500 + M] = xs[0]  # planted containment sanity
    m = np.full(B, M, np.int32)
    n = np.full(B, N, np.int32)
    cells = M * N * B

    for label, cfg in (
        ("strips linear", ScoringConfig()),
        ("strips affine 4/1",
         ScoringConfig(match=3.0, mismatch=-3.0, gap_penalty=1.0,
                       gap_open=4.0)),
    ):
        eng = PallasEngine(cfg)
        res = eng.score_batch(xs, ys, m, n)  # first-batch oracle gate
        assert int(np.asarray(res["score"])[0]) == 3 * M, "planted hit"
        prep = eng.prepare(xs, ys, m, n, device=True)
        for K in (args.k1, args.k2):  # warm (compile both programs)
            np.asarray(eng.score_repeated(prep, K))
        t1 = t2 = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(eng.score_repeated(prep, args.k1))
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(eng.score_repeated(prep, args.k2))
            t2 = min(t2, time.perf_counter() - t0)
        gcups = cells * (args.k2 - args.k1) / (t2 - t1) / 1e9
        print(f"{label}: {gcups:.1f} GCUPS on-device "
              f"({M}x{N} B={B}, K={args.k1}/{args.k2})", flush=True)


if __name__ == "__main__":
    main()
