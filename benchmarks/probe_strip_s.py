"""Probe: strip-kernel throughput vs STRIP_S and batch size (VERDICT r2 #5).

The strip kernel measured 179.9 GCUPS e2e-per-call at the solve_big winner
shape (10 kb reads x 21 kb windows, B=128) vs 257 for the single-strip
kernel; candidate explanations were per-call RTT amortization (B) and
boundary-row staging overhead per strip crossing (S). This probe sweeps
STRIP_S in {256, 512, 1024} x B in {128, 256} on the real chip, reporting
e2e-per-call GCUPS (first call per config pays the program-load tax and is
excluded via warmup).

STRIP_S is a module global read at trace time; the jit cache is cleared
between configs because M (rounded to a strip multiple) can coincide
across S values.

Usage: timeout 1800 python benchmarks/probe_strip_s.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from parallel_genomeseq_tpu.ops import wavefront_pallas as wp
from parallel_genomeseq_tpu.utils.config import ScoringConfig

M0, N0 = 10_000, 21_000
REPS = 5


def run(S: int, B: int, rng):
    wp.STRIP_S = S
    wp._call_strips.clear_cache()
    eng = wp.PallasEngine(ScoringConfig())
    DNA = np.frombuffer(b"ACGT", np.uint8)
    xs = rng.choice(DNA, size=(B, M0)).astype(np.uint8)
    ys = rng.choice(DNA, size=(B, N0)).astype(np.uint8)
    ys[0, 500 : 500 + M0] = xs[0]  # planted containment, checks the result
    m = np.full(B, M0)
    n = np.full(B, N0)
    prep = eng.prepare(xs, ys, m, n, device=True)
    t0 = time.perf_counter()
    res = eng.score_prepared(prep)
    s0 = np.asarray(res["score"])
    t_first = time.perf_counter() - t0
    assert int(s0[0]) == 3 * M0, (S, B, int(s0[0]))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        res = eng.score_prepared(prep)
        np.asarray(res["score"])  # force full sync through the tunnel
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    gcups = B * M0 * N0 / t / 1e9
    print(
        f"S={S:5d} B={B:4d}: {gcups:7.1f} GCUPS e2e-per-call "
        f"(median of {REPS}, {t*1e3:.1f} ms/call; first call {t_first:.1f}s)",
        flush=True,
    )
    return gcups


def main():
    rng = np.random.default_rng(3)
    out = {}
    for S in (256, 512, 1024):
        for B in (128, 256):
            try:
                out[(S, B)] = run(S, B, rng)
            except Exception as e:  # noqa: BLE001 - probe reports and moves on
                print(f"S={S} B={B}: FAILED {type(e).__name__}: {e}", flush=True)
    best = max(out, key=out.get) if out else None
    if best:
        print(f"best: S={best[0]} B={best[1]} at {out[best]:.1f} GCUPS")


if __name__ == "__main__":
    main()
