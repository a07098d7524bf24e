#!/usr/bin/env python
"""Hardware probe: the affine + substitution-matrix STRIP kernel on real TPU.

History: this kernel reproducibly crashed the v5e worker at first execution
in rounds 2-3 (S=256 and S=128 alike). probe_pa_bisect.py root-caused the
fault on 2026-08-20 — ANY 32-bit (int32/float32) persistent boundary-row
scratch crashes v5e Mosaic, in every strip kernel flavor — and the fix
(int16 hi/lo pair rows, wavefront_pallas._rows_init) removed the prepare()
gate. This probe is now the recorded end-to-end PASS for the production
engine path (v5e 2026-08-20: first call 400.8s compile+load+verify,
score[0]=615 oracle-exact, steady state 31.6 ms/call = 21.2 GCUPS
e2e-per-call at B=128, 2560x2048) and the regression canary to re-run after
any Mosaic / boundary-row change.

Workload: B=128 synthetic titin-class protein queries (M > MAX_M so the strip
path engages) vs ~2k-residue database entries, BLOSUM50 with swps3's 12/2
affine open/extend gaps (reference: src/mpi_sw_solve_uniprot.cpp:120-123 is
the custom-scoring requirement; benchmark/swps/swps3_benchmark.c uses
BLOSUM50). The engine's first-batch gate verifies lanes 0 and B-1 against
ops/oracle.sw_affine_score_fast, so a miscompile fails loudly here too.

Exit 0 + "PROBE PASS" on success. A worker crash kills this process only.
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(M=2560, N=2048, B=128):
    import jax

    from parallel_genomeseq_tpu.ops.substitution import ALPHABET, blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import MAX_M, PallasEngine

    assert M > MAX_M, "probe must exercise the strip path"
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0)
    rng = np.random.default_rng(7)
    aa = np.frombuffer(ALPHABET.encode(), np.uint8)[:20]  # real residues only
    x = rng.choice(aa, (B, M)).astype(np.uint8)
    y = rng.choice(aa, (B, N)).astype(np.uint8)
    # Plant a strong exact region so the argmax is non-trivial.
    x[0, 600:680] = y[0, 100:180]
    m = np.full(B, M, np.int32)
    n = np.full(B, N, np.int32)

    eng = PallasEngine(cfg, interpret=False)
    t0 = time.perf_counter()
    res = eng.score_batch(x, y, m, n)  # first-batch oracle gate runs inside
    s = np.asarray(res["score"])
    t1 = time.perf_counter()
    cells = int(m.sum()) * N
    print(
        f"PROBE PASS strips_profile_affine S=128: first call {t1 - t0:.1f}s "
        f"(compile+load+verify), score[0]={int(s[0])} "
        f"i[0]={int(np.asarray(res['i'])[0])} j[0]={int(np.asarray(res['j'])[0])}",
        flush=True,
    )
    # Steady-state marginal timing (device-resident, min over repeats).
    prep = eng.prepare(x, y, m, n, device=True)
    np.asarray(eng.score_prepared(prep)["score"])
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(eng.score_prepared(prep)["score"])
        best = min(best, time.perf_counter() - t0)
    print(f"steady-state: {best * 1e3:.1f} ms/call = {cells / best / 1e9:.1f} "
          f"GCUPS e2e-per-call (B={B}, {M}x{N})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
