#!/usr/bin/env python
"""Phase-level profile of the e2e traceback path at B=512 vs B=1024.

Round-2 left open: reads/s peaks at B=512 (5,344) and REGRESSES at B=1024
(~4,500) on the data_small workload. This probe isolates the three device
phases at steady state (everything compiled + loaded):

  sweep  = score_batch_moves (Pallas wavefront + (D, M, B) move tensor)
  walk   = walk_moves (jitted fixed-trip device walk over the move tensor)
  fetch  = one batched jax.device_get of (score, i, j, pos, cx, cy, steps)

Each phase is timed with a hard sync (np.asarray of a scalar output) and
min-over-repeats, per batch size. Whatever phase scales super-linearly
from 512 -> 1024 is the regression.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(sizes=(512, 1024, 2048), repeats=5):
    import jax

    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops.traceback import walk_moves
    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta
    from parallel_genomeseq_tpu.seqio.readers import read_ground_truth
    from parallel_genomeseq_tpu.utils.encoding import X_PAD, Y_PAD, batch_pad, to_bytes

    print(f"backend={jax.default_backend()}", flush=True)
    ref = read_fasta("/root/reference/data/data_small/genome.chr22.5K.fa")
    rows = read_ground_truth("/root/reference/data/data_small_ground_truth.csv")
    eng = PallasEngine()
    yb = to_bytes(ref)

    for B in sizes:
        reads = [to_bytes(rows[k % len(rows)]["SEQ"]) for k in range(B)]
        M = 128
        N = ((len(yb) + 127) // 128) * 128
        xs = batch_pad(reads, M, X_PAD)
        ys = np.broadcast_to(
            np.concatenate([yb, np.full(N - len(yb), Y_PAD, np.uint8)])[None],
            (B, N),
        ).copy()
        m = np.array([len(r) for r in reads], np.int32)
        n = np.full(B, len(yb), np.int32)
        max_steps = min(int(M + 3 * M / 2) + 8, M + N + 1)

        # Warm up all programs (pays the per-process load tax).
        res = eng.score_batch_moves(xs, ys, m, n)
        Bp, Mp = res["moves"].shape[2], res["moves"].shape[1]
        xs_w = np.full((Bp, Mp), X_PAD, np.uint8)
        xs_w[:B, :M] = xs
        ys_w = np.full((Bp, N), Y_PAD, np.uint8)
        ys_w[:B] = ys
        xs_wT = np.ascontiguousarray(xs_w.T)
        out = walk_moves(res["moves"], xs_wT, ys_w, res["i"], res["j"],
                         max_steps=max_steps)
        jax.device_get(out)

        t_sweep = t_walk = t_fetch = t_all = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            res = eng.score_batch_moves(xs, ys, m, n)
            np.asarray(res["score"])  # sync (moves stays on device)
            t1 = time.perf_counter()
            out = walk_moves(res["moves"], xs_wT, ys_w, res["i"], res["j"],
                             max_steps=max_steps)
            np.asarray(out[0])  # sync pos
            t2 = time.perf_counter()
            fetched = jax.device_get((res["score"], res["i"], res["j"]) + out)
            t3 = time.perf_counter()
            t_sweep = min(t_sweep, t1 - t0)
            t_walk = min(t_walk, t2 - t1)
            t_fetch = min(t_fetch, t3 - t2)

        # Fused async chain (the production fast path): dispatch everything,
        # one blocking fetch at the end.
        for _ in range(repeats):
            t0 = time.perf_counter()
            res = eng.score_batch_moves(xs, ys, m, n)
            out = walk_moves(res["moves"], xs_wT, ys_w, res["i"], res["j"],
                             max_steps=max_steps)
            jax.device_get((res["score"], res["i"], res["j"]) + out)
            t_all = min(t_all, time.perf_counter() - t0)

        moves_mb = res["moves"].size / 1e6
        print(
            f"B={B:5d} moves={moves_mb:7.1f} MB | sweep {t_sweep*1e3:7.1f} ms"
            f" | walk {t_walk*1e3:7.1f} ms | fetch {t_fetch*1e3:6.1f} ms"
            f" | fused {t_all*1e3:7.1f} ms -> {B/t_all:6.0f} reads/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(*([int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [])))
