"""Probe: traceback-walk gather formulations on real TPU.

Round-3 phase split at B=1024 measured the lockstep walk at ~71 ms — as
expensive as the whole 640 Mcell sweep. Hypothesis: the per-step
``moves[d, r, lanes]`` advanced-index gather ((B,) elements from a
(D, M, B) operand with per-lane (d, r)) lowers poorly on TPU. This probe
times three formulations of the same 312-step walk:

  a) current: moves[d, r, lanes] on the (D, M, B) layout;
  b) flat take_along_axis: moves laid out (B, D*M) once, per step one
     jnp.take_along_axis(bm, (d*M+r)[:, None], axis=1) batched gather;
  c) b) plus x/y char reads also via take_along_axis.

Usage: timeout 1800 python benchmarks/probe_walk_gather.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp

from parallel_genomeseq_tpu.ops.scan_dp import MOVE_N, MOVE_W, STOP_BIT
from parallel_genomeseq_tpu.ops.traceback import GAP_BYTE, walk_moves


@functools.partial(jax.jit, static_argnames=("max_steps", "M"))
def walk_moves_flat(moves_bf, x_bm, y_bn, i0, j0, *, max_steps: int, M: int):
    """Variant b/c: flat (B, D*M) moves + take_along_axis everywhere."""
    B = moves_bf.shape[0]
    DM = moves_bf.shape[1]
    cx0 = jnp.zeros((max_steps, B), jnp.uint8)
    cy0 = jnp.zeros((max_steps, B), jnp.uint8)

    def body(it, state):
        i, j, pos, active, cx, cy, steps = state
        d = jnp.clip(i + j - 2, 0, DM // M - 1)
        r = jnp.clip(i - 1, 0, M - 1)
        mv = jnp.take_along_axis(moves_bf, (d * M + r)[:, None], axis=1)[:, 0]
        stop = (mv & STOP_BIT) != 0
        code = mv & np.uint8(3)
        xc = jnp.take_along_axis(x_bm, r[:, None], axis=1)[:, 0]
        yc = jnp.take_along_axis(
            y_bn, jnp.clip(j - 1, 0, y_bn.shape[1] - 1)[:, None], axis=1
        )[:, 0]
        go_w = (code == MOVE_W) & ~stop
        go_n = (code == MOVE_N) & ~stop
        emit_x = jnp.where(go_w, GAP_BYTE, xc)
        emit_y = jnp.where(go_n, GAP_BYTE, yc)
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
    state = (
        i0, j0, jnp.zeros_like(i0), i0 > 0, cx0, cy0, jnp.zeros_like(i0),
    )
    _, _, pos, _, cx, cy, steps = jax.lax.fori_loop(0, max_steps, body, state)
    return pos, cx, cy, steps


def main(B=1024, M=128, N=4992, max_steps=312, reps=8):
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta
    from parallel_genomeseq_tpu.seqio.readers import read_ground_truth
    from parallel_genomeseq_tpu.utils.encoding import (
        X_PAD, Y_PAD, batch_pad, to_bytes,
    )
    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

    print(f"backend={jax.default_backend()}", flush=True)
    ref = read_fasta("/root/reference/data/data_small/genome.chr22.5K.fa")
    rows = read_ground_truth("/root/reference/data/data_small_ground_truth.csv")
    reads = ([r["SEQ"] for r in rows] * 2)[:B]
    xb = [to_bytes(r) for r in reads]
    m = np.array([len(v) for v in xb], np.int32)
    n = np.full(B, len(ref), np.int32)
    xs = batch_pad(xb, M, X_PAD)
    ys = batch_pad([to_bytes(ref)] * B, ((N + 127) // 128) * 128, Y_PAD)

    eng = PallasEngine()
    resp = eng.score_batch_moves(xs, ys, m, n)
    moves = resp["moves"]
    D, Mp, Bp = moves.shape
    print(f"moves {moves.shape}", flush=True)
    xs_w = np.full((Bp, Mp), X_PAD, np.uint8)
    xs_w[:B, :M] = xs
    ys_w = np.full((Bp, ys.shape[1]), Y_PAD, np.uint8)
    ys_w[:B] = ys
    x_dev = jax.device_put(np.ascontiguousarray(xs_w.T))
    xbm_dev = jax.device_put(xs_w)
    y_dev = jax.device_put(ys_w)
    i0, j0 = resp["i"], resp["j"]

    # a) current layout
    out_a = walk_moves(moves, x_dev, y_dev, i0, j0, max_steps=max_steps)
    np.asarray(out_a[0])
    t = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out_a = walk_moves(moves, x_dev, y_dev, i0, j0, max_steps=max_steps)
        np.asarray(out_a[0])
        t.append(time.perf_counter() - t0)
    print(f"a) (D,M,B) advanced-index walk: {min(t)*1e3:.1f} ms", flush=True)

    # b) flat layout
    moves_bf = jnp.transpose(moves, (2, 0, 1)).reshape(Bp, D * Mp)
    moves_bf.block_until_ready()
    out_b = walk_moves_flat(
        moves_bf, xbm_dev, y_dev, i0, j0, max_steps=max_steps, M=Mp
    )
    np.asarray(out_b[0])
    t = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out_b = walk_moves_flat(
            moves_bf, xbm_dev, y_dev, i0, j0, max_steps=max_steps, M=Mp
        )
        np.asarray(out_b[0])
        t.append(time.perf_counter() - t0)
    print(f"b) (B,D*M) take_along_axis walk: {min(t)*1e3:.1f} ms", flush=True)
    # include the transpose cost it would add per batch
    t = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mb = jnp.transpose(moves, (2, 0, 1)).reshape(Bp, D * Mp)
        mb.block_until_ready()
        t.append(time.perf_counter() - t0)
    print(f"   transpose cost: {min(t)*1e3:.1f} ms", flush=True)

    for k in ("pos",):
        a = np.asarray(out_a[0])
        b = np.asarray(out_b[0])
        assert (a == b).all(), "pos mismatch"
    assert (np.asarray(out_a[1]) == np.asarray(out_b[1])).all(), "cx mismatch"
    print("outputs identical: PASS", flush=True)


if __name__ == "__main__":
    main()
