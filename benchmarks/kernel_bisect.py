"""Bisect per-step cost of the wavefront kernel by compiling stripped variants."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
M = int(os.environ.get("BM_M", 128)); B = int(os.environ.get("BM_B", 128)); NBLK = int(os.environ.get("BM_NBLK", 640))


def make_kernel(variant: str):
    def kernel(x_ref, y_ref, n_ref, mrow_ref, best_ref, bestd_ref):
        x = x_ref[:].astype(jnp.int32)
        rr = jax.lax.broadcasted_iota(jnp.int32, (M, B), 0)
        row0 = rr == 0
        rowmask = mrow_ref[:] != 0
        n_row = n_ref[0, :][None, :]
        zeros = jnp.zeros((M, B), jnp.int32)

        def outer(o, carry):
            h1, s2, best, bestd, ywin = carry
            if variant == "none":
                for k in range(8):
                    hd = jnp.maximum(jnp.maximum(s2 + 3, h1 - 2), 0)
                    s2 = h1
                    h1 = hd
                return h1, s2, best, bestd, ywin
            if variant == "rollonly":
                for k in range(8):
                    h1 = pltpu.roll(h1, 1, 0)
                return h1, s2, best, bestd, ywin
            if variant == "roll2":
                for k in range(8):
                    h1 = pltpu.roll(h1, 1, 0)
                    ywin = pltpu.roll(ywin, 1, 0)
                return h1, s2, best, bestd, ywin
            base = pl.multiple_of(o * 8, 8)
            blk = y_ref[pl.ds(base, 8), :].astype(jnp.int32)
            for k in range(8):
                d = o * 8 + k
                if variant != "noy":
                    yc = blk[k : k + 1, :]
                    ywin = pltpu.roll(ywin, 1, 0)
                    ywin = jnp.where(row0, yc, ywin)
                if variant == "nosc":
                    sc = jnp.int32(3)
                else:
                    sc = jnp.where(x == ywin, 3, -3)
                if variant == "noroll":
                    s1 = h1
                else:
                    s1 = pltpu.roll(h1, 1, 0)
                    s1 = jnp.where(row0, 0, s1)
                hd = jnp.maximum(
                    jnp.maximum(s2 + sc, h1 - 2), jnp.maximum(s1 - 2, 0)
                )
                if variant not in ("nomask", "minimal"):
                    valid = (rr <= d) & rowmask & (rr >= d + 1 - n_row)
                    hd = jnp.where(valid, hd, 0)
                if variant not in ("nobest", "minimal"):
                    upd = hd > best
                    best = jnp.where(upd, hd, best)
                    bestd = jnp.where(upd, d, bestd)
                s2 = s1
                h1 = hd
            return h1, s2, best, bestd, ywin

        _, _, best, bestd, _ = jax.lax.fori_loop(
            0, NBLK, outer, (zeros, zeros, zeros, zeros, zeros)
        )
        best_ref[:] = best
        bestd_ref[:] = bestd

    return kernel


def run(variant):
    xs = np.random.randint(65, 90, (M, B)).astype(np.uint8)
    ys = np.random.randint(65, 90, (NBLK * 8, B)).astype(np.uint8)
    nn = np.full((1, B), NBLK * 8 - M, np.int32)
    mrow = np.ones((M, B), np.int32)
    spec = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape[:-1]) + (b,), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(variant),
        grid=(1,),
        in_specs=[spec((M, B)), spec((NBLK * 8, B)), spec((1, B)), spec((M, B))],
        out_specs=[spec((M, B)), spec((M, B))],
        out_shape=[jax.ShapeDtypeStruct((M, B), jnp.int32)] * 2,
    )
    f = jax.jit(f)
    t0 = time.time()
    r = f(xs, ys, nn, mrow)
    np.asarray(r[0])
    compile_t = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        r = f(xs, ys, nn, mrow)
        np.asarray(r[0])
        times.append(time.time() - t0)
    dt = min(times)
    print(
        f"{variant:8s} compile {compile_t:5.1f}s  run {dt*1e3:7.2f} ms  "
        f"{dt/ (NBLK*8) * 1e9:7.1f} ns/step", flush=True,
    )


if __name__ == "__main__":
    for v in sys.argv[1:] or ["full", "nobest", "nomask", "minimal", "nosc", "noy", "noroll"]:
        run(v)
