#!/usr/bin/env python
"""Phase breakdown of the resident-DB UNIPROT scan (cli/solve_uniprot fast
path): where does the non-kernel time go, per batch size?

Measured on the REAL synthetic SwissProt-scale DB (561k entries), steady
state (pass 2):
  gather   the round-4 FIRST-CUT device path: per-byte XLA gather of the
           (Ny, B) windows from an unpadded flat DB + encode, with the DP
           kernel replaced by a trivial reduction. Kept as the recorded
           evidence for why the slab layout exists: this elementwise
           gather measured 79 of the 86 ms/batch (92%) of the whole scan.
  slab     the shipped path (score_db_slab_jit): host-packed transposed
           per-batch blocks uploaded once, ONE dynamic_slice per batch,
           full packed-profile affine DP kernel included.

Usage: python benchmarks/probe_uniprot_phase.py [B ...]
"""

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DB = "data/uniprot_syn/database.fasta"


def main(bsizes):
    import jax
    import jax.numpy as jnp

    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import (
        UNROLL,
        PallasEngine,
        _round_up,
        score_db_slab_jit,
    )
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta
    from parallel_genomeseq_tpu.seqio.uniprot import iter_database
    from parallel_genomeseq_tpu.utils.encoding import to_bytes
    from parallel_genomeseq_tpu.utils.platform import setup_cache

    setup_cache()
    cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0)
    eng = PallasEngine(cfg)
    plut, elut = eng._lut()
    query = to_bytes(read_fasta("/root/reference/data/query/P02232.fasta"))
    entries = list(iter_database(DB))
    print(f"{len(entries)} entries", flush=True)
    seq_bytes = [to_bytes(e[1]) for e in entries]
    lens_np = np.array([len(s) for s in seq_bytes], np.int32)
    offs_np = np.zeros(len(entries), np.int32)
    np.cumsum(lens_np[:-1], out=offs_np[1:])
    flat_np = np.concatenate(seq_bytes)
    t0 = time.perf_counter()
    flat_dev = jax.device_put(flat_np)
    flat_dev.block_until_ready()
    print(f"upload {flat_np.nbytes/1e6:.0f} MB flat in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    Mq = _round_up(len(query), 8)
    qcol = np.full(Mq, 1, np.uint8)
    qcol[: len(query)] = query
    plut_np = np.asarray(plut)
    pprof_np = np.ascontiguousarray(np.broadcast_to(
        plut_np[qcol.astype(np.int32)].T[:, :, None],
        (plut_np.shape[1], Mq, 128)))
    pprof_dev = jax.device_put(pprof_np)
    Smat = np.asarray(cfg.matrix).astype(np.int32)
    worst, best_sub = int(Smat.min()), int(Smat.max())
    order = sorted(range(len(entries)), key=lambda k: int(lens_np[k]))
    real_cells = int(lens_np.sum()) * len(query)

    @functools.partial(jax.jit, static_argnames=("N",))
    def gather_only(flat_db, offs, lens, *, N):
        B0 = offs.shape[0]
        Ny = _round_up(max(N, 8) + Mq + UNROLL, UNROLL)
        B = _round_up(max(B0, 128), 128)
        offs_p = jnp.zeros((B,), jnp.int32).at[:B0].set(offs)
        lens_p = jnp.zeros((B,), jnp.int32).at[:B0].set(lens)
        t = jnp.arange(Ny, dtype=jnp.int32)[:, None]
        idx = jnp.clip(offs_p[None, :] + t, 0, flat_db.shape[0] - 1)
        vals = flat_db[idx]
        ys = jnp.where(t < lens_p[None, :], vals, np.uint8(2))
        ycodes = jnp.asarray(elut)[ys.astype(jnp.int32)]
        return jnp.sum(ycodes.astype(jnp.int32), axis=0)

    for B in bsizes:
        nb = (len(order) + B - 1) // B
        Bp = _round_up(B, 128)
        offs_mat = np.zeros((nb, B), np.int32)
        lens_mat = np.zeros((nb, Bp), np.int32)
        Ns = np.zeros(nb, np.int32)
        row0s = np.zeros(nb, np.int32)
        r = 0
        for bi in range(nb):
            idxs = order[bi * B : (bi + 1) * B]
            offs_mat[bi, : len(idxs)] = offs_np[idxs]
            for li, k in enumerate(idxs):
                lens_mat[bi, li] = lens_np[k]
            row0s[bi] = r
            Ns[bi] = _round_up(max(int(lens_mat[bi].max()), 1), 512)
            r += int(Ns[bi])
        t0 = time.perf_counter()
        slab = np.full((r + Mq + 3 * UNROLL, Bp), 2, np.uint8)
        for bi in range(nb):
            r0 = int(row0s[bi])
            for li, k in enumerate(order[bi * B : (bi + 1) * B]):
                slab[r0 : r0 + len(seq_bytes[k]), li] = seq_bytes[k]
        slab = np.asarray(elut)[slab.astype(np.int32)]  # host pre-encode
        t_pack = time.perf_counter() - t0
        t0 = time.perf_counter()
        slab_dev = jax.device_put(slab)
        lens_dev = jax.device_put(lens_mat)
        row0_dev = jax.device_put(row0s)
        slab_dev.block_until_ready()
        t_upl = time.perf_counter() - t0
        print(f"B={B}: slab {slab.nbytes/1e6:.0f} MB packed in {t_pack:.1f}s, "
              f"uploaded in {t_upl:.1f}s", flush=True)
        offs_dev = jax.device_put(offs_mat)
        lensB_dev = jax.device_put(lens_mat[:, :B].copy())
        _row = jax.jit(lambda mat, i: jax.lax.dynamic_index_in_dim(
            mat, i, axis=0, keepdims=False))

        for label, fn in (
            ("gather", lambda bi: gather_only(
                flat_dev, _row(offs_dev, bi), _row(lensB_dev, bi),
                N=int(Ns[bi]))),
            ("slab", lambda bi: score_db_slab_jit(
                slab_dev, _row(row0_dev, bi), _row(lens_dev, bi), pprof_dev,
                N=int(Ns[bi]), worst=worst, best_sub=best_sub,
                gap=2, gopen=10, interpret=False)[0]),
        ):
            for p in range(2):  # pass 1 pays program loads, pass 2 measures
                t0 = time.perf_counter()
                outs = [fn(bi) for bi in range(nb)]
                for o in outs:
                    np.asarray(o)
                dt = time.perf_counter() - t0
            print(f"B={B:6d} {label:6s} {dt:6.2f}s  {nb} batches  "
                  f"{dt/nb*1e3:6.1f} ms/batch  {real_cells/dt/1e9:5.2f} GCUPS-real",
                  flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [4096])
