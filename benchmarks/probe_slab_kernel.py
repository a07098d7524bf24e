#!/usr/bin/env python
"""Probe: UNIPROT slab-path kernel marginal GCUPS (+ a recorded dead end).

Measures the affine packed-profile kernel through score_db_slab_group_jit
on a synthetic resident slab at the UNIPROT shape. Marginal GCUPS via
group-size differencing (k=2 vs k=16 scans of identical batches in one
dispatch each — same dispatch overhead, so the delta is pure kernel time).
Oracle-checked on two lanes.

Recorded DEAD END (2026-08-21): a shared-query variant of _packed_sow that
loaded ONE (M, 1) lane column per packed word (every lane shares the query
in the DB scan) and broadcast in the selects measured 48.0 GCUPS real
(~72 padded) — identical to the per-lane-load kernel. The profile kernel's
bound includes the per-lane (M, B) select-tree intermediates, which narrow
loads cannot shrink; only fewer WORDS help (probe_small_alphabet.py:
2 words -> 199.5 GCUPS vs 7 words -> ~76). The variant was reverted.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def main(B=8192, db_len=360, N=512):
    import jax

    from parallel_genomeseq_tpu.ops.oracle import sw_affine_score_fast
    from parallel_genomeseq_tpu.ops.substitution import ALPHABET, blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import (
        PROF_WORDS,
        UNROLL,
        PallasEngine,
        _round_up,
        score_db_slab_group_jit,
    )
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta
    from parallel_genomeseq_tpu.utils.encoding import to_bytes
    from parallel_genomeseq_tpu.utils.platform import setup_cache

    setup_cache()
    cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0)
    eng = PallasEngine(cfg)
    plut, elut = eng._lut()
    plut_np, elut_np = np.asarray(plut), np.asarray(elut)
    query = to_bytes(read_fasta("/root/reference/data/query/P02232.fasta"))
    Mq = _round_up(len(query), 8)
    qcol = np.full(Mq, 1, np.uint8)
    qcol[: len(query)] = query
    pprof_np = np.ascontiguousarray(np.broadcast_to(
        plut_np[qcol.astype(np.int32)].T[:, :, None],
        (PROF_WORDS, Mq, 128)))
    pprof_dev = jax.device_put(pprof_np)

    rng = np.random.default_rng(3)
    aa = np.frombuffer(ALPHABET.encode(), np.uint8)[:20]
    K = 16
    ys = rng.choice(aa, (K * B, db_len)).astype(np.uint8)
    ys[0, 50 : 50 + min(len(query), db_len - 50)] = query[: db_len - 50]
    # Build a resident slab of K batches, each (N, B).
    slab = np.zeros((K * N + Mq + 3 * UNROLL, B), np.uint8)
    for g in range(K):
        blk = elut_np[ys[g * B : (g + 1) * B, :]]
        slab[g * N : g * N + db_len] = blk.T
    slab_dev = jax.device_put(slab)
    row0 = jax.device_put(np.arange(K, dtype=np.int32) * N)
    lens = jax.device_put(np.full((K, B), db_len, np.int32))
    S = np.asarray(cfg.matrix).astype(np.int32)
    kw = dict(N=N, worst=int(S.min()), best_sub=int(S.max()),
              gap=int(cfg.gap_penalty), gopen=int(cfg.gap_open),
              interpret=eng.interpret, ncodes=len(ALPHABET) + 1)

    sc2, _, _ = score_db_slab_group_jit(slab_dev, 0, row0, lens, pprof_dev,
                                        k=2, **kw)
    sc2 = np.asarray(sc2)
    for b in (0, 1):
        want = sw_affine_score_fast(query, ys[b], cfg)[0]
        assert int(sc2[0, b]) == want, (b, int(sc2[0, b]), want)
    print("oracle check OK", flush=True)

    out = score_db_slab_group_jit(slab_dev, 0, row0, lens, pprof_dev,
                                  k=K, **kw)
    np.asarray(out[0])
    cells = len(query) * db_len * B
    t2 = t16 = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(score_db_slab_group_jit(
            slab_dev, 0, row0, lens, pprof_dev, k=2, **kw)[0])
        t2 = min(t2, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(score_db_slab_group_jit(
            slab_dev, 0, row0, lens, pprof_dev, k=K, **kw)[0])
        t16 = min(t16, time.perf_counter() - t0)
    marg = (K - 2) * cells / (t16 - t2) / 1e9
    print(f"slab-path affine kernel: {marg:.1f} GCUPS marginal "
          f"(k=2: {t2*1e3:.1f} ms, k={K}: {t16*1e3:.1f} ms, "
          f"{cells/1e9:.3f} Gcells/batch real)", flush=True)


if __name__ == "__main__":
    main()
