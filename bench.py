#!/usr/bin/env python
"""Headline benchmarks: SW wavefront GCUPS per TPU chip.

Workload: the reference's accuracy-workload shape — 125-bp reads against the
4,980-bp chr22 reference (data_small), batched 128 lanes per kernel call —
plus the UNIPROT protein workload (P02232 vs SwissProt-scale entries).
Kernel rates use the ON-DEVICE repeat loop (PallasEngine.score_repeated):
K kernel iterations run inside ONE dispatch via lax.scan, so the
host<->device round trip appears exactly once per dispatch and differencing
two K values cancels it exactly — host-side marginal estimators drifted
26-320 GCUPS across sessions through this rig's remote tunnel (CLAUDE.md
"ESTIMATOR SAGA"); the on-device loop cannot see tunnel noise at all. The
host-side min-timing estimate is still computed and reported alongside
(stderr + "host_estimate" JSON field) for cross-checking.

Baselines: 4.6 GCUPS/core, the reference's own per-core model for its
skewed AVX2 kernel (src/sw_solve_big.cpp:73; see BASELINE.md; the same C++
kernel measured 7.9 GCUPS single-thread on this machine's host CPU), and
for the protein path the striped-SSE2 Farrar kernel + the reference's own
float protein path (see PROTEIN_BASELINE below).

Prints one JSON line per headline metric, each
{"metric", "value", "unit", "vs_baseline"}, in this order (most important
first so a driver timeout cannot drop the flagship numbers):
  1. sw_wavefront_gcups_per_chip[pallas]   (DNA kernel, on-device repeat)
  2. sw_e2e_pipelined_b5120_gcups_per_chip (DNA end-to-end, 2 in flight)
  3. uniprot_e2e_gcups                     (full 561k-entry DB warm scan)
  4. sw_profile_gcups_per_chip             (BLOSUM50 linear kernel)
  5. sw_profile_affine_gcups_per_chip      (BLOSUM50 10/2 affine kernel)
A wall-clock budget (--budget seconds, default 2400, env
PGS_BENCH_BUDGET) skips not-yet-started sections when exceeded so the
process always exits 0 with whatever landed.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_GCUPS = 4.6
# Protein-path baselines, measured on this host CPU (2026-08-19) by
# benchmarks/bench_protein_baseline.py at the UNIPROT workload shape
# (P02232 x 360-aa entries, BLOSUM50), scores verified against the oracle:
#   striped SSE2 (Farrar, benchmarks/striped_sw.c — the swps3 algorithm
#   class; actual swps3 sources are wget-fetched by the reference's
#   init_setup.sh and cannot be obtained on this no-egress rig):
#     linear 1.67 GCUPS/core, affine(10/2) 1.97 GCUPS/core.
#   the reference's own protein path (float SWAligner + scoring lambda,
#   mpi_sw_solve_uniprot.cpp:120-123): 0.20 GCUPS.
PROTEIN_BASELINE = {"sw_profile_gcups_per_chip": 1.67,
                    "sw_profile_affine_gcups_per_chip": 1.97}

T0 = time.perf_counter()


def elapsed():
    return time.perf_counter() - T0


def emit(metric, value, baseline, unit="GCUPS", **extra):
    print(json.dumps({
        "metric": metric, "value": round(value, 2), "unit": unit,
        "vs_baseline": round(value / baseline, 2), **extra,
    }), flush=True)


def build_inputs(B):
    from parallel_genomeseq_tpu.seqio.readers import read_fasta, read_ground_truth
    from parallel_genomeseq_tpu.utils.encoding import X_PAD, batch_pad, to_bytes

    ref = read_fasta("/root/reference/data/data_small/genome.chr22.5K.fa")
    rows = read_ground_truth("/root/reference/data/data_small_ground_truth.csv")
    reads = [to_bytes(rows[k % len(rows)]["SEQ"]) for k in range(B)]
    xs = batch_pad(reads, max(len(r) for r in reads), X_PAD)
    ys = np.broadcast_to(to_bytes(ref)[None, :], (B, len(ref))).copy()
    m = np.array([len(r) for r in reads], np.int32)
    n = np.full(B, len(ref), np.int32)
    cells = int(m.sum()) * len(ref)
    return xs, ys, m, n, cells


def build_protein_inputs(B, db_len=360, seed=11):
    """The UNIPROT workload shape (mpi_sw_solve_uniprot.cpp:65-138): the
    P02232 query against SwissProt-length protein entries, one entry per
    batch lane. db_len=360 ~ the SwissProt mean entry length."""
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta
    from parallel_genomeseq_tpu.utils.encoding import to_bytes

    query = to_bytes(read_fasta("/root/reference/data/query/P02232.fasta"))
    rng = np.random.default_rng(seed)
    aa = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    ys = rng.choice(aa, (B, db_len)).astype(np.uint8)
    # Plant the query into one lane so the argmax is non-trivial.
    ys[0, 50 : 50 + min(len(query), db_len - 50)] = query[: db_len - 50]
    xs = np.broadcast_to(query[None, :], (B, len(query))).copy()
    m = np.full(B, len(query), np.int32)
    n = np.full(B, db_len, np.int32)
    cells = len(query) * db_len * B
    return xs, ys, m, n, cells


def _verify_small(engine, xs, ys, m, n, res):
    """First-batch miscompile gate for the prepared-path bench (the remote
    compile service has produced deterministic wrong executables; every
    engine path on this rig verifies its first real batch)."""
    from parallel_genomeseq_tpu.ops.oracle import (
        sw_affine_score_fast,
        sw_score_fast,
    )

    fast = sw_affine_score_fast if engine.cfg.is_affine else sw_score_fast
    score = np.asarray(res["score"])
    jj = np.asarray(res["j"])
    for b in (0, len(m) - 1):
        want = fast(xs[b, : m[b]], ys[b, : n[b]], engine.cfg)
        got = (int(score[b]), int(jj[b]))
        if got != (want[0], want[2]):
            raise RuntimeError(
                f"bench first-batch check FAILED (lane {b}: {got} != oracle "
                f"{(want[0], want[2])}): suspected miscompile — retry in a "
                "fresh process or clear the JAX compilation cache"
            )


def kernel_estimate(engine, b_small=128, b_big=5120, repeats=16,
                    builder=build_inputs):
    """Host-side min-timing batch-differencing GCUPS (the cross-check
    estimate; the headline uses kernel_repeat_estimate).

    Each invocation carries a fixed host<->device round trip (~28 ms
    through the remote tunnel; sub-ms on directly-attached hardware), so
    the kernel rate is the marginal cost of the extra lanes:
    (c_big - c_small) / (min t_big - min t_small), small/big INTERLEAVED.
    Tunnel noise is strictly ADDITIVE, so the min over repeats is the
    noise-free observation and the difference of mins is drift-robust —
    but only within one session; across sessions this family of estimators
    has drifted 26-320 GCUPS, which is why it is no longer the headline.
    Returns (kernel_gcups, e2e_gcups, prep_big, cells_big)."""
    xs, ys, m, n, c_small = builder(b_small)
    prep_s = engine.prepare(xs, ys, m, n, device=True)
    res_s = engine.score_prepared(prep_s)
    np.asarray(res_s["score"])  # warm up (compile)
    _verify_small(engine, xs, ys, m, n, res_s)
    xs, ys, m, n, c_big = builder(b_big)
    prep_b = engine.prepare(xs, ys, m, n, device=True)
    np.asarray(engine.score_prepared(prep_b)["score"])
    t_s_best = t_b_best = float("inf")
    ests = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(engine.score_prepared(prep_s)["score"])
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(engine.score_prepared(prep_b)["score"])
        t_b = time.perf_counter() - t0
        t_s_best = min(t_s_best, t_s)
        t_b_best = min(t_b_best, t_b)
        if t_b > t_s:
            ests.append((c_big - c_small) / (t_b - t_s))
    if t_b_best > t_s_best:
        kernel = (c_big - c_small) / (t_b_best - t_s_best) / 1e9
    elif ests:  # pathological drift: fall back to the median of pairs
        kernel = float(np.median(ests)) / 1e9
    else:
        raise RuntimeError("batch differencing produced no valid estimates")
    return kernel, c_big / t_b_best / 1e9, prep_b, c_big


def kernel_repeat_estimate(engine, prep, cells, K1=4, K2=12, repeats=5):
    """ON-DEVICE repeat-loop GCUPS: time one dispatch of K kernel
    iterations (lax.scan with a carried dependency and per-iteration
    rolled inputs — XLA can neither elide nor hoist the body), difference
    over K. The tunnel RTT appears once per dispatch and cancels exactly
    in t(K2) - t(K1); unlike every host-side marginal estimator this one
    is structurally immune to RTT drift (VERDICT r4 item 2)."""
    for K in (K1, K2):  # warm up (compile both programs)
        np.asarray(engine.score_repeated(prep, K))
    t1 = t2 = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(engine.score_repeated(prep, K1))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(engine.score_repeated(prep, K2))
        t2 = min(t2, time.perf_counter() - t0)
    if t2 <= t1:
        raise RuntimeError(
            f"repeat differencing failed: t(K={K2})={t2:.4f}s <= "
            f"t(K={K1})={t1:.4f}s"
        )
    return cells * (K2 - K1) / (t2 - t1) / 1e9


def e2e_pipelined(engine, prep, cells, repeats=12):
    """Two-in-flight end-to-end GCUPS: batch k+1 dispatches BEFORE batch k's
    blocking fetch, so the ~28 ms tunnel round trip of the fetch overlaps
    the next batch's device compute (the align_stream discipline applied to
    the headline measurement). Median per-batch steady-state time."""
    prev = engine.score_prepared(prep)  # warm (compiled already by caller)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        nxt = engine.score_prepared(prep)
        np.asarray(prev["score"])
        prev = nxt
        times.append(time.perf_counter() - t0)
    np.asarray(prev["score"])
    return cells / float(np.median(times)) / 1e9


def uniprot_e2e(db_path="data/uniprot_syn/database.fasta", scans=3):
    """Full SwissProt-scale (561,356-entry) database scan IN-PROCESS via
    the resident slab (models.protein_db.ResidentProteinDB — the exact
    engine behind solve_uniprot --engine pallas and serve --protein-db):
    the honest end-to-end protein number. One-time DB load + pack + upload
    + per-shape program loads are reported separately (a long-lived server
    or resumed run pays them once); the metric is the WARM scan window —
    scoring + result fetch + unpack for every entry, min over `scans`.
    Round 4 ran this through a fresh solve_uniprot subprocess and the
    driver timeout hit during its cold pass (BENCH_r04 rc:124); in-process
    the cold cost is paid once, not re-paid (VERDICT r4 item 1).
    Returns (gcups, proteins_per_s, n_entries, wall_cold, wall_warm)."""
    if not os.path.exists(db_path):
        # Regenerating the 561k-entry DB costs minutes; tell the log so a
        # driver-timeout post-mortem can see where the time went.
        print(f"# uniprot_e2e: {db_path} missing — generating the "
              "SwissProt-scale synthetic DB (one-time, minutes)",
              file=sys.stderr, flush=True)
        from parallel_genomeseq_tpu.seqio.datagen import gen_protein_db
        from parallel_genomeseq_tpu.seqio.native_io import read_fasta

        os.makedirs(os.path.dirname(db_path), exist_ok=True)
        q = read_fasta("/root/reference/data/query/P02232.fasta")
        gen_protein_db(db_path, query=q)
    from parallel_genomeseq_tpu.models.protein_db import ResidentProteinDB
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta
    from parallel_genomeseq_tpu.seqio.uniprot import iter_database

    query = read_fasta("/root/reference/data/query/P02232.fasta")
    t0 = time.perf_counter()
    entries = list(iter_database(db_path))
    t_load = time.perf_counter() - t0
    # pad_mult=128 measured best (2026-08-21 sweep on this DB: 55.8 GCUPS
    # warm vs 47.8 at 512 — less padded window compute; see CLAUDE.md).
    db = ResidentProteinDB(entries, matrix="blosum50", gap_penalty=12.0,
                           gap_open=0.0, batch_size=4096, pad_mult=128)
    _, _, wall_cold = db.scan_scores(query)  # per-shape program loads
    wall = min(db.scan_scores(query)[2] for _ in range(max(scans, 1)))
    cells = len(query) * sum(len(e[1]) for e in entries)
    print(
        f"# uniprot_e2e: DB load {t_load:.1f}s, slab prep {db.prep_s:.1f}s "
        f"({db.slab_mb:.0f} MB), cold scan (program loads) "
        f"{wall_cold:.1f}s, warm scan {wall:.3f}s",
        file=sys.stderr, flush=True,
    )
    return (cells / wall / 1e9, len(entries) / wall, len(entries),
            wall_cold, wall)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the timed region into DIR",
    )
    ap.add_argument(
        "--skip-protein", action="store_true",
        help="DNA headline only (skip the BLOSUM profile kernels)",
    )
    ap.add_argument(
        "--skip-uniprot", action="store_true",
        help="skip the full-database UNIPROT e2e headline",
    )
    ap.add_argument(
        "--budget", type=float,
        default=float(os.environ.get("PGS_BENCH_BUDGET", 2400)),
        help="wall-clock seconds; sections not yet started when the budget "
        "is exceeded are skipped so the run always exits 0 with whatever "
        "metrics landed (the driver's own timeout would drop them all)",
    )
    args = ap.parse_args()

    from parallel_genomeseq_tpu.utils.platform import setup_cache

    setup_cache()
    profile_ctx = None
    if args.profile:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()

    # ---- 1+2: DNA kernel + pipelined e2e -------------------------------
    result = None
    for attempt in range(2):
        try:
            from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

            eng = PallasEngine()
            host_gcups, e2e_gcups, prep_b, c_big = kernel_estimate(eng)
            e2e_pipe = e2e_pipelined(eng, prep_b, c_big)
            kernel_gcups = kernel_repeat_estimate(eng, prep_b, c_big)
            result = ("pallas", kernel_gcups, host_gcups, e2e_gcups, e2e_pipe)
            break
        except Exception as e:  # miscompile / flaky backend: retry, then fall back
            print(f"# pallas attempt {attempt} failed: {e}", file=sys.stderr)
    if result is None:
        from parallel_genomeseq_tpu.ops.scan_dp import ScanEngine

        eng = ScanEngine()
        xs, ys, m, n, cells = build_inputs(128)
        np.asarray(eng.score_batch(xs, ys, m, n)["score"])
        t0 = time.perf_counter()
        np.asarray(eng.score_batch(xs, ys, m, n)["score"])
        dt = time.perf_counter() - t0
        g = cells / dt / 1e9
        result = ("scan", g, g, g, g)

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)

    name, kernel_gcups, host_gcups, e2e_gcups, e2e_pipe = result
    print(
        f"# engine={name} kernel(on-device repeat)={kernel_gcups:.1f} GCUPS "
        f"kernel(host min-timing)={host_gcups:.1f} GCUPS "
        f"end2end(B=5120)={e2e_gcups:.1f} GCUPS "
        f"end2end-pipelined(2 in flight)={e2e_pipe:.1f} GCUPS",
        file=sys.stderr, flush=True,
    )
    emit(f"sw_wavefront_gcups_per_chip[{name}]", kernel_gcups, BASELINE_GCUPS,
         host_estimate=round(host_gcups, 2))
    emit("sw_e2e_pipelined_b5120_gcups_per_chip", e2e_pipe, BASELINE_GCUPS)

    # ---- 3: UNIPROT full-DB e2e (the round-4 flagship; runs BEFORE the
    # profile-kernel microbenchmarks so a driver timeout cannot drop it) --
    if not args.skip_uniprot:
        if elapsed() > args.budget:
            print(f"# uniprot_e2e skipped: budget exceeded "
                  f"({elapsed():.0f}s > {args.budget:.0f}s)", file=sys.stderr)
        else:
            try:
                u_gcups, u_rate, u_n, _, _ = uniprot_e2e()
                print(
                    f"# uniprot_e2e: {u_gcups:.2f} GCUPS warm, "
                    f"{u_rate:,.0f} proteins/s over {u_n:,} entries",
                    file=sys.stderr, flush=True,
                )
                emit("uniprot_e2e_gcups", u_gcups, 0.20,
                     proteins_per_s=round(u_rate))
            except Exception as e:
                print(f"# uniprot_e2e failed: {e}", file=sys.stderr)

    # ---- 4+5: protein profile kernels (BLOSUM50 linear + 10/2 affine) --
    if not args.skip_protein:
        from parallel_genomeseq_tpu.ops.substitution import blosum_config

        for metric, gopen in (
            ("sw_profile_gcups_per_chip", 0.0),
            ("sw_profile_affine_gcups_per_chip", 10.0),
        ):
            if elapsed() > args.budget:
                print(f"# {metric} skipped: budget exceeded "
                      f"({elapsed():.0f}s > {args.budget:.0f}s)",
                      file=sys.stderr)
                continue
            pbase = PROTEIN_BASELINE[metric]
            try:
                from parallel_genomeseq_tpu.ops.wavefront_pallas import (
                    PallasEngine,
                )

                cfg = blosum_config(
                    "blosum50", gap_penalty=2.0, gap_open=gopen
                )
                eng = PallasEngine(cfg)
                h_gcups, e_gcups, prep_b, c_big = kernel_estimate(
                    eng, builder=build_protein_inputs
                )
                k_gcups = kernel_repeat_estimate(eng, prep_b, c_big)
                print(
                    f"# {metric}: kernel(on-device repeat)={k_gcups:.1f} "
                    f"GCUPS kernel(host min-timing)={h_gcups:.1f} GCUPS "
                    f"end2end(B=5120)={e_gcups:.1f} GCUPS",
                    file=sys.stderr, flush=True,
                )
                emit(metric, k_gcups, pbase, host_estimate=round(h_gcups, 2))
            except Exception as e:
                print(f"# {metric} failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
