#!/usr/bin/env python
"""Headline benchmark: SW wavefront GCUPS per TPU chip.

Workload: the reference's accuracy-workload shape — 125-bp reads against the
4,980-bp chr22 reference (data_small), batched 128 lanes per kernel call.
Timing is min-over-repeats with device-resident inputs (the reference's
sw_solve_big methodology, src/sw_solve_big.cpp:82-88, which also excludes
host IO from its GCUPS math).

Baseline: 4.6 GCUPS/core, the reference's own per-core model for its skewed
AVX2 kernel on an ETH Leonhard node (src/sw_solve_big.cpp:73; see
BASELINE.md). For context, the same C++ kernel measured 7.9 GCUPS
single-thread on this machine's host CPU.

Prints one JSON line per headline metric (DNA kernel, pipelined e2e,
protein profile linear/affine, UNIPROT full-DB e2e), each
{"metric", "value", "unit", "vs_baseline"}.
"""

import json
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
    from parallel_genomeseq_tpu.utils.encoding import Y_PAD, batch_pad, to_bytes

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


def time_batch(engine, B, repeats=8):
    """Min-over-repeats wall time for one B-lane invocation, inputs
    device-resident, output fetched (the fetch forces a true sync on this
    remote-tunnel setup where block_until_ready returns early)."""
    xs, ys, m, n, cells = build_inputs(B)
    prep = engine.prepare(xs, ys, m, n, device=True)
    res = engine.score_prepared(prep)  # warm up (compile)
    np.asarray(res["score"])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = engine.score_prepared(prep)
        np.asarray(res["score"])
        best = min(best, time.perf_counter() - t0)
    return best, cells


def kernel_estimate(engine, b_small=128, b_big=5120, repeats=16,
                    builder=build_inputs):
    """Min-timing batch-differencing GCUPS.

    Each invocation carries a fixed host<->device round trip (~28 ms through
    the remote tunnel; sub-ms on directly-attached hardware), so the kernel
    rate is the marginal cost of the extra lanes:
    (c_big - c_small) / (min t_big - min t_small), small/big INTERLEAVED.
    Tunnel noise is strictly ADDITIVE, so the min over repeats is the
    noise-free observation and the difference of mins is drift-robust.
    (Two earlier estimators failed here: round 2's sequential two-phase
    min-over-repeats let the phases sample different RTT regimes, and the
    round-4 median-of-adjacent-pairs + max-of-two-sessions variant SELECTED
    drift-inflated sessions — one recorded run priced the 7-word linear
    profile kernel at 320 GCUPS, physically impossible for that kernel.)
    Returns (kernel_gcups, e2e_gcups, prep_big, cells_big)."""
    xs, ys, m, n, c_small = builder(b_small)
    prep_s = engine.prepare(xs, ys, m, n, device=True)
    xs, ys, m, n, c_big = builder(b_big)
    prep_b = engine.prepare(xs, ys, m, n, device=True)
    for p in (prep_s, prep_b):  # warm up (compile)
        np.asarray(engine.score_prepared(p)["score"])
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


def uniprot_e2e(db_path="data/uniprot_syn/database.fasta"):
    """Full SwissProt-scale (561,356-entry) database scan through the real
    solve_uniprot driver on the device-resident path (--engine pallas):
    the honest end-to-end protein number — DB load, one flat upload,
    on-device window gather + packed-profile kernel, result fetch, CSV.
    Returns (gcups, proteins_per_s, n_entries)."""
    import os
    import re
    import subprocess
    import sys as _sys
    import tempfile

    if not os.path.exists(db_path):
        from parallel_genomeseq_tpu.seqio.datagen import gen_protein_db
        from parallel_genomeseq_tpu.seqio.native_io import read_fasta

        os.makedirs(os.path.dirname(db_path), exist_ok=True)
        q = read_fasta("/root/reference/data/query/P02232.fasta")
        gen_protein_db(db_path, query=q)
    out = tempfile.mktemp(suffix=".csv")
    # Two passes in ONE process: pass 1 pays this rig's per-process
    # program-load tax (the first invocation of each compiled program costs
    # minutes through the remote tunnel; a directly-attached TPU or the
    # long-lived cli/serve.py process does not pay it), pass 2 measures the
    # steady state — the same warm-up methodology as benchmarks/e2e_reads.py.
    code = (
        "from parallel_genomeseq_tpu.cli.solve_uniprot import main\n"
        f"a = ['--database', {db_path!r}, '--engine', 'pallas',\n"
        "     '--batch-size', '8192', '--pad-mult', '512',\n"
        "     '--matrix', 'blosum50', '--top', '3']\n"
        f"main(a + ['--output', {out!r}])\n"
        f"main(a + ['--output', {out!r}])\n"
    )
    r = subprocess.run(
        [_sys.executable, "-c", code],
        capture_output=True, text=True, timeout=2400,
    )
    if r.returncode != 0:
        raise RuntimeError(f"solve_uniprot failed: {r.stdout[-800:]}\n{r.stderr[-800:]}")
    ms = re.findall(r"Scored ([\d.]+) Gcells in ([\d.]+)s: ([\d.]+) GCUPS", r.stdout)
    n = re.search(r"query \d+aa vs (\d+) proteins", r.stdout)
    gcells, secs, gcups = (float(v) for v in ms[-1])  # warm pass
    n_entries = int(n.group(1))
    print(
        f"# uniprot_e2e cold pass (incl. per-process program loads): "
        f"{ms[0][1]}s; warm pass: {secs}s",
        file=sys.stderr,
    )
    try:
        os.unlink(out)
    except OSError:
        pass
    return gcups, n_entries / secs, n_entries


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
    args = ap.parse_args()

    from parallel_genomeseq_tpu.utils.platform import setup_cache

    setup_cache()
    profile_ctx = None
    if args.profile:
        import contextlib

        import jax

        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()

    result = None
    for attempt in range(2):
        try:
            from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

            eng = PallasEngine()
            if not eng.interpret:
                eng.self_check()
            kernel_gcups, e2e_gcups, prep_b, c_big = kernel_estimate(eng)
            e2e_pipe = e2e_pipelined(eng, prep_b, c_big)
            result = ("pallas", kernel_gcups, e2e_gcups, e2e_pipe)
            break
        except Exception as e:  # miscompile / flaky backend: retry, then fall back
            print(f"# pallas attempt {attempt} failed: {e}", file=sys.stderr)
    if result is None:
        from parallel_genomeseq_tpu.ops.scan_dp import ScanEngine

        eng = ScanEngine()
        xs, ys, m, n, cells = build_inputs(128)
        res = eng.score_batch(xs, ys, m, n)
        np.asarray(res["score"])
        t0 = time.perf_counter()
        res = eng.score_batch(xs, ys, m, n)
        np.asarray(res["score"])
        dt = time.perf_counter() - t0
        result = ("scan", cells / dt / 1e9, cells / dt / 1e9, cells / dt / 1e9)

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)

    name, kernel_gcups, e2e_gcups, e2e_pipe = result
    print(
        f"# engine={name} kernel={kernel_gcups:.1f} GCUPS "
        f"end2end(B=5120)={e2e_gcups:.1f} GCUPS "
        f"end2end-pipelined(2 in flight)={e2e_pipe:.1f} GCUPS",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"sw_wavefront_gcups_per_chip[{name}]",
                "value": round(kernel_gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(kernel_gcups / BASELINE_GCUPS, 2),
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "sw_e2e_pipelined_b5120_gcups_per_chip",
                "value": round(e2e_pipe, 2),
                "unit": "GCUPS",
                "vs_baseline": round(e2e_pipe / BASELINE_GCUPS, 2),
            }
        )
    )

    # Protein-path headlines: the substitution-matrix kernels on the
    # UNIPROT workload shape (swps3's BLOSUM50 scoring; linear-gap for the
    # reference-parity config, 10/2 open/extend for the swps3-style affine
    # config). Failures here never mask the DNA headline above.
    if not args.skip_protein:
        from parallel_genomeseq_tpu.ops.substitution import blosum_config

        for metric, gopen in (
            ("sw_profile_gcups_per_chip", 0.0),
            ("sw_profile_affine_gcups_per_chip", 10.0),
        ):
            pbase = PROTEIN_BASELINE[metric]
            try:
                from parallel_genomeseq_tpu.ops.wavefront_pallas import (
                    PallasEngine,
                )

                cfg = blosum_config(
                    "blosum50", gap_penalty=2.0, gap_open=gopen
                )
                eng = PallasEngine(cfg)
                if not eng.interpret:
                    # First-batch oracle gate (miscompile defense) on the
                    # same program shape the small batch reuses.
                    xs, ys, m, n, _ = build_protein_inputs(128)
                    eng.score_batch(xs, ys, m, n)
                k_gcups, e_gcups, _, _ = kernel_estimate(
                    eng, builder=build_protein_inputs
                )
                print(
                    f"# {metric}: kernel={k_gcups:.1f} GCUPS "
                    f"end2end(B=5120)={e_gcups:.1f} GCUPS",
                    file=sys.stderr,
                )
                print(
                    json.dumps(
                        {
                            "metric": metric,
                            "value": round(k_gcups, 2),
                            "unit": "GCUPS",
                            "vs_baseline": round(k_gcups / pbase, 2),
                        }
                    )
                )
            except Exception as e:
                print(f"# {metric} failed: {e}", file=sys.stderr)

    # UNIPROT end-to-end: the full 561,356-entry SwissProt-scale database
    # through the real driver (device-resident DB, packed-profile kernel).
    # Baseline: the reference's own protein path measured at 0.20 GCUPS on
    # this host CPU (float SWAligner, mpi_sw_solve_uniprot.cpp:120-123).
    if not args.skip_uniprot:
        try:
            u_gcups, u_rate, u_n = uniprot_e2e()
            print(
                f"# uniprot_e2e: {u_gcups:.2f} GCUPS end-to-end, "
                f"{u_rate:,.0f} proteins/s over {u_n:,} entries",
                file=sys.stderr,
            )
            print(
                json.dumps(
                    {
                        "metric": "uniprot_e2e_gcups",
                        "value": round(u_gcups, 2),
                        "unit": "GCUPS",
                        "vs_baseline": round(u_gcups / 0.20, 2),
                    }
                )
            )
        except Exception as e:
            print(f"# uniprot_e2e failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
