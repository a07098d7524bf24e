"""solve_batch: many-read alignment benchmark with timing-CSV output.

TPU-native rework of the reference's fine-grain OMP benchmark driver
(src/omp_sw_solve_small.cpp `solve_small` subcommand): aligns the first
n_reads reads and appends one CSV row of mean timings. The reference's knobs
map as:

    n_threads       -> batch lanes per device call (--batch-size)
    finegrain_type  -> engine variant (--engine scan|pallas; the reference's
                       five OMP scheduling variants collapse into which
                       wavefront implementation runs)
    mt_simd         -> the Pallas kernel (SIMD+MT fused by construction)

CSV schema keeps the reference's column structure
(src/omp_sw_solve_small.cpp:223-239) with independently measured levels:
n_reads, n_lanes, engine, avg_t_calcscore (whole align call per read),
avg_t_sweep (score wavefront, synced), avg_t_walk (traceback walk + decode;
0 without --traceback). The reference's per-diagonal sum has no observable
analog inside a fused TPU kernel, so the second level is the walk stage.

Usage:
    python -m parallel_genomeseq_tpu.cli.solve_batch 64 --engine pallas \
        --timing-file data/timings.csv
"""

from __future__ import annotations

import argparse
import sys
import time

from ..models.swaligner import BatchSWAligner
from ..seqio.native_io import read_fasta
from ..seqio.readers import read_ground_truth
from ..seqio.writers import append_timing_row
from . import common


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("n_reads", type=int, nargs="?", default=10)
    p.add_argument("--engine", default="auto", choices=["auto", "pallas", "scan"])
    p.add_argument("--timing-file", default=str(common.REPO_DATA / "timing_batch.csv"))
    p.add_argument("--ref", default=str(common.REFERENCE_DATA / "data_small/genome.chr22.5K.fa"))
    p.add_argument("--reads", default=str(common.REFERENCE_DATA / "data_small_ground_truth.csv"))
    p.add_argument("--traceback", action="store_true", help="include traceback in the timed path")
    common.add_scoring_flags(p)
    common.add_platform_flags(p)
    args = p.parse_args(argv)
    common.apply_platform(args)

    ref = read_fasta(args.ref)
    rows = read_ground_truth(args.reads)
    reads = [r["SEQ"] for r in rows[: args.n_reads]]
    cfg = common.scoring_from_args(args)
    # detail_timing: sync between sweep and walk so the CSV's two timing
    # levels are independently measured (the default fused path trades that
    # split for fewer host round trips).
    aligner = BatchSWAligner(cfg, score_engine=args.engine, detail_timing=True)

    # Warm-up (compile) on the first batch shape.
    aligner.align_batch(reads[: min(len(reads), args.batch_size)], [ref], traceback=args.traceback)

    t_calc = t_sweep = t_walk = 0.0
    t0_all = time.perf_counter()
    for batch in common.batched(reads, args.batch_size):
        t0 = time.perf_counter()
        results = aligner.align_batch(batch, [ref], traceback=args.traceback)
        t_calc += time.perf_counter() - t0
        t_sweep += results[0].timings[0] / 1e6
        t_walk += results[0].timings[1] / 1e6
    total = time.perf_counter() - t0_all

    n = len(reads)
    avg_calc = t_calc / n * 1e6
    avg_sweep = t_sweep / n * 1e6
    avg_walk = t_walk / n * 1e6
    import os

    os.makedirs(os.path.dirname(args.timing_file) or ".", exist_ok=True)
    append_timing_row(
        args.timing_file,
        ["n_reads", "n_lanes", "engine", "avg_t_calcscore", "avg_t_sweep", "avg_t_walk"],
        [n, args.batch_size, args.engine, f"{avg_calc:.1f}", f"{avg_sweep:.1f}", f"{avg_walk:.1f}"],
    )
    cells = sum(len(r) for r in reads) * len(ref)
    print(
        f"solve_batch: {n} reads, engine {args.engine}, "
        f"avg calc {avg_calc:.0f} us/read, sweep {avg_sweep:.0f} us/read, "
        f"walk {avg_walk:.0f} us/read, "
        f"{cells/total/1e9:.2f} GCUPS end-to-end"
    )
    print(f"timing row appended to {args.timing_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
