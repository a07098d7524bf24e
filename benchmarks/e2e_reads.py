"""Steady-state end-to-end reads/s on the data_small workload.

The reference's canonical accuracy workload (src/sw_solve_small.cpp:82-106)
times the full align path — sweep + argmax + traceback + host strings. This
harness measures the same thing at steady state: pass 0 warms up every
compiled program (on this rig the FIRST invocation of each program pays a
multi-minute per-process load tax through the axon tunnel), then timed
passes measure the amortized throughput a long-lived process (cli/serve.py)
actually delivers.

Usage:
    python benchmarks/e2e_reads.py [--npiece 17] [--batch-size 128]
        [--passes 3] [--no-traceback]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from parallel_genomeseq_tpu.cli import common
from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
from parallel_genomeseq_tpu.parallel.chunking import ChunkedAligner
from parallel_genomeseq_tpu.seqio.native_io import read_fasta
from parallel_genomeseq_tpu.seqio.readers import read_ground_truth


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref", default=str(common.REFERENCE_DATA / "data_small/genome.chr22.5K.fa"))
    p.add_argument("--input", default=str(common.REFERENCE_DATA / "data_small_ground_truth.csv"))
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--no-traceback", action="store_true")
    p.add_argument(
        "--batch-sizes", default="",
        help="comma list (e.g. 64,128,256,512): sweep batch sizes and print "
        "the reads/s-vs-batch curve (each size pays its one-time program "
        "load in the warmup pass)",
    )
    p.add_argument(
        "--seed-extend", action="store_true",
        help="seed-and-extend path: FM-index window per read, extension "
        "inside the window only (~20x fewer DP cells per seeded read)",
    )
    common.add_scoring_flags(p)
    common.add_chunk_flags(p, npiece_default=17)
    common.add_platform_flags(p)
    args = p.parse_args(argv)
    common.apply_platform(args)

    ref = read_fasta(args.ref)
    rows = read_ground_truth(args.input)
    reads = [r["SEQ"] for r in rows]
    cfg = common.scoring_from_args(args)
    tb = not args.no_traceback
    if args.seed_extend:
        from parallel_genomeseq_tpu.models.seed_extend import SeedExtendAligner

        al = SeedExtendAligner(ref, cfg)
        stream = lambda batches: al.align_stream(batches, traceback=tb)
    elif args.npiece > 1:
        al = ChunkedAligner(cfg=cfg, chunk=common.chunk_from_args(args))
        stream = lambda batches: al.align_stream(batches, ref, traceback=tb)
    else:
        al = BatchSWAligner(cfg)
        stream = lambda batches: al.align_stream(batches, [ref], traceback=tb)

    cells = sum(len(r) for r in reads) * len(ref)
    sizes = (
        [int(v) for v in args.batch_sizes.split(",") if v]
        if args.batch_sizes
        else [args.batch_size]
    )
    curve = []
    for bs in sizes:
        best = 0.0
        for it in range(args.passes + 1):
            t0 = time.perf_counter()
            out = []
            for batch_results in stream(common.batched(reads, bs)):
                out.extend(batch_results)
            dt = time.perf_counter() - t0
            tag = "warmup" if it == 0 else f"pass {it}"
            if it > 0:
                best = max(best, len(out) / dt)
            print(
                f"{tag}: {len(out)} reads in {dt:.3f}s = {len(out)/dt:.0f} reads/s"
                f" ({cells/dt/1e9:.1f} GCUPS e2e, npiece={args.npiece},"
                f" B={bs}, traceback={tb})",
                flush=True,
            )
        curve.append((bs, best))
    if len(curve) > 1:
        print("reads/s vs batch size (best pass):")
        for bs, v in curve:
            print(f"  B={bs:5d}  {v:7.0f} reads/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
