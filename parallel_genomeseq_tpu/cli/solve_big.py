"""solve_big: the GCUPS throughput workload — long reads vs a long reference.

TPU-native rework of the reference driver (src/sw_solve_big.cpp): aligns
n_reads long reads (default 10,000 bp) against a custom reference (default
30,000 bp) with 2*npiece overlapping windows and overlap ratio 2.0, taking
the min time over --nrepeat repetitions per batch (the reference's
methodology, src/sw_solve_big.cpp:82-88), and reports GCUPS mean plus the
reference's own "theoretical GCUPS" efficiency model
(npiece * percore / (ref + 2*(npiece-1)*overlap*read) * ref,
src/sw_solve_big.cpp:71-74) evaluated with this machine's measured kernel
rate instead of Leonhard's 4.6 GCUPS/core.

Generates its own data when --ref/--reads are absent (seqio/datagen
equivalents of py/ompfg_data_prep.py).

Usage:
    python -m parallel_genomeseq_tpu.cli.solve_big [npiece] [nrepeat] [flags]
"""

from __future__ import annotations

import argparse
import csv
import sys
import time

import numpy as np

from ..parallel.chunking import ChunkedAligner
from ..seqio.datagen import gen_reads_custom, gen_ref_custom
from ..seqio.native_io import read_fasta
from ..utils.config import ChunkConfig
from . import common


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("npiece", type=int, nargs="?", default=7)
    p.add_argument("nrepeat", type=int, nargs="?", default=3)
    p.add_argument("--ref", default=None, help="custom ref FASTA (generated if absent)")
    p.add_argument("--reads", default=None, help="reads CSV (generated if absent)")
    p.add_argument("--ref-len", type=int, default=30_000)
    p.add_argument("--read-len", type=int, default=10_000)
    p.add_argument("--n-reads", type=int, default=100)
    p.add_argument("--overlap-ratio", type=float, default=2.0)
    p.add_argument(
        "--kernel-gcups", type=float, default=None,
        help="measured kernel GCUPS for the efficiency model (default: the "
        "latest recorded bench.py result, else 271)",
    )
    p.add_argument(
        "--traceback", action="store_true",
        help="include winner traceback in the timed path (the reference's "
        "calculateScore does; scoring-only is the default here since the "
        "benchmark metric is GCUPS of the sweep)",
    )
    common.add_scoring_flags(p)
    common.add_platform_flags(p)
    args = p.parse_args(argv)
    common.apply_platform(args)

    import os

    os.makedirs(common.REPO_DATA, exist_ok=True)
    if args.ref:
        ref = read_fasta(args.ref)
    else:
        ref = gen_ref_custom(
            common.REPO_DATA / "custom_ref_1.fa", ref_len=args.ref_len
        )
    if args.reads:
        with open(args.reads, newline="") as f:
            rows = list(csv.DictReader(f))
        reads = [r["SEQ"] for r in rows]
    else:
        pairs = gen_reads_custom(
            ref, common.REPO_DATA / "custom_reads_1.csv",
            n_reads=args.n_reads, read_len=min(args.read_len, len(ref)),
        )
        reads = [s for s, _ in pairs]

    npiece = args.npiece * 2  # the reference doubles the CLI arg (sw_solve_big.cpp:78)
    print(
        f"solve_big: {len(reads)} reads x {len(reads[0])} bp vs {len(ref)} bp, "
        f"npiece {npiece}, overlap {args.overlap_ratio}"
    )
    cfg = common.scoring_from_args(args)
    aligner = ChunkedAligner(
        cfg=cfg, chunk=ChunkConfig(npiece=npiece, overlap_ratio=args.overlap_ratio)
    )

    read_len = len(reads[0])
    overlap = args.overlap_ratio * read_len
    est_mem = len(reads[0]) * (len(ref) + (npiece - 1) * overlap) * 4 / 1e9
    print(f"Estimated peak DP cells per read: {est_mem:.2f} G (not materialized; wavefront carries only)")

    gcups_per_read = []
    for bk, batch in enumerate(common.batched(reads, args.batch_size)):
        best_t = float("inf")
        for _ in range(args.nrepeat):
            t0 = time.perf_counter()
            res = aligner.align_batch(batch, ref, traceback=args.traceback)
            best_t = min(best_t, time.perf_counter() - t0)
        cells = sum(len(r) for r in batch) * len(ref)
        gcups_per_read.append(cells / best_t / 1e9)
        print(f"batch {bk}: {best_t*1e3:.1f} ms (min of {args.nrepeat}) -> {gcups_per_read[-1]:.2f} GCUPS")
        lv = res[0].timings.levels_us
        if args.traceback and lv:
            # Per-strip-level replay+walk times, top strip first — the
            # strip-path analog of the reference's per-anti-diagonal
            # timing vector (src/aligner/similaritymatrix.cpp:241-244).
            lv_ms = " ".join(f"{v / 1e3:.1f}" for v in lv)
            print(f"  traceback strip levels (ms, top first): {lv_ms}")

    g = np.array(gcups_per_read)
    print(f"GCUPS mean {g.mean():.2f} std {g.std():.2f} (useful cells / wall time, batches of {args.batch_size})")
    # Reference efficiency model with a measured per-chip kernel rate (the
    # reference hard-codes Leonhard's 4.6 GCUPS/core, src/sw_solve_big.cpp:73).
    percore = args.kernel_gcups or _measured_kernel_gcups()
    model = npiece * percore / (len(ref) + 2 * (npiece - 1) * overlap) * len(ref) / npiece
    print(f"Overlap-efficiency model at {percore:.0f} GCUPS kernel rate: {model:.1f} GCUPS")
    return 0


def _measured_kernel_gcups(default: float = 271.0) -> float:
    """Latest recorded bench.py kernel rate (BENCH_r*.json at the repo root),
    so the efficiency model tracks measurements instead of a stale constant."""
    import glob
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    best = default
    for path in sorted(glob.glob(str(root / "BENCH_r*.json"))):
        try:
            rec = json.loads(Path(path).read_text().strip().splitlines()[-1])
            if "GCUPS" in str(rec.get("unit", "")) and rec.get("value"):
                best = float(rec["value"])
        except (ValueError, OSError, IndexError):
            continue
    return best


if __name__ == "__main__":
    sys.exit(main())
