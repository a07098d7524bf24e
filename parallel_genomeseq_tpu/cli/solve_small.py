"""solve_small: the accuracy workload — data_small reads vs chr22 5K ref.

TPU-native rework of the reference driver (src/sw_solve_small.cpp): reads the
reference FASTA and the 1,170-read ground-truth CSV, aligns every read
(chunked into --npiece overlapping windows, or unchunked full-matrix with
--npiece 1), writes align_output.csv with appended pos_pred,score columns,
prints GCUPS, and optionally runs the position-parity check in-process
(replacing the separate py/eval.py step).

Usage:
    python -m parallel_genomeseq_tpu.cli.solve_small [--npiece 17] [--eval]
"""

from __future__ import annotations

import argparse
import sys
import time

from ..models.swaligner import BatchSWAligner
from ..parallel.chunking import ChunkedAligner
from ..seqio.evaluate import check_parity
from ..seqio.native_io import read_fasta
from ..seqio.readers import read_ground_truth
from ..seqio.writers import write_align_output
from . import common


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref", default=str(common.REFERENCE_DATA / "data_small/genome.chr22.5K.fa"))
    p.add_argument("--input", default=str(common.REFERENCE_DATA / "data_small_ground_truth.csv"))
    p.add_argument("--output", default=str(common.REPO_DATA / "align_output.csv"))
    p.add_argument("--limit", type=int, default=0, help="align only the first N reads (0 = all)")
    p.add_argument("--eval", action="store_true", help="run position-parity check after writing")
    p.add_argument(
        "--parity-mode", choices=["exact", "skewed"], default="exact",
        help="skewed = bit-parity with the reference's serial AVX2 build "
        "(saturating uint8 + raw-layout argmax tie-break); exact = true "
        "int32 scores (default, strictly better on ground-truth parity)",
    )
    p.add_argument(
        "--seed-extend", action="store_true",
        help="FM-index exact-seed the reads and extend only inside the "
        "seeded reference window (banded SW); unseeded reads fall back to "
        "full-width — the seed-and-extend direction the reference's BWT "
        "prototype (src/bwt_fm.cpp) never finished",
    )
    p.add_argument(
        "--both-strands", action="store_true",
        help="also align the reverse complement of each read and keep the "
        "better score (forward wins ties); extension — the reference "
        "aligns the given sequence only",
    )
    common.add_scoring_flags(p)
    common.add_chunk_flags(p, npiece_default=17)
    common.add_platform_flags(p)
    args = p.parse_args(argv)
    common.apply_platform(args)

    ref = read_fasta(args.ref)
    rows = read_ground_truth(args.input)
    if args.limit:
        rows = rows[: args.limit]
    reads = [r["SEQ"] for r in rows]
    print(f"solve_small: {len(reads)} reads vs {len(ref)}-bp reference")

    cfg = common.scoring_from_args(args)
    if args.seed_extend and args.parity_mode == "skewed":
        p.error("--seed-extend implies exact int32 scoring; drop --parity-mode skewed")
    if args.seed_extend:
        from ..models.seed_extend import SeedExtendAligner

        aligner = SeedExtendAligner(ref, cfg)
        stream = lambda batches: aligner.align_stream(batches)
    elif args.parity_mode == "skewed":
        from ..utils.config import Semantics
        import dataclasses

        cfg = dataclasses.replace(cfg, semantics=Semantics.SAT_UINT8)
        aligner = BatchSWAligner(cfg, tie="skewed")
        stream = lambda batches: aligner.align_stream(batches, [ref])
    elif args.npiece > 1:
        aligner = ChunkedAligner(cfg=cfg, chunk=common.chunk_from_args(args))
        stream = lambda batches: aligner.align_stream(batches, ref)
    else:
        aligner = BatchSWAligner(cfg)
        stream = lambda batches: aligner.align_stream(batches, [ref])

    if args.both_strands:
        # Each batch doubles with the reads' reverse complements (same
        # pipelined stream, 2x lanes); pairwise merge keeps the better
        # strand per read.
        from ..models.swaligner import merge_strand_pairs
        from ..utils.encoding import revcomp

        inner = stream

        def stream(batches):  # noqa: F811 — intentional wrap
            # itertools.tee keeps only the batches between dispatch and
            # collect alive (the inner stream's pipeline depth), preserving
            # align_stream's bounded host memory and lazy input generators.
            import itertools

            b1, b2 = itertools.tee(list(b) for b in batches)
            doubled = (b + [revcomp(r) for r in b] for b in b1)
            for b, res in zip(b2, inner(doubled)):
                yield merge_strand_pairs(res[: len(b)], res[len(b) :])

    # Batches are pipelined: align_stream keeps a few batches dispatched
    # ahead of the oldest blocking fetch, hiding the device round trips.
    results = []
    cells = sum(len(r) for r in reads) * len(ref) * (2 if args.both_strands else 1)
    t0 = time.perf_counter()
    for bk, batch_results in enumerate(stream(common.batched(reads, args.batch_size))):
        results.extend(batch_results)
        done = len(results)
        if bk == 0 or done % (args.batch_size * 4) == 0 or done == len(reads):
            print(f"progress: {done}/{len(reads)}")
    t_total = time.perf_counter() - t0

    import os

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    write_align_output(args.output, rows, results)
    gcups = cells / t_total / 1e9
    # Under --seed-extend the DP work actually performed is ~20x smaller than
    # the full matrix; the figure below is matrix-equivalent throughput.
    label = "full-matrix-equivalent GCUPS" if args.seed_extend else "GCUPS"
    print(
        f"Aligned {len(results)} reads in {t_total:.3f}s "
        f"({cells/1e9:.3f} Gcells): {gcups:.3f} {label} (incl. traceback+host IO)"
    )
    print(f"Done, output file see: {args.output}")

    if args.eval:
        report = check_parity(args.output)
        print(report.summary())
        return 0 if report.diffs < len(results) * 0.02 else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
