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
import time

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
    import os

    from ..seqio import native_io

    with open(path, "rb") as f:
        first = f.readline()
    rec = len(first)  # payload + newline
    size = os.path.getsize(path)
    # Uniform-record fast path requires the file to be an exact multiple of
    # the first record's size AND every sliced record to decode as one full
    # line (payload + trailing newline, no embedded newline). A ragged file
    # can pass the size check by coincidence, so the decode check always
    # runs — including in single-process mode, where the old code skipped it
    # and sliced ragged reads at wrong byte offsets.
    if rec > 1 and first.endswith(b"\n") and size % rec == 0:
        total = native_io.count_records(path, rec)
        per = (total + num_processes - 1) // num_processes
        lo = process_id * per
        block = native_io.read_records(path, rec, lo, per)
        # Validate the slice against the raw bytes (read_records strips the
        # record's final byte): uniform records means every newline in the
        # slice sits exactly at a record boundary.
        with open(path, "rb") as f:
            f.seek(lo * rec)
            raw = f.read(len(block) * rec)
        ok = all(
            raw[k * rec : (k + 1) * rec].endswith(b"\n")
            and b"\n" not in raw[k * rec : (k + 1) * rec - 1]
            for k in range(len(block))
        )
        if ok:
            return total, ["".join(map(chr, row)).strip() for row in block], lo
    # Ragged records: whole-file line reader (each process still keeps only
    # its own slice in memory as reads; the file is small relative to reads).
    with open(path) as f:
        reads = [l.strip() for l in f if l.strip()]
    per = (len(reads) + num_processes - 1) // num_processes
    lo = process_id * per
    return len(reads), reads[lo : lo + per], lo


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reads", required=True, help="line-per-read file (see seqio.readers.fastq_to_lines)")
    p.add_argument("--ref", default=str(common.REFERENCE_DATA / "data_small/genome.chr22.5K.fa"))
    p.add_argument("--output", default=str(common.REPO_DATA / "align_output_dist.csv"))
    p.add_argument("--coordinator", default=None, help="host:port for jax.distributed")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument(
        "--score-only", action="store_true",
        help="skip the winner-window traceback and emit the DP argmax "
        "column pos_end instead of pos_pred (faster; diverges from the "
        "reference writer's schema)",
    )
    p.add_argument(
        "--merge-timeout", type=float, default=600.0,
        help="seconds the writer waits for all shards before failing",
    )
    p.add_argument(
        "--bench-align", action="store_true",
        help="re-run the (already compiled) local scoring pass once more "
        "and print its compute-only rate as 'align_rate: ...' — the "
        "multi-process scaling measurement (compile time excluded)",
    )
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

    import jax

    aligner = MeshAligner(
        chunk_cfg=common.chunk_from_args(args),
        # Each process computes its own read slice on its LOCAL devices (the
        # MPI worker pattern); no cross-process collective is in the compute.
        mesh=make_mesh(devices=jax.local_devices()),
    )
    out = aligner.score_reads(local_reads, ref)

    if args.bench_align:
        # Timed warm re-run: the first score_reads above paid the compile,
        # so this measures pure per-process alignment throughput (the
        # quantity that must scale ~linearly with process count).
        t0 = time.perf_counter()
        out = aligner.score_reads(local_reads, ref)
        np.asarray(out["score"])
        dt = time.perf_counter() - t0
        print(
            f"align_rate: {len(local_reads)} reads in {dt:.4f}s = "
            f"{len(local_reads) / dt:.1f} reads/s"
        )

    if args.score_only:
        header = "index,SEQ,pos_end,score\n"
        rows = [
            f"{offset + k},{read},{int(out['j'][k])},{int(out['score'][k])}\n"
            for k, read in enumerate(local_reads)
        ]
    else:
        # The reference's MPI workers run the FULL aligner — score AND
        # traceback — per read, and the writer rank emits pos_pred
        # (src/mpi_sw_solve_small.cpp:126-186). TPU equivalent: each process
        # re-runs a traceback aligner on its reads' winning windows only
        # (the chunking winner-re-run trick, plocalaligner.cpp:132-141),
        # then offsets pos back to global 1-based reference coordinates.
        pos_pred = _winner_traceback(
            local_reads, ref, out["piece"], args, batch=args.batch_size
        )
        header = "index,SEQ,pos_pred,score\n"
        rows = [
            f"{offset + k},{read},{pos_pred[k]},{int(out['score'][k])}\n"
            for k, read in enumerate(local_reads)
        ]

    # Process 0 is the writer (the reference's rank size-1 writer pattern,
    # src/mpi_sw_solve_small.cpp:148-186): every process writes its shard
    # atomically (tmp + rename), then process 0 waits for ALL shards before
    # merging — fixing the round-1 race where an early-finishing process 0
    # silently skipped the merge.
    import os

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    shard_path = f"{args.output}.part{args.process_id}"
    with open(shard_path + ".tmp", "w") as f:
        f.write(header)
        f.writelines(rows)
    os.replace(shard_path + ".tmp", shard_path)
    print(f"wrote shard {shard_path}")

    if args.coordinator:
        # Real barrier through the jax.distributed coordination service, so
        # non-writer processes also exit only after every shard is durable.
        _barrier("pgs_shards_written", args.merge_timeout)

    if args.process_id == 0:
        parts = [f"{args.output}.part{p}" for p in range(args.num_processes)]
        deadline = time.time() + args.merge_timeout
        while not all(os.path.exists(p) for p in parts):
            if time.time() > deadline:
                missing = [p for p in parts if not os.path.exists(p)]
                print(f"merge timeout: missing shards {missing}", file=sys.stderr)
                return 1
            time.sleep(0.05)
        with open(args.output, "w") as f:
            f.write(header)
            for part in parts:
                with open(part) as pf:
                    next(pf)
                    f.write(pf.read())
        print(f"Done, output file see: {args.output}")
    return 0


def _winner_traceback(reads, ref, pieces, args, batch=128):
    """Per-read traceback on the winning window, in global coordinates.

    Mirrors ChunkedAligner._submit_winner (parallel/chunking.py:177-210)
    but takes the winner from the mesh merge's ``piece`` output. The window
    geometry must match MeshAligner.score_reads: one shared range set built
    from the LONGEST local read (mesh.py:275-278). Batches are pipelined
    depth-2 through the submit/collect split to hide device round trips.
    """
    from collections import deque

    from ..models.swaligner import BatchSWAligner
    from ..parallel.chunking import make_string_ranges

    if not reads:
        return []
    ranges = make_string_ranges(
        args.npiece, max(len(r) for r in reads), len(ref), args.overlap_ratio
    )
    # Mesh padding can report a pad-window id for all-zero-score reads;
    # clamp to the real windows (window 0 starts at ref[0], same result).
    win = [min(max(int(p), 0), len(ranges) - 1) for p in pieces]
    aligner = BatchSWAligner()
    q = deque()
    pos = []

    def _drain(pending, lefts):
        for r, res in zip(lefts, aligner.collect(pending)):
            pos.append((res.pos + r) if res.pos > 0 else 0)

    for k in range(0, len(reads), batch):
        chunk = reads[k : k + batch]
        lefts = [ranges[w][0] for w in win[k : k + batch]]
        refs = [ref[ranges[w][0] : ranges[w][1]] for w in win[k : k + batch]]
        q.append((aligner.submit_batch(chunk, refs), lefts))
        if len(q) > 2:
            _drain(*q.popleft())
    while q:
        _drain(*q.popleft())
    return pos


def _barrier(name: str, timeout_s: float):
    """Block until every process reaches this point (jax.distributed only)."""
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


if __name__ == "__main__":
    sys.exit(main())
