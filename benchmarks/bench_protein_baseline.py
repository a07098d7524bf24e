#!/usr/bin/env python
"""Protein-path CPU baselines: what the TPU profile kernels must beat.

Two baselines, mirroring the roles in the reference repo:

1. `reference`: the reference's OWN protein compute path — its
   SWAligner<Similarity_Matrix> with a substitution-matrix scoring lambda,
   exactly what mpi_sw_solve_uniprot.cpp:120-123 runs per protein — built
   from the reference's sources (out-of-tree copy, like
   compare_reference.py) and timed on this host.
2. `striped`: a from-scratch Farrar striped SSE2 int16 SW
   (benchmarks/striped_sw.c) — the swps3 algorithm class. The actual swps3
   sources are wget-fetched by benchmark/swps/init_setup.sh (not vendored)
   and this rig has no egress, so this is the honest swps3-class stand-in.
   Scores are verified against ops/oracle before timing.

Workloads:
- `uniprot` shape: P02232 query (145 aa) vs 360-aa entries — the workload
  mpi_sw_solve_uniprot distributes (bench.py's protein headline shape).
- `swps3` shape: 1000-aa query vs 1000-aa db entries — the smallest rung
  of py/benchmark_swps.py:7-17's sweep.

Usage: python benchmarks/bench_protein_baseline.py [--skip-reference]
Prints one GCUPS line per (baseline, workload, gap-model).
"""

import argparse
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
SCRATCH = pathlib.Path("/tmp/pgs_protein_base")


def write_matrix(path):
    from parallel_genomeseq_tpu.ops.substitution import ALPHABET, BLOSUM50

    with open(path, "w") as f:
        f.write(ALPHABET + "\n")
        for row in np.asarray(BLOSUM50, int):
            f.write(" ".join(map(str, row)) + "\n")


def make_workload(shape, B, seed=11, size=1000, plant=True):
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta

    rng = np.random.default_rng(seed)
    aa = list("ARNDCQEGHILKMFPSTWYV")
    if shape == "uniprot":
        q = read_fasta("/root/reference/data/query/P02232.fasta")
        dbs = ["".join(rng.choice(aa, 360)) for _ in range(B)]
    else:  # swps3 size rung (py/benchmark_swps.py sweeps 1k-8k residues)
        q = "".join(rng.choice(aa, size))
        dbs = ["".join(rng.choice(aa, size)) for _ in range(B)]
    if plant:
        # plant the query head into lane 0 so scores are non-trivial; the
        # big sweep rungs skip this (a >= 8k self-hit scores past the
        # int16 saturation point of any Farrar/swps3-class kernel)
        dbs[0] = (
            q[: min(len(q), len(dbs[0]))] + dbs[0][min(len(q), len(dbs[0])) :]
        )
    return q, dbs


def build_striped():
    SCRATCH.mkdir(parents=True, exist_ok=True)
    exe = SCRATCH / "striped_sw"
    subprocess.run(
        ["gcc", "-O3", "-march=native", str(REPO / "benchmarks/striped_sw.c"),
         "-o", str(exe)],
        check=True, capture_output=True,
    )
    return exe


def run_striped(exe, q, dbs, gap_open, gap_ext, reps):
    mat = SCRATCH / "blosum50.tsv"
    write_matrix(mat)
    pairs = SCRATCH / "pairs.tsv"
    pairs.write_text("".join(f"{q}\t{d}\n" for d in dbs))
    out = subprocess.run(
        [str(exe), str(mat), str(gap_open), str(gap_ext), str(pairs),
         str(reps)],
        check=True, capture_output=True, text=True,
    ).stdout.splitlines()
    scores = [int(s) for s in out if not s.startswith("#")]
    gcups = float(next(s.split()[2] for s in out if s.startswith("# GCUPS")))
    return scores, gcups


def verify_striped(q, dbs, scores, gap_open, gap_ext, nver=8):
    from parallel_genomeseq_tpu.ops.oracle import (
        sw_affine_score_fast, sw_score_fast,
    )
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    cfg = blosum_config("blosum50", gap_penalty=gap_ext, gap_open=gap_open)
    fast = sw_affine_score_fast if gap_open else sw_score_fast
    idx = list(range(0, len(dbs), max(1, len(dbs) // nver)))
    for k in idx:
        want = fast(q, dbs[k], cfg)[0]
        if scores[k] != want:
            raise RuntimeError(
                f"striped_sw mismatch lane {k}: {scores[k]} != oracle {want}"
            )


REF_PROBE = r"""
// Timing probe over the reference's own protein compute path (the
// SWAligner<Similarity_Matrix> + custom scoring lambda configuration of
// mpi_sw_solve_uniprot.cpp:120-123). Part of the TPU framework's benchmark
// harness, not of the reference.
#include <chrono>
#include <fstream>
#include <functional>
#include <iostream>
#include <string>
#include <vector>
#include "smithwaterman.h"

static int idx[256];
static std::vector<std::vector<float>> MAT;

int main(int argc, char** argv) {
  std::ifstream mf(argv[1]);
  std::string alpha; mf >> alpha;
  int A = alpha.size();
  MAT.assign(A, std::vector<float>(A));
  for (int i = 0; i < A; i++) for (int j = 0; j < A; j++) mf >> MAT[i][j];
  for (int i = 0; i < 256; i++) idx[i] = -1;
  for (int i = 0; i < A; i++) idx[(unsigned char)alpha[i]] = i;
  float gap_open = std::atof(argv[2]);   // linear model only when 0
  float gap_ext = std::atof(argv[3]);
  (void)gap_open;  // the reference aligner supports linear gaps only
  std::ifstream in(argv[4]);
  int reps = argc > 5 ? std::atoi(argv[5]) : 1;
  auto score_fn = [](const char& a, const char& b) {
    return MAT[idx[(unsigned char)a]][idx[(unsigned char)b]];
  };
  std::vector<std::pair<std::string, std::string>> pairs;
  std::string line;
  while (std::getline(in, line)) {
    auto tab = line.find('\t');
    if (tab == std::string::npos) continue;
    pairs.emplace_back(line.substr(0, tab), line.substr(tab + 1));
  }
  double cells = 0;
  for (auto& p : pairs) cells += double(p.first.size()) * p.second.size();
  auto t0 = std::chrono::high_resolution_clock::now();
  float sink = 0;
  for (int r = 0; r < reps; r++)
    for (auto& p : pairs) {
      SWAligner<Similarity_Matrix> la(p.first, p.second, score_fn, gap_ext);
      sink += la.calculateScore();
    }
  double dt = std::chrono::duration<double>(
      std::chrono::high_resolution_clock::now() - t0).count();
  std::cerr << "sink " << sink << "\n";
  std::cout << "# GCUPS " << cells * reps / dt / 1e9 << "\n";
  return 0;
}
"""


def build_ref_probe():
    """Build against the reference sources (out-of-tree copy; reuses the
    compare_reference.py scratch tree and its unpacked Eigen)."""
    sys.path.insert(0, str(REPO / "benchmarks"))
    import compare_reference as cr

    src = cr.SCRATCH / "src"
    if not (src / "CMakeLists.txt").exists():
        cr.build()
    eigen = None
    for cand in cr.SCRATCH.rglob("Eigen/Dense"):
        eigen = cand.parents[1]
        break
    if eigen is None:
        cr.build()
        for cand in cr.SCRATCH.rglob("Eigen/Dense"):
            eigen = cand.parents[1]
            break
    cpp = SCRATCH / "ref_protein_probe.cpp"
    cpp.write_text(REF_PROBE)
    exe = SCRATCH / "ref_protein_probe"
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-march=native",
         f"-I{src}/src/aligner", f"-I{eigen}", str(cpp),
         f"{src}/src/aligner/smithwaterman.cpp",
         f"{src}/src/aligner/similaritymatrix.cpp", "-o", str(exe)],
        check=True, capture_output=True,
    )
    return exe


def run_striped_procs(exe, q, dbs, gap_open, gap_ext, reps, nproc):
    """swps3-style worker-pool scaling (the reference's swps3_benchmark.c
    forks one worker per thread count, benchmark/swps/swps3_benchmark.c):
    split the pairs over nproc concurrent single-core processes and report
    aggregate cells / wall time."""
    mat = SCRATCH / "blosum50.tsv"
    write_matrix(mat)
    chunks = [dbs[p::nproc] for p in range(nproc)]
    files = []
    for p, ch in enumerate(chunks):
        f = SCRATCH / f"pairs_{p}.tsv"
        f.write_text("".join(f"{q}\t{d}\n" for d in ch))
        files.append(f)
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [str(exe), str(mat), str(gap_open), str(gap_ext), str(f),
             str(reps)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for f in files
    ]
    for pr in procs:
        assert pr.wait() == 0
    dt = time.perf_counter() - t0
    cells = sum(len(q) * len(d) for d in dbs) * reps
    return cells / dt / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-reference", action="store_true",
                    help="skip building/timing the reference-sources probe")
    ap.add_argument(
        "--sweep", action="store_true",
        help="run the full swps3-style sweep (problem sizes 1k-8k residues "
        "x worker counts, py/benchmark_swps.py:7-17) instead of the two "
        "headline rungs",
    )
    args = ap.parse_args()
    SCRATCH.mkdir(parents=True, exist_ok=True)

    exe = build_striped()
    results = {}
    for shape, B, reps in (("uniprot", 256, 20), ("swps3", 32, 4)):
        q, dbs = make_workload(shape, B)
        for gname, gopen in (("linear", 0), ("affine10", 10)):
            scores, gcups = run_striped(exe, q, dbs, gopen, 2, reps)
            verify_striped(q, dbs, scores, gopen, 2)
            results[f"striped[{shape},{gname}]"] = gcups
            print(f"striped_sw  {shape:8s} {gname:9s} {gcups:7.3f} GCUPS "
                  "(verified vs oracle)")

    if args.sweep:
        # The reference's swps3 sweep: problem sizes 1k..8k residues
        # (py/benchmark_swps.py:7-17 sweeps 1000-8000) x worker counts
        # (its 2-72 thread axis, capped at this host's cores — the pool is
        # embarrassingly parallel over pairs, as in swps3_benchmark.c's
        # fork-per-worker design).
        import os

        workers = sorted({1, 2, os.cpu_count() or 1})
        workers = [w for w in workers if w <= (os.cpu_count() or 1)]
        for size in (1000, 2000, 4000, 8000):
            B = max(4, 32_000_000 // (size * size))
            q, dbs = make_workload("swps3", B, size=size, plant=size < 3000)
            for gname, gopen in (("linear", 0), ("affine10", 10)):
                scores, _ = run_striped(exe, q, dbs, gopen, 2, 1)
                verify_striped(q, dbs, scores, gopen, 2, nver=2)
                for w in workers:
                    gcups = run_striped_procs(exe, q, dbs, gopen, 2, 1, w)
                    results[f"striped[swps3-{size},{gname},w{w}]"] = gcups
                    print(
                        f"striped_sw  {size}x{size} {gname:9s} workers={w} "
                        f"{gcups:7.3f} GCUPS aggregate"
                    )

    if not args.skip_reference:
        ref = build_ref_probe()
        mat = SCRATCH / "blosum50.tsv"
        for shape, B, reps in (("uniprot", 64, 2), ("swps3", 4, 1)):
            q, dbs = make_workload(shape, B)
            pairs = SCRATCH / "pairs.tsv"
            pairs.write_text("".join(f"{q}\t{d}\n" for d in dbs))
            out = subprocess.run(
                [str(ref), str(mat), "0", "2", str(pairs), str(reps)],
                check=True, capture_output=True, text=True,
            ).stdout
            gcups = float(out.split()[-1])
            results[f"reference[{shape},linear]"] = gcups
            print(f"reference   {shape:8s} linear    {gcups:7.3f} GCUPS "
                  "(float SWAligner, the mpi_sw_solve_uniprot path)")

    import json
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
