"""External-baseline comparison: build + run the reference C++ binary and
compare output and speed against this framework (the role the vendored swps3
benchmark plays in the reference, benchmark/swps/).

Steps: copy the reference tree to a scratch dir (its CMake hardcodes the
output path into the source tree), build serial sw_solve_small, run it on
data_small, then run our solve_small in skewed-parity mode and diff the two
align_output.csv files row by row.

--mode uniprot checks the OTHER reference compute path: its UNIPROT driver
aligns with the float-matrix SWAligner<Similarity_Matrix> and default
uniform scoring (mpi_sw_solve_uniprot.cpp:120-123), not the skewed uint8
kernel. Its MPI harness as committed does not compile (MPI_float typo), so
this mode compiles a tiny probe of ours against the reference's own aligner
sources and diffs (score, pos) on the P02232 query vs synthetic protein
entries, pair for pair, against our exact-int32 colmajor aligner.

Usage: python benchmarks/compare_reference.py [--skip-build] [--mode uniprot]
"""

import argparse
import shutil
import subprocess
import sys
import time
from pathlib import Path

REF = Path("/root/reference")
SCRATCH = Path("/tmp/pgs_refcmp")
REPO = Path(__file__).resolve().parents[1]


def build():
    src = SCRATCH / "src"
    if not (src / "CMakeLists.txt").exists():
        SCRATCH.mkdir(parents=True, exist_ok=True)
        shutil.copytree(REF, src, dirs_exist_ok=True)
    bld = SCRATCH / "build"
    bld.mkdir(exist_ok=True)
    subprocess.run(
        ["cmake", str(src), "-DCMAKE_BUILD_TYPE=Release"],
        cwd=bld, check=True, capture_output=True,
    )
    subprocess.run(
        ["make", "-j2", "sw_solve_small"], cwd=bld, check=True, capture_output=True
    )
    return src / "bin" / "sw_solve_small"


PROBE_SRC = r"""
// Parity probe (part of the TPU framework's benchmark harness, NOT of the
// reference): drives the reference's own SWAligner<Similarity_Matrix> —
// the class its UNIPROT driver uses (mpi_sw_solve_uniprot.cpp:120-123) —
// over tab-separated (x, y) pairs and prints "score,pos" per pair.
#include <fstream>
#include <iostream>
#include <string>
#include "smithwaterman.h"

int main(int argc, char** argv) {
  std::ifstream in(argv[1]);
  std::string line;
  while (std::getline(in, line)) {
    auto tab = line.find('\t');
    if (tab == std::string::npos) continue;
    std::string x = line.substr(0, tab), y = line.substr(tab + 1);
    SWAligner<Similarity_Matrix> la(x, y);
    float score = la.calculateScore();
    std::cout << score << "," << la.getPos() << "\n";
  }
  return 0;
}
"""


def build_probe():
    """Compile the probe against the reference's aligner sources + its
    vendored Eigen (unpacked by the cmake build)."""
    src = SCRATCH / "src"
    eigen = None
    for cand in SCRATCH.rglob("Eigen/Dense"):
        eigen = cand.parents[1]
        break
    if eigen is None:
        raise RuntimeError("vendored Eigen not found — run the cmake build first")
    probe_cpp = SCRATCH / "parity_probe.cpp"
    probe_cpp.write_text(PROBE_SRC)
    probe = SCRATCH / "parity_probe"
    subprocess.run(
        [
            "g++", "-O2", "-std=c++17", "-march=native",
            f"-I{src}/src/aligner", f"-I{eigen}",
            str(probe_cpp),
            f"{src}/src/aligner/smithwaterman.cpp",
            f"{src}/src/aligner/similaritymatrix.cpp",
            "-o", str(probe),
        ],
        check=True, capture_output=True,
    )
    return probe


def run_uniprot_parity(n_entries=64, seed=99):
    """(score, pos) parity on the UNIPROT compute path: reference float
    SWAligner vs our exact-int32 colmajor aligner, P02232 query + synthetic
    protein entries (the SwissProt files themselves are not committed)."""
    import random

    sys.path.insert(0, str(REPO))
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta

    probe = build_probe()
    query = read_fasta("/root/reference/data/query/P02232.fasta")
    rng = random.Random(seed)
    alpha = "ARNDCQEGHILKMFPSTWYV"
    entries = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(60, 400)))
        for _ in range(n_entries)
    ]
    entries[0] = query  # one exact self-hit
    entries[1] = query[20:80]  # one exact substring
    pairs = SCRATCH / "uniprot_pairs.tsv"
    # The reference driver passes (x=db entry, y=query):
    # mpi_sw_solve_uniprot.cpp:120 `SWAligner<...>(input_line, fa_string)`.
    pairs.write_text("".join(f"{e}\t{query}\n" for e in entries))
    out = subprocess.run(
        [str(probe), str(pairs)], check=True, capture_output=True, text=True
    ).stdout.splitlines()
    want = [(float(s), int(p)) for s, p in (ln.split(",") for ln in out)]

    ours = BatchSWAligner().align_batch(entries, [query] * len(entries))
    diffs = [
        (k, want[k], (r.score, r.pos))
        for k, r in enumerate(ours)
        if (r.score, r.pos) != want[k]
    ]
    for k, w, g in diffs[:10]:
        print(f"  entry {k}: reference (score,pos)={w} ours={g}")
    print(
        f"uniprot-path parity: {len(entries) - len(diffs)}/{len(entries)} "
        f"pairs bit-identical (float SWAligner vs exact-int32 colmajor)"
    )
    return 1 if diffs else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--mode", choices=["small", "uniprot"], default="small")
    args = ap.parse_args()

    binary = SCRATCH / "src" / "bin" / "sw_solve_small"
    if not args.skip_build or not binary.exists():
        print("building reference binary...")
        binary = build()

    if args.mode == "uniprot":
        return run_uniprot_parity()

    print("running reference binary...")
    t0 = time.perf_counter()
    subprocess.run([str(binary)], cwd=SCRATCH / "src", check=True,
                   capture_output=True)
    t_ref = time.perf_counter() - t0
    ref_out = SCRATCH / "src" / "data" / "align_output.csv"

    print("running TPU framework (skewed-parity mode)...")
    ours_out = REPO / "data" / "align_output_parity.csv"
    t0 = time.perf_counter()
    subprocess.run(
        [
            sys.executable, "-m", "parallel_genomeseq_tpu.cli.solve_small",
            "--parity-mode", "skewed", "--output", str(ours_out),
        ],
        cwd=REPO, check=True, capture_output=True,
    )
    t_ours = time.perf_counter() - t0

    rc = subprocess.run(
        [
            sys.executable, "-m", "parallel_genomeseq_tpu.cli.evaluate",
            "--option", "compare", "--align-file", str(ours_out),
            "--compare-file", str(ref_out),
        ],
        cwd=REPO,
    ).returncode
    print(f"reference binary wall: {t_ref:.1f}s | framework wall: {t_ours:.1f}s")
    print("BIT-PARITY" if rc == 0 else "MISMATCH")
    return rc


if __name__ == "__main__":
    sys.exit(main())
