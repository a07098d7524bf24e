"""External-baseline comparison: build + run the reference C++ binary and
compare output and speed against this framework (the role the vendored swps3
benchmark plays in the reference, benchmark/swps/).

Steps: copy the reference tree to a scratch dir (its CMake hardcodes the
output path into the source tree), build serial sw_solve_small, run it on
data_small, then run our solve_small in skewed-parity mode and diff the two
align_output.csv files row by row.

Usage: python benchmarks/compare_reference.py [--skip-build]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    binary = SCRATCH / "src" / "bin" / "sw_solve_small"
    if not args.skip_build or not binary.exists():
        print("building reference binary...")
        binary = build()

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
