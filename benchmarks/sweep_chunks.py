"""Chunk-count sweep of solve_big (the reference's benchmark_mediumpara.py:
npiece in 7..36, nrepeat fixed; py/benchmark_mediumpara.py:4-8)."""

import subprocess
import sys

NREPEAT = sys.argv[1] if len(sys.argv) > 1 else "3"
EXTRA = sys.argv[2:]

for npiece in range(7, 37):
    print(f"=== npiece={npiece} ===", flush=True)
    subprocess.run(
        [
            sys.executable, "-m", "parallel_genomeseq_tpu.cli.solve_big",
            str(npiece), NREPEAT, *EXTRA,
        ],
        check=True,
    )
