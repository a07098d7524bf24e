#!/usr/bin/env bash
# Lane-count sweep of the batched aligner (the reference's fine-grain
# thread sweep, benchmark/ompfg/ompfg_bench_template.sh:20-33, with batch
# lanes replacing OMP threads). Appends rows to the timing CSV consumed by
# `evaluate --option ompfg`.
set -euo pipefail
N_READS=${N_READS:-128}
ENGINE=${ENGINE:-auto}
OUT=${OUT:-data/timing_sweep.csv}
for lanes in 8 16 32 64 128 256; do
  echo "=== lanes=$lanes ==="
  python -m parallel_genomeseq_tpu.cli.solve_batch "$N_READS" \
    --engine "$ENGINE" --batch-size "$lanes" --timing-file "$OUT" "$@"
done
echo "sweep complete -> $OUT"
