#!/usr/bin/env bash
# Fetch hg38 chr22 for full-scale custom data generation (the reference's
# benchmark/ompfg/data_get_chr22.sh). Requires network access.
set -euo pipefail
DEST=${1:-data}
mkdir -p "$DEST"
wget -O "$DEST/genome.chr22.fa.gz" \
  "http://hgdownload.soe.ucsc.edu/goldenPath/hg38/chromosomes/chr22.fa.gz"
gunzip -f "$DEST/genome.chr22.fa.gz"
echo "fetched $DEST/genome.chr22.fa — generate benchmark data with:"
echo "  python -m parallel_genomeseq_tpu.cli.gen_data gen_ref --source-fa $DEST/genome.chr22.fa"
