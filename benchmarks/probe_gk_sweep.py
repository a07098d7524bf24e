#!/usr/bin/env python
"""Probe: sweep the slab scan-group size GK (VERDICT r4 item 8).

GK bounds how many same-padded-N batches fuse into one
score_db_slab_group_jit dispatch (models/protein_db.py). It was picked
once at 8; this probe measures the warm full-DB scan wall time of
ResidentProteinDB at GK in {4, 8, 16, 32, 64} on the real SwissProt-scale
database (561,356 entries) and reports GCUPS per setting, so the wired-in
default is a measured choice. Each setting pays its own per-shape program
loads on the cold scan; only the warm scans are compared.

Usage: python benchmarks/probe_gk_sweep.py [--db data/uniprot_syn/database.fasta]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="data/uniprot_syn/database.fasta")
    ap.add_argument("--gks", default="4,8,16,32,64")
    ap.add_argument("--scans", type=int, default=3)
    args = ap.parse_args()

    from parallel_genomeseq_tpu.models import protein_db as pdb
    from parallel_genomeseq_tpu.seqio.native_io import read_fasta
    from parallel_genomeseq_tpu.seqio.uniprot import iter_database
    from parallel_genomeseq_tpu.utils.platform import setup_cache

    setup_cache()
    query = read_fasta("/root/reference/data/query/P02232.fasta")
    entries = list(iter_database(args.db))
    cells = len(query) * sum(len(s) for _, s in entries)
    print(f"DB: {len(entries)} entries, query {len(query)}aa, "
          f"{cells/1e9:.1f} Gcells/scan")

    results = {}
    for gk in (int(v) for v in args.gks.split(",")):
        pdb.GK = gk
        t0 = time.perf_counter()
        db = pdb.ResidentProteinDB(entries, matrix="blosum50",
                                   gap_penalty=12.0, gap_open=0.0)
        _, _, wall_cold = db.scan_scores(query)
        wall = min(db.scan_scores(query)[2] for _ in range(args.scans))
        results[gk] = wall
        print(f"GK={gk:3d}: groups={len(db.groups):3d} "
              f"prep={db.prep_s:.1f}s cold={wall_cold:.2f}s "
              f"warm={wall:.3f}s = {cells/wall/1e9:.2f} GCUPS "
              f"(total setup {time.perf_counter()-t0:.1f}s)", flush=True)
        del db
    best = min(results, key=results.get)
    print(f"best: GK={best} ({results[best]:.3f}s, "
          f"{cells/results[best]/1e9:.2f} GCUPS)")


if __name__ == "__main__":
    main()
