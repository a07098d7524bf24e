#!/usr/bin/env python
"""Probe: titin-class query through the STRIPS-capable resident slab
(VERDICT r4 item 5).

A 4096-aa query scans the real SwissProt-scale database (561,356 entries)
on the device-resident slab via score_db_slab_strips_jit — the path that
previously fell back to the per-batch-upload loop for any query > MAX_M.
Correctness: the first scan's two-lane oracle gate inside
ResidentProteinDB, plus an explicit 8-entry comparison against the numpy
oracle here. Criterion: >= 10 GCUPS warm e2e (the non-resident loop
measured ~0.77 GCUPS at short-query shapes before round 4's slab).

Usage: python benchmarks/probe_slab_strips.py [--qlen 4096]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="data/uniprot_syn/database.fasta")
    ap.add_argument("--qlen", type=int, default=4096)
    ap.add_argument("--scans", type=int, default=3)
    ap.add_argument("--limit", type=int, default=0,
                    help="only first N entries (0 = full DB)")
    args = ap.parse_args()

    from parallel_genomeseq_tpu.models.protein_db import ResidentProteinDB
    from parallel_genomeseq_tpu.ops.oracle import sw_score_fast
    from parallel_genomeseq_tpu.ops.substitution import ALPHABET
    from parallel_genomeseq_tpu.seqio.uniprot import iter_database
    from parallel_genomeseq_tpu.utils.encoding import to_bytes
    from parallel_genomeseq_tpu.utils.platform import setup_cache

    setup_cache()
    entries = list(iter_database(args.db))
    if args.limit:
        entries = entries[: args.limit]
    rng = np.random.default_rng(7)
    aa = list(ALPHABET[:20])
    query = "".join(rng.choice(aa, args.qlen))
    # Plant a fragment of a random DB entry inside the query so a known
    # entry scores high (sanity that long-query hits are real).
    donor = entries[len(entries) // 2]
    frag = donor[1][:600]
    query = query[:1000] + frag + query[1000 + len(frag):]

    cells = len(query) * sum(len(s) for _, s in entries)
    print(f"DB: {len(entries)} entries; query {len(query)}aa (> MAX_M); "
          f"{cells/1e9:.1f} Gcells/scan")
    t0 = time.perf_counter()
    db = ResidentProteinDB(entries, matrix="blosum50", gap_penalty=12.0,
                           gap_open=0.0, max_query_len=args.qlen)
    print(f"resident: slab {db.slab_mb:.0f} MB, prep {db.prep_s:.1f}s")
    scores, pos, wall_cold = db.scan_scores(query)  # oracle-gated
    wall = min(db.scan_scores(query)[2] for _ in range(args.scans))
    print(f"cold scan {wall_cold:.1f}s; warm scan {wall:.3f}s = "
          f"{cells/wall/1e9:.2f} GCUPS, "
          f"{len(entries)/wall:,.0f} proteins/s "
          f"(startup total {time.perf_counter()-t0:.1f}s)")

    # Explicit oracle spot-check on 8 entries spread across length buckets.
    qb = to_bytes(query)
    cfg = db.cfg
    idxs = [db.order[k] for k in
            np.linspace(0, len(entries) - 1, 8).astype(int)]
    for k in idxs:
        want = sw_score_fast(qb, to_bytes(entries[k][1]), cfg)
        got = (int(scores[k]), int(pos[k]))
        assert got == (want[0], want[2]), (k, got, want)
    print("oracle spot-check: 8/8 exact")
    top = int(np.argmax(scores))
    print(f"top hit: {entries[top][0]} score={scores[top]} "
          f"(donor was {donor[0]})")


if __name__ == "__main__":
    main()
