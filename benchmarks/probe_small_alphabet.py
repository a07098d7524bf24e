#!/usr/bin/env python
"""Probe: substitution-matrix scoring with a SMALL alphabet on real TPU.

Two purposes:
1. Feature: DNA substitution matrices (transition/transversion weighting,
   the EDNAFULL class of scoring — something the reference's fast path
   cannot do at all, src/aligner/similaritymatrix.cpp:389-392) on the
   Pallas fast path. A 4-letter alphabet packs into TWO profile words, so
   the ncodes-pruned select tree collapses to ONE select + byte extract.
2. Model check: round 4 concluded the protein profile kernel (~70 GCUPS vs
   ~257 uniform) is bound by VMEM traffic of its 7 word planes, not by
   extraction ops. If that model is right, the 2-word DNA-matrix kernel
   should land well above the protein kernel.

Workload: the DNA headline shape (125-bp reads x 4,980-bp chr22 reference,
B=128 vs 5120 marginal differencing) with a transition/transversion matrix
(match +5, transition -1, transversion -4). Scores oracle-verified.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import build_inputs, kernel_estimate
from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine
from parallel_genomeseq_tpu.utils.config import ScoringConfig


def tt_config(gap_open=0.0):
    """Transition/transversion DNA matrix: A<->G and C<->T are transitions
    (chemically likelier, milder penalty)."""
    alpha = "ACGT"
    S = np.full((4, 4), -4, np.int32)  # transversion
    np.fill_diagonal(S, 5)
    for a, b in (("A", "G"), ("C", "T")):
        S[alpha.index(a), alpha.index(b)] = -1
        S[alpha.index(b), alpha.index(a)] = -1
    return ScoringConfig(matrix=S, alphabet=alpha, gap_penalty=2.0,
                         gap_open=gap_open)


def main():
    from parallel_genomeseq_tpu.ops.oracle import sw_score_fast

    cfg = tt_config()
    eng = PallasEngine(cfg)
    print(f"interpret={eng.interpret} ncodes={eng._ncodes()} "
          f"(words={max(1, (eng._ncodes() + 3) // 4)})", flush=True)
    xs, ys, m, n, _ = build_inputs(128)
    res = eng.score_batch(xs, ys, m, n)  # first-batch oracle gate inside
    # Extra spot check vs the fast oracle on a lane with the custom matrix.
    want = sw_score_fast(xs[3][: m[3]], ys[3][: n[3]], cfg)
    got = int(np.asarray(res["score"])[3])
    assert got == want[0], (got, want)
    print(f"oracle spot check OK (score {got})", flush=True)
    k, e, _, _ = kernel_estimate(eng)
    print(f"dna-matrix kernel={k:.1f} GCUPS  e2e(B=5120)={e:.1f} GCUPS "
          f"(uniform kernel ~257, protein 7-word profile ~70)", flush=True)


if __name__ == "__main__":
    main()
