"""Probe: packed-profile kernels (round-4 word-select redesign) on real TPU.

Verifies the depth-3 word-select tree + byte-extract compiles on v5e Mosaic,
passes the first-batch oracle gate, and measures marginal GCUPS at the
UNIPROT shape vs the round-3 A-way selector baseline (52.3/52.8 GCUPS).
"""
import sys
sys.path.insert(0, "/root/repo")
from bench import build_protein_inputs, kernel_estimate
from parallel_genomeseq_tpu.ops.substitution import blosum_config
from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

for name, gopen in (("linear", 0.0), ("affine", 10.0)):
    cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=gopen)
    eng = PallasEngine(cfg)
    print(f"[{name}] interpret={eng.interpret}", flush=True)
    xs, ys, m, n, _ = build_protein_inputs(128)
    eng.score_batch(xs, ys, m, n)  # first-batch oracle gate
    print(f"[{name}] first-batch oracle gate PASSED", flush=True)
    k, e, _, _ = kernel_estimate(eng, builder=build_protein_inputs)
    print(f"[{name}] kernel={k:.1f} GCUPS  e2e(B=5120)={e:.1f} GCUPS", flush=True)
