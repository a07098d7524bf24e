"""parallel_genomeseq_tpu — TPU-native parallel local sequence alignment.

A from-scratch JAX / XLA / Pallas framework with the capabilities of the
reference C++/OpenMP/MPI implementation (kosta777/parallel-genomeseq):
Smith-Waterman local alignment of DNA reads against reference genomes and of
protein queries against UNIPROT, built around a batched anti-diagonal
wavefront kernel, coarse-grained overlapping-chunk decomposition across the
device mesh, and read-level data parallelism.

Layers (bottom-up):
- ops:      DP compute — numpy oracle, lax.scan sweep, Pallas wavefront kernel
- models:   aligner APIs (SWAligner, chunked ParallelLocalAligner, FM-index)
- parallel: chunk geometry, device mesh sharding, multi-host distribution
- seqio:    FASTA/FASTQ/SAM/CSV ingestion and result output
- cli:      workload drivers (solve_small, solve_big, solve_batch, solve_uniprot)
- utils:    scoring config, encodings, results, timings
"""

from .utils.config import ChunkConfig, ScoringConfig, Semantics
from .utils.result import AlignResult, Timings

__version__ = "0.1.0"

__all__ = [
    "AlignResult",
    "ChunkConfig",
    "ScoringConfig",
    "Semantics",
    "Timings",
    "__version__",
]
