"""Scoring and execution configuration for the TPU-native aligner.

The reference implementation configures scoring via a C++
``std::function<float(char,char)>`` plus a float gap penalty with defaults
``a == b ? +3 : -3`` and ``gap_penalty = 2.0``
(reference: src/aligner/smithwaterman.cpp:8) and its fast AVX2 path probes the
function to recover uniform match/mismatch scores
(reference: src/aligner/similaritymatrix.cpp:389-392), which restricts that
path to uniform scoring.

Here scoring is declarative data instead of an opaque callable, so every
execution path (oracle, lax.scan sweep, Pallas wavefront kernel) supports the
same configurations:

- uniform match/mismatch scoring (DNA read mapping), and
- a substitution matrix over a finite alphabet (protein scoring, e.g. BLOSUM50
  for the UNIPROT workload; the reference only supports this on its slow
  float path).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np


class Semantics(enum.Enum):
    """DP value semantics.

    EXACT_INT32: exact integer DP values (no clamping). This is the default:
        it reproduces the reference's float-matrix semantics
        (src/aligner/similaritymatrix.cpp:49-54) exactly whenever the scoring
        parameters are integers, which they are for every shipped workload.
    FLOAT32: exact float32 DP (for non-integer scoring parameters).
    SAT_UINT8: saturating uint8 DP, matching the reference's skewed AVX2 path
        (`_mm256_adds_epu8`/`_mm256_subs_epu8`, src/aligner/similaritymatrix.cpp:75-81):
        scores clamp to [0, 255] and mismatch/gap use saturating subtraction.
    """

    EXACT_INT32 = "int32"
    FLOAT32 = "float32"
    SAT_UINT8 = "sat_uint8"


@dataclasses.dataclass(frozen=True)
class ScoringConfig:
    """Declarative scoring: uniform match/mismatch or a substitution matrix.

    Defaults mirror the reference defaults (+3 match, -3 mismatch, gap 2.0;
    src/aligner/smithwaterman.cpp:8).

    If ``matrix`` is provided it is a ``(len(alphabet), len(alphabet))`` array
    and ``alphabet`` maps characters to matrix rows; match/mismatch are
    ignored. Gap penalty is linear (the reference has no affine gaps).
    """

    match: float = 3.0
    mismatch: float = -3.0
    gap_penalty: float = 2.0
    gap_open: float = 0.0
    matrix: Optional[np.ndarray] = None
    alphabet: Optional[str] = None
    semantics: Semantics = Semantics.EXACT_INT32

    def __post_init__(self):
        if (self.matrix is None) != (self.alphabet is None):
            raise ValueError("matrix and alphabet must be provided together")
        if self.matrix is not None:
            m = np.asarray(self.matrix)
            if m.shape != (len(self.alphabet), len(self.alphabet)):
                raise ValueError(
                    f"matrix shape {m.shape} != ({len(self.alphabet)},) ** 2"
                )
        if float(self.gap_open) < 0:
            raise ValueError("gap_open must be >= 0 (it is a penalty magnitude)")
        if self.gap_open and self.semantics == Semantics.SAT_UINT8:
            raise ValueError("affine gaps are not supported in SAT_UINT8 semantics")

    @property
    def is_uniform(self) -> bool:
        return self.matrix is None

    @property
    def is_affine(self) -> bool:
        """Affine (Gotoh) gap model: a gap of length L costs
        ``gap_open + L * gap_penalty`` (gap_penalty acts as the per-residue
        extend cost; gap_open is the one-time opening surcharge). gap_open=0
        degenerates exactly to the reference's linear model — an extension
        beyond the reference, which has no affine gaps
        (src/aligner/smithwaterman.cpp:8 takes a single gap_penalty)."""
        return float(self.gap_open) != 0.0

    @property
    def is_integral(self) -> bool:
        vals = [self.gap_penalty, self.gap_open]
        if self.is_uniform:
            vals += [self.match, self.mismatch]
        else:
            vals += list(np.asarray(self.matrix).ravel())
        return all(float(v) == int(v) for v in vals)

    def score(self, a: str, b: str) -> float:
        """Scalar scoring function (the oracle path uses this)."""
        if self.is_uniform:
            return self.match if a == b else self.mismatch
        ia = self.alphabet.find(a)
        ib = self.alphabet.find(b)
        if ia < 0 or ib < 0:
            # Unknown characters score as the worst entry in the table, which
            # can never create an alignment through them.
            return float(np.min(self.matrix))
        return float(self.matrix[ia, ib])

    def byte_table(self) -> np.ndarray:
        """(256, 256) float32 score lookup over raw byte values."""
        tab = np.full((256, 256), self.mismatch if self.is_uniform else float(np.min(self.matrix)), np.float32)
        if self.is_uniform:
            np.fill_diagonal(tab, self.match)
        else:
            idx = np.frombuffer(self.alphabet.encode("ascii"), np.uint8)
            tab[np.ix_(idx, idx)] = np.asarray(self.matrix, np.float32)
        return tab

    def dp_dtype(self):
        if self.semantics == Semantics.SAT_UINT8:
            return np.uint8
        if self.semantics == Semantics.FLOAT32 or not self.is_integral:
            return np.float32
        return np.int32


DEFAULT_SCORING = ScoringConfig()


@dataclasses.dataclass(frozen=True)
class ChunkConfig:
    """Coarse-grained decomposition of the long sequence into overlapping
    windows (the reference's OMPParallelLocalAligner geometry,
    src/aligner/plocalaligner.cpp:44-67)."""

    npiece: int = 1
    overlap_ratio: float = 2.0
