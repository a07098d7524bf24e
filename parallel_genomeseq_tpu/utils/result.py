"""Alignment result and timing surfaces.

Mirrors the reference's LocalAligner query surface — getScore/getPos/
getConsensus_x/getConsensus_y/getTimings (reference: src/aligner/localaligner.h:7-17)
— as a plain dataclass.

Timing surface keeps the reference's two levels (whole wavefront sweep and
sum of per-diagonal times, reference: src/aligner/similaritymatrix.cpp:30-35):
on TPU the per-step breakdown inside a fused kernel is not observable, so both
levels report kernel wall time unless the sweep runs step-by-step.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Timings:
    """Microsecond timings: [0] whole wavefront sweep, [1] per-diagonal sum."""

    sweep_us: float = 0.0
    diag_sum_us: float = 0.0

    def __getitem__(self, i: int) -> float:
        return (self.sweep_us, self.diag_sum_us)[i]


@dataclasses.dataclass(frozen=True)
class AlignResult:
    """Result of one local alignment.

    pos is the 1-based position in the *reference* (sequence_y) where the
    traceback stopped — matching SAM POS and the reference's
    ``pos = index_y`` (src/aligner/smithwaterman.cpp:54).
    consensus_x / consensus_y are stored in reverse order with '-' for gaps,
    exactly as the reference builds them by push_back during the walk
    (src/aligner/smithwaterman.cpp:41-78).
    """

    score: float
    pos: int
    consensus_x: str = ""
    consensus_y: str = ""
    max_i: int = 0  # 1-based read index of the DP maximum
    max_j: int = 0  # 1-based reference index of the DP maximum
    timings: Timings = Timings()
