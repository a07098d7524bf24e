"""Alignment result and timing surfaces.

Mirrors the reference's LocalAligner query surface — getScore/getPos/
getConsensus_x/getConsensus_y/getTimings (reference: src/aligner/localaligner.h:7-17)
— as a plain dataclass.

Timing surface keeps the reference's two-level structure (whole wavefront
sweep and a finer second level, reference: src/aligner/similaritymatrix.cpp:30-35)
with TPU-meaningful levels: inside a fused kernel the per-diagonal breakdown is
not observable, so the second level is the traceback stage (device walk +
host consensus decode) — the other genuinely separate phase of calculateScore.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Timings:
    """Microsecond timings, two independently measured levels (neither is a
    copy of the other). With ``BatchSWAligner(detail_timing=True)``:
    [0] score sweep (host prep + device wavefront, synced), [1] traceback
    walk + consensus decode. On the default fused fast path the phases share
    one async device chain and one batched fetch, so the split is
    [0] device pipeline (sweep + walk, synced at the single fetch),
    [1] host consensus decode. 0 for levels a score-only call skips."""

    sweep_us: float = 0.0
    walk_us: float = 0.0
    # Per-strip-level times (top strip first) for the checkpointed strip
    # traceback paths — the TPU analog of the reference's per-anti-diagonal
    # timing vector (src/aligner/similaritymatrix.cpp:241-244): inside a
    # fused kernel per-diagonal times are unobservable, but the strip
    # replay loop is host-driven and each level (moves recompute + lockstep
    # walk, synced) is individually timed. Empty for single-strip calls.
    levels_us: tuple = ()

    def __getitem__(self, i: int) -> float:
        return (self.sweep_us, self.walk_us)[i]


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
    strand: str = "+"  # "-" when the reverse complement aligned better
    timings: Timings = Timings()
