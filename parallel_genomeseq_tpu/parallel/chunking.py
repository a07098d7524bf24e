"""Coarse-grained decomposition: overlapping reference windows, argmax merge.

Reimplements the reference's OMPParallelLocalAligner geometry and merge
semantics (src/aligner/plocalaligner.cpp:44-143) the TPU way: pieces become
batch lanes of one fused wavefront call instead of OpenMP threads, and the
merge is a per-read argmax over the piece axis.

Intentional divergences from the reference (see SURVEY.md §5 "don't replicate
reference bugs"):
- the merge is deterministic (first piece wins score ties, in piece order) —
  the reference's OMP version has an unsynchronized max reduction and
  nondeterministic piece ordering (plocalaligner.cpp:93-129);
- the winner re-run keeps the configured scoring function — the reference
  silently re-runs with default scoring (plocalaligner.cpp:135).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..models.swaligner import BatchSWAligner
from ..ops.scan_dp import ScanEngine
from ..utils.config import ChunkConfig, ScoringConfig
from ..utils.encoding import X_PAD, Y_PAD, batch_pad, to_bytes
from ..utils.result import AlignResult
import time


def make_string_ranges(
    npiece: int, short_len: int, long_len: int, overlap_ratio: float
) -> List[Tuple[int, int]]:
    """Overlapping [left, right) windows of the long sequence.

    Port of the reference's ``_make_string_range``
    (src/aligner/plocalaligner.cpp:44-67): overlap = short_len * overlap_ratio,
    piece = (long_len + (npiece-1) * overlap) // npiece, each window starting
    overlap before the previous window's end; the last window absorbs the
    remainder. The overlap guarantees any local alignment whose reference
    span is <= overlap is fully contained in some window.
    """
    overlap = int(short_len * overlap_ratio)
    if npiece == 1:
        return [(0, long_len)]
    piece = (long_len + (npiece - 1) * overlap) // npiece
    if overlap > piece:
        raise ValueError(
            f"overlap {overlap} > piece length {piece}: reduce npiece or overlap_ratio"
        )
    ranges = [(0, piece)]
    right = piece
    while len(ranges) < npiece - 1:
        left = max(0, right - overlap)
        right = min(left + piece, long_len)
        ranges.append((left, right))
    if right >= long_len:
        raise ValueError(
            f"npiece {npiece} too large for long_len {long_len}: windows exhausted"
        )
    ranges.append((max(0, right - overlap), long_len))
    return ranges


def _round_up(v: int, mult: int) -> int:
    return ((v + mult - 1) // mult) * mult


class ChunkedAligner:
    """Align reads against one long reference via overlapping windows.

    Pipeline: (R reads x P pieces) lanes -> one score-only wavefront ->
    per-read argmax merge over pieces -> one R-lane traceback re-run on the
    winning windows only (the reference's "recompute the winner" trick,
    plocalaligner.cpp:132-141, which keeps the big sweep traceback-free).
    """

    def __init__(
        self,
        cfg: ScoringConfig = ScoringConfig(),
        chunk: ChunkConfig = ChunkConfig(npiece=4, overlap_ratio=2.0),
        pad_m: int = 8,
        pad_n: int = 128,
        score_engine: str = "auto",
    ):
        from ..models.swaligner import make_score_engine

        self.cfg = cfg
        self.chunk = chunk
        self.pad_m = pad_m
        self.pad_n = pad_n
        self.engine = make_score_engine(cfg, score_engine)
        self._winner_aligner = BatchSWAligner(cfg, pad_m=pad_m, pad_n=pad_n)

    def align_batch(
        self, reads: Sequence[str], ref: str, traceback: bool = True
    ) -> List[AlignResult]:
        return self._collect_winner(
            self._submit_winner(self._submit_scores(reads, ref, traceback))
        )

    def align_stream(self, batches, ref: str, traceback: bool = True, depth: int = 2):
        """Pipelined alignment over an iterable of read batches. Both device
        stages — the (R x P)-lane chunk-score sweep and the winner traceback
        re-run — dispatch up to ``depth`` batches ahead of the oldest
        blocking fetch, so the tunnel round trips of stage A(k) overlap the
        compute of A(k+1..) and B(k-1..). Yields List[AlignResult] per input
        batch, in order."""
        from collections import deque

        qa, qb = deque(), deque()
        for batch in batches:
            qa.append(self._submit_scores(batch, ref, traceback))
            if len(qa) > depth:
                qb.append(self._submit_winner(qa.popleft()))
            if len(qb) > depth:
                yield self._collect_winner(qb.popleft())
        while qa:
            qb.append(self._submit_winner(qa.popleft()))
            if len(qb) > depth:
                yield self._collect_winner(qb.popleft())
        while qb:
            yield self._collect_winner(qb.popleft())

    def _submit_scores(self, reads: Sequence[str], ref: str, traceback: bool):
        """Stage A dispatch: (R reads x P pieces) score-only wavefront.
        Returns a pending dict; the score fetch blocks in _submit_winner."""
        P = self.chunk.npiece
        R = len(reads)
        ref_b = to_bytes(ref)
        xb = [to_bytes(r) for r in reads]

        # Per-read window geometry (reads may differ in length).
        all_ranges = [
            make_string_ranges(P, len(x), len(ref_b), self.chunk.overlap_ratio)
            for x in xb
        ]

        # Lanes: read-major [r0p0, r0p1, ..., r1p0, ...].
        m = np.repeat([len(x) for x in xb], P).astype(np.int32)
        lane_ranges = [rg for ranges in all_ranges for rg in ranges]
        n = np.array([r - l for l, r in lane_ranges], np.int32)
        M = _round_up(max(len(x) for x in xb), self.pad_m)
        N = _round_up(int(n.max()), self.pad_n)
        xs = batch_pad([x for x in xb for _ in range(P)], M, X_PAD)
        ys = np.full((R * P, N), Y_PAD, np.uint8)
        for k, (l, r) in enumerate(lane_ranges):
            ys[k, : r - l] = ref_b[l:r]

        engine = self.engine
        t0 = time.perf_counter()
        try:
            # Winner selection needs scores only; positions come from the
            # winner re-run below (score-only kernels skip argmax tracking).
            from ..ops.wavefront_pallas import EnvelopeError
            from ..ops.wavefront_pallas import PallasEngine as _PE

            if isinstance(engine, _PE):
                res = engine.score_batch(xs, ys, m, n, need_pos=False)
            else:
                res = engine.score_batch(xs, ys, m, n)
        except EnvelopeError:
            # Batches outside the Pallas kernels' envelope (e.g.
            # substitution-matrix scoring on strip-length reads, or scores
            # exceeding the int16 boundary bound) fall back to the scan
            # wavefront, which has no such limits. Any other error — a
            # genuine shape/contract bug — propagates.
            if not hasattr(self, "_scan_fallback"):
                self._scan_fallback = ScanEngine(self.cfg)
            engine = self._scan_fallback
            res = engine.score_batch(xs, ys, m, n)
        return {
            "reads": list(reads), "ref": ref, "all_ranges": all_ranges,
            "score": res["score"], "R": R, "traceback": traceback, "t0": t0,
        }

    def _submit_winner(self, pa):
        """Stage A fetch + stage B dispatch: block on the chunk scores,
        argmax-merge per read, dispatch the winner traceback re-run."""
        R = pa["R"]
        P = self.chunk.npiece
        all_ranges = pa["all_ranges"]
        scores = np.asarray(pa["score"]).reshape(R, P)
        # First piece wins ties: argmax returns the first maximum.
        winner = np.argmax(scores, axis=1)
        sweep_us = (time.perf_counter() - pa["t0"]) * 1e6

        lefts = np.array(
            [all_ranges[r][winner[r]][0] for r in range(R)], np.int64
        )
        if not pa["traceback"]:
            from ..utils.result import Timings

            t = Timings(sweep_us=sweep_us)
            results = [
                AlignResult(
                    score=float(scores[r, winner[r]]), pos=0, timings=t
                )
                for r in range(R)
            ]
            return {"results": results}

        # Winner re-run with traceback, windows offset back to global coords.
        ref = pa["ref"]
        win_refs = [
            ref[all_ranges[r][winner[r]][0] : all_ranges[r][winner[r]][1]]
            for r in range(R)
        ]
        pending = self._winner_aligner.submit_batch(pa["reads"], win_refs)
        return {"pending": pending, "lefts": lefts}

    def _collect_winner(self, pb) -> List[AlignResult]:
        if "results" in pb:
            return pb["results"]
        results = self._winner_aligner.collect(pb["pending"])
        lefts = pb["lefts"]
        out = []
        for r, resr in enumerate(results):
            out.append(
                AlignResult(
                    score=resr.score,
                    pos=(resr.pos + int(lefts[r])) if resr.pos > 0 else 0,
                    consensus_x=resr.consensus_x,
                    consensus_y=resr.consensus_y,
                    max_i=resr.max_i,
                    max_j=(resr.max_j + int(lefts[r])) if resr.max_j > 0 else 0,
                    timings=resr.timings,
                )
            )
        return out
