"""Seed-and-extend alignment: FM-index exact seeds + windowed wavefront extension.

The reference's BWT/FM-index prototype (src/bwt_fm.cpp:182-239) builds the
backward-search machinery and demos pattern location, but never closes the
loop back to alignment — seeds are found, nothing is extended. This module
completes that direction the TPU-native way:

1. ``FMIndex.seeds`` anchors exact k-mers of the read on the reference
   (host-side index probe — sequential, data-dependent, wrong shape for the
   MXU/VPU, so it stays on host by design).
2. Seeds vote by diagonal (ref_pos - read_offset); nearby diagonals (within
   a gap-slack) are clustered, and the best-supported cluster defines a
   narrow reference window around the implied placement.
3. The existing batched wavefront aligner extends within the window only —
   an implicitly *banded* Smith-Waterman whose band is chosen by the seeds —
   and window-local results are offset back to global coordinates exactly
   like the chunk merge (parallel/chunking.py).

Reads that produce no seeds (or too few votes) fall back to the full-width
aligner, so *unseeded* reads never degrade below plain SW. (Seeded reads are
heuristic, as in every seed-and-extend aligner: a read whose true optimum is
mutation-dense with no exact k-mer can seed a decoy region and return a lower
score than full SW; on data_small windows results are exact.) Windows are
batched
through the same pipelined submit/collect path as everything else; since a
window is O(|read| + 2*margin) instead of O(|ref|), the DP work per seeded
read drops by ~|ref| / (|read| + 2*margin) (20x on the data_small shape).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from ..utils.config import ScoringConfig
from ..utils.result import AlignResult
from .fm_index import FMIndex
from .swaligner import BatchSWAligner


def cluster_diagonals(
    seeds: Sequence[Tuple[int, int]], slack: int
) -> List[Tuple[int, int, int]]:
    """Group seeds whose diagonals (pos - offset) lie within ``slack`` of the
    previous one. Returns [(votes, dmin, dmax)] per cluster, where votes
    counts *distinct read offsets* (a repetitive k-mer hitting many reference
    copies inflates seed count but not placement evidence)."""
    if not seeds:
        return []
    by_diag = sorted((pos - off, off) for off, pos in seeds)
    clusters = []
    offs = {by_diag[0][1]}
    dmin = dmax = by_diag[0][0]
    for d, off in by_diag[1:]:
        if d - dmax <= slack:
            dmax = d
            offs.add(off)
        else:
            clusters.append((len(offs), dmin, dmax))
            offs = {off}
            dmin = dmax = d
    clusters.append((len(offs), dmin, dmax))
    return clusters


class SeedExtendAligner:
    """FM-index seeded, window-extended batch aligner over one reference.

    Parameters
    ----------
    ref: the reference string (indexed once at construction).
    k / step: seed k-mer length and read-offset stride.
    margin: extra reference columns kept on each side of the seeded
        placement — the gap/soft-clip budget of the banded extension.
    min_votes: clusters with fewer distinct-offset votes than this are
        ignored; reads with no qualifying cluster use the full reference.
    """

    def __init__(
        self,
        ref: str,
        cfg: ScoringConfig = ScoringConfig(),
        k: int = 24,
        step: int = 8,
        margin: int = 64,
        min_votes: int = 1,
        aligner: Optional[BatchSWAligner] = None,
    ):
        self.ref = ref
        self.fm = FMIndex(ref)
        self.k = k
        self.step = step
        self.margin = margin
        self.min_votes = min_votes
        self.aligner = aligner if aligner is not None else BatchSWAligner(cfg)

    def _window_from_seeds(self, read: str, seeds) -> Optional[Tuple[int, int]]:
        clusters = cluster_diagonals(seeds, slack=self.margin // 2)
        if not clusters:
            return None
        # Vote ties prefer the SMALLEST diagonal, matching the leftmost /
        # min-j tie convention of the full-width engines (scan_dp._reduce_best)
        # so repetitive reads place identically under either path.
        votes, dmin, dmax = max(clusters, key=lambda c: (c[0], -c[1], -c[2]))
        if votes < self.min_votes:
            return None
        left = max(0, dmin - self.margin)
        right = min(len(self.ref), dmax + len(read) + self.margin)
        return (left, right) if right > left else None

    def window(self, read: str) -> Optional[Tuple[int, int]]:
        """Best-supported reference window [left, right) for ``read``, or
        None when seeding fails (caller falls back to the full reference)."""
        if len(read) < self.k:
            return None
        return self._window_from_seeds(read, self.fm.seeds(read, self.k, self.step))

    def windows_batch(self, reads: Sequence[str]) -> List[Optional[Tuple[int, int]]]:
        """``window`` for a whole batch: one vectorized FM probe
        (FMIndex.seeds_batch) instead of per-k-mer python backward searches —
        the host-side seeding cost is what bounds seeded throughput once the
        extension itself is 20x smaller."""
        seed_lists = self.fm.seeds_batch(list(reads), self.k, self.step)
        return [
            self._window_from_seeds(r, s) for r, s in zip(reads, seed_lists)
        ]

    def submit_batch(self, reads: Sequence[str], traceback: bool = True) -> dict:
        """Dispatch one batch without blocking: seeded reads extend inside
        their windows, the rest run full-width. Both groups dispatch before
        either result is fetched, so the fallback sweep overlaps the windowed
        one on device. Pair with ``collect``."""
        windows = self.windows_batch(reads)
        seeded = [i for i, w in enumerate(windows) if w is not None]
        full = [i for i, w in enumerate(windows) if w is None]
        pend_s = pend_f = None
        if seeded:
            pend_s = self.aligner.submit_batch(
                [reads[i] for i in seeded],
                [self.ref[windows[i][0] : windows[i][1]] for i in seeded],
                traceback,
            )
        if full:
            pend_f = self.aligner.submit_batch(
                [reads[i] for i in full], [self.ref] * len(full), traceback
            )
        return {
            "n": len(reads), "windows": windows, "seeded": seeded,
            "full": full, "pend_s": pend_s, "pend_f": pend_f,
        }

    def collect(self, pending: dict) -> List[AlignResult]:
        windows = pending["windows"]
        out: List[Optional[AlignResult]] = [None] * pending["n"]
        if pending["pend_s"] is not None:
            for i, r in zip(pending["seeded"], self.aligner.collect(pending["pend_s"])):
                left = windows[i][0]
                out[i] = AlignResult(
                    score=r.score,
                    pos=(r.pos + left) if r.pos > 0 else 0,
                    consensus_x=r.consensus_x,
                    consensus_y=r.consensus_y,
                    max_i=r.max_i,
                    max_j=(r.max_j + left) if r.max_j > 0 else 0,
                    timings=r.timings,
                )
        if pending["pend_f"] is not None:
            for i, r in zip(pending["full"], self.aligner.collect(pending["pend_f"])):
                out[i] = r
        return out  # type: ignore[return-value]

    def align_batch(
        self, reads: Sequence[str], traceback: bool = True
    ) -> List[AlignResult]:
        return self.collect(self.submit_batch(reads, traceback))

    def align_stream(self, batches, traceback: bool = True, depth: int = 4):
        """Pipelined streaming: host-side seeding of batch k+1..k+depth
        overlaps the device extension and blocking fetch of batch k (the
        same dispatch-ahead discipline as BatchSWAligner.align_stream)."""
        from collections import deque

        q = deque()
        for batch in batches:
            q.append(self.submit_batch(batch, traceback))
            if len(q) > depth:
                yield self.collect(q.popleft())
        while q:
            yield self.collect(q.popleft())

    def align(self, read: str, traceback: bool = True) -> AlignResult:
        return self.align_batch([read], traceback)[0]
