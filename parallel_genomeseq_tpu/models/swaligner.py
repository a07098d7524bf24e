"""Smith-Waterman aligner API: the reference SWAligner's role, batch-first.

The reference aligns one (read, ref) pair per SWAligner instance and loops
reads serially (src/aligner/smithwaterman.h:11-58, src/sw_solve_small.cpp:80-93).
On TPU throughput lives in the batch dimension, so the core API is
``BatchSWAligner.align_batch`` over B lanes; ``SWAligner.align`` is the
single-pair convenience built on a B=1 batch.

Pipeline per batch: one fused forward wavefront emitting per-cell move codes
(ops/scan_dp), exact argmax with the reference's column-major tie-break, then
a batched on-device traceback walk (ops/traceback) and host string assembly.
"""

from __future__ import annotations

import time
from typing import List, Sequence

import numpy as np

from ..ops.scan_dp import ScanEngine
from ..ops.traceback import decode_consensus, walk_moves, walk_moves_affine
from ..ops.wavefront_pallas import EnvelopeError
from ..utils.config import ScoringConfig
from ..utils.encoding import X_PAD, Y_PAD, batch_pad, to_bytes
from ..utils.result import AlignResult, Timings


def _round_up(v: int, mult: int) -> int:
    return ((v + mult - 1) // mult) * mult


def make_score_engine(cfg: ScoringConfig, name: str = "auto"):
    """Score-only engine factory: 'pallas' (TPU kernel), 'scan' (lax.scan),
    or 'auto' (Pallas on TPU when the config allows, else scan)."""
    from ..utils.config import Semantics

    if name == "auto":
        import jax

        pallas_ok = (
            jax.default_backend() == "tpu"
            and cfg.semantics != Semantics.SAT_UINT8
            and cfg.is_integral
        )
        name = "pallas" if pallas_ok else "scan"
        from ..utils.logging import vlog

        vlog(f"score engine auto-selected: {name}")
    if name == "pallas":
        from ..ops.wavefront_pallas import PallasEngine

        return PallasEngine(cfg)
    if name == "scan":
        return ScanEngine(cfg)
    raise ValueError(f"unknown engine {name!r}")


class BatchSWAligner:
    """Aligns batches of reads against per-lane reference windows.

    Shapes are padded to multiples of ``pad_m`` / ``pad_n`` to bound the
    number of compiled programs. Score-only calls use ``score_engine``
    ('auto' = Pallas kernel on TPU); traceback calls use the scan engine,
    which emits the move codes the device walk needs.
    """

    def __init__(
        self,
        cfg: ScoringConfig = ScoringConfig(),
        pad_m: int = 8,
        pad_n: int = 128,
        score_engine: str = "auto",
        tie: str = "colmajor",
        detail_timing: bool = False,
    ):
        """``detail_timing=False`` (default) runs the fused fast path: the
        score sweep and the traceback walk dispatch as one async device
        chain and ALL outputs come back in a single batched fetch — on a
        high-RTT link (this rig's tunnel is ~28 ms per blocking transfer)
        that is the difference between 1 and ~7 round trips per batch.
        ``detail_timing=True`` syncs between the phases so
        ``Timings.sweep_us`` / ``walk_us`` are independently measured
        (solve_batch's timing CSV uses this)."""
        self.cfg = cfg
        self.pad_m = pad_m
        self.pad_n = pad_n
        self.detail_timing = detail_timing
        self.engine = ScanEngine(cfg, tie=tie)
        self.scorer = (
            self.engine if tie != "colmajor" else make_score_engine(cfg, score_engine)
        )

    def align_batch(
        self,
        reads: Sequence[str],
        refs: Sequence[str],
        traceback: bool = True,
    ) -> List[AlignResult]:
        """Align reads[k] against refs[k] (pass a length-1 refs list or the
        same string repeated to share one reference)."""
        return self.collect(self.submit_batch(reads, refs, traceback))

    def align_stream(self, batches, refs, traceback: bool = True, depth: int = 4):
        """Pipelined alignment over an iterable of read batches: up to
        ``depth`` batches are dispatched ahead of the oldest un-fetched one,
        so device compute and host->device staging of batch k+1..k+depth
        overlap the blocking result fetch of batch k (~28 ms per round trip
        on this rig's tunnel). Yields one List[AlignResult] per input batch,
        in order. ``depth`` bounds device memory: each in-flight traceback
        batch holds its (D, M, B) uint8 move tensor until its walk runs."""
        from collections import deque

        q = deque()
        for batch in batches:
            q.append(self.submit_batch(batch, refs, traceback))
            if len(q) > depth:
                yield self.collect(q.popleft())
        while q:
            yield self.collect(q.popleft())

    def submit_batch(self, reads, refs, traceback: bool = True) -> "_PendingBatch":
        """Dispatch one batch without blocking on its results (fast path);
        pair with ``collect``. Detail-timing mode and the strip-length
        engine are internally synchronous, so their pendings come back
        already materialized."""
        if len(refs) == 1 and len(reads) > 1:
            refs = list(refs) * len(reads)
        if len(reads) != len(refs):
            raise ValueError("reads and refs length mismatch")
        xb = [to_bytes(r) for r in reads]
        yb = [to_bytes(r) for r in refs]
        m = np.array([len(v) for v in xb], np.int32)
        n = np.array([len(v) for v in yb], np.int32)
        M = _round_up(max(1, int(m.max())), self.pad_m)
        N = _round_up(max(1, int(n.max())), self.pad_n)
        xs = batch_pad(xb, M, X_PAD)
        ys = batch_pad(yb, N, Y_PAD)

        t0 = time.perf_counter()
        strip_res = None
        # Walk-length bound: <= M diagonal/north moves plus at most
        # score/gap west moves (score <= match * M), capped by the
        # geometric bound i0 + j0 <= M + N.
        gapv = max(float(self.cfg.gap_penalty), 1e-9)
        matchv = max(float(self.cfg.match), 1.0) if self.cfg.is_uniform else float(
            np.asarray(self.cfg.matrix).max()
        )
        max_steps = min(int(M + matchv * M / gapv) + 8, M + N + 1)
        if traceback:
            from ..ops.wavefront_pallas import MAX_M, PallasEngine

            fused = None
            if isinstance(self.scorer, PallasEngine) and M <= MAX_M:
                # Fused Pallas pass: score + argmax + move codes, no scan —
                # all four scoring families (uniform/profile x linear/
                # affine; the affine kernels emit scan_dp's H/E/F state
                # codes, which walk_moves_affine consumes either way).
                try:
                    fused = self.scorer.score_batch_moves(xs, ys, m, n)
                except EnvelopeError:
                    # e.g. a moves kernel's VMEM envelope at large M:
                    # fall through to the scan emit_moves path.
                    fused = None
            if fused is not None:
                resp = fused
                Bp = resp["moves"].shape[2]
                Mp = resp["moves"].shape[1]
                xs_w = np.full((Bp, Mp), X_PAD, np.uint8)
                xs_w[: len(xb), :M] = xs
                ys_w = np.full((Bp, N), Y_PAD, np.uint8)
                ys_w[: len(yb)] = ys
                res = resp
                xs, ys, M = xs_w, ys_w, Mp  # walk over the padded geometry
            elif isinstance(self.scorer, PallasEngine) and M > MAX_M:
                # Strip-length reads (uniform OR substitution-matrix,
                # linear OR affine): checkpointed strip recompute — the
                # scan emit_moves tensor would be O(D*M*B) (~40 GB at the
                # solve_big winner shape). The affine variants checkpoint
                # the F boundary rows alongside H and replay the H/E/F
                # state machine; the profile variants ride the int16 hi/lo
                # boundary-row pairs.
                try:
                    if self.cfg.is_affine:
                        strip_res = self.scorer.score_batch_strip_affine_moves(
                            xs, ys, m, n, max_steps=max_steps
                        )
                    else:
                        strip_res = self.scorer.score_batch_strip_moves(
                            xs, ys, m, n, max_steps=max_steps
                        )
                    res = strip_res
                except EnvelopeError:
                    res = self.engine.score_batch(xs, ys, m, n, emit_moves=True)
            else:
                # General traceback path (float scoring, or single-strip
                # shapes on the scan engine): the scan sweep materializes
                # a (D, M, B) uint8 move tensor. Guard the shapes where
                # that cannot fit — strip-length reads on a PallasEngine
                # scorer (any scoring family) take the checkpointed strip
                # traceback above instead.
                est = (M + N) * M * len(xb)
                if est > 2 * 1024**3:
                    raise ValueError(
                        f"traceback at this shape needs a ~{est/1e9:.1f} GB "
                        "move tensor (scan emit_moves); use a Pallas scorer "
                        "(checkpointed strip traceback), reduce the batch "
                        "size, or run with traceback=False"
                    )
                res = self.engine.score_batch(xs, ys, m, n, emit_moves=True)
        else:
            try:
                res = self.scorer.score_batch(xs, ys, m, n)
            except EnvelopeError:
                # Outside the Pallas kernels' envelope (e.g. the gated
                # affine+matrix strip path): the scan wavefront has no
                # such limits.
                res = self.engine.score_batch(xs, ys, m, n)
        detail = self.detail_timing or strip_res is not None
        if detail:
            # Force the score sweep's results so the two timing levels are
            # independently meaningful (JAX dispatch is async). The strip
            # engine walks level-by-level internally (already synced), so
            # the split costs nothing extra there.
            score = np.asarray(res["score"])
            ii = np.asarray(res["i"])
            jj = np.asarray(res["j"])
            sweep_us = (time.perf_counter() - t0) * 1e6
            walk_us = 0.0
            consensus = pos = None
            if traceback:
                t1 = time.perf_counter()
                if strip_res is not None:
                    # Walk already done level-by-level inside the engine
                    # (sweep_us covers it); only the string decode remains.
                    pos = np.asarray(strip_res["pos"])
                    consensus = decode_consensus(
                        strip_res["cx"], strip_res["cy"], strip_res["steps"]
                    )
                else:
                    walk = walk_moves_affine if self.cfg.is_affine else walk_moves
                    pos, cx, cy, steps = walk(
                        res["moves"], np.ascontiguousarray(xs.T), ys,
                        res["i"], res["j"], max_steps=max_steps,
                    )
                    pos = np.asarray(pos)
                    consensus = decode_consensus(cx, cy, steps)
                walk_us = (time.perf_counter() - t1) * 1e6
            results = _assemble(
                len(reads), traceback, score, ii, jj, pos, consensus,
                Timings(
                    sweep_us=sweep_us, walk_us=walk_us,
                    levels_us=(
                        strip_res.get("level_us", ())
                        if strip_res is not None else ()
                    ),
                ),
            )
            return _PendingBatch(len(reads), traceback, t0, results=results)

        if traceback:
            # Chain the walk onto the (still in-flight) sweep outputs; no
            # host sync until collect().
            walk = walk_moves_affine if self.cfg.is_affine else walk_moves
            pos, cx, cy, steps = walk(
                res["moves"], np.ascontiguousarray(xs.T), ys,
                res["i"], res["j"], max_steps=max_steps,
            )
            arrays = (res["score"], res["i"], res["j"], pos, cx, cy, steps)
        else:
            arrays = (res["score"], res["i"], res["j"])
        return _PendingBatch(len(reads), traceback, t0, arrays=arrays)

    def collect(self, pending: "_PendingBatch") -> List[AlignResult]:
        """Block on a pending batch's results. One batched fetch for the
        whole pipeline (device_get starts every copy async before blocking
        on any), then host string assembly."""
        if pending.results is not None:
            return pending.results
        import jax

        fetched = jax.device_get(pending.arrays)
        sweep_us = (time.perf_counter() - pending.t0) * 1e6
        if pending.traceback:
            score, ii, jj, pos, cx, cy, steps = fetched
            t1 = time.perf_counter()
            consensus = decode_consensus(cx, cy, steps)
            walk_us = (time.perf_counter() - t1) * 1e6
        else:
            score, ii, jj = fetched
            pos = consensus = None
            walk_us = 0.0
        return _assemble(
            pending.nreads, pending.traceback, score, ii, jj, pos, consensus,
            Timings(sweep_us=sweep_us, walk_us=walk_us),
        )


class _PendingBatch:
    """An in-flight batch: dispatched device arrays awaiting one fetch, or
    (for the synchronous detail/strip paths) already-materialized results."""

    __slots__ = ("nreads", "traceback", "t0", "arrays", "results")

    def __init__(self, nreads, traceback, t0, arrays=None, results=None):
        self.nreads = nreads
        self.traceback = traceback
        self.t0 = t0
        self.arrays = arrays
        self.results = results


def _assemble(nreads, traceback, score, ii, jj, pos, consensus, t: Timings):
    out = []
    for k in range(nreads):
        if traceback:
            cxk, cyk = consensus[k]
            pk = int(pos[k])
        else:
            cxk = cyk = ""
            pk = 0
        out.append(
            AlignResult(
                score=float(score[k]), pos=pk, consensus_x=cxk,
                consensus_y=cyk, max_i=int(ii[k]), max_j=int(jj[k]),
                timings=t,
            )
        )
    return out


def merge_strand_pairs(fwd: List[AlignResult], rev: List[AlignResult]) -> List[AlignResult]:
    """Pairwise merge of forward / reverse-complement results for
    both-strand alignment (extension — the reference aligns the given
    sequence only). The reverse result wins only on a strictly better
    score (conventional plus-strand preference on ties) and is tagged
    strand='-'; its pos/consensus are in forward reference coordinates
    for the reverse-complemented read."""
    import dataclasses

    out = []
    for f, r in zip(fwd, rev):
        out.append(dataclasses.replace(r, strand="-") if r.score > f.score else f)
    return out


class SWAligner:
    """Single-pair aligner with the reference's query surface."""

    def __init__(self, cfg: ScoringConfig = ScoringConfig(), tie: str = "colmajor"):
        self._batch = BatchSWAligner(cfg, tie=tie)

    def align(self, read: str, ref: str, traceback: bool = True) -> AlignResult:
        return self._batch.align_batch([read], [ref], traceback=traceback)[0]
