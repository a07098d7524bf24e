"""Device-resident protein database: pack once, scan many queries.

The TPU-native shape of the reference's UNIPROT workload
(src/mpi_sw_solve_uniprot.cpp:65-138): instead of per-rank FASTA file loops
re-read for every query, the whole database is length-bucketed, packed
host-side into transposed per-batch blocks of compact y codes, and uploaded
ONCE. Each scan then contributes only the query's packed profile; batches
dispatch as same-shape lax.scan groups (one program call + one result fetch
per group) and the full 561k-entry SwissProt-scale DB scores in ~1 s per
query on one v5e chip (see CLAUDE.md round-4 measurements).

Used by cli/solve_uniprot.py (one-shot CLI, adds checkpoint/resume around
the same layout) and cli/serve.py (long-lived server: `scan_db` requests).
"""

from __future__ import annotations

import time
from typing import List, Sequence, Tuple

import numpy as np

from ..ops.substitution import blosum_config
from ..utils.encoding import to_bytes


def _round_up(v, mult):
    return ((v + mult - 1) // mult) * mult


GK = 16  # max batches per scan-group dispatch (swept with batch_size:
# B=4096/GK=16 measured 62.5 GCUPS warm vs 60.6 at B=8192/GK=8 on the
# 561k DB, 2026-08-21 — tighter length buckets cut padding and the
# larger groups hold the dispatch count)

# The reference writer's per-row schema (mpi_sw_solve_uniprot.cpp:151-186):
# one row per database entry, traceback columns empty unless walked.
UNIPROT_CSV_HEADER = ["name", "len", "score", "pos_end", "pos_pred",
                      "consensus_x", "consensus_y"]


def write_uniprot_csv(path, entries, scores, pos, tb_rows=None):
    """Write the UNIPROT all-rows result CSV — the ONE writer shared by
    cli/solve_uniprot.py and the serve scan_db whole-result mode, so the
    'byte-identical outputs' contract between them cannot drift."""
    import csv
    import os

    tb_rows = tb_rows or {}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(UNIPROT_CSV_HEADER)
        for k, (name, seq) in enumerate(entries):
            pp, cx, cy = tb_rows.get(k, ("", "", ""))
            w.writerow([name, len(seq), int(scores[k]), int(pos[k]),
                        pp, cx, cy])


def pack_slab(seqs: Sequence[np.ndarray], order: Sequence[int], B: int,
              pad_mult: int, elut_np: np.ndarray, tail_rows: int):
    """Host-side slab pack shared by the CLI driver and the server.

    seqs: per-entry uint8 byte arrays. order: entry indices in scan order
    (length-sorted; resume-filtered by the CLI). B: batch size (rounded up
    to LANE internally by the caller's Bp). Returns (slab uint8 (R, Bp),
    lens_mat (nb, Bp) int32, row0s (nb,) int32, Ns (nb,) int32,
    groups [(g0, k, N)], nb). The slab holds COMPACT y codes (elut applied
    once on the flat concat — uint8 fancy indexing, no astype
    intermediate); rows past an entry's true length carry neighboring
    garbage that the device-side length mask turns into pad code 0.
    """
    from ..ops.wavefront_pallas import LANE

    Bp = _round_up(max(B, 1), LANE)
    nb = (len(order) + B - 1) // B
    all_lens = np.array([len(sq) for sq in seqs], np.int32)
    all_offs = np.zeros(max(len(seqs), 1), np.int64)
    if len(seqs) > 1:
        np.cumsum(all_lens[:-1], out=all_offs[1:])
    flat = np.concatenate(seqs) if seqs else np.zeros(1, np.uint8)
    flat = elut_np[flat]
    lens_mat = np.zeros((nb, Bp), np.int32)
    offs_mat = np.zeros((nb, Bp), np.int64)
    Ns = np.zeros(nb, np.int32)
    row0s = np.zeros(nb, np.int32)
    r = 0
    for bi in range(nb):
        idxs = order[bi * B : (bi + 1) * B]
        lens_mat[bi, : len(idxs)] = all_lens[idxs]
        offs_mat[bi, : len(idxs)] = all_offs[idxs]
        row0s[bi] = r
        Ns[bi] = _round_up(max(int(lens_mat[bi].max()), 1), pad_mult)
        r += int(Ns[bi])
    N_max = int(Ns.max()) if nb else 0
    # Overrun guard: window rows may read up to N_max past an entry's end.
    flat = np.concatenate([flat, np.zeros(N_max + 1, np.uint8)])
    t_all = np.arange(N_max, dtype=np.int64)[:, None]
    slab = np.zeros((r + tail_rows, Bp), np.uint8)  # 0 = pad code
    for bi in range(nb):
        Nb = int(Ns[bi])
        np.take(
            flat,
            offs_mat[bi][None, :] + t_all[:Nb],
            out=slab[int(row0s[bi]) : int(row0s[bi]) + Nb],
        )
    groups = []
    g0 = 0
    while g0 < nb:
        k = 1
        while g0 + k < nb and Ns[g0 + k] == Ns[g0] and k < GK:
            k += 1
        groups.append((g0, k, int(Ns[g0])))
        g0 += k
    return slab, lens_mat, row0s, Ns, groups, nb


class ResidentProteinDB:
    """One resident database, many query scans.

    Entries are (name, sequence) pairs; scans return top-K hits with the
    DP score and pos_end (1-based entry index of the DP maximum — the
    fast-path columns of the reference writer's schema). The first scan in
    a process verifies two lanes against the numpy oracle (the per-process
    miscompile gate every engine path on this rig carries).
    """

    def __init__(self, entries: List[Tuple[str, str]], matrix="blosum50",
                 gap_penalty=2.0, gap_open=10.0, batch_size=4096,
                 pad_mult=128, max_query_len=None):
        # pad_mult=128 measured best on the 561k SwissProt-scale DB
        # (2026-08-21 sweep: 0.518 s warm / 55.8 GCUPS vs 0.605 s / 47.8 at
        # 512 — padded window compute dominates once dispatch is grouped;
        # 128 costs a few more compiled shapes on the cold scan).
        import jax

        from ..ops.wavefront_pallas import (
            LANE,
            MAX_M,
            UNROLL,
            PallasEngine,
        )

        self.cfg = blosum_config(
            matrix, gap_penalty=gap_penalty, gap_open=gap_open
        )
        self.engine = PallasEngine(self.cfg)
        self.entries = entries
        self.B = batch_size
        # Queries beyond MAX_M dispatch the strip kernels over the same
        # resident slab (score_db_slab_strips_jit); max_query_len > MAX_M
        # just sizes the slab tail accordingly.
        self.max_query_len = max_query_len or MAX_M
        self._Mq = self._pad_q(self.max_query_len)
        plut, elut = self.engine._lut()
        self._plut_np = np.asarray(plut)
        elut_np = np.asarray(elut)
        self._seqs = [to_bytes(e[1]) for e in entries]
        self.order = sorted(
            range(len(entries)), key=lambda k: len(self._seqs[k])
        )
        t0 = time.perf_counter()
        slab, lens_mat, row0s, Ns, groups, nb = pack_slab(
            self._seqs, self.order, batch_size, pad_mult, elut_np,
            tail_rows=self._Mq + 3 * UNROLL,
        )
        self._lens_mat = lens_mat
        self._Ns = Ns
        self.groups = groups
        self._slab_dev = jax.device_put(slab)
        self._lens_dev = jax.device_put(lens_mat)
        self._row0_dev = jax.device_put(row0s)
        self._slab_dev.block_until_ready()
        self.prep_s = time.perf_counter() - t0
        self.slab_mb = slab.nbytes / 1e6
        Smat = np.asarray(self.cfg.matrix).astype(np.int32)
        self._worst, self._best = int(Smat.min()), int(Smat.max())
        # First-scan oracle gate is PER KERNEL FAMILY: the single-strip
        # slab kernel and the strips slab kernel are different compiled
        # programs, and on this rig each program can independently
        # miscompile — a short-query warm scan must not disarm the gate
        # for the first titin-class scan (or vice versa).
        self._verified = set() if not self.engine.interpret else {
            "single", "strips"}
        self.scans_served = 0

    @staticmethod
    def _pad_q(nq: int) -> int:
        """Padded query length: multiple of the strip height for
        titin-class queries (STRIP_S; STRIP_S_PA = 128 divides it),
        multiple of 8 for single-strip ones."""
        from ..ops.wavefront_pallas import MAX_M, STRIP_S

        if nq > MAX_M:
            return _round_up(max(nq, STRIP_S), STRIP_S)
        return _round_up(nq, 8)

    def scan_scores(self, query: str):
        """Score every entry: returns (scores, pos_end) int32 arrays in
        ENTRY order, plus the scan wall time."""
        import jax

        from ..ops.wavefront_pallas import (
            LANE,
            MAX_M,
            score_db_slab_group_jit,
        )

        qb = to_bytes(query)
        if len(qb) > self.max_query_len:
            raise ValueError(
                f"query {len(qb)}aa exceeds this DB's max_query_len "
                f"{self.max_query_len}"
            )
        Mq = self._pad_q(len(qb))
        qcol = np.full(Mq, 1, np.uint8)  # X_PAD
        qcol[: len(qb)] = qb
        pprof = jax.device_put(np.ascontiguousarray(np.broadcast_to(
            self._plut_np[qcol.astype(np.int32)].T[:, :, None],
            (self._plut_np.shape[1], Mq, LANE),
        )))
        t0 = time.perf_counter()
        outs = []
        for g0, k, N in self.groups:
            outs.append(score_db_slab_group_jit(
                self._slab_dev, g0, self._row0_dev, self._lens_dev, pprof,
                k=k, N=N, worst=self._worst, best_sub=self._best,
                gap=int(self.cfg.gap_penalty),
                gopen=int(self.cfg.gap_open),
                interpret=self.engine.interpret,
                ncodes=len(self.cfg.alphabet) + 1,
                strips=len(qb) > MAX_M,
            ))
        fetched = jax.device_get([(o[0], o[2]) for o in outs])
        scores = np.zeros(len(self.entries), np.int32)
        pos = np.zeros(len(self.entries), np.int32)
        for (g0, k, _), (sc, jj) in zip(self.groups, fetched):
            for g in range(k):
                idxs = self.order[(g0 + g) * self.B : (g0 + g + 1) * self.B]
                scores[idxs] = sc[g][: len(idxs)]
                pos[idxs] = jj[g][: len(idxs)]
        wall = time.perf_counter() - t0
        family = "strips" if len(qb) > MAX_M else "single"
        if family not in self._verified and self.entries:
            from ..ops.oracle import sw_affine_score_fast, sw_score_fast

            fast = (sw_affine_score_fast if self.cfg.is_affine
                    else sw_score_fast)
            for k in (self.order[0], self.order[-1]):
                want = fast(qb, self._seqs[k], self.cfg)
                got = (int(scores[k]), int(pos[k]))
                if got != (want[0], want[2]):
                    raise RuntimeError(
                        f"resident-DB first-scan check FAILED (entry {k}: "
                        f"{got} != oracle {(want[0], want[2])}): suspected "
                        "miscompile — restart the process or clear the JAX "
                        "compilation cache"
                    )
            self._verified.add(family)
        self.scans_served += 1
        return scores, pos, wall

    def scan(self, query: str, top: int = 10):
        """Top-K hits for one query: [(name, entry_len, score, pos_end)],
        plus (wall_s, gcups)."""
        scores, pos, wall = self.scan_scores(query)
        cells = len(query) * sum(len(sq) for sq in self._seqs)
        ranked = np.argsort(-scores, kind="stable")[: max(top, 0)]
        hits = [
            (self.entries[k][0], len(self._seqs[k]), int(scores[k]),
             int(pos[k]))
            for k in ranked
        ]
        return hits, wall, cells / wall / 1e9 if wall else 0.0
