"""Device-mesh distribution: chunk-sharded references, data-parallel reads.

The TPU-native replacement for the reference's two distribution mechanisms:

- OpenMP threads over reference pieces (src/aligner/plocalaligner.cpp:110-115)
  -> the ``chunk`` mesh axis: each device holds a slice of the overlapping
  reference windows and scores all its (read, window) lanes locally.
- MPI ranks over reads with a writer-rank collecting results via Send/Recv
  (src/mpi_sw_solve_small.cpp:89-186) -> the ``batch`` mesh axis: reads are
  data-parallel, and the merge is an XLA collective (max + masked-max
  argmax over the chunk axis) over ICI instead of point-to-point messages
  to a writer rank. Results come back sharded by read; the host gathers one
  small array instead of 126-byte structs per read.

Everything is a single ``shard_map``-decorated jitted function: XLA inserts
the collectives, and the same program runs on a real TPU mesh or a
host-platform CPU mesh (tests use 8 virtual CPU devices).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.config import ChunkConfig, ScoringConfig
from ..utils.encoding import X_PAD, Y_PAD, to_bytes
from .chunking import make_string_ranges

# Merge-key packing: score * PIECE_SLOTS + (PIECE_SLOTS - 1 - piece) makes
# lexicographic (max score, min piece index) a single integer max.
PIECE_SLOTS = 1 << 10


def make_mesh(
    n_devices: Optional[int] = None, chunk: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes (chunk, batch). ``chunk`` defaults to the largest
    power-of-two divisor <= sqrt(n) so both axes get parallelism.

    ``devices`` overrides the device list — multi-process drivers pass
    ``jax.local_devices()`` so each process runs an independent local mesh
    over its own read slice (the MPI worker-rank pattern), rather than a
    global mesh requiring globally-sharded inputs."""
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devs)} "
            f"{devs[0].platform} device(s) are visible — for a virtual CPU "
            "mesh set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n} and force the cpu platform before JAX initializes"
        )
    devs = devs[:n]
    if chunk is None:
        chunk = 1
        while chunk * 2 * chunk * 2 <= n and n % (chunk * 2) == 0:
            chunk *= 2
    if n % chunk:
        raise ValueError(f"n_devices {n} not divisible by chunk axis {chunk}")
    arr = np.array(devs).reshape(chunk, n // chunk)
    return Mesh(arr, ("chunk", "batch"))


def _score_lanes_pallas(x_rm, y_pn, match, mismatch, gap, interpret, gopen=0):
    """Score all (local reads x local pieces) lanes with the Pallas wavefront
    kernel — the production per-shard compute on TPU meshes (the scan path
    remains the general/fallback engine). Lanes are already X_PAD/Y_PAD
    padded by score_reads. gopen > 0 selects the affine kernel."""
    from ..ops.wavefront_pallas import score_lanes_jit

    Rl, M = x_rm.shape
    Pl, N = y_pn.shape
    xs = jnp.repeat(x_rm, Pl, axis=0)  # lane = r * Pl + p
    ys = jnp.tile(y_pn, (Rl, 1))
    score, i, j = score_lanes_jit(
        xs, ys, match=match, mismatch=mismatch, gap=gap, interpret=interpret,
        gopen=gopen,
    )
    return (
        score.reshape(Rl, Pl),
        i.reshape(Rl, Pl),
        j.reshape(Rl, Pl),
    )


def _score_lanes_pallas_profile(x_rm, y_pn, packed_lut, encode_lut, worst,
                                best_sub, gap, interpret, gopen=0,
                                ncodes=None):
    """Substitution-matrix sibling of _score_lanes_pallas: score all (local
    reads x local pieces) lanes with the Pallas packed-profile kernel —
    BLOSUM-class scoring on TPU meshes (the UNIPROT workload the reference
    distributes via MPI, src/mpi_sw_solve_uniprot.cpp:65-138)."""
    from ..ops.wavefront_pallas import score_lanes_profile_jit

    Rl, M = x_rm.shape
    Pl, N = y_pn.shape
    xs = jnp.repeat(x_rm, Pl, axis=0)  # lane = r * Pl + p
    ys = jnp.tile(y_pn, (Rl, 1))
    from ..ops.wavefront_pallas import PROF_CODES

    score, i, j = score_lanes_profile_jit(
        xs, ys, packed_lut, encode_lut, worst=worst, best_sub=best_sub,
        gap=gap, interpret=interpret, gopen=gopen,
        ncodes=ncodes or PROF_CODES,
    )
    return (
        score.reshape(Rl, Pl),
        i.reshape(Rl, Pl),
        j.reshape(Rl, Pl),
    )


def _score_lanes_scan(x_rm, y_pn, m_r, n_p, table, gap, gap_open=None):
    """Score all (local reads x local pieces) lanes with the scan wavefront.

    x_rm: (Rl, M) uint8; y_pn: (Pl, N) uint8; m_r: (Rl,); n_p: (Pl,).
    gap_open is not None selects the affine (Gotoh) recurrence.
    Returns (score, i, j) each (Rl, Pl) int32.
    """
    from ..ops.scan_dp import _reduce_best, _wavefront, _wavefront_affine

    Rl, M = x_rm.shape
    Pl, N = y_pn.shape
    B = Rl * Pl
    xs = jnp.repeat(x_rm, Pl, axis=0)  # lane = r * Pl + p
    ys = jnp.tile(y_pn, (Rl, 1))
    m = jnp.repeat(m_r, Pl)
    n = jnp.tile(n_p, (Rl,))
    x_mb = xs.T
    ypad = jnp.concatenate([ys, jnp.full((B, M), Y_PAD, jnp.uint8)], axis=1)
    yr = jnp.concatenate(
        [jnp.flip(ypad, axis=1).T, jnp.full((M, B), Y_PAD, jnp.uint8)], axis=0
    )
    if gap_open is not None:
        best, bestd, _ = _wavefront_affine(
            x_mb, yr, m.astype(jnp.int32), n.astype(jnp.int32), table,
            gap_open, gap, keep_matrix=False,
        )
    else:
        best, bestd, _ = _wavefront(
            x_mb, yr, m.astype(jnp.int32), n.astype(jnp.int32), table, gap,
            semantics="int32", keep_matrix=False,
        )
    score, i, j = _reduce_best(best, bestd)
    return (
        score.reshape(Rl, Pl).astype(jnp.int32),
        i.reshape(Rl, Pl),
        j.reshape(Rl, Pl),
    )


class MeshAligner:
    """Chunk-sharded, read-data-parallel scoring over a device mesh.

    One jitted shard_map program per (R, P, M, N) shape: local wavefront
    scoring, local argmax over the device's pieces, then a pmax merge over
    the ``chunk`` axis with (score, piece)-key packing so the winner matches
    the deterministic sequential merge (first piece wins ties — the fixed
    version of the reference's racy OMP reduction,
    src/aligner/plocalaligner.cpp:119-129).
    """

    def __init__(
        self,
        cfg: ScoringConfig = ScoringConfig(),
        chunk_cfg: ChunkConfig = ChunkConfig(npiece=8, overlap_ratio=2.0),
        mesh: Optional[Mesh] = None,
        engine: str = "auto",
    ):
        if not cfg.is_integral:
            # The (256,256) byte score table is int32 inside the kernel;
            # uniform and substitution-matrix scoring both route through it.
            raise ValueError("MeshAligner requires integral scoring")
        self.cfg = cfg
        self.chunk_cfg = chunk_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        tab = cfg.byte_table().astype(np.int32)
        self._table = jnp.asarray(tab)
        self._gap = jnp.asarray(int(cfg.gap_penalty), jnp.int32)
        # Mask-free kernel preconditions (see wavefront_pallas._make_body):
        # pad-byte decay is only exact with a strictly negative
        # mismatch/worst-matrix score and gap >= 1.
        worst_neg = (
            int(cfg.mismatch) < 0
            if cfg.is_uniform
            else int(np.asarray(cfg.matrix).min()) < 0
        )
        if engine == "auto":
            # Pallas per-shard compute: production path on TPU meshes when
            # the mask-free kernel preconditions hold (see PallasEngine).
            engine = (
                "pallas"
                if (
                    jax.default_backend() == "tpu"
                    and worst_neg
                    and int(cfg.gap_penalty) >= 1
                )
                else "scan"
            )
        if engine not in ("pallas", "scan"):
            raise ValueError(f"unknown engine {engine!r}")
        if engine == "pallas":
            # Same preconditions PallasEngine enforces: _score_lanes_pallas
            # ignores per-lane m/n and relies on pad-byte decay.
            if not worst_neg:
                raise ValueError(
                    "MeshAligner engine='pallas' requires a negative "
                    "mismatch / worst matrix entry (use engine='scan')"
                )
            if int(cfg.gap_penalty) < 1:
                raise ValueError(
                    "MeshAligner engine='pallas' requires gap_penalty >= 1 (use engine='scan')"
                )
        self.engine = engine
        if not cfg.is_uniform:
            # Packed-profile LUT pair for the Pallas profile path (mirrors
            # PallasEngine._lut; worst for out-of-alphabet bytes, including
            # the pad bytes).
            from ..ops.wavefront_pallas import _packed_luts

            alpha = tuple(cfg.alphabet.encode("ascii"))
            plut_np, elut_np = _packed_luts(cfg.matrix, alpha)
            self._plut = (jnp.asarray(plut_np), jnp.asarray(elut_np))
        else:
            self._plut = None
        self._fn_cache = {}
        # Per-instance first-result miscompile gate (remote TPU compiles have
        # been observed to rarely produce wrong executables); interpret-mode
        # and scan paths are trusted.
        self._verified = engine != "pallas" or jax.default_backend() != "tpu"

    def _build(self, R, Pp, M, N):
        mesh = self.mesh
        table, gap = self._table, self._gap
        gap_open = (
            jnp.asarray(int(self.cfg.gap_open), jnp.int32)
            if self.cfg.is_affine
            else None
        )
        use_pallas = self.engine == "pallas"
        uniform = self.cfg.is_uniform
        if use_pallas:
            gap_i = int(self.cfg.gap_penalty)
            gopen_i = int(self.cfg.gap_open)
            interpret = jax.default_backend() != "tpu"
            if uniform:
                match_i = int(self.cfg.match)
                mismatch_i = int(self.cfg.mismatch)
            else:
                plut, elut = self._plut
                Smat = np.asarray(self.cfg.matrix)
                worst_i = int(Smat.min())
                best_i = int(Smat.max())

        @functools.partial(
            jax.jit,
            static_argnums=(),
        )
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                P("batch", None),  # x (R, M)
                P("chunk", None),  # y (Pp, N)
                P("batch"),  # m (R,)
                P("chunk"),  # n (Pp,)
                P("chunk"),  # lefts (Pp,)
                P("chunk"),  # piece ids (Pp,)
            ),
            out_specs=(P("batch"), P("batch"), P("batch"), P("batch")),
            check_vma=False,  # scan carries are created inside the mapped fn
        )
        def run(x, y, m, n, lefts, pids):
            if use_pallas and not uniform:
                score, i, j = _score_lanes_pallas_profile(
                    x, y, plut, elut, worst_i, best_i, gap_i, interpret,
                    gopen_i, ncodes=len(self.cfg.alphabet) + 1,
                )  # (Rl, Pl)
            elif use_pallas:
                score, i, j = _score_lanes_pallas(
                    x, y, match_i, mismatch_i, gap_i, interpret, gopen_i
                )  # (Rl, Pl)
            else:
                score, i, j = _score_lanes_scan(x, y, m, n, table, gap, gap_open)
            # Local argmax over this device's pieces: first piece wins ties.
            key = score * PIECE_SLOTS + (PIECE_SLOTS - 1 - pids[None, :])
            loc = jnp.argmax(key, axis=1)  # (Rl,)
            rows = jnp.arange(score.shape[0])
            lscore = score[rows, loc]
            lkey = key[rows, loc]
            li = i[rows, loc]
            lj = j[rows, loc] + lefts[loc]  # global ref coordinates
            lpid = pids[loc]
            # Global merge across the chunk axis.
            gkey = jax.lax.pmax(lkey, "chunk")
            win = lkey == gkey
            neg = jnp.int32(-1)
            gscore = jax.lax.pmax(jnp.where(win, lscore, neg), "chunk")
            gi = jax.lax.pmax(jnp.where(win, li, neg), "chunk")
            gj = jax.lax.pmax(jnp.where(win, lj, neg), "chunk")
            gpid = jax.lax.pmax(jnp.where(win, lpid, neg), "chunk")
            return gscore, gi, gj, gpid

        return run

    def score_reads(self, reads: Sequence[str], ref: str):
        """Returns dict of per-read numpy arrays: score, i (read idx), j
        (global 1-based ref idx of the DP max), piece (winning window)."""
        Pp = self.chunk_cfg.npiece
        ref_b = to_bytes(ref)
        xb = [to_bytes(r) for r in reads]
        # Ragged batches: window geometry follows the LONGEST read (one
        # shared (Pp, N) window tensor keeps the shard_map program static).
        # This diverges from ChunkedAligner's per-read ranges
        # (chunking.py:104-107) in window boundaries only: overlap =
        # overlap_ratio * max_len >= overlap_ratio * len(read) for every
        # read, so the containment guarantee (any alignment with reference
        # span <= overlap_ratio * len(read) lies fully inside some window)
        # still holds per read, and scores are exact for all lengths.
        mlen = max(len(x) for x in xb)
        ranges = make_string_ranges(
            Pp, mlen, len(ref_b), self.chunk_cfg.overlap_ratio
        )
        # Pad R to a multiple of the batch axis, P to a multiple of chunk axis.
        bsz = self.mesh.shape["batch"]
        csz = self.mesh.shape["chunk"]
        R = ((len(xb) + bsz - 1) // bsz) * bsz
        Ppad = ((Pp + csz - 1) // csz) * csz
        if Ppad >= PIECE_SLOTS:
            raise ValueError(f"npiece {Ppad} >= {PIECE_SLOTS}")
        N = max(r - l for l, r in ranges)
        x = np.full((R, mlen), X_PAD, np.uint8)
        for k, v in enumerate(xb):
            x[k, : len(v)] = v
        y = np.full((Ppad, N), Y_PAD, np.uint8)
        n = np.zeros((Ppad,), np.int32)
        lefts = np.zeros((Ppad,), np.int32)
        pids = np.arange(Ppad, dtype=np.int32)
        for k, (l, r) in enumerate(ranges):
            y[k, : r - l] = ref_b[l:r]
            n[k] = r - l
            lefts[k] = l
        m = np.zeros((R,), np.int32)
        m[: len(xb)] = [len(v) for v in xb]

        key = (R, Ppad, mlen, N)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build(R, Ppad, mlen, N)
        run = self._fn_cache[key]
        gscore, gi, gj, gpid = run(x, y, m, n, lefts, pids)
        k = len(xb)
        out = {
            "score": np.asarray(gscore)[:k],
            "i": np.asarray(gi)[:k],
            "j": np.asarray(gj)[:k],
            "piece": np.asarray(gpid)[:k],
        }
        if not self._verified:
            self._verify_first(xb, ref_b, out)
        return out

    def _verify_first(self, xb, ref_b, out):
        """First-result miscompile gate (mirrors PallasEngine._verify_first):
        check two lanes' merged scores against the vectorized numpy oracle on
        the full reference — the chunk decomposition guarantees the global SW
        maximum survives the pmax merge, so the scores must be equal."""
        from ..ops.oracle import sw_affine_score_fast, sw_score_fast

        fast = sw_affine_score_fast if self.cfg.is_affine else sw_score_fast
        for lane in {0, len(xb) - 1}:
            want = fast(xb[lane], ref_b, self.cfg)[0]
            got = int(out["score"][lane])
            if got != want:
                raise RuntimeError(
                    f"MeshAligner first-result check FAILED (lane {lane}: "
                    f"score {got} != oracle {want}): suspected miscompile — "
                    "retry in a fresh process or clear the JAX compilation cache"
                )
        self._verified = True
