"""Affine-gap (Gotoh) alignment — extension beyond the reference.

The reference only has a linear gap model (src/aligner/smithwaterman.cpp:8
takes one gap_penalty). Here a gap of length L costs gap_open + L *
gap_penalty; gap_open=0 degenerates exactly to the linear recurrence, which
doubles as the differential anchor: every affine path is tested against the
linear oracle at gap_open=0 and against the affine numpy oracle otherwise.
"""

import numpy as np
import pytest

from conftest import random_dna
from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
from parallel_genomeseq_tpu.ops import oracle
from parallel_genomeseq_tpu.ops.scan_dp import ScanEngine, hstack_to_matrix
from parallel_genomeseq_tpu.utils.config import ScoringConfig, Semantics

AFF = ScoringConfig(match=3.0, mismatch=-3.0, gap_penalty=1.0, gap_open=4.0)


def test_config_affine_flags():
    assert not ScoringConfig().is_affine
    assert AFF.is_affine
    assert AFF.is_integral
    with pytest.raises(ValueError):
        ScoringConfig(gap_open=-1.0)
    with pytest.raises(ValueError):
        ScoringConfig(gap_open=2.0, semantics=Semantics.SAT_UINT8)


def test_oracle_affine_degenerates_to_linear(rng):
    """gap_open=0 affine == linear oracle, cell for cell."""
    cfg = ScoringConfig(gap_open=0.0)
    for _ in range(4):
        x = random_dna(rng, int(rng.integers(5, 25)))
        y = random_dna(rng, int(rng.integers(5, 40)))
        H, _, _ = oracle.sw_affine_matrices(x, y, cfg)
        np.testing.assert_array_equal(H, oracle.sw_matrix(x, y, cfg).astype(np.float64))


def test_oracle_affine_prefers_one_long_gap():
    """With a high opening cost, one 2-long gap must beat two 1-long gaps.
    Read = reference with a 2-bp deletion: affine scores
    match*|read| - open - 2*extend."""
    ref = "ACGTACGTACGTACGTACGT"
    read = ref[:8] + ref[10:]  # drop 2 bp
    res = oracle.align(read, ref, AFF)
    assert res.score == 3 * len(read) - 4 - 2 * 1
    # consensus has exactly one 2-column gap run in x
    assert res.consensus_x.count("-") == 2
    assert "--" in res.consensus_x
    assert res.pos == 1


def test_oracle_affine_score_vs_bruteforce(rng):
    """Affine H must equal a brute-force best-local-alignment search on tiny
    inputs (exhaustive over gap placements via the recurrence's own dual:
    compare against linear DP with gap cost folded per run length)."""
    cfg = ScoringConfig(match=2.0, mismatch=-2.0, gap_penalty=1.0, gap_open=3.0)
    # Hand-checkable: read AATT vs ref AAGGTT. Best: AA + TT around a 2-gap.
    # score = 4*2 - (3 + 2*1) = 3  (vs ungapped AA..=4? AA match = 4 w/ no
    # gap -> 4 > 3, so best is plain AA (or TT) = 4).
    H, E, F = oracle.sw_affine_matrices("AATT", "AAGGTT", cfg)
    assert H.max() == 4.0
    # Cheaper opening makes bridging the gap win: 8 - (1 + 2) = 5.
    cfg2 = ScoringConfig(match=2.0, mismatch=-2.0, gap_penalty=1.0, gap_open=1.0)
    H2, _, _ = oracle.sw_affine_matrices("AATT", "AAGGTT", cfg2)
    assert H2.max() == 5.0


def test_scan_affine_matches_oracle(rng):
    """Scan affine wavefront == numpy affine oracle: H stack, score, argmax."""
    eng = ScanEngine(AFF)
    for _ in range(3):
        mlen = int(rng.integers(6, 20))
        nlen = int(rng.integers(8, 40))
        x = random_dna(rng, mlen)
        y = random_dna(rng, nlen)
        res = eng.score_batch(
            np.frombuffer(x.encode(), np.uint8)[None, :],
            np.frombuffer(y.encode(), np.uint8)[None, :],
            np.array([mlen]), np.array([nlen]), keep_matrix=True,
        )
        H, _, _ = oracle.sw_affine_matrices(x, y, AFF)
        got = hstack_to_matrix(res["hstack"], mlen, nlen)
        np.testing.assert_array_equal(got, H.astype(got.dtype))
        i, j, score = oracle.find_max(H)
        assert float(res["score"][0]) == score
        assert (int(res["i"][0]), int(res["j"][0])) == (i, j)


def test_scan_affine_ragged_batch(rng):
    """Per-lane lengths respected in one padded affine batch."""
    eng = ScanEngine(AFF)
    xs, ys, ms, ns = [], [], [], []
    pairs = []
    for _ in range(5):
        mlen = int(rng.integers(4, 16))
        nlen = int(rng.integers(6, 30))
        x, y = random_dna(rng, mlen), random_dna(rng, nlen)
        pairs.append((x, y))
        ms.append(mlen)
        ns.append(nlen)
    M, N = max(ms), max(ns)
    xb = np.zeros((5, M), np.uint8)
    yb = np.zeros((5, N), np.uint8)
    for k, (x, y) in enumerate(pairs):
        xb[k, : ms[k]] = np.frombuffer(x.encode(), np.uint8)
        yb[k, : ns[k]] = np.frombuffer(y.encode(), np.uint8)
    res = eng.score_batch(xb, yb, np.array(ms), np.array(ns))
    for k, (x, y) in enumerate(pairs):
        H, _, _ = oracle.sw_affine_matrices(x, y, AFF)
        i, j, score = oracle.find_max(H)
        assert float(res["score"][k]) == score, (x, y)
        assert (int(res["i"][k]), int(res["j"][k])) == (i, j), (x, y)


def test_batch_aligner_affine_traceback(rng):
    """End-to-end affine alignment (device walk) == affine oracle."""
    al = BatchSWAligner(AFF)
    ref = random_dna(rng, 300)
    reads = []
    # reads with deletions/insertions that exercise gap runs
    for _ in range(8):
        s = int(rng.integers(0, 220))
        seg = list(ref[s : s + 60])
        k = int(rng.integers(5, 50))
        del seg[k : k + int(rng.integers(1, 4))]  # deletion (gap in read)
        reads.append("".join(seg))
    got = al.align_batch(reads, [ref])
    for read, g in zip(reads, got):
        w = oracle.align(read, ref, AFF)
        assert g.score == w.score, read
        assert g.pos == w.pos, read
        assert g.consensus_x == w.consensus_x, read
        assert g.consensus_y == w.consensus_y, read


def test_batch_aligner_affine_insertion_runs(rng):
    """Gap-in-reference (F) runs: reads with inserted bases."""
    al = BatchSWAligner(AFF)
    ref = random_dna(rng, 250)
    reads = []
    for _ in range(6):
        s = int(rng.integers(0, 180))
        seg = list(ref[s : s + 50])
        k = int(rng.integers(5, 40))
        ins = random_dna(rng, int(rng.integers(2, 4)))
        seg[k:k] = list(ins)
        reads.append("".join(seg))
    got = al.align_batch(reads, [ref])
    for read, g in zip(reads, got):
        w = oracle.align(read, ref, AFF)
        assert (g.score, g.pos) == (w.score, w.pos), read
        assert g.consensus_x == w.consensus_x, read
        assert g.consensus_y == w.consensus_y, read


def test_mesh_affine_scan(rng):
    """Affine scoring through the sharded mesh == affine oracle."""
    from parallel_genomeseq_tpu.parallel.mesh import MeshAligner, make_mesh
    from parallel_genomeseq_tpu.utils.config import ChunkConfig

    mesh = make_mesh(4, chunk=2)
    ref = random_dna(rng, 400)
    reads = [ref[40:100], ref[250:310], ref[100:160], ref[300:360]]
    ma = MeshAligner(
        mesh=mesh, cfg=AFF, chunk_cfg=ChunkConfig(npiece=2, overlap_ratio=2.0),
        engine="scan",
    )
    out = ma.score_reads(reads, ref)
    for k, read in enumerate(reads):
        H, _, _ = oracle.sw_affine_matrices(read, ref, AFF)
        _, _, score = oracle.find_max(H)
        assert int(out["score"][k]) == int(score)


def test_mesh_affine_pallas_matches_scan(rng):
    """Affine mesh compute on the Pallas path (interpret mode on CPU) ==
    the scan path, same sharded geometry."""
    from parallel_genomeseq_tpu.parallel.mesh import MeshAligner, make_mesh
    from parallel_genomeseq_tpu.utils.config import ChunkConfig

    mesh = make_mesh(4, chunk=2)
    ref = random_dna(rng, 320)
    reads = [ref[20:70], ref[200:250], ref[100:150], ref[250:300]]
    kw = dict(mesh=mesh, cfg=AFF, chunk_cfg=ChunkConfig(npiece=2, overlap_ratio=2.0))
    got = MeshAligner(engine="pallas", **kw).score_reads(reads, ref)
    want = MeshAligner(engine="scan", **kw).score_reads(reads, ref)
    for k in ("score", "i", "j", "piece"):
        np.testing.assert_array_equal(got[k], want[k], k)


def test_pallas_engine_accepts_uniform_affine():
    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

    # uniform affine has a dedicated kernel; construction must succeed
    PallasEngine(AFF, interpret=True)


def test_affine_score_fast_matches_matrices(rng):
    """Column-vectorized affine oracle == full H/E/F matrices (score+argmax)."""
    for _ in range(6):
        mlen = int(rng.integers(4, 24))
        nlen = int(rng.integers(6, 48))
        x, y = random_dna(rng, mlen), random_dna(rng, nlen)
        H, _, _ = oracle.sw_affine_matrices(x, y, AFF)
        i, j, score = oracle.find_max(H)
        got = oracle.sw_affine_score_fast(x, y, AFF)
        assert got == (int(score), i, j), (x, y)


def test_pallas_affine_kernel_matches_scan(rng):
    """Affine Pallas kernel (interpret mode) == scan affine engine."""
    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

    from parallel_genomeseq_tpu.utils.encoding import X_PAD, Y_PAD, batch_pad, to_bytes

    pe = PallasEngine(AFF, interpret=True)
    se = ScanEngine(AFF)
    B = 7
    xb, yb = [], []
    for k in range(B):
        xb.append(to_bytes(random_dna(rng, int(rng.integers(8, 41)))))
        yb.append(to_bytes(random_dna(rng, int(rng.integers(16, 97)))))
    xs = batch_pad(xb, 40, X_PAD)
    ys = batch_pad(yb, 96, Y_PAD)
    m = np.array([len(v) for v in xb], np.int32)
    n = np.array([len(v) for v in yb], np.int32)
    got = pe.score_batch(xs, ys, m, n)
    want = se.score_batch(xs, ys, m, n)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]).astype(np.int32), k
        )


def test_pallas_affine_score_only(rng):
    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

    pe = PallasEngine(AFF, interpret=True)
    ref = random_dna(rng, 200)
    reads = [ref[20:80], ref[100:160]]
    xs = np.zeros((2, 60), np.uint8)
    for k, r in enumerate(reads):
        xs[k] = np.frombuffer(r.encode(), np.uint8)
    ys = np.tile(np.frombuffer(ref.encode(), np.uint8), (2, 1))
    res = pe.score_batch(xs, ys, np.array([60, 60]), np.array([200, 200]),
                         need_pos=False)
    assert list(np.asarray(res["score"])) == [180, 180]


def test_pallas_affine_matrix_strips_matches_scan(rng):
    """Titin-class affine protein queries (> 2048 aa, BLOSUM + open/extend)
    stay on the Pallas strip path and match the scan affine engine exactly.
    (Uniform affine strips: tests/test_strips.py::test_strips_affine_vs_scan.)"""
    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import MAX_M, PallasEngine

    cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0)
    alpha = np.frombuffer(cfg.alphabet.encode(), np.uint8)
    B, m = 2, MAX_M + 256  # 2304 aa query
    n = np.array([420, 300])
    N = int(n.max())
    xs = rng.choice(alpha, size=(B, m)).astype(np.uint8)
    ys = np.full((B, N), 2, np.uint8)
    for b in range(B):
        ys[b, : n[b]] = rng.choice(alpha, size=n[b])
    # planted region with a 3-residue deletion -> one affine gap run
    ys[0, 100:397] = np.concatenate(
        [xs[0, 1000:1150], xs[0, 1153:1300]]
    )
    mm = np.full(B, m)
    got = PallasEngine(cfg).score_batch(xs, ys, mm, n)
    want = ScanEngine(cfg).score_batch(xs, ys, mm, n)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), k)
    assert int(np.asarray(got["score"])[0]) > 800  # planted region found


def test_pallas_profile_affine_matches_scan(rng):
    """Affine + BLOSUM substitution scoring (the swps3 12/2 protein config)
    on the Pallas profile kernel == scan affine engine."""
    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine
    from parallel_genomeseq_tpu.utils.encoding import X_PAD, Y_PAD, batch_pad

    cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0)
    assert cfg.is_affine and not cfg.is_uniform
    pe = PallasEngine(cfg, interpret=True)
    se = ScanEngine(cfg)
    aas = "ARNDCQEGHILKMFPSTWYV"
    prot = lambda n: "".join(rng.choice(list(aas)) for _ in range(n))
    xb = [np.frombuffer(prot(int(rng.integers(10, 30))).encode(), np.uint8)
          for _ in range(4)]
    yb = [np.frombuffer(prot(int(rng.integers(20, 60))).encode(), np.uint8)
          for _ in range(4)]
    xs = batch_pad(xb, 32, X_PAD)
    ys = batch_pad(yb, 64, Y_PAD)
    m = np.array([len(v) for v in xb], np.int32)
    n = np.array([len(v) for v in yb], np.int32)
    got = pe.score_batch(xs, ys, m, n)
    want = se.score_batch(xs, ys, m, n)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]).astype(np.int32), k
        )


def test_profile_affine_strip_envelope():
    """The rounds-2/3 hardware gate on the affine+matrix strip kernel is
    GONE: the v5e worker crashes were root-caused to 32-bit boundary-row
    scratch (benchmarks/probe_pa_bisect.py) and fixed by int16 hi/lo pairs,
    with recorded passing hardware probes. prepare() must now ACCEPT
    strip-length matrix+gap_open queries, and refuse only beyond the
    int16-pair bound best_sub * M >= 2**30 (exactness of the pair
    encoding), in any mode."""
    import pytest

    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import (
        EnvelopeError, MAX_M, PallasEngine,
    )

    cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0)
    M = MAX_M + 8
    x = np.full((2, M), 65, np.uint8)
    y = np.full((2, 256), 65, np.uint8)
    m = np.full(2, M, np.int32)
    n = np.full(2, 256, np.int32)
    for interpret in (False, True):
        PallasEngine(cfg, interpret=interpret).prepare(x, y, m, n)  # no raise

    best_sub = int(np.asarray(cfg.matrix).max())
    M_big = 2**30 // best_sub + 8  # pair-encoding bound exceeded
    x_big = np.zeros((1, M_big), np.uint8)
    with pytest.raises(EnvelopeError):
        PallasEngine(cfg, interpret=True).prepare(
            x_big, y[:1], np.array([M_big], np.int32), n[:1]
        )


def test_affine_fast_oracle_blosum(rng):
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    cfg = blosum_config("blosum62", gap_penalty=2.0, gap_open=10.0)
    aas = "ARNDCQEGHILKMFPSTWYV"
    prot = lambda n: "".join(rng.choice(list(aas)) for _ in range(n))
    for _ in range(3):
        x, y = prot(int(rng.integers(8, 20))), prot(int(rng.integers(12, 40)))
        H, _, _ = oracle.sw_affine_matrices(x, y, cfg)
        i, j, score = oracle.find_max(H)
        assert oracle.sw_affine_score_fast(x, y, cfg) == (int(score), i, j)


def test_chunked_affine(rng):
    """Affine scoring through the chunked aligner (score + winner-re-run
    traceback) == unchunked affine oracle when the alignment fits a window."""
    from parallel_genomeseq_tpu.parallel.chunking import ChunkedAligner
    from parallel_genomeseq_tpu.utils.config import ChunkConfig

    ref = random_dna(rng, 1600)
    reads = []
    for _ in range(5):
        s = int(rng.integers(0, 1500))
        seg = list(ref[s : s + 70])
        k = int(rng.integers(10, 60))
        del seg[k : k + 2]
        reads.append("".join(seg))
    ca = ChunkedAligner(cfg=AFF, chunk=ChunkConfig(npiece=4, overlap_ratio=2.0))
    got = ca.align_batch(reads, ref)
    for read, g in zip(reads, got):
        w = oracle.align(read, ref, AFF)
        assert g.score == w.score, read
        assert g.pos == w.pos, read
        assert g.consensus_x == w.consensus_x, read


def test_affine_moves_kernel_traceback_matches_scan(rng):
    """The fused single-strip AFFINE moves kernels (uniform and
    packed-profile) must produce identical traceback results (pos +
    consensus) to the scan engine's H/E/F emit_moves path, including gap
    runs that exercise the E/F extend bits."""
    import numpy as np

    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.utils.config import ScoringConfig

    for cfg, alpha in (
        (ScoringConfig(match=3.0, mismatch=-3.0, gap_penalty=1.0,
                       gap_open=4.0), list("ACGT")),
        (blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0),
         list("ARNDCQEGHILKMFPSTWYV")),
    ):
        ref = "".join(rng.choice(alpha, 300))
        reads = []
        for nsub, nind in ((0, 0), (4, 0), (2, 3), (0, 6)):
            s = int(rng.integers(0, 220))
            read = list(ref[s : s + 64])
            for _ in range(nsub):
                read[int(rng.integers(0, len(read)))] = rng.choice(alpha)
            for _ in range(nind):
                p = int(rng.integers(1, len(read) - 1))
                if rng.integers(0, 2):
                    read.insert(p, rng.choice(alpha))
                else:
                    del read[p]
            reads.append("".join(read))
        reads.append("".join(rng.choice(alpha, 64)))  # background lane
        want = BatchSWAligner(cfg, score_engine="scan").align_batch(
            reads, [ref])
        got = BatchSWAligner(cfg, score_engine="pallas").align_batch(
            reads, [ref])
        for k, (w, g) in enumerate(zip(want, got)):
            assert g.score == w.score, (cfg.is_uniform, k)
            assert g.pos == w.pos, (cfg.is_uniform, k)
            assert g.consensus_x == w.consensus_x, (cfg.is_uniform, k)
            assert g.consensus_y == w.consensus_y, (cfg.is_uniform, k)
