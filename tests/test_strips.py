"""Differential tests for the strip-mode (long-read) Pallas kernel."""

import numpy as np
import pytest

from parallel_genomeseq_tpu.ops.scan_dp import ScanEngine
from parallel_genomeseq_tpu.ops.wavefront_pallas import MAX_M, PallasEngine
from parallel_genomeseq_tpu.utils.config import ScoringConfig


DNA = np.frombuffer(b"ACGT", np.uint8)


def test_strips_vs_scan(rng):
    B, m, n = 3, MAX_M + 52, 400
    ref = rng.choice(DNA, size=n)
    xs = rng.choice(DNA, size=(B, m)).astype(np.uint8)
    ys = np.broadcast_to(ref[None, :], (B, n)).copy()
    xs[0, 700 : 700 + n] = ref  # planted containment
    mm = np.full(B, m)
    nn = np.full(B, n)
    got = PallasEngine().score_batch(xs, ys, mm, nn)
    want = ScanEngine().score_batch(xs, ys, mm, nn)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
    assert int(np.asarray(got["score"])[0]) == 3 * n


def test_strips_ragged_lengths(rng):
    B, m = 4, MAX_M + 200
    n = np.array([64, 200, 333, 120])
    N = int(n.max())
    xs = rng.choice(DNA, size=(B, m)).astype(np.uint8)
    ys = np.full((B, N), 2, np.uint8)
    for b in range(B):
        ys[b, : n[b]] = rng.choice(DNA, size=n[b])
    mm = np.full(B, m)
    got = PallasEngine().score_batch(xs, ys, mm, n)
    want = ScanEngine().score_batch(xs, ys, mm, n)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def _mutate(rng, seq, n_sub, n_indel=0):
    s = list(seq)
    for _ in range(n_sub):
        s[int(rng.integers(0, len(s)))] = int(rng.choice(DNA))
    for _ in range(n_indel):
        p = int(rng.integers(1, len(s) - 1))
        if rng.integers(0, 2):
            s.insert(p, int(rng.choice(DNA)))
        else:
            del s[p]
    return np.array(s, np.uint8)


def test_strip_traceback_vs_oracle(rng):
    """Full greedy traceback on strip-length reads (checkpointed strip
    recompute) must match the numpy dense-matrix oracle exactly — pos,
    score, and both consensus strings, including lanes with indels."""
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops import oracle

    n = 3200
    ref = rng.choice(DNA, size=n)
    m = MAX_M + 256
    reads = []
    for k, (subs, indels) in enumerate([(0, 0), (40, 0), (25, 6), (0, 12)]):
        s = int(rng.integers(0, n - m - 40))
        reads.append(_mutate(rng, ref[s : s + m], subs, indels)[:m])
    reads.append(rng.choice(DNA, size=m))  # unrelated read
    reads = [r.tobytes().decode("ascii") for r in reads]
    ref_s = ref.tobytes().decode("ascii")

    al = BatchSWAligner(score_engine="pallas")
    got = al.align_batch(reads, [ref_s])
    for k, read in enumerate(reads):
        want = oracle.align(read, ref_s)
        assert got[k].score == want.score, k
        assert got[k].pos == want.pos, k
        assert got[k].consensus_x == want.consensus_x, k
        assert got[k].consensus_y == want.consensus_y, k


def test_strip_traceback_multi_strip_walk(rng):
    """A read spanning many strips: the walk crosses every strip boundary
    and the emissions stay contiguous across levels."""
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops import oracle

    m = 4 * 256 + 2048  # 12 strips
    n = m + 500
    ref = rng.choice(DNA, size=n)
    read = _mutate(rng, ref[100 : 100 + m], 60, 10)[:m]
    read_s = read.tobytes().decode("ascii")
    ref_s = ref.tobytes().decode("ascii")
    got = BatchSWAligner(score_engine="pallas").align_batch([read_s], [ref_s])[0]
    want = oracle.align(read_s, ref_s)
    assert (got.score, got.pos) == (want.score, want.pos)
    assert got.consensus_x == want.consensus_x
    assert got.consensus_y == want.consensus_y


def test_strips_substitution_matrix(rng):
    """Long protein queries (> MAX_M residues) with BLOSUM scoring stay on
    the Pallas strip path (VERDICT: the UNIPROT capability for titin-class
    queries) and must match the scan engine exactly."""
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    cfg = blosum_config("blosum50", gap_penalty=12.0)
    alpha = np.frombuffer(cfg.alphabet.encode(), np.uint8)
    B, m = 3, MAX_M + 256  # 2304 aa query
    n = np.array([500, 340, 420])
    N = int(n.max())
    xs = rng.choice(alpha, size=(B, m)).astype(np.uint8)
    ys = np.full((B, N), 2, np.uint8)
    for b in range(B):
        ys[b, : n[b]] = rng.choice(alpha, size=n[b])
    ys[0, 100:400] = xs[0, 1000:1300]  # planted high-identity region
    mm = np.full(B, m)
    got = PallasEngine(cfg).score_batch(xs, ys, mm, n)
    want = ScanEngine(cfg).score_batch(xs, ys, mm, n)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
    assert int(np.asarray(got["score"])[0]) > 1000  # planted region found


def test_strips_rejects_unsupported():
    m = MAX_M + 8
    xs = np.full((1, m), 65, np.uint8)
    ys = np.full((1, 64), 65, np.uint8)
    with pytest.raises(ValueError):
        # match * read_len beyond the int16 boundary-row bound
        PallasEngine(ScoringConfig(match=100.0, mismatch=-3.0, gap_penalty=2.0)) \
            .score_batch(xs, ys, np.array([m]), np.array([64]))


def test_strip_affine_traceback_vs_oracle(rng):
    """Full affine (Gotoh) traceback on strip-length reads — checkpointed
    H+F boundary rows, per-strip H/E/F move replay, state-machine walk —
    must match the numpy affine oracle exactly (VERDICT r2 #6: removes the
    2048-bp affine traceback cap)."""
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops import oracle

    cfg = ScoringConfig(match=3.0, mismatch=-3.0, gap_penalty=1.0, gap_open=4.0)
    n = 2600
    ref = rng.choice(DNA, size=n)
    m = MAX_M + 300
    reads = []
    for subs, indels in [(0, 0), (40, 0), (20, 8), (0, 14)]:
        s0 = int(rng.integers(0, n - 2100))
        seg = _mutate(rng, ref[s0 : s0 + 2100], subs, indels)
        r = rng.choice(DNA, size=m)
        r[100 : 100 + len(seg)] = seg[: min(len(seg), m - 100)]
        reads.append(r.tobytes().decode("ascii"))
    reads.append(rng.choice(DNA, size=m).tobytes().decode("ascii"))
    ref_s = ref.tobytes().decode("ascii")

    al = BatchSWAligner(cfg, score_engine="pallas")
    got = al.align_batch(reads, [ref_s])
    for k, read in enumerate(reads):
        want = oracle.align(read, ref_s, cfg)
        assert got[k].score == want.score, k
        assert got[k].pos == want.pos, k
        assert got[k].consensus_x == want.consensus_x, k
        assert got[k].consensus_y == want.consensus_y, k


def test_strip_affine_traceback_gap_run_crosses_strip_edge(rng):
    """An insertion in the read (an F run: gap columns in the reference)
    planted ACROSS a strip boundary: the walk leaves strip s mid-run with
    machine state F and must resume extending at strip s-1."""
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops import oracle

    cfg = ScoringConfig(match=3.0, mismatch=-3.0, gap_penalty=1.0, gap_open=4.0)
    m = MAX_M + 512  # 10 strips of 256
    # Read = ref segment with 24 inserted bases straddling read row 512
    # (strip boundary 2): rows 500..524 are insertions.
    n = m + 200
    ref = rng.choice(DNA, size=n)
    read = np.concatenate(
        [ref[50 : 50 + 500], rng.choice(DNA, size=24), ref[550 : 50 + m - 24 + 500]]
    )[:m]
    read_s = read.tobytes().decode("ascii")
    ref_s = ref.tobytes().decode("ascii")
    got = BatchSWAligner(cfg, score_engine="pallas").align_batch(
        [read_s], [ref_s]
    )[0]
    want = oracle.align(read_s, ref_s, cfg)
    assert (got.score, got.pos) == (want.score, want.pos)
    assert got.consensus_x == want.consensus_x
    assert got.consensus_y == want.consensus_y
    assert "-" * 20 in got.consensus_y  # the long F run is in the alignment


def test_strips_affine_vs_scan(rng):
    """Affine (Gotoh) strip kernel: long uniform-scoring reads with
    open/extend gaps stay on Pallas — differential vs the scan affine
    engine, including a planted read with a deletion (F run crossing
    strip rows is exercised by the containment lane)."""
    from parallel_genomeseq_tpu.utils.config import ScoringConfig

    cfg = ScoringConfig(match=3.0, mismatch=-3.0, gap_penalty=1.0, gap_open=4.0)
    B, m, n = 3, MAX_M + 52, 400
    ref = rng.choice(DNA, size=n)
    xs = rng.choice(DNA, size=(B, m)).astype(np.uint8)
    ys = np.broadcast_to(ref[None, :], (B, n)).copy()
    xs[0, 700 : 700 + n] = ref  # planted containment
    # lane 1: planted segment with a 3-bp deletion -> one affine gap run
    seg = np.concatenate([ref[50:150], ref[153:250]])
    xs[1, 300 : 300 + len(seg)] = seg
    mm = np.full(B, m)
    nn = np.full(B, n)
    got = PallasEngine(cfg).score_batch(xs, ys, mm, nn)
    want = ScanEngine(cfg).score_batch(xs, ys, mm, nn)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), k)
    assert int(np.asarray(got["score"])[0]) == 3 * n
    # deletion lane: at least the planted segment minus one opened 3-long
    # gap (random flanking bases can extend the local alignment further)
    assert int(np.asarray(got["score"])[1]) >= 3 * len(seg) - (4 + 3 * 1)


def test_strip_profile_traceback_vs_oracle(rng):
    """Full traceback for titin-class BLOSUM queries on the Pallas fast
    path (VERDICT r4 #7: profile-strips replay) — checkpointed int16
    hi/lo boundary-row pairs, per-strip packed-profile move replay — must
    match the numpy dense-matrix oracle exactly, linear AND affine."""
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops import oracle
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    for gopen in (0.0, 10.0):
        cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=gopen)
        alpha = np.frombuffer(cfg.alphabet.encode(), np.uint8)
        m = MAX_M + 300
        n = 900
        ref = rng.choice(alpha, size=n)
        reads = []
        for subs, indels in [(0, 0), (30, 0), (15, 6)]:
            s0 = int(rng.integers(0, n - 700))
            seg = _mutate_alpha(rng, ref[s0 : s0 + 700], subs, indels, alpha)
            r = rng.choice(alpha, size=m)
            r[200 : 200 + len(seg)] = seg[: min(len(seg), m - 200)]
            reads.append(r.tobytes().decode("ascii"))
        reads.append(rng.choice(alpha, size=m).tobytes().decode("ascii"))
        ref_s = ref.tobytes().decode("ascii")

        al = BatchSWAligner(cfg, score_engine="pallas")
        got = al.align_batch(reads, [ref_s])
        for k, read in enumerate(reads):
            want = oracle.align(read, ref_s, cfg)
            assert got[k].score == want.score, (gopen, k)
            assert got[k].pos == want.pos, (gopen, k)
            assert got[k].consensus_x == want.consensus_x, (gopen, k)
            assert got[k].consensus_y == want.consensus_y, (gopen, k)


def _mutate_alpha(rng, seq, n_sub, n_indel, alpha):
    s = list(seq)
    for _ in range(n_sub):
        s[int(rng.integers(0, len(s)))] = int(rng.choice(alpha))
    for _ in range(n_indel):
        p = int(rng.integers(1, len(s) - 1))
        if rng.integers(0, 2):
            s.insert(p, int(rng.choice(alpha)))
        else:
            del s[p]
    return np.array(s, np.uint8)
