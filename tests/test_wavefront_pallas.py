"""Differential tests: Pallas wavefront kernel (interpret mode) vs scan/oracle."""

import numpy as np
import pytest

from conftest import random_dna, random_protein
from parallel_genomeseq_tpu.ops import oracle
from parallel_genomeseq_tpu.ops.scan_dp import ScanEngine
from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine
from parallel_genomeseq_tpu.utils.config import ScoringConfig, Semantics
from parallel_genomeseq_tpu.utils.encoding import X_PAD, Y_PAD, batch_pad, to_bytes


def test_wiki_golden():
    eng = PallasEngine()
    res = eng.score_batch(
        to_bytes("GGTTGACTA")[None], to_bytes("TGTTACGG")[None],
        np.array([9]), np.array([8]),
    )
    assert int(res["score"][0]) == 13
    assert (int(res["i"][0]), int(res["j"][0])) == (7, 6)


def test_random_vs_oracle(rng):
    eng = PallasEngine()
    for _ in range(6):
        m = int(rng.integers(1, 40))
        n = int(rng.integers(1, 90))
        x, y = random_dna(rng, m), random_dna(rng, n)
        res = eng.score_batch(
            to_bytes(x)[None], to_bytes(y)[None], np.array([m]), np.array([n])
        )
        oi, oj, ov = oracle.find_max(oracle.sw_matrix(x, y))
        assert int(res["score"][0]) == ov, (x, y)
        if ov > 0:
            assert (int(res["i"][0]), int(res["j"][0])) == (oi, oj), (x, y)


def test_ragged_batch_vs_scan(rng):
    pairs = [
        (random_dna(rng, int(rng.integers(4, 33))), random_dna(rng, int(rng.integers(10, 120))))
        for _ in range(9)
    ]
    M = max(len(x) for x, _ in pairs)
    N = max(len(y) for _, y in pairs)
    xs = batch_pad([to_bytes(x) for x, _ in pairs], M, X_PAD)
    ys = batch_pad([to_bytes(y) for _, y in pairs], N, Y_PAD)
    m = np.array([len(x) for x, _ in pairs])
    n = np.array([len(y) for _, y in pairs])
    got = PallasEngine().score_batch(xs, ys, m, n)
    want = ScanEngine().score_batch(xs, ys, m, n)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def test_profile_kernel_protein(rng):
    alpha = "ARNDCQEGHILKMFPSTWYV"
    mat = rng.integers(-4, 12, size=(20, 20))
    mat = ((mat + mat.T) // 2).astype(np.float64)
    cfg = ScoringConfig(matrix=mat, alphabet=alpha, gap_penalty=3.0)
    eng = PallasEngine(cfg)
    x = random_protein(rng, 30)
    y = random_protein(rng, 70)
    res = eng.score_batch(
        to_bytes(x)[None], to_bytes(y)[None], np.array([30]), np.array([70])
    )
    oi, oj, ov = oracle.find_max(oracle.sw_matrix(x, y, cfg))
    assert int(res["score"][0]) == ov
    if ov > 0:
        assert (int(res["i"][0]), int(res["j"][0])) == (oi, oj)


def test_profile_device_prep_matches_host_path(rng):
    """prepare(device=True) pre-gathers the (A, M, B) profile on device;
    prepare(device=False) ships raw bytes and score_prepared gathers them.
    Both must produce identical results (the at-scale UNIPROT fast path)."""
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    cfg = blosum_config("blosum50", gap_penalty=4.0)
    eng = PallasEngine(cfg)
    xs = batch_pad([to_bytes(random_protein(rng, 24)) for _ in range(3)], 24, X_PAD)
    ys = batch_pad([to_bytes(random_protein(rng, 60)) for _ in range(3)], 60, Y_PAD)
    m = np.full(3, 24)
    n = np.full(3, 60)
    host = eng.score_prepared(eng.prepare(xs, ys, m, n))
    dev = eng.score_prepared(eng.prepare(xs, ys, m, n, device=True))
    want = ScanEngine(cfg).score_batch(xs, ys, m, n)
    for k in ("score", "i", "j"):
        np.testing.assert_array_equal(np.asarray(host[k]), np.asarray(want[k]))
        np.testing.assert_array_equal(np.asarray(dev[k]), np.asarray(want[k]))


def test_rejects_sat_uint8():
    with pytest.raises(ValueError):
        PallasEngine(ScoringConfig(semantics=Semantics.SAT_UINT8))


def test_packed_lut_envelope_guards():
    """The packed profile stores biased scores as bytes over a 31-code
    space: alphabets > 31 letters or matrices spanning > 255 must raise
    EnvelopeError (callers fall back to the scan engine)."""
    from parallel_genomeseq_tpu.ops.wavefront_pallas import (
        EnvelopeError, _packed_luts,
    )

    big_alpha = bytes(range(65, 65 + 32))  # 32 letters
    mat = np.zeros((32, 32)) - 1
    with pytest.raises(EnvelopeError):
        _packed_luts(mat, big_alpha)
    wide = np.zeros((4, 4)) - 1.0
    wide[0, 0] = 300.0  # span 301 > 255
    with pytest.raises(EnvelopeError):
        _packed_luts(wide, b"ACGT")


def test_packed_lut_roundtrip(rng):
    """Every (x byte, y code) decodes back to the exact matrix entry, and
    out-of-alphabet bytes / code 0 decode to the matrix minimum."""
    from parallel_genomeseq_tpu.ops.wavefront_pallas import _packed_luts

    alpha = b"ARNDCQEGHILKMFPSTWYVBZX*"
    mat = rng.integers(-6, 16, size=(24, 24))
    mat = ((mat + mat.T) // 2).astype(np.float64)
    plut, elut = _packed_luts(mat, alpha)
    worst = int(mat.min())
    for ri, rb in enumerate(alpha):
        for ci, cb in enumerate(alpha):
            code = int(elut[cb])
            assert code == ci + 1
            word = int(plut[rb, code // 4]) & 0xFFFFFFFF
            v = (word >> (8 * (code % 4))) & 0xFF
            assert v + worst == int(mat[ri, ci])
    # code 0 (pad/invalid) and unknown bytes -> worst
    assert all((int(plut[b, 0]) & 0xFF) == 0 for b in (1, 2, ord("J")))
    assert int(elut[1]) == 0 and int(elut[2]) == 0 and int(elut[ord("J")]) == 0


def test_self_check_passes():
    eng = PallasEngine()
    eng.self_check()  # interpret-mode kernel must agree with scan


def test_moves_kernel_traceback_matches_scan(rng):
    """The fused Pallas score+moves pass must produce identical traceback
    results (pos + consensus) to the scan emit_moves path."""
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner

    ref = random_dna(rng, 500)
    reads = []
    for _ in range(5):
        s = int(rng.integers(0, 420))
        read = list(ref[s : s + 60])
        for _ in range(3):
            read[int(rng.integers(0, 60))] = rng.choice(list("ACGT"))
        reads.append("".join(read))
    scan_al = BatchSWAligner(score_engine="scan")
    pal_al = BatchSWAligner(score_engine="pallas")
    want = scan_al.align_batch(reads, [ref])
    got = pal_al.align_batch(reads, [ref])
    for w, g in zip(want, got):
        assert g.score == w.score
        assert g.pos == w.pos
        assert g.consensus_x == w.consensus_x
        assert g.consensus_y == w.consensus_y


def test_first_batch_verification_gate(rng):
    """The miscompile gate verifies the first real batch per kernel family
    against the fast numpy oracle — and raises loudly on a wrong result."""
    import numpy as np
    import pytest
    from parallel_genomeseq_tpu.ops.wavefront_pallas import PallasEngine

    eng = PallasEngine(interpret=True)
    eng._checked = set()  # interpret mode trusts by default; force the gate
    x = rng.integers(65, 69, (4, 24)).astype(np.uint8)
    y = rng.integers(65, 69, (4, 96)).astype(np.uint8)
    m = np.full(4, 24)
    n = np.full(4, 96)
    res = eng.score_batch(x, y, m, n)
    assert eng._checked == {"uniform"}

    # moves path has its own gate
    eng._checked = set()
    eng.score_batch_moves(x, y, m, n)
    assert eng._checked == {"moves"}

    # a corrupted result must raise
    eng._checked = set()
    bad = dict(res)
    bad["score"] = np.asarray(res["score"]) + 1
    with pytest.raises(RuntimeError, match="first-batch check FAILED"):
        eng._verify_first(x, y, m, n, bad, need_pos=True, path="uniform")


def test_packed_sow_pruned_tree_matches_full(rng):
    """The ncodes-pruned word-select tree (dead words dropped: e.g. the
    25-code protein alphabet never reaches packed word 7) must score
    identically to the unpruned 32-code tree on every reachable code."""
    import jax.numpy as jnp

    from parallel_genomeseq_tpu.ops.substitution import ALPHABET, blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import (
        PROF_CODES,
        _packed_luts,
        _packed_sow,
    )

    cfg = blosum_config("blosum50", gap_penalty=2.0)
    plut, elut = _packed_luts(np.asarray(cfg.matrix), ALPHABET.encode())
    ncodes = len(ALPHABET) + 1
    # One x row per alphabet letter (plus a pad row), every reachable y code.
    xs = np.frombuffer(ALPHABET.encode(), np.uint8)
    M = len(xs)
    B = 128
    pprof = np.transpose(plut[xs.astype(np.int32)], (1, 0))[:, :, None]
    pprof = np.broadcast_to(pprof, (plut.shape[1], M, B)).astype(np.int32)
    ywin = rng.integers(0, ncodes, size=(M, B)).astype(np.int32)

    class FakeRef:
        shape = pprof.shape

        def __getitem__(self, w):
            return jnp.asarray(pprof[w])

    for slot in (0, 256):
        full, _ = _packed_sow(FakeRef(), int(np.asarray(cfg.matrix).min()),
                              slot, PROF_CODES)
        pruned, _ = _packed_sow(FakeRef(), int(np.asarray(cfg.matrix).min()),
                                slot, ncodes)
        a = np.asarray(full(jnp.asarray(ywin)))
        b = np.asarray(pruned(jnp.asarray(ywin)))
        np.testing.assert_array_equal(a, b)
    # And the scores themselves are the matrix entries (code c = letter c-1).
    s0 = np.asarray(pruned(jnp.asarray(ywin)))
    Smat = np.asarray(cfg.matrix)
    for i in (0, M - 1):
        for b in (0, B - 1):
            c = ywin[i, b]
            want = Smat[i, c - 1] if c > 0 else Smat.min()
            assert s0[i, b] == want * (slot or 1)


def test_i16_pair_row_encoding_roundtrip():
    """The int16 hi/lo boundary-row pair (the fix for the v5e 32-bit
    scratch fault, see _rows_init) must be exact for the full value range
    the strip kernels produce, including the negative affine F init."""
    vals = np.array(
        [0, 1, -1, -13, 32767, 32768, -32768, 2**29, -(2**29), 2**30 - 1],
        np.int64,
    )
    hi, lo = np.divmod(vals, 1 << 15)  # numpy divmod == python divmod: floor
    assert hi.min() >= -(2**15) and hi.max() < 2**15, "hi fits int16"
    assert lo.min() >= 0 and lo.max() < (1 << 15), "lo fits int16 (positive)"
    back = hi.astype(np.int16).astype(np.int64) * (1 << 15) + lo.astype(
        np.int16
    ).astype(np.int64)
    np.testing.assert_array_equal(back, vals)
    # The in-kernel store path uses arithmetic shift, not divmod — same split.
    h2 = vals >> 15
    l2 = vals - (h2 << 15)
    np.testing.assert_array_equal(h2, hi)
    np.testing.assert_array_equal(l2, lo)


def test_score_repeated_matches_score_prepared(rng):
    """The on-device repeat loop (the benchmarking dispatch that ends the
    host-side estimator drift saga) must actually execute the kernel: at
    K=1 the accumulated scalar equals the max lane score of the plain
    dispatch, and at K=3 it equals the sum over the three row-rolled
    inputs computed independently."""
    import jax.numpy as jnp

    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    for cfg in (
        ScoringConfig(),
        ScoringConfig(gap_penalty=1.0, gap_open=4.0),
        blosum_config("blosum50", gap_penalty=2.0),
        blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0),
    ):
        eng = PallasEngine(cfg)
        alpha = cfg.alphabet or "ACGT"
        B, M, N = 8, 24, 40
        xs = batch_pad(
            [to_bytes("".join(rng.choice(list(alpha), M)))] * B, M, X_PAD
        )
        ys = batch_pad(
            [to_bytes("".join(rng.choice(list(alpha), N))) for _ in range(B)],
            N, Y_PAD,
        )
        m = np.full(B, M, np.int32)
        n = np.full(B, N, np.int32)
        prep = eng.prepare(xs, ys, m, n, device=True)
        acc1 = int(np.asarray(eng.score_repeated(prep, 1)))
        base = int(np.asarray(eng.score_prepared(prep)["score"]).max())
        assert acc1 == base
        # K=3: independently score each rolled variant of the kernel-layout
        # reference block and sum the max lane scores.
        want = 0
        for k in range(3):
            prep_k = {**prep, "args": [prep["args"][0],
                                       jnp.roll(prep["args"][1], k, axis=0)]}
            want += int(np.asarray(eng.score_prepared(prep_k)["score"]).max())
        assert int(np.asarray(eng.score_repeated(prep, 3))) == want


def test_profile_moves_kernel_traceback_matches_scan(rng):
    """The fused packed-profile Pallas score+moves pass (BLOSUM traceback
    on the fast path — the --traceback-all hot kernel) must produce
    identical traceback results (pos + consensus) to the scan emit_moves
    path, including indel lanes and an all-mismatch lane."""
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    cfg = blosum_config("blosum50", gap_penalty=12.0)
    ref = random_protein(rng, 300)
    alpha = list("ARNDCQEGHILKMFPSTWYV")
    reads = []
    for nsub, nind in ((0, 0), (4, 0), (2, 2)):
        s = int(rng.integers(0, 220))
        read = list(ref[s : s + 60])
        for _ in range(nsub):
            read[int(rng.integers(0, len(read)))] = rng.choice(alpha)
        for _ in range(nind):
            p = int(rng.integers(1, len(read) - 1))
            if rng.integers(0, 2):
                read.insert(p, rng.choice(alpha))
            else:
                del read[p]
        reads.append("".join(read))
    reads.append("".join(rng.choice(alpha, 60)))  # background lane
    scan_al = BatchSWAligner(cfg, score_engine="scan")
    pal_al = BatchSWAligner(cfg, score_engine="pallas")
    want = scan_al.align_batch(reads, [ref])
    got = pal_al.align_batch(reads, [ref])
    for k, (w, g) in enumerate(zip(want, got)):
        assert g.score == w.score, k
        assert g.pos == w.pos, k
        assert g.consensus_x == w.consensus_x, k
        assert g.consensus_y == w.consensus_y, k


def test_score_repeated_strips(rng):
    """score_repeated covers the strip kernels too (the long-read
    on-device benchmarking loop): at K=1 the accumulated scalar equals the
    max lane score of the plain strips dispatch, uniform and profile."""
    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.ops.wavefront_pallas import MAX_M

    for cfg in (
        ScoringConfig(),
        blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0),
    ):
        eng = PallasEngine(cfg)
        alpha = cfg.alphabet or "ACGT"
        B, M, N = 4, MAX_M + 8, 96
        xs = batch_pad(
            [to_bytes("".join(rng.choice(list(alpha), M)))] * B, M, X_PAD
        )
        ys = batch_pad(
            [to_bytes("".join(rng.choice(list(alpha), N))) for _ in range(B)],
            N, Y_PAD,
        )
        m = np.full(B, M, np.int32)
        n = np.full(B, N, np.int32)
        prep = eng.prepare(xs, ys, m, n, device=True)
        assert prep["strips"]
        acc1 = int(np.asarray(eng.score_repeated(prep, 1)))
        base = int(np.asarray(eng.score_prepared(prep)["score"]).max())
        assert acc1 == base
