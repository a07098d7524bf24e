"""Differential tests: lax.scan wavefront vs the numpy oracle.

Mirrors the reference's differential test of its skewed AVX2 kernel against
the naive float matrix (test/test_skewedmatrix.cpp:39-66), extended to ragged
batches and all three DP semantics.
"""

import numpy as np
import pytest

from conftest import random_dna, random_protein
from parallel_genomeseq_tpu.ops import oracle, scan_dp
from parallel_genomeseq_tpu.ops.scan_dp import ScanEngine, hstack_to_matrix, sw_matrix_scan
from parallel_genomeseq_tpu.utils.config import ScoringConfig, Semantics
from parallel_genomeseq_tpu.utils.encoding import X_PAD, Y_PAD, batch_pad, to_bytes

WIKI_X = "GGTTGACTA"
WIKI_Y = "TGTTACGG"


def test_wiki_matrix_matches_oracle():
    H_scan = sw_matrix_scan(WIKI_X, WIKI_Y)
    H_oracle = oracle.sw_matrix(WIKI_X, WIKI_Y)
    np.testing.assert_array_equal(H_scan, H_oracle)


@pytest.mark.parametrize("semantics", [Semantics.EXACT_INT32, Semantics.FLOAT32, Semantics.SAT_UINT8])
def test_random_matrices_match_oracle(rng, semantics):
    cfg = ScoringConfig(semantics=semantics)
    for _ in range(5):
        m = int(rng.integers(1, 40))
        n = int(rng.integers(1, 60))
        x, y = random_dna(rng, m), random_dna(rng, n)
        H_scan = sw_matrix_scan(x, y, cfg)
        H_oracle = oracle.sw_matrix(x, y, cfg)
        np.testing.assert_array_equal(H_scan, H_oracle, err_msg=f"x={x} y={y}")


def test_argmax_matches_oracle_tiebreak(rng):
    eng = ScanEngine()
    for _ in range(20):
        m = int(rng.integers(1, 30))
        n = int(rng.integers(1, 50))
        x, y = random_dna(rng, m), random_dna(rng, n)
        res = eng.score_batch(
            to_bytes(x)[None], to_bytes(y)[None], np.array([m]), np.array([n])
        )
        H = oracle.sw_matrix(x, y)
        oi, oj, ov = oracle.find_max(H)
        if ov == 0:
            continue
        assert int(res["score"][0]) == ov
        assert int(res["i"][0]) == oi, (x, y)
        assert int(res["j"][0]) == oj, (x, y)


def test_ragged_batch(rng):
    """Lanes with different read/ref lengths, padded, must match per-pair oracle."""
    eng = ScanEngine()
    pairs = [
        (random_dna(rng, int(rng.integers(5, 33))), random_dna(rng, int(rng.integers(5, 70))))
        for _ in range(7)
    ]
    M = max(len(x) for x, _ in pairs)
    N = max(len(y) for _, y in pairs)
    xs = batch_pad([to_bytes(x) for x, _ in pairs], M, X_PAD)
    ys = batch_pad([to_bytes(y) for _, y in pairs], N, Y_PAD)
    m = np.array([len(x) for x, _ in pairs])
    n = np.array([len(y) for _, y in pairs])
    res = eng.score_batch(xs, ys, m, n)
    for k, (x, y) in enumerate(pairs):
        H = oracle.sw_matrix(x, y)
        oi, oj, ov = oracle.find_max(H)
        assert int(res["score"][k]) == ov, (k, x, y)
        if ov > 0:
            assert (int(res["i"][k]), int(res["j"][k])) == (oi, oj), (k, x, y)


def test_protein_substitution_batch(rng):
    """Substitution-matrix scoring through the scan engine (BLOSUM-style)."""
    alpha = "ARNDCQEGHILKMFPSTWYV"
    mat = rng.integers(-4, 12, size=(20, 20))
    mat = ((mat + mat.T) // 2).astype(np.float64)  # symmetric, integral
    cfg = ScoringConfig(matrix=mat, alphabet=alpha, gap_penalty=3.0)
    eng = ScanEngine(cfg)
    x = random_protein(rng, 25)
    y = random_protein(rng, 40)
    res = eng.score_batch(
        to_bytes(x)[None], to_bytes(y)[None], np.array([25]), np.array([40])
    )
    H = oracle.sw_matrix(x, y, cfg)
    oi, oj, ov = oracle.find_max(H)
    assert int(res["score"][0]) == ov
    if ov > 0:
        assert (int(res["i"][0]), int(res["j"][0])) == (oi, oj)


def test_all_zero_matrix_returns_origin():
    eng = ScanEngine(ScoringConfig(match=1.0, mismatch=-5.0, gap_penalty=5.0))
    res = eng.score_batch(
        to_bytes("AAAA")[None], to_bytes("GGGG")[None], np.array([4]), np.array([4])
    )
    assert int(res["score"][0]) == 0
    assert int(res["i"][0]) == 0 and int(res["j"][0]) == 0


def test_hstack_roundtrip(rng):
    x, y = random_dna(rng, 12), random_dna(rng, 20)
    eng = ScanEngine()
    res = eng.score_batch(
        to_bytes(x)[None], to_bytes(y)[None], np.array([12]), np.array([20]),
        keep_matrix=True,
    )
    H = hstack_to_matrix(res["hstack"], 12, 20)
    np.testing.assert_array_equal(H, oracle.sw_matrix(x, y))
