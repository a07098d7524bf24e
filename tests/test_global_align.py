"""Needleman-Wunsch and Hirschberg global alignment tests."""

import numpy as np
import pytest

from conftest import random_dna
from parallel_genomeseq_tpu.models.hirschberg import alignment_score, hirschberg_align
from parallel_genomeseq_tpu.ops import oracle
from parallel_genomeseq_tpu.utils.config import ScoringConfig


def test_nw_identical_sequences():
    res = oracle.nw_align("ACGTACGT", "ACGTACGT")
    assert res.score == 24
    assert res.consensus_x == "ACGTACGT"[::-1]
    assert res.consensus_y == "ACGTACGT"[::-1]


def test_nw_known_small():
    # GATTACA vs GCATGCU with +1/-1/1 (classic wikipedia NW example, score 0)
    cfg = ScoringConfig(match=1.0, mismatch=-1.0, gap_penalty=1.0)
    res = oracle.nw_align("GCATGCU", "GATTACA", cfg)
    assert res.score == 0


def test_nw_boundary_is_gap_cost():
    H = oracle.nw_matrix("AC", "AGC")
    assert H[0, 3] == -6.0 and H[2, 0] == -4.0


def test_hirschberg_matches_nw_score(rng):
    cfg = ScoringConfig()
    for _ in range(6):
        x = random_dna(rng, int(rng.integers(1, 40)))
        y = random_dna(rng, int(rng.integers(1, 50)))
        want = oracle.nw_align(x, y, cfg)
        got = hirschberg_align(x, y, cfg)
        assert got.score == want.score, (x, y)
        # the emitted alignment must actually achieve the optimal score
        assert alignment_score(got.consensus_x[::-1], got.consensus_y[::-1], cfg) == want.score
        # and be a valid alignment of the two sequences
        assert got.consensus_x[::-1].replace("-", "") == x
        assert got.consensus_y[::-1].replace("-", "") == y


def test_nw_lastrow_device_matches_oracle(rng):
    """Device NW last-row scan (lax.scan + cummax gap chain) vs the dense
    numpy NW matrix, ragged batch, uniform and BLOSUM scoring."""
    from parallel_genomeseq_tpu.ops.global_dp import nw_lastrow_batch, nw_score_batch
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    for cfg, alpha in (
        (ScoringConfig(), list("ACGT")),
        (blosum_config("blosum62", gap_penalty=4.0), list("ARNDCQEGHILKMFPSTWYV")),
    ):
        xs = ["".join(rng.choice(alpha, int(rng.integers(3, 60)))) for _ in range(5)]
        ys = ["".join(rng.choice(alpha, int(rng.integers(3, 80)))) for _ in range(5)]
        rows = nw_lastrow_batch(xs, ys, cfg)
        scores = nw_score_batch(xs, ys, cfg)
        for k in range(5):
            H = oracle.nw_matrix(xs[k], ys[k], cfg)
            np.testing.assert_allclose(rows[k], H[-1], err_msg=str(k))
            assert scores[k] == H[-1, -1]


def test_hirschberg_device_path_matches_host(rng):
    """Forcing every row sweep onto the device must reproduce the host
    recursion exactly (score and emitted alignment)."""
    from parallel_genomeseq_tpu.models.hirschberg import hirschberg_align

    x = random_dna(rng, 700)
    y = list(x)
    for _ in range(25):
        y[int(rng.integers(0, len(y)))] = rng.choice(list("ACGT"))
    y = "".join(y)
    cfg = ScoringConfig()
    host = hirschberg_align(x, y, cfg, device_cells=1 << 60)
    dev = hirschberg_align(x, y, cfg, device_cells=0)
    assert dev.score == host.score
    assert alignment_score(dev.consensus_x[::-1], dev.consensus_y[::-1], cfg) == dev.score
    assert dev.consensus_x[::-1].replace("-", "") == x
    assert dev.consensus_y[::-1].replace("-", "") == y


def test_hirschberg_linear_space_long(rng):
    # Long enough that a dense matrix would be ~100M cells.
    x = random_dna(rng, 3000)
    y = list(x)
    for _ in range(60):
        y[int(rng.integers(0, len(y)))] = rng.choice(list("ACGT"))
    y = "".join(y)
    cfg = ScoringConfig()
    got = hirschberg_align(x, y, cfg)
    assert alignment_score(got.consensus_x[::-1], got.consensus_y[::-1], cfg) == got.score
    assert got.score >= 3 * (3000 - 2 * 60)  # at most all mutations mismatch
