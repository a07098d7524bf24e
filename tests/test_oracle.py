"""Golden-value and property tests for the numpy oracle.

Goldens come from the reference's unit tests on the Wikipedia SW example
(reference: test/test_localaligner.cpp:24-27,53-59): score 13, POS 2,
consensus 'CAGTTG' / 'CA-TTG' for GGTTGACTA x TGTTACGG.
"""

import numpy as np
import pytest

from parallel_genomeseq_tpu.ops import oracle
from parallel_genomeseq_tpu.utils.config import ScoringConfig, Semantics

WIKI_X = "GGTTGACTA"
WIKI_Y = "TGTTACGG"


def test_wikipedia_golden():
    res = oracle.align(WIKI_X, WIKI_Y)
    assert res.score == 13
    assert res.pos == 2
    assert res.consensus_x == "CAGTTG"
    assert res.consensus_y == "CA-TTG"


def test_wikipedia_golden_sat_uint8():
    cfg = ScoringConfig(semantics=Semantics.SAT_UINT8)
    res = oracle.align(WIKI_X, WIKI_Y, cfg)
    assert res.score == 13
    assert res.pos == 2
    assert res.consensus_x == "CAGTTG"
    assert res.consensus_y == "CA-TTG"


def test_matrix_boundaries_zero():
    H = oracle.sw_matrix(WIKI_X, WIKI_Y)
    assert np.all(H[0, :] == 0)
    assert np.all(H[:, 0] == 0)
    assert H.shape == (len(WIKI_X) + 1, len(WIKI_Y) + 1)


def test_float_vs_int_semantics_agree():
    cfg_f = ScoringConfig(semantics=Semantics.FLOAT32)
    Hi = oracle.sw_matrix(WIKI_X, WIKI_Y)
    Hf = oracle.sw_matrix(WIKI_X, WIKI_Y, cfg_f)
    np.testing.assert_array_equal(Hi.astype(np.float32), Hf)


def test_sat_uint8_saturates():
    # A perfect 100-char match scores 300 in exact arithmetic but clamps at
    # 255 in the saturating-uint8 semantics (as in the reference's skewed
    # path, src/aligner/similaritymatrix.cpp:376-384).
    x = "A" * 100
    cfg = ScoringConfig(semantics=Semantics.SAT_UINT8)
    res_sat = oracle.align(x, x, cfg)
    res_exact = oracle.align(x, x)
    assert res_exact.score == 300
    assert res_sat.score == 255


def test_argmax_column_major_tiebreak():
    # Two equal maxima: column-major first-occurrence picks the smaller
    # ref index j (Eigen maxCoeff semantics).
    H = np.zeros((4, 5), dtype=np.int32)
    H[3, 2] = 7
    H[1, 4] = 7
    i, j, v = oracle.find_max(H)
    assert (i, j, v) == (3, 2, 7)
    # and within a column, the smaller read index i
    H[1, 2] = 7
    i, j, v = oracle.find_max(H)
    assert (i, j) == (1, 2)


def test_substitution_matrix_scoring():
    # A custom matrix equivalent to uniform +3/-3 must reproduce the golden.
    alpha = "ACGT"
    m = np.full((4, 4), -3.0)
    np.fill_diagonal(m, 3.0)
    cfg = ScoringConfig(matrix=m, alphabet=alpha)
    res = oracle.align(WIKI_X, WIKI_Y, cfg)
    assert res.score == 13
    assert res.pos == 2


def test_empty_alignment():
    res = oracle.align("AAAA", "GGGG", ScoringConfig(match=1.0, mismatch=-3.0, gap_penalty=5.0))
    assert res.score == 0
    assert res.pos == 0


def test_exact_substring_position(rng):
    # A read sampled from the reference must align back at its origin.
    from conftest import random_dna

    ref = random_dna(rng, 400)
    for start in (0, 37, 250):
        read = ref[start : start + 60]
        res = oracle.align(read, ref)
        assert res.score == 3 * 60
        assert res.pos == start + 1  # 1-based
        assert res.consensus_x == read[::-1]


def test_traceback_first_row_stop():
    # Max on row 1: neighbors include boundary zeros -> immediate stop,
    # pos = ref index of the max cell.
    res = oracle.align("G", "ATG")
    assert res.score == 3
    assert res.pos == 3
    assert res.consensus_x == "G"
    assert res.consensus_y == "G"


def test_sw_score_fast_matches_matrix(rng):
    """The vectorized startup-check oracle must agree with the per-cell DP
    (score and column-major argmax) for uniform and BLOSUM scoring."""
    from parallel_genomeseq_tpu.ops import oracle
    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.utils.config import ScoringConfig

    for t in range(12):
        protein = t % 2 == 1
        alpha = list("ARNDCQEGHILKMFPSTWYV") if protein else list("ACGT")
        x = "".join(rng.choice(alpha, int(rng.integers(3, 50))))
        y = "".join(rng.choice(alpha, int(rng.integers(3, 100))))
        cfg = (
            blosum_config("blosum50", gap_penalty=5.0)
            if protein else ScoringConfig()
        )
        H = oracle.sw_matrix(x, y, cfg)
        i, j, v = oracle.find_max(H)
        want = (int(v), i, j) if v > 0 else (0, 0, 0)
        assert oracle.sw_score_fast(x, y, cfg) == want, (t, x, y)
