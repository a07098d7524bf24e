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


def test_strips_rejects_unsupported():
    m = MAX_M + 8
    xs = np.full((1, m), 65, np.uint8)
    ys = np.full((1, 64), 65, np.uint8)
    with pytest.raises(ValueError):
        # match * read_len beyond the int16 boundary-row bound
        PallasEngine(ScoringConfig(match=100.0, mismatch=-3.0, gap_penalty=2.0)) \
            .score_batch(xs, ys, np.array([m]), np.array([64]))
