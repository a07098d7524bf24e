"""Tests for window geometry and the chunked aligner merge."""

import numpy as np
import pytest

from conftest import random_dna
from parallel_genomeseq_tpu.parallel.chunking import ChunkedAligner, make_string_ranges
from parallel_genomeseq_tpu.ops import oracle
from parallel_genomeseq_tpu.utils.config import ChunkConfig, ScoringConfig


def test_ranges_single_piece():
    assert make_string_ranges(1, 10, 1000, 2.0) == [(0, 1000)]


def test_ranges_reference_geometry():
    # The solve_small configuration: 17 pieces, 125-bp read, 4980-bp ref,
    # overlap 2.0 (src/sw_solve_small.cpp:82).
    ranges = make_string_ranges(17, 125, 4980, 2.0)
    assert len(ranges) == 17
    overlap = int(125 * 2.0)
    piece = (4980 + 16 * overlap) // 17
    assert ranges[0] == (0, piece)
    # every interior window starts `overlap` before the previous end
    for (l0, r0), (l1, r1) in zip(ranges, ranges[1:]):
        assert l1 == max(0, r0 - overlap)
    assert ranges[-1][1] == 4980
    # full coverage
    assert ranges[0][0] == 0
    for (l0, r0), (l1, r1) in zip(ranges, ranges[1:]):
        assert l1 <= r0  # no holes


def test_ranges_window_lengths_bounded():
    ranges = make_string_ranges(7, 100, 3000, 2.0)
    piece = (3000 + 6 * 200) // 7
    for l, r in ranges[:-1]:
        assert r - l == piece


def test_ranges_errors():
    with pytest.raises(ValueError):
        make_string_ranges(50, 100, 120, 2.0)  # overlap > piece


def test_chunked_matches_unchunked_positions(rng):
    """Any alignment spanning <= overlap is contained in some window, so the
    chunked score equals the full-matrix score; position matches when the
    optimum is unique."""
    ref = random_dna(rng, 2000)
    reads = []
    for _ in range(6):
        s = int(rng.integers(0, 1900))
        read = list(ref[s : s + 80])
        for _ in range(3):
            p = int(rng.integers(0, len(read)))
            read[p] = rng.choice(list("ACGT"))
        reads.append("".join(read))
    ca = ChunkedAligner(chunk=ChunkConfig(npiece=5, overlap_ratio=2.0))
    results = ca.align_batch(reads, ref)
    for read, got in zip(reads, results):
        want = oracle.align(read, ref)
        assert got.score == want.score, read
        assert got.pos == want.pos, read


def test_chunked_score_only(rng):
    ref = random_dna(rng, 1500)
    reads = [ref[100:180], ref[1200:1280]]
    ca = ChunkedAligner(chunk=ChunkConfig(npiece=4, overlap_ratio=2.0))
    results = ca.align_batch(reads, ref, traceback=False)
    assert [r.score for r in results] == [240.0, 240.0]
    assert all(r.pos == 0 for r in results)


def test_chunked_custom_scoring_not_dropped(rng):
    """The winner re-run must keep the configured scoring (the reference
    silently reverts to defaults, plocalaligner.cpp:135 — divergence)."""
    ref = random_dna(rng, 1200)
    read = ref[300:360]
    cfg = ScoringConfig(match=5.0, mismatch=-4.0, gap_penalty=6.0)
    ca = ChunkedAligner(cfg=cfg, chunk=ChunkConfig(npiece=3, overlap_ratio=2.0))
    got = ca.align_batch([read], ref)[0]
    want = oracle.align(read, ref, cfg)
    assert got.score == want.score == 300.0
    assert got.pos == want.pos


def test_chunked_stream_matches_batch(rng):
    """align_stream pipelining must be a pure reordering of device work:
    identical results to per-batch align_batch calls, in order."""
    ref = random_dna(rng, 1800)
    reads = []
    for _ in range(20):
        s = int(rng.integers(0, 1700))
        read = list(ref[s : s + 70])
        p = int(rng.integers(0, len(read)))
        read[p] = rng.choice(list("ACGT"))
        reads.append("".join(read))
    ca = ChunkedAligner(chunk=ChunkConfig(npiece=4, overlap_ratio=2.0))
    batches = [reads[k : k + 6] for k in range(0, len(reads), 6)]
    want = [r for b in batches for r in ca.align_batch(b, ref)]
    got = [r for out in ca.align_stream(batches, ref, depth=2) for r in out]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.score == w.score
        assert g.pos == w.pos
        assert g.consensus_x == w.consensus_x
        assert g.consensus_y == w.consensus_y


def test_chunked_stream_score_only(rng):
    ref = random_dna(rng, 1500)
    reads = [ref[100:180], ref[900:980], ref[1200:1280], ref[40:120]]
    ca = ChunkedAligner(chunk=ChunkConfig(npiece=4, overlap_ratio=2.0))
    batches = [reads[:2], reads[2:]]
    got = [
        r
        for out in ca.align_stream(batches, ref, traceback=False, depth=3)
        for r in out
    ]
    assert [r.score for r in got] == [240.0] * 4
