"""Differential tests: device traceback vs the numpy oracle walk."""

import numpy as np
import pytest

from conftest import random_dna
from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner, SWAligner
from parallel_genomeseq_tpu.ops import oracle
from parallel_genomeseq_tpu.utils.config import ScoringConfig, Semantics


def test_wiki_golden_device():
    res = SWAligner().align("GGTTGACTA", "TGTTACGG")
    assert res.score == 13
    assert res.pos == 2
    assert res.consensus_x == "CAGTTG"
    assert res.consensus_y == "CA-TTG"


def test_batch_matches_oracle(rng):
    pairs = [
        (random_dna(rng, int(rng.integers(4, 30))), random_dna(rng, int(rng.integers(8, 64))))
        for _ in range(16)
    ]
    ba = BatchSWAligner()
    results = ba.align_batch([x for x, _ in pairs], [y for _, y in pairs])
    for (x, y), got in zip(pairs, results):
        want = oracle.align(x, y)
        assert got.score == want.score, (x, y)
        assert got.pos == want.pos, (x, y)
        assert got.consensus_x == want.consensus_x, (x, y)
        assert got.consensus_y == want.consensus_y, (x, y)


def test_mutated_reads_vs_oracle(rng):
    """Reads with substitutions/indels against a shared reference."""
    ref = random_dna(rng, 300)
    reads = []
    for _ in range(8):
        s = int(rng.integers(0, 240))
        read = list(ref[s : s + 50])
        for _ in range(4):
            p = int(rng.integers(0, len(read)))
            op = rng.choice(["sub", "del", "ins"])
            if op == "sub":
                read[p] = rng.choice(list("ACGT"))
            elif op == "del":
                read.pop(p)
            else:
                read.insert(p, rng.choice(list("ACGT")))
        reads.append("".join(read))
    ba = BatchSWAligner()
    results = ba.align_batch(reads, [ref])
    for read, got in zip(reads, results):
        want = oracle.align(read, ref)
        assert got.score == want.score
        assert got.pos == want.pos
        assert got.consensus_x == want.consensus_x
        assert got.consensus_y == want.consensus_y


def test_sat_uint8_semantics_device(rng):
    cfg = ScoringConfig(semantics=Semantics.SAT_UINT8)
    ba = BatchSWAligner(cfg)
    ref = random_dna(rng, 200)
    reads = [ref[i : i + 120] for i in (0, 40, 77)]  # saturating: 360 -> 255
    results = ba.align_batch(reads, [ref])
    for read, got in zip(reads, results):
        want = oracle.align(read, ref, cfg)
        assert got.score == want.score == 255
        assert got.pos == want.pos
        assert got.consensus_x == want.consensus_x


def test_score_only_mode():
    res = SWAligner().align("GGTTGACTA", "TGTTACGG", traceback=False)
    assert res.score == 13
    assert res.pos == 0 and res.consensus_x == ""


def test_no_alignment_lane():
    ba = BatchSWAligner(ScoringConfig(match=1.0, mismatch=-5.0, gap_penalty=5.0))
    got = ba.align_batch(["AAAA", "GGGG"], ["GGGG", "GGGG"])
    assert got[0].score == 0 and got[0].pos == 0 and got[0].consensus_x == ""
    assert got[1].score == 4


def test_batch_stream_matches_batch(rng):
    """BatchSWAligner.align_stream == per-batch align_batch, in order."""
    from conftest import random_dna
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner

    ref = random_dna(rng, 600)
    reads = []
    for _ in range(12):
        s = int(rng.integers(0, 520))
        read = list(ref[s : s + 60])
        p = int(rng.integers(0, len(read)))
        read[p] = rng.choice(list("ACGT"))
        reads.append("".join(read))
    al = BatchSWAligner()
    batches = [reads[k : k + 4] for k in range(0, len(reads), 4)]
    want = [r for b in batches for r in al.align_batch(b, [ref])]
    got = [r for out in al.align_stream(batches, [ref], depth=2) for r in out]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.score, g.pos, g.consensus_x, g.consensus_y) == (
            w.score, w.pos, w.consensus_x, w.consensus_y,
        )
