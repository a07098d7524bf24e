"""Reverse-complement (both-strands) alignment — extension beyond the
reference, which aligns the given sequence only. Real read sets contain
reverse-strand reads; --both-strands aligns read and revcomp(read) and keeps
the better score (forward wins ties)."""

import numpy as np

from conftest import random_dna
from parallel_genomeseq_tpu.models.swaligner import (
    BatchSWAligner, merge_strand_pairs,
)
from parallel_genomeseq_tpu.ops import oracle
from parallel_genomeseq_tpu.utils.encoding import revcomp


def test_revcomp_basic():
    assert revcomp("ACGT") == "ACGT"
    assert revcomp("AACG") == "CGTT"
    assert revcomp("ACGTN") == "NACGT"
    # involution
    assert revcomp(revcomp("GATTACA")) == "GATTACA"
    # uint8 form
    arr = np.frombuffer(b"ACGT", np.uint8)
    np.testing.assert_array_equal(revcomp(revcomp(arr)), arr)


def test_both_strands_finds_reverse_read(rng):
    """A read sampled from the minus strand aligns with strand '-' at the
    forward-planted position and the forward-planted score."""
    ref = random_dna(rng, 600)
    seg = ref[200:280]
    fwd_read = seg
    rev_read = revcomp(seg)
    al = BatchSWAligner()
    reads = [fwd_read, rev_read]
    fwd = al.align_batch(reads, [ref])
    rev = al.align_batch([revcomp(r) for r in reads], [ref])
    merged = merge_strand_pairs(fwd, rev)
    # forward read: plus strand wins (tie or better)
    assert merged[0].strand == "+"
    assert merged[0].score == 240.0
    # reverse read: minus strand strictly better
    assert merged[1].strand == "-"
    assert merged[1].score == 240.0
    assert merged[1].pos == fwd[0].pos  # same forward coordinates
    w = oracle.align(seg, ref)
    assert merged[1].pos == w.pos


def test_solve_small_both_strands(tmp_path):
    """CLI smoke: --both-strands output identical to plain for the all-
    forward data_small subset (forward wins ties)."""
    import csv

    from parallel_genomeseq_tpu.cli import solve_small

    out1 = tmp_path / "plain.csv"
    out2 = tmp_path / "both.csv"
    base = ["--limit", "24", "--npiece", "1", "--batch-size", "24"]
    assert solve_small.main(base + ["--output", str(out1)]) == 0
    assert solve_small.main(base + ["--both-strands", "--output", str(out2)]) == 0
    rows1 = list(csv.reader(open(out1)))
    rows2 = list(csv.reader(open(out2)))
    assert rows1 == rows2
