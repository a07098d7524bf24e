"""Native IO layer: build, bind, and agree with the Python readers."""

import numpy as np
import pytest

from conftest import needs_reference_data

from parallel_genomeseq_tpu.native import lib
from parallel_genomeseq_tpu.seqio import native_io, readers

REF_FA = "/root/reference/data/data_small/genome.chr22.5K.fa"
GT_CSV = "/root/reference/data/data_small_ground_truth.csv"


def test_native_builds():
    assert lib() is not None, "native library failed to build"


@needs_reference_data
def test_read_fasta_matches_python():
    assert native_io.read_fasta(REF_FA) == readers.read_fasta(REF_FA)


@needs_reference_data
def test_parse_gt_csv_matches_python():
    seq, lens, pos = native_io.parse_gt_csv(GT_CSV, seq_cap=256)
    rows = readers.read_ground_truth(GT_CSV)
    assert len(rows) == len(seq) == 1170
    for k in (0, 7, 1169):
        want = rows[k]["SEQ"].encode()
        assert seq[k, : lens[k]].tobytes() == want
        assert pos[k] == int(rows[k]["POS"])


def test_fixed_records_roundtrip(tmp_path):
    p = tmp_path / "reads.txt"
    payload = 20
    recs = [bytes(np.random.randint(65, 90, payload).astype(np.uint8)) for _ in range(9)]
    with open(p, "wb") as f:
        for r in recs:
            f.write(r + b"\n")
    assert native_io.count_records(p, payload + 1) == 9
    got = native_io.read_records(p, payload + 1, 3, 4)
    assert got.shape == (4, payload)
    for k in range(4):
        assert got[k].tobytes() == recs[3 + k]


@needs_reference_data
def test_write_align_output_matches_schema(tmp_path):
    out = tmp_path / "ao.csv"
    n = 1170
    pos = np.arange(1, n + 1, dtype=np.int64)
    score = np.full(n, 375.0)
    wrote = native_io.write_align_output(GT_CSV, out, pos, score)
    assert wrote == n
    import csv

    with open(out, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == n
    assert rows[0]["pos_pred"] == "1" and rows[0]["score"] == "375"
    assert rows[5]["POS"]  # original columns preserved
