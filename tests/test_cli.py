"""In-process CLI smoke tests (CPU) for the workload drivers."""

import csv
import os

import numpy as np
import pytest

from conftest import needs_reference_data, random_dna


def test_demo_runs(capsys):
    from parallel_genomeseq_tpu.cli.demo import main

    assert main(["--platform", "cpu"]) == 0
    out = capsys.readouterr().out
    assert "score = 13" in out and "CAGTTG" in out


@needs_reference_data
def test_solve_small_limit(tmp_path, capsys):
    from parallel_genomeseq_tpu.cli.solve_small import main

    out = tmp_path / "ao.csv"
    assert main([
        "--platform", "cpu", "--limit", "8", "--npiece", "1",
        "--output", str(out),
    ]) == 0
    rows = list(csv.DictReader(open(out), skipinitialspace=True))
    assert len(rows) == 8 and all(int(r["score"]) > 0 for r in rows)


def test_gen_data_and_solve_big(tmp_path, capsys):
    from parallel_genomeseq_tpu.cli import gen_data, solve_big

    ref_fa = tmp_path / "ref.fa"
    assert gen_data.main(["gen_ref", "--ref-len", "1500", "--out", str(ref_fa)]) == 0
    reads_csv = tmp_path / "reads.csv"
    assert gen_data.main([
        "gen_reads", "--ref", str(ref_fa), "--n-reads", "4",
        "--read-len", "200", "--out-csv", str(reads_csv),
        "--out-txt", str(tmp_path / "reads.txt"),
    ]) == 0
    assert solve_big.main([
        "2", "1", "--platform", "cpu", "--ref", str(ref_fa),
        "--reads", str(reads_csv), "--batch-size", "4",
    ]) == 0
    assert "GCUPS mean" in capsys.readouterr().out


def test_evaluate_compare_detects_mismatch(tmp_path):
    from parallel_genomeseq_tpu.cli.evaluate import main

    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    a.write_text("index,pos_pred,score\n0,5,10\n")
    b.write_text("index,pos_pred,score\n0,6,10\n")
    assert main(["--option", "compare", "--align-file", str(a), "--compare-file", str(b)]) == 1
    b.write_text("index,pos_pred,score\n0,5,10\n")
    assert main(["--option", "compare", "--align-file", str(a), "--compare-file", str(b)]) == 0


def test_solve_uniprot_synthetic(tmp_path, rng, capsys):
    from parallel_genomeseq_tpu.cli.solve_uniprot import main

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    query = "".join(rng.choice(alpha, 50))
    qf = tmp_path / "q.fasta"
    qf.write_text(">q\n" + query + "\n")
    db = tmp_path / "db.fasta"
    with open(db, "w") as f:
        for k in range(6):
            f.write(f">p{k}\n" + "".join(rng.choice(alpha, 120)) + "\n")
        f.write(">planted\n" + query + "\n")
    out = tmp_path / "o.csv"
    assert main([
        "--platform", "cpu", "--query", str(qf), "--database", str(db),
        "--output", str(out), "--top", "1", "--batch-size", "8",
    ]) == 0
    top = capsys.readouterr().out.splitlines()
    assert any("planted" in l for l in top)


def test_solve_uniprot_checkpoint_resume(tmp_path, rng, capsys):
    from parallel_genomeseq_tpu.cli.solve_uniprot import main

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    query = "".join(rng.choice(alpha, 40))
    qf = tmp_path / "q.fasta"
    qf.write_text(">q\n" + query + "\n")
    db = tmp_path / "db.fasta"
    with open(db, "w") as f:
        for k in range(10):
            f.write(f">p{k}\n" + "".join(rng.choice(alpha, 80 + 7 * k)) + "\n")
    out = tmp_path / "o.csv"
    ckpt = tmp_path / "o.csv.ckpt"
    base = [
        "--platform", "cpu", "--query", str(qf), "--database", str(db),
        "--output", str(out), "--batch-size", "4",
    ]
    assert main(base + ["--checkpoint", str(ckpt)]) == 0
    full = out.read_text()
    lines = ckpt.read_text().splitlines()
    assert len(lines) == 10

    # Simulate a killed run: keep only the first batch's checkpoint rows.
    ckpt.write_text("\n".join(lines[:4]) + "\n")
    out.unlink()
    assert main(base + ["--resume"]) == 0
    captured = capsys.readouterr().out
    assert "resume: 4 proteins restored" in captured
    assert "6 to go" in captured
    assert out.read_text() == full
