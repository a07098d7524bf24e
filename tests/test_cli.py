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


def test_solve_uniprot_resident_matches_scan(tmp_path, rng, capsys):
    """The device-resident DB fast path (--engine pallas: flat-DB upload +
    on-device window gather, round-4) must produce a byte-identical output
    CSV to the legacy per-batch scan path, linear and affine."""
    from parallel_genomeseq_tpu.cli.solve_uniprot import main

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    query = "".join(rng.choice(alpha, 48))
    qf = tmp_path / "q.fasta"
    qf.write_text(">q\n" + query + "\n")
    db = tmp_path / "db.fasta"
    with open(db, "w") as f:
        for k in range(13):  # odd count -> remainder batch exercises padding
            ln = int(rng.integers(30, 200))
            f.write(f">p{k}\n" + "".join(rng.choice(alpha, ln)) + "\n")
        f.write(">planted\n" + query + "\n")
    for extra in ([], ["--gap-open", "10", "--gap-penalty", "2"]):
        out_s = tmp_path / "scan.csv"
        out_p = tmp_path / "pallas.csv"
        base = ["--platform", "cpu", "--query", str(qf), "--database",
                str(db), "--batch-size", "4", "--pad-mult", "64"] + extra
        assert main(base + ["--engine", "scan", "--output", str(out_s)]) == 0
        assert main(base + ["--engine", "pallas", "--output", str(out_p)]) == 0
        got = capsys.readouterr().out
        assert "resident DB:" in got  # the fast path actually ran
        assert out_p.read_text() == out_s.read_text()


def test_solve_uniprot_traceback_top(tmp_path, rng, capsys):
    """Top-K rows must carry the reference writer's pos_pred semantics:
    traceback pos with x=entry, y=query (position in the QUERY), matching a
    direct BatchSWAligner run in those roles. Other rows stay score-only."""
    import csv as csv_mod

    from parallel_genomeseq_tpu.cli.solve_uniprot import main
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    query = "".join(rng.choice(alpha, 60))
    qf = tmp_path / "q.fasta"
    qf.write_text(">q\n" + query + "\n")
    db = tmp_path / "db.fasta"
    names, seqs = [], []
    with open(db, "w") as f:
        for k in range(9):
            s = "".join(rng.choice(alpha, int(rng.integers(40, 150))))
            names.append(f"p{k}")
            seqs.append(s)
            f.write(f">p{k}\n{s}\n")
        names.append("planted")
        seqs.append(query[5:55])
        f.write(">planted\n" + query[5:55] + "\n")
    out = tmp_path / "o.csv"
    assert main([
        "--platform", "cpu", "--query", str(qf), "--database", str(db),
        "--output", str(out), "--top", "3", "--batch-size", "4",
    ]) == 0
    rows = list(csv_mod.DictReader(open(out)))
    filled = [r for r in rows if r["pos_pred"] != ""]
    assert len(filled) == 3
    cfg = blosum_config("blosum50")
    by_name = dict(zip(names, seqs))
    want = BatchSWAligner(cfg).align_batch(
        [by_name[r["name"]] for r in filled], [query] * 3, traceback=True
    )
    for r, w in zip(filled, want):
        assert int(r["pos_pred"]) == w.pos
        assert r["consensus_x"] == w.consensus_x
        assert int(r["score"]) == int(w.score)
    assert all(r["pos_pred"] == "" for r in rows if r not in filled)


def test_read_slice_ragged_single_process(tmp_path):
    """Ragged line-per-read files must decode correctly even in
    single-process mode (round-1 bug: the fixed-record fast path was
    unconditionally trusted when num_processes == 1)."""
    from parallel_genomeseq_tpu.cli.solve_dist import read_slice

    reads = ["ACGTACGTA", "ACG", "ACGTACGTACGTACGTAC", "ACGTACGT"]
    path = tmp_path / "ragged.txt"
    path.write_text("\n".join(reads) + "\n")
    n_total, local, lo = read_slice(str(path), 0, 1)
    assert (n_total, lo) == (4, 0)
    assert local == reads
    # And the 2-process slices must partition the read set.
    n0, l0, o0 = read_slice(str(path), 0, 2)
    n1, l1, o1 = read_slice(str(path), 1, 2)
    assert n0 == n1 == 4 and o0 == 0 and o1 == 2
    assert l0 + l1 == reads


def test_read_slice_uniform_records(tmp_path):
    """Uniform fixed-record files take the positioned-read fast path and
    produce identical slicing."""
    from parallel_genomeseq_tpu.cli.solve_dist import read_slice

    reads = [f"ACGTACG{k}" for k in range(6)]
    path = tmp_path / "uniform.txt"
    path.write_text("\n".join(reads) + "\n")
    parts = [read_slice(str(path), p, 3) for p in range(3)]
    assert all(n == 6 for n, _, _ in parts)
    assert [r for _, local, _ in parts for r in local] == reads


def test_solve_uniprot_resume_complete(tmp_path, rng, capsys):
    """Resuming a fully-completed run must exit 0 (round-1 bug:
    ZeroDivisionError computing GCUPS over zero scored cells)."""
    from parallel_genomeseq_tpu.cli.solve_uniprot import main

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    qf = tmp_path / "q.fasta"
    qf.write_text(">q\n" + "".join(rng.choice(alpha, 30)) + "\n")
    db = tmp_path / "db.fasta"
    with open(db, "w") as f:
        for k in range(4):
            f.write(f">p{k}\n" + "".join(rng.choice(alpha, 60)) + "\n")
    out = tmp_path / "o.csv"
    ckpt = tmp_path / "o.csv.ckpt"
    base = [
        "--platform", "cpu", "--query", str(qf), "--database", str(db),
        "--output", str(out), "--batch-size", "4", "--checkpoint", str(ckpt),
    ]
    assert main(base) == 0
    full = out.read_text()
    out.unlink()
    assert main(base + ["--resume"]) == 0
    assert out.read_text() == full


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


def test_solve_uniprot_resident_resume(tmp_path, rng, capsys):
    """Kill-and-resume on the device-resident SLAB path (--engine pallas):
    resume filters `order`, so the slab layout and same-N dispatch groups
    are rebuilt from the surviving batch composition — the merged output
    must still be byte-identical to the uninterrupted run."""
    from parallel_genomeseq_tpu.cli.solve_uniprot import main

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    qf = tmp_path / "q.fasta"
    qf.write_text(">q\n" + "".join(rng.choice(alpha, 40)) + "\n")
    db = tmp_path / "db.fasta"
    with open(db, "w") as f:
        for k in range(13):
            f.write(f">p{k}\n" + "".join(rng.choice(alpha, 50 + 11 * k)) + "\n")
    out = tmp_path / "o.csv"
    ckpt = tmp_path / "o.csv.ckpt"
    base = [
        "--platform", "cpu", "--engine", "pallas", "--query", str(qf),
        "--database", str(db), "--output", str(out), "--batch-size", "4",
        "--pad-mult", "64",
    ]
    assert main(base + ["--checkpoint", str(ckpt)]) == 0
    captured = capsys.readouterr().out
    assert "resident DB:" in captured  # the slab path actually ran
    full = out.read_text()
    lines = ckpt.read_text().splitlines()
    assert len(lines) == 13

    # Simulate a kill after the first 5 checkpointed proteins (mid-batch:
    # the surviving order re-buckets into different groups).
    ckpt.write_text("\n".join(lines[:5]) + "\n")
    out.unlink()
    assert main(base + ["--resume"]) == 0
    captured = capsys.readouterr().out
    assert "resume: 5 proteins restored" in captured
    assert "resident DB:" in captured
    assert out.read_text() == full


def test_solve_uniprot_multi_query(tmp_path, rng, capsys):
    """--query a.fasta,b.fasta scans BOTH queries against one shared
    resident slab (the DB pack/upload is query-independent); each query's
    output must be byte-identical to its own single-query run."""
    from parallel_genomeseq_tpu.cli.solve_uniprot import main

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    qfs = []
    for qn, ln in (("qa", 30), ("qb", 45)):
        qf = tmp_path / f"{qn}.fasta"
        qf.write_text(f">{qn}\n" + "".join(rng.choice(alpha, ln)) + "\n")
        qfs.append(qf)
    db = tmp_path / "db.fasta"
    with open(db, "w") as f:
        for k in range(9):
            f.write(f">p{k}\n" + "".join(rng.choice(alpha, 60 + 9 * k)) + "\n")
    common_args = [
        "--platform", "cpu", "--engine", "pallas", "--database", str(db),
        "--batch-size", "4", "--pad-mult", "64",
    ]
    singles = {}
    for qf in qfs:
        out = tmp_path / f"single_{qf.stem}.csv"
        assert main(common_args + ["--query", str(qf),
                                   "--output", str(out)]) == 0
        singles[qf.stem] = out.read_text()
    multi_out = tmp_path / "multi.csv"
    assert main(common_args + [
        "--query", f"{qfs[0]},{qfs[1]}", "--output", str(multi_out)]) == 0
    captured = capsys.readouterr().out
    assert "2 queries" in captured
    assert "one shared resident DB" in captured
    for qn in ("qa", "qb"):
        assert (tmp_path / f"multi.csv.{qn}").read_text() == singles[qn]

    # Checkpoint/resume are single-query-only (rows are name-keyed).
    import pytest

    with pytest.raises(SystemExit):
        main(common_args + ["--query", f"{qfs[0]},{qfs[1]}",
                            "--output", str(multi_out), "--resume"])


def test_solve_uniprot_multi_query_non_resident(tmp_path, rng, capsys):
    """Multi-query must also work OFF the resident path (round-4 bug:
    build_pprof was defined only under `if resident:` but called for every
    query after the first — `--engine scan`, `--matrix uniform`, or a long
    query all crashed with UnboundLocalError after query 1). Each query's
    output must be byte-identical to its own single-query run."""
    from parallel_genomeseq_tpu.cli.solve_uniprot import main

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    qfs = []
    for qn, ln in (("qa", 30), ("qb", 45)):
        qf = tmp_path / f"{qn}.fasta"
        qf.write_text(f">{qn}\n" + "".join(rng.choice(alpha, ln)) + "\n")
        qfs.append(qf)
    db = tmp_path / "db.fasta"
    with open(db, "w") as f:
        for k in range(9):
            f.write(f">p{k}\n" + "".join(rng.choice(alpha, 60 + 9 * k)) + "\n")
    for mode in (["--engine", "scan"], ["--matrix", "uniform"]):
        common_args = [
            "--platform", "cpu", "--database", str(db),
            "--batch-size", "4", "--pad-mult", "64",
        ] + mode
        singles = {}
        for qf in qfs:
            out = tmp_path / f"nr_single_{qf.stem}.csv"
            assert main(common_args + ["--query", str(qf),
                                       "--output", str(out)]) == 0
            singles[qf.stem] = out.read_text()
        multi_out = tmp_path / "nr_multi.csv"
        assert main(common_args + [
            "--query", f"{qfs[0]},{qfs[1]}", "--output", str(multi_out)]) == 0
        for qn in ("qa", "qb"):
            assert (tmp_path / f"nr_multi.csv.{qn}").read_text() == singles[qn]
    capsys.readouterr()


def test_solve_uniprot_multi_query_long_query_resident(tmp_path, rng, capsys):
    """A multi-query scan mixing a short and a TITIN-CLASS (> MAX_M) query
    stays fully RESIDENT: the short query dispatches the single-strip slab
    kernel, the long one the strips slab kernel
    (score_db_slab_strips_jit), over one shared slab — and both outputs
    are byte-identical to single-query scan-engine runs. (Round-4 bugs
    covered: the gate looked only at the first query, and long queries
    fell back to the per-batch-upload loop entirely.)"""
    from parallel_genomeseq_tpu.cli.solve_uniprot import main
    from parallel_genomeseq_tpu.ops.wavefront_pallas import MAX_M

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    qa = tmp_path / "qa.fasta"
    qa.write_text(">qa\n" + "".join(rng.choice(alpha, 24)) + "\n")
    qlong = tmp_path / "qlong.fasta"
    qlong.write_text(">qlong\n" + "".join(rng.choice(alpha, MAX_M + 8)) + "\n")
    db = tmp_path / "db.fasta"
    with open(db, "w") as f:
        for k in range(7):
            f.write(f">p{k}\n" + "".join(rng.choice(alpha, 30 + 11 * k)) + "\n")
    multi_out = tmp_path / "lg_multi.csv"
    assert main([
        "--platform", "cpu", "--engine", "pallas", "--database", str(db),
        "--batch-size", "4", "--pad-mult", "64", "--top", "1",
        "--traceback-top", "0",
        "--query", f"{qa},{qlong}", "--output", str(multi_out)]) == 0
    got = capsys.readouterr().out
    assert "resident DB:" in got  # the slab path served BOTH queries
    for qf, qn in ((qa, "qa"), (qlong, "qlong")):
        out_s = tmp_path / f"lg_single_{qn}.csv"
        assert main([
            "--platform", "cpu", "--engine", "scan", "--database", str(db),
            "--batch-size", "4", "--pad-mult", "64", "--top", "1",
            "--traceback-top", "0",
            "--query", str(qf), "--output", str(out_s)]) == 0
        capsys.readouterr()
        assert (tmp_path / f"lg_multi.csv.{qn}").read_text() == \
            out_s.read_text(), qn


def test_solve_uniprot_traceback_all(tmp_path, rng, capsys):
    """--traceback-all must emit the reference writer's pos_pred/consensus
    for EVERY row (the reference runs calculateScore() incl. traceback on
    every entry, mpi_sw_solve_uniprot.cpp:120-138,151-186), each matching a
    direct BatchSWAligner probe in the writer's x=entry/y=query roles."""
    import csv as csv_mod

    from parallel_genomeseq_tpu.cli.solve_uniprot import main
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    query = "".join(rng.choice(alpha, 40))
    qf = tmp_path / "q.fasta"
    qf.write_text(">q\n" + query + "\n")
    db = tmp_path / "db.fasta"
    names, seqs = [], []
    with open(db, "w") as f:
        for k in range(64):
            ln = int(rng.integers(25, 90))
            sq = "".join(rng.choice(alpha, ln))
            names.append(f"p{k}")
            seqs.append(sq)
            f.write(f">p{k}\n{sq}\n")
    out = tmp_path / "o.csv"
    assert main([
        "--platform", "cpu", "--query", str(qf), "--database", str(db),
        "--output", str(out), "--batch-size", "16", "--pad-mult", "64",
        "--traceback-all",
    ]) == 0
    capsys.readouterr()
    rows = {r["name"]: r for r in csv_mod.DictReader(open(out))}
    assert len(rows) == 64
    cfg = blosum_config("blosum50", gap_penalty=12.0, gap_open=0.0)
    bat = BatchSWAligner(cfg)
    probe = bat.align_batch(seqs, [query] * len(seqs), traceback=True)
    for name, sq, r in zip(names, seqs, probe):
        row = rows[name]
        assert row["pos_pred"] != "", name
        assert int(row["pos_pred"]) == r.pos, name
        assert row["consensus_x"] == r.consensus_x, name
        assert row["consensus_y"] == r.consensus_y, name
        assert int(row["score"]) == int(r.score), name
