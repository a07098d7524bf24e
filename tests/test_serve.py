"""Alignment server: subprocess round-trip over the Unix-socket protocol."""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import random_dna

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def server(tmp_path, rng):
    from parallel_genomeseq_tpu.cli.serve import request, wait_ready

    ref = random_dna(rng, 600)
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(f">ref\n{ref}\n")
    sock = str(tmp_path / "pgs.sock")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "parallel_genomeseq_tpu.cli.serve",
            "--socket", sock, "--ref", str(ref_fa), "--platform", "cpu",
            "--warm-read-len", "24", "--batch-size", "8",
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    try:
        wait_ready(sock, timeout=240.0)
        yield sock, ref
        request(sock, {"op": "shutdown"})
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_serve_roundtrip(server, rng):
    from parallel_genomeseq_tpu.cli.serve import request
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner

    sock, ref = server
    rep = request(sock, {"op": "ping"})
    assert rep["ok"] and rep["ref_len"] == len(ref)

    reads = [random_dna(rng, 24) for _ in range(5)]
    reads[0] = ref[100:124]  # planted exact hit
    rep = request(sock, {"op": "align", "reads": reads})
    assert rep["ok"], rep
    got = rep["results"]
    assert len(got) == len(reads)
    want = BatchSWAligner().align_batch(reads, [ref])
    for g, w in zip(got, want):
        assert g["score"] == w.score
        assert g["pos"] == w.pos
        assert g["consensus_x"] == w.consensus_x
        assert g["consensus_y"] == w.consensus_y
    assert got[0]["score"] == 3 * 24

    # per-request reference override
    rep = request(
        sock, {"op": "align", "reads": [reads[0]], "ref": reads[0],
               "traceback": False},
    )
    assert rep["ok"] and rep["results"][0]["score"] == 3 * 24

    # malformed request keeps the server alive
    rep = request(sock, {"op": "align", "reads": []})
    assert not rep["ok"]
    assert request(sock, {"op": "ping"})["ok"]


def test_serve_protein_db_scan(tmp_path, rng):
    """--protein-db loads a resident slab at startup; scan_db requests
    return top-K hits matching the oracle's scores."""
    from parallel_genomeseq_tpu.cli.serve import request, wait_ready

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    db = tmp_path / "db.fasta"
    seqs = ["".join(rng.choice(alpha, 60 + 13 * k)) for k in range(7)]
    query = "".join(rng.choice(alpha, 35))
    seqs[4] = seqs[4][:10] + query + seqs[4][10:]  # planted exact hit
    with open(db, "w") as f:
        for k, sq in enumerate(seqs):
            f.write(f">p{k}\n{sq}\n")
    sock = str(tmp_path / "pgs.sock")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "parallel_genomeseq_tpu.cli.serve",
            "--socket", sock, "--platform", "cpu", "--warm-read-len", "0",
            "--protein-db", str(db), "--db-batch-size", "4",
            "--db-pad-mult", "64",
        ],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        wait_ready(sock, timeout=240.0)
        rep = request(sock, {"op": "ping"})
        assert rep["ok"] and rep["protein_db_entries"] == 7
        rep = request(sock, {"op": "scan_db", "query": query, "top": 3})
        assert rep["ok"], rep
        assert rep["n_entries"] == 7 and len(rep["hits"]) == 3

        from parallel_genomeseq_tpu.ops.oracle import sw_affine_score_fast
        from parallel_genomeseq_tpu.ops.substitution import blosum_config

        cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0)
        want = sorted(
            (sw_affine_score_fast(query, sq, cfg)[0] for sq in seqs),
            reverse=True,
        )[:3]
        assert [h["score"] for h in rep["hits"]] == want
        assert rep["hits"][0]["name"] == "p4"  # the planted winner

        # traceback=true adds the CLI's --traceback-top columns to the
        # inline hits (pos_pred in the QUERY, consensus strings), matching
        # a direct BatchSWAligner run in the writer's x=entry/y=query roles.
        rep = request(sock, {"op": "scan_db", "query": query, "top": 2,
                             "traceback": True})
        assert rep["ok"], rep
        from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner

        bat = BatchSWAligner(cfg)
        by_name = {f"p{k}": sq for k, sq in enumerate(seqs)}
        for h in rep["hits"]:
            w = bat.align_batch([by_name[h["name"]]], [query],
                                traceback=True)[0]
            assert h["pos_pred"] == w.pos
            assert h["consensus_x"] == w.consensus_x
            assert h["consensus_y"] == w.consensus_y
            assert h["score"] == int(w.score)

        # Whole-result serving: "output" makes the server write EVERY row's
        # CSV server-side (the reference writer's all-rows schema); the file
        # must be byte-identical to a solve_uniprot run with the same
        # scoring and traceback disabled.
        out_srv = tmp_path / "served.csv"
        rep = request(sock, {"op": "scan_db", "query": query, "top": 3,
                             "output": str(out_srv)})
        assert rep["ok"], rep
        assert rep["n_rows"] == 7 and rep["output"] == str(out_srv)
        assert len(rep["hits"]) == 3  # top-K still inline
        from parallel_genomeseq_tpu.cli.solve_uniprot import main as up_main

        qf = tmp_path / "q.fasta"
        qf.write_text(">q\n" + query + "\n")
        out_cli = tmp_path / "cli.csv"
        assert up_main([
            "--platform", "cpu", "--engine", "pallas", "--query", str(qf),
            "--database", str(db), "--output", str(out_cli),
            "--matrix", "blosum50", "--gap-open", "10", "--gap-penalty", "2",
            "--batch-size", "4", "--pad-mult", "64", "--traceback-top", "0",
        ]) == 0
        assert out_srv.read_text() == out_cli.read_text()

        # Errors surface without killing the server.
        rep = request(sock, {"op": "scan_db", "query": ""})
        assert not rep["ok"]
        rep = request(sock, {"op": "ping"})
        assert rep["ok"]
        request(sock, {"op": "shutdown"})
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_serve_protein_align_matrix(tmp_path, rng):
    """--matrix blosum50 turns the align op into a protein aligner (full
    traceback serving with substitution-matrix scoring — the reference's
    fast path cannot do matrix scoring at all)."""
    from parallel_genomeseq_tpu.cli.serve import request, wait_ready
    from parallel_genomeseq_tpu.models.swaligner import BatchSWAligner
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    ref = "".join(rng.choice(alpha, 400))
    ref_fa = tmp_path / "pref.fa"
    ref_fa.write_text(f">p\n{ref}\n")
    sock = str(tmp_path / "pgs_prot.sock")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "parallel_genomeseq_tpu.cli.serve",
            "--socket", sock, "--ref", str(ref_fa), "--platform", "cpu",
            "--warm-read-len", "0", "--batch-size", "8",
            "--matrix", "blosum50", "--gap-penalty", "2", "--gap-open", "10",
        ],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        wait_ready(sock, timeout=240.0)
        queries = ["".join(rng.choice(alpha, 40)) for _ in range(3)]
        queries[0] = ref[100:140]  # planted exact hit
        rep = request(sock, {"op": "align", "reads": queries})
        assert rep["ok"], rep
        cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=10.0)
        want = BatchSWAligner(cfg).align_batch(queries, [ref])
        for g, w in zip(rep["results"], want):
            assert g["score"] == w.score
            assert g["pos"] == w.pos
            assert g["consensus_x"] == w.consensus_x
        request(sock, {"op": "shutdown"})
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
