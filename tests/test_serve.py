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
