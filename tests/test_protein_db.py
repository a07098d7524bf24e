"""ResidentProteinDB unit tests (CPU, interpret mode)."""

import numpy as np
import pytest


def _mkdb(rng, n=9, minlen=30, maxlen=150):
    alpha = list("ARNDCQEGHILKMFPSTWYV")
    return [(f"p{k}",
             "".join(rng.choice(alpha, int(rng.integers(minlen, maxlen)))))
            for k in range(n)]


def test_scan_matches_scan_engine_short_and_titin(rng):
    """Resident scans — single-strip AND strips slab kernels — must match
    the scan engine exactly, sharing one slab across both query classes."""
    from parallel_genomeseq_tpu.models.protein_db import ResidentProteinDB
    from parallel_genomeseq_tpu.ops.scan_dp import ScanEngine
    from parallel_genomeseq_tpu.ops.wavefront_pallas import MAX_M
    from parallel_genomeseq_tpu.utils.encoding import Y_PAD, batch_pad, to_bytes

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    entries = _mkdb(rng)
    qshort = "".join(rng.choice(alpha, 40))
    qlong = "".join(rng.choice(alpha, MAX_M + 16))
    db = ResidentProteinDB(entries, matrix="blosum50", gap_penalty=12.0,
                           gap_open=0.0, batch_size=4, pad_mult=64,
                           max_query_len=MAX_M + 16)
    eng = ScanEngine(db.cfg)
    for q in (qshort, qlong):
        scores, pos, _ = db.scan_scores(q)
        qb = to_bytes(q)
        seqs = [to_bytes(s) for _, s in entries]
        n = np.array([len(s) for s in seqs], np.int32)
        ys = batch_pad(seqs, int(n.max()), Y_PAD)
        xs = np.broadcast_to(qb[None, :], (len(seqs), len(qb))).copy()
        m = np.full(len(seqs), len(qb), np.int32)
        want = eng.score_batch(xs, ys, m, n)
        np.testing.assert_array_equal(scores, np.asarray(want["score"]))
        np.testing.assert_array_equal(pos, np.asarray(want["j"]))


def test_first_scan_gate_is_per_kernel_family(rng):
    """A verified short-query (single-strip) scan must NOT disarm the
    first-scan oracle gate for the strips slab kernel — they are separate
    compiled programs and each can independently miscompile (the serve
    startup warm scan is always short, so without per-family tracking the
    first titin-class request would go unverified)."""
    from parallel_genomeseq_tpu.models.protein_db import ResidentProteinDB
    from parallel_genomeseq_tpu.ops.wavefront_pallas import MAX_M

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    entries = _mkdb(rng)
    db = ResidentProteinDB(entries, matrix="blosum50", gap_penalty=12.0,
                           gap_open=0.0, batch_size=4, pad_mult=64,
                           max_query_len=MAX_M + 16)
    db._verified = set()  # interpret mode pre-verifies; arm the gate
    db.scan_scores("".join(rng.choice(alpha, 40)))
    assert db._verified == {"single"}
    db.scan_scores("".join(rng.choice(alpha, MAX_M + 16)))
    assert db._verified == {"single", "strips"}

    # And a failing check raises: poison the oracle comparison by lying
    # about an entry's bytes.
    db2 = ResidentProteinDB(entries, matrix="blosum50", gap_penalty=12.0,
                            gap_open=0.0, batch_size=4, pad_mult=64)
    db2._verified = set()
    from parallel_genomeseq_tpu.utils.encoding import to_bytes

    db2._seqs[db2.order[0]] = to_bytes("AAAA")  # slab still has the real seq
    with pytest.raises(RuntimeError, match="first-scan check FAILED"):
        db2.scan_scores("".join(rng.choice(alpha, 40)))


def test_write_uniprot_csv_shared_writer(tmp_path):
    from parallel_genomeseq_tpu.models.protein_db import (
        UNIPROT_CSV_HEADER,
        write_uniprot_csv,
    )

    entries = [("a", "ARN"), ("b", "DCQEG")]
    out = tmp_path / "o.csv"
    write_uniprot_csv(str(out), entries, [7, 9], [2, 4],
                      {1: (3, "DC-", "DCQ")})
    lines = out.read_text().splitlines()
    assert lines[0] == ",".join(UNIPROT_CSV_HEADER)
    assert lines[1] == "a,3,7,2,,,"
    assert lines[2] == "b,5,9,4,3,DC-,DCQ"
