"""Multi-device tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from conftest import random_dna
from parallel_genomeseq_tpu.ops import oracle
from parallel_genomeseq_tpu.parallel.chunking import ChunkedAligner
from parallel_genomeseq_tpu.parallel.mesh import MeshAligner, make_mesh
from parallel_genomeseq_tpu.utils.config import ChunkConfig


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["chunk"] * mesh.shape["batch"] == 8
    assert mesh.shape["chunk"] == 2
    mesh1 = make_mesh(1)
    assert dict(mesh1.shape) == {"chunk": 1, "batch": 1}


def test_mesh_scores_match_oracle(rng):
    ref = random_dna(rng, 900)
    reads = []
    for _ in range(6):
        s = int(rng.integers(0, 850))
        read = list(ref[s : s + 40])
        for _ in range(2):
            read[int(rng.integers(0, 40))] = rng.choice(list("ACGT"))
        reads.append("".join(read))
    al = MeshAligner(
        chunk_cfg=ChunkConfig(npiece=4, overlap_ratio=2.0), mesh=make_mesh(8)
    )
    out = al.score_reads(reads, ref)
    for k, read in enumerate(reads):
        H = oracle.sw_matrix(read, ref)
        _, _, ov = oracle.find_max(H)
        assert int(out["score"][k]) == ov, (k, read)


def test_mesh_matches_single_device_chunked(rng):
    """The distributed merge must agree with the sequential ChunkedAligner
    winner (same deterministic first-piece-wins tie-break)."""
    ref = random_dna(rng, 1200)
    reads = [ref[i : i + 50] for i in (10, 300, 700, 1100)]
    chunk = ChunkConfig(npiece=4, overlap_ratio=2.0)
    mal = MeshAligner(chunk_cfg=chunk, mesh=make_mesh(8))
    out = mal.score_reads(reads, ref)
    cal = ChunkedAligner(chunk=chunk, score_engine="scan")
    got = cal.align_batch(reads, ref)
    for k in range(len(reads)):
        assert int(out["score"][k]) == got[k].score
        assert int(out["j"][k]) == got[k].max_j, k


def test_mesh_ragged_reads_match_chunked(rng):
    """Ragged read lengths: MeshAligner's shared max-read window geometry
    must still produce exact scores and the same winning position as the
    per-read-geometry ChunkedAligner (max is unique for planted reads)."""
    ref = random_dna(rng, 1200)
    reads = [ref[10:40], ref[300:390], ref[700:755], ref[1050:1190]]
    chunk = ChunkConfig(npiece=4, overlap_ratio=2.0)
    mal = MeshAligner(chunk_cfg=chunk, mesh=make_mesh(8))
    out = mal.score_reads(reads, ref)
    cal = ChunkedAligner(chunk=chunk, score_engine="scan")
    got = cal.align_batch(reads, ref)
    for k, read in enumerate(reads):
        H = oracle.sw_matrix(read, ref)
        _, _, ov = oracle.find_max(H)
        assert int(out["score"][k]) == ov == got[k].score, k
        assert int(out["j"][k]) == got[k].max_j, k


def test_mesh_pallas_engine_preconditions():
    """engine='pallas' must reject configs outside the mask-free kernel
    envelope up front (same contract as PallasEngine.__init__) instead of
    silently returning wrong scores from padded lanes."""
    from parallel_genomeseq_tpu.ops.substitution import blosum_config
    from parallel_genomeseq_tpu.utils.config import ScoringConfig

    mesh = make_mesh(2)
    with pytest.raises(ValueError, match="negative"):
        MeshAligner(
            cfg=ScoringConfig(match=3, mismatch=0, gap_penalty=2),
            mesh=mesh, engine="pallas",
        )
    with pytest.raises(ValueError, match="gap_penalty >= 1"):
        MeshAligner(
            cfg=ScoringConfig(match=3, mismatch=-3, gap_penalty=0),
            mesh=mesh, engine="pallas",
        )
    # Substitution matrices with a negative worst entry ARE accepted (the
    # profile per-shard path); blosum62's min is -4.
    MeshAligner(cfg=blosum_config("blosum62"), mesh=mesh, engine="pallas")


def test_graft_entry_points():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import jax

    fn, args = mod.entry()
    score, i, j = jax.jit(fn)(*args)
    assert score.shape == (args[0].shape[1],)
    mod.dryrun_multichip(8)


def test_mesh_substitution_scoring(rng):
    """Distributed chunk-sharded scoring with a BLOSUM matrix — the UNIPROT
    multi-host configuration (custom scoring + chunk-sharded merge)."""
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    ref = "".join(rng.choice(alpha, 300))
    reads = ["".join(rng.choice(alpha, 25)) for _ in range(3)] + [ref[90:115]]
    cfg = blosum_config("blosum62", gap_penalty=4.0)
    al = MeshAligner(
        cfg=cfg, chunk_cfg=ChunkConfig(npiece=4, overlap_ratio=2.0),
        mesh=make_mesh(8),
    )
    out = al.score_reads(reads, ref)
    for k, r in enumerate(reads):
        _, _, ov = oracle.find_max(oracle.sw_matrix(r, ref, cfg))
        assert int(out["score"][k]) == ov, k


def test_mesh_pallas_profile_matches_scan(rng):
    """Substitution-matrix scoring on the Pallas per-shard path (VERDICT r2
    #7: BLOSUM on TPU meshes — the reference's MPI+UNIPROT combination,
    mpi_sw_solve_uniprot.cpp:65-138) must agree with the scan mesh on score,
    position, and winning piece — linear and affine gaps."""
    from parallel_genomeseq_tpu.ops.substitution import blosum_config

    alpha = list("ARNDCQEGHILKMFPSTWYV")
    ref = "".join(rng.choice(alpha, 400))
    reads = [ref[i : i + 30] for i in (25, 180, 360)] + [
        "".join(rng.choice(alpha, 30)) for _ in range(2)
    ]
    chunk = ChunkConfig(npiece=4, overlap_ratio=2.0)
    mesh = make_mesh(8)
    for gopen in (0.0, 10.0):
        cfg = blosum_config("blosum50", gap_penalty=2.0, gap_open=gopen)
        out_p = MeshAligner(
            cfg=cfg, chunk_cfg=chunk, mesh=mesh, engine="pallas"
        ).score_reads(reads, ref)
        out_s = MeshAligner(
            cfg=cfg, chunk_cfg=chunk, mesh=mesh, engine="scan"
        ).score_reads(reads, ref)
        for k in ("score", "i", "j", "piece"):
            assert (out_p[k] == out_s[k]).all(), (gopen, k, out_p[k], out_s[k])


def test_mesh_pallas_engine_matches_scan(rng):
    """The Pallas per-shard compute (production TPU path; interpret on this
    CPU mesh) must agree with the scan per-shard compute on score, position,
    and winning piece."""
    ref = random_dna(rng, 1000)
    reads = [ref[i : i + 40] for i in (25, 400, 880)] + [
        random_dna(rng, 40) for _ in range(3)
    ]
    chunk = ChunkConfig(npiece=4, overlap_ratio=2.0)
    mesh = make_mesh(8)
    out_p = MeshAligner(chunk_cfg=chunk, mesh=mesh, engine="pallas").score_reads(reads, ref)
    out_s = MeshAligner(chunk_cfg=chunk, mesh=mesh, engine="scan").score_reads(reads, ref)
    for k in ("score", "i", "j", "piece"):
        assert (out_p[k] == out_s[k]).all(), (k, out_p[k], out_s[k])
