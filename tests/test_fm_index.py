"""FM-index tests: the reference's demo cases plus property checks."""

import numpy as np
import pytest

from conftest import needs_reference_data

from conftest import random_dna
from parallel_genomeseq_tpu.models.fm_index import FMIndex, _suffix_array


def brute_positions(text, pattern):
    return [i for i in range(len(text) - len(pattern) + 1) if text[i : i + len(pattern)] == pattern]


def test_reference_demo_case():
    # The reference demos on "TAGAGA" (+'$') with pattern "AGA"
    # (src/bwt_fm.cpp:182-239): two occurrences.
    fm = FMIndex("TAGAGA")
    assert fm.count("AGA") == 2
    assert fm.locate("AGA") == [1, 3]


def test_suffix_array_matches_sorted_suffixes():
    text = "TAGAGA"
    s = np.concatenate([np.frombuffer(text.encode(), np.uint8).astype(np.int32) + 1, [0]])
    sa = _suffix_array(s)
    suffixes = sorted(range(len(s)), key=lambda i: bytes(s[i:]))
    assert list(sa) == suffixes


def test_random_patterns(rng):
    text = random_dna(rng, 800)
    fm = FMIndex(text)
    for _ in range(20):
        plen = int(rng.integers(1, 12))
        start = int(rng.integers(0, len(text) - plen))
        pat = text[start : start + plen]
        assert fm.locate(pat) == brute_positions(text, pat)
    assert fm.count("NNN") == 0
    assert fm.locate("X") == []


def test_seeds_anchor_read(rng):
    text = random_dna(rng, 500)
    read = text[200:260]
    fm = FMIndex(text)
    seeds = fm.seeds(read, k=20, step=10)
    # every seed maps the read back consistently
    assert any(pos - off == 200 for off, pos in seeds)


@needs_reference_data
def test_genome_scale():
    from parallel_genomeseq_tpu.seqio.readers import read_fasta

    ref = read_fasta("/root/reference/data/data_small/genome.chr22.5K.fa")
    fm = FMIndex(ref)
    pat = ref[2634:2634 + 40]
    assert fm.locate(pat) == brute_positions(ref, pat)
