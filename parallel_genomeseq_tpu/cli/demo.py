"""demo: minimal end-to-end example (the reference's main.cpp / parseqal).

Runs the Wikipedia Smith-Waterman example GGTTGACTA vs TGTTACGG through the
aligner (reference: src/main.cpp:11-20) and prints score, POS, and the
consensus strings; then shows the same pair through the chunked aligner and
the FM-index seed lookup.

Usage: python -m parallel_genomeseq_tpu.cli.demo
"""

from __future__ import annotations

import argparse
import sys

from ..models.fm_index import FMIndex
from ..models.swaligner import SWAligner
from ..parallel.chunking import ChunkedAligner
from ..utils.config import ChunkConfig
from . import common


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_platform_flags(p)
    args = p.parse_args(argv)
    common.apply_platform(args)

    x, y = "GGTTGACTA", "TGTTACGG"
    res = SWAligner().align(x, y)
    print(f"SW {x} vs {y}:")
    print(f"  score = {res.score:.0f}  POS = {res.pos}")
    print(f"  consensus_x = {res.consensus_x}")
    print(f"  consensus_y = {res.consensus_y}")

    ref = y * 8
    chunked = ChunkedAligner(chunk=ChunkConfig(npiece=2, overlap_ratio=2.0))
    cres = chunked.align_batch([x], ref)[0]
    print(f"chunked vs {len(ref)}-bp tandem reference: score {cres.score:.0f} pos {cres.pos}")

    fm = FMIndex(ref)
    print(f"FM-index: 'GTTAC' occurs at {fm.locate('GTTAC')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
