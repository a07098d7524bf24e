"""Alignment output CSV, drop-in compatible with the reference's schema.

The reference drivers append ``pos_pred`` and ``score`` columns to each
ground-truth row and write ``data/align_output.csv`` with the values
space-prefixed (``<row>, <pos>, <score>`` — src/sw_solve_small.cpp:91-93);
pandas tolerates the spaces, and the eval tooling joins on the ``index``
column. We keep the exact column schema (header gains ``,pos_pred,score``).
"""

from __future__ import annotations

import csv
from typing import Sequence

from ..utils.result import AlignResult


def _fmt_score(score: float) -> str:
    # The reference streams a float through operator<< — integral scores
    # print without a decimal point.
    return str(int(score)) if float(score) == int(score) else repr(score)


def write_align_output(
    out_path,
    gt_rows: Sequence[dict],
    results: Sequence[AlignResult],
    fieldnames: Sequence[str] = ("index", "QNAME", "SEQ", "POS"),
):
    """Ground-truth rows + results -> align_output.csv."""
    if len(gt_rows) != len(results):
        raise ValueError("row/result count mismatch")
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(list(fieldnames) + ["pos_pred", "score"])
        for row, res in zip(gt_rows, results):
            w.writerow(
                [row[k] for k in fieldnames] + [res.pos, _fmt_score(res.score)]
            )


def append_timing_row(path, header: Sequence[str], row: Sequence):
    """Append one CSV row, writing the header if the file is new (the
    reference's CSVWriter pattern, src/omp_sw_solve_small.cpp:20-62)."""
    import os

    new = not os.path.exists(path) or os.path.getsize(path) == 0
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(header)
        w.writerow(row)
