"""Position-parity evaluation: the reference's de-facto integration test.

Port of ``py/eval.py --option sw_solve_small`` (py/eval.py:102-121): join the
alignment output with ground truth, count rows where pos_pred != POS. Nonzero
deltas can be legitimate (greedy traceback + non-unique optima — the
reference prints the same caveat).
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from typing import List


@dataclass
class ParityReport:
    total: int
    diffs: int
    diff_rows: List[dict]

    @property
    def ok(self) -> bool:
        return self.diffs == 0

    def summary(self) -> str:
        if self.diffs == 0:
            return "No diffs"
        return (
            f"{self.diffs}/{self.total} alignments different from ground truth\n"
            "May be caused by cost function. There is often no unique correct solution."
        )


def check_parity(align_output_path) -> ParityReport:
    with open(align_output_path, newline="") as f:
        rows = list(csv.DictReader(f, skipinitialspace=True))
    diff_rows = [
        r for r in rows if int(r["pos_pred"]) != int(r["POS"])
    ]
    return ParityReport(total=len(rows), diffs=len(diff_rows), diff_rows=diff_rows)
