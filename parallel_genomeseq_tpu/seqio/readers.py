"""Sequence file ingestion: FASTA, FASTQ, SAM, ground-truth CSV.

Python equivalents of the reference's py/reader.py parsers and the C++
drivers' inline readers, with the same conventions:

- FASTA: skip the first (header) line, concatenate the rest
  (py/reader.py:110-116, src/sw_solve_small.cpp:25-30).
- FASTQ: 4-line records; record[1] is the read (py/reader.py:100-107).
- SAM: tab-separated fields QNAME..QUAL, '@'-prefixed meta lines stripped
  (py/reader.py:27-43).
- ground-truth CSV: columns index,QNAME,SEQ,POS (py/reader.py:161-173).
"""

from __future__ import annotations

import csv
import dataclasses
from typing import Dict, List

SAM_FIELDS = (
    "QNAME", "FLAG", "RNAME", "POS", "MAPQ", "CIGAR",
    "RNEXT", "PNEXT", "TLEN", "SEQ", "QUAL",
)


def read_fasta(path) -> str:
    """Single-record FASTA -> one concatenated sequence string (all
    non-header lines joined, matching the reference drivers)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith(">"):
                out.append(line)
    return "".join(out)


def read_fasta_records(path) -> List[tuple]:
    """Multi-record FASTA -> list of (header, sequence)."""
    records = []
    header, seq = None, []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if header is not None:
                    records.append((header, "".join(seq)))
                header, seq = line[1:], []
            elif line:
                seq.append(line)
    if header is not None:
        records.append((header, "".join(seq)))
    return records


def read_fastq(path) -> List[Dict[str, str]]:
    """FASTQ -> list of {'name', 'seq', 'qual'} dicts."""
    out = []
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    lines = [l for l in lines if l != ""]
    for k in range(0, len(lines) - 3, 4):
        out.append(
            {"name": lines[k][1:], "seq": lines[k + 1], "qual": lines[k + 3]}
        )
    return out


@dataclasses.dataclass
class SamRecord:
    QNAME: str
    FLAG: str
    RNAME: str
    POS: int
    MAPQ: str
    CIGAR: str
    RNEXT: str
    PNEXT: str
    TLEN: str
    SEQ: str
    QUAL: str


def read_sam(path) -> List[SamRecord]:
    """SAM -> records (meta '@' lines skipped)."""
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip() or line.startswith("@"):
                continue
            fields = line.rstrip("\n").split("\t")
            vals = dict(zip(SAM_FIELDS, fields))
            out.append(
                SamRecord(
                    QNAME=vals.get("QNAME", ""), FLAG=vals.get("FLAG", ""),
                    RNAME=vals.get("RNAME", ""), POS=int(vals.get("POS", 0)),
                    MAPQ=vals.get("MAPQ", ""), CIGAR=vals.get("CIGAR", ""),
                    RNEXT=vals.get("RNEXT", ""), PNEXT=vals.get("PNEXT", ""),
                    TLEN=vals.get("TLEN", ""), SEQ=vals.get("SEQ", ""),
                    QUAL=vals.get("QUAL", ""),
                )
            )
    return out


def read_ground_truth(path) -> List[Dict[str, str]]:
    """index,QNAME,SEQ,POS rows as dicts (POS kept as string for round-trip)."""
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def gen_ground_truth(sam_path, out_path) -> int:
    """SAM -> ground-truth CSV (the reference's ``gen_input_125``,
    py/reader.py:161-173). Returns row count."""
    records = read_sam(sam_path)
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "QNAME", "SEQ", "POS"])
        for k, r in enumerate(records):
            w.writerow([k, r.QNAME, r.SEQ, r.POS])
    return len(records)


def fastq_to_lines(fq_path, out_path) -> int:
    """Strip FASTQ to bare read lines for fixed-record distributed IO
    (the reference's ``mpi_prepare``, py/reader.py:45-50)."""
    reads = read_fastq(fq_path)
    with open(out_path, "w") as f:
        for r in reads:
            f.write(r["seq"] + "\n")
    return len(reads)
