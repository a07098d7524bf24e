"""Numpy-facing wrappers over the native IO library, with Python fallbacks.

Each function uses the C++ fast path when the native library builds on this
machine and transparently falls back to the pure-Python readers otherwise,
so the framework works on compiler-less hosts.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import lib as _native_lib
from . import readers as _py


def read_fasta(path) -> str:
    L = _native_lib()
    if L is None:
        return _py.read_fasta(path)
    cap = 1 << 20
    while True:
        buf = ctypes.create_string_buffer(cap)
        n = L.pgs_read_fasta(str(path).encode(), buf, cap)
        if n == -1:
            raise FileNotFoundError(path)
        if n == -2 or n > cap:
            cap *= 8
            continue
        return buf.raw[:n].decode("ascii")


def read_records(path, record_size: int, start_rec: int, n_rec: int) -> np.ndarray:
    """(n, record_size-1) uint8 payloads of fixed-size records — the
    MPI_File_read_at_all analog for per-process read slicing."""
    L = _native_lib()
    payload = record_size - 1
    if L is None:
        with open(path, "rb") as f:
            f.seek(start_rec * record_size)
            data = f.read(n_rec * record_size)
        out = []
        for k in range(n_rec):
            rec = data[k * record_size : (k + 1) * record_size]
            if len(rec) < payload:
                break
            out.append(np.frombuffer(rec[:payload], np.uint8))
        return np.array(out, np.uint8) if out else np.zeros((0, payload), np.uint8)
    out = np.zeros((n_rec, payload), np.uint8)
    got = L.pgs_read_records(
        str(path).encode(), record_size, start_rec, n_rec,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if got < 0:
        raise FileNotFoundError(path)
    return out[:got]


def count_records(path, record_size: int) -> int:
    L = _native_lib()
    if L is None:
        import os

        return (os.path.getsize(path) + record_size - 1) // record_size
    return int(L.pgs_count_records(str(path).encode(), record_size))


def parse_gt_csv(path, seq_cap: int = 512, max_rows: int = 1 << 20):
    """(seq_matrix (n, seq_cap) uint8 NUL-padded, lengths (n,), pos (n,))."""
    L = _native_lib()
    if L is None:
        rows = _py.read_ground_truth(path)
        n = len(rows)
        seq = np.zeros((n, seq_cap), np.uint8)
        lens = np.zeros(n, np.int32)
        pos = np.zeros(n, np.int64)
        for k, r in enumerate(rows):
            b = r["SEQ"].encode()
            seq[k, : len(b)] = np.frombuffer(b, np.uint8)
            lens[k] = len(b)
            pos[k] = int(r["POS"])
        return seq, lens, pos
    for cap in (seq_cap, seq_cap * 8, seq_cap * 64):
        seq = np.zeros((max_rows, cap), np.uint8)
        lens = np.zeros(max_rows, np.int32)
        pos = np.zeros(max_rows, np.int64)
        n = L.pgs_parse_gt_csv(
            str(path).encode(), cap, max_rows,
            seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if n == -2:
            continue
        if n < 0:
            raise IOError(f"pgs_parse_gt_csv failed ({n}) for {path}")
        return seq[:n], lens[:n], pos[:n]
    raise IOError("sequence longer than maximum supported cap")


def write_align_output(in_csv, out_csv, pos: np.ndarray, score: np.ndarray) -> int:
    L = _native_lib()
    if L is None:
        rows = _py.read_ground_truth(in_csv)
        from ..utils.result import AlignResult
        from .writers import write_align_output as pyw

        results = [
            AlignResult(score=float(s), pos=int(p)) for p, s in zip(pos, score)
        ]
        pyw(out_csv, rows, results)
        return len(rows)
    pos = np.ascontiguousarray(pos, np.int64)
    score = np.ascontiguousarray(score, np.float64)
    n = L.pgs_write_align_output(
        str(in_csv).encode(), str(out_csv).encode(),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        score.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pos),
    )
    if n < 0:
        raise IOError(f"pgs_write_align_output failed for {out_csv}")
    return int(n)
