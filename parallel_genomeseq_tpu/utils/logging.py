"""Verbosity-gated logging (the reference's VERBOSE compile flag, runtime).

The reference gates matrix dumps and extra prints behind a compile-time
VERBOSE define (CMakeLists.txt:32-34). Here it's the PGS_VERBOSE env var /
``set_verbose`` at runtime — same surface, no rebuild.
"""

from __future__ import annotations

import os
import sys

_verbose = os.environ.get("PGS_VERBOSE", "0") not in ("", "0", "false")


def set_verbose(on: bool) -> None:
    global _verbose
    _verbose = on


def verbose() -> bool:
    return _verbose


def vlog(*args) -> None:
    if _verbose:
        print("[pgs]", *args, file=sys.stderr, flush=True)
