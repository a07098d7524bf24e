"""JAX platform setup: compilation cache and backend helpers.

The single-chip TPU in this environment is reached through an experimental
remote tunnel whose compile service is occasionally flaky (hangs, transient
errors, and in rare cases a miscompiled executable). Two defenses:

- a persistent compilation cache so each program shape compiles once per
  machine rather than once per process;
- engines run a small golden self-check after first compile (see
  ops/wavefront_pallas.PallasEngine.self_check) so a bad executable fails
  loudly instead of silently corrupting alignments.
"""

from __future__ import annotations

import os
from pathlib import Path

_CACHE_SET = False


def setup_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent JAX compilation cache (idempotent)."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "PGS_JAX_CACHE", str(Path.home() / ".cache" / "pgs_jax_cache")
        )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_SET = True
    except Exception:
        pass  # cache is an optimization; never fail setup


def is_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"
