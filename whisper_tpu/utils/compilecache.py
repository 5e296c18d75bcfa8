"""Persistent XLA compilation cache for fast process startup.

Remote compiles through the axon tunnel cost 1-5 minutes per program
(CLAUDE.md), and every fresh process (bench.py, the CLI, the servers)
used to pay them again.  JAX's persistent compilation cache serializes
compiled executables to disk keyed by HLO hash, so a second process
reuses them instantly (when the backend supports executable
serialization; if it does not, JAX logs a warning and compiles as
before — enabling the cache is never worse).

Env knobs:
  WHISPER_TPU_CACHE_DIR=<dir>  cache location (default
                               ~/.cache/whisper_tpu/xla)
  WHISPER_TPU_CACHE_DIR=0      disable

No reference counterpart (ORT sessions build in milliseconds; XLA's
compile model is what makes this subsystem necessary).
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the cache dir, or None when disabled/unavailable.  Call
    BEFORE the first jit compilation; safe to call more than once.
    """
    env = os.environ.get("WHISPER_TPU_CACHE_DIR")
    if env == "0":
        return None
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "whisper_tpu", "xla")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Remote compiles are minutes; cache anything that took >=1 s.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:
        return None
