"""Persistent XLA compilation cache.

First compiles through the tunneled TPU compile service take 60-300 s
per new shape; a persistent on-disk cache makes stage graphs compile
once per (shape, k) ever.  Enabled by the CLI and bench drivers.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    """Idempotently turn on the JAX persistent compilation cache.

    TPU backend only: XLA:CPU persists AOT machine code keyed without
    the host's CPU feature set, so an entry written on one machine can
    SIGSEGV when deserialized on another (observed with
    +prefer-no-scatter entries). CPU compiles are fast; the cache only
    pays for itself against the 60-300 s tunneled TPU compile service.
    """
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return ""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs: cache simply stays off
    return path
