"""Persistent XLA compilation cache.

Compiles of the full wavefront integrator through the axon TPU tunnel take
minutes; the persistent cache turns every later process start into a ~10 s
load.  Called by the CLI / bench / driver entry points.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "GPUSPECTRAL_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax or read-only fs: compile cache is best-effort
