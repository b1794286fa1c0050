"""JAX environment helpers.

This box compiles XLA programs on a single host core, so every stray
eager dispatch costs ~0.5s of compile. Two rules keep the framework
fast here and on real TPU hosts alike:

  1. jit whole programs (init included) — one compile each;
  2. enable the persistent compilation cache so re-runs and tests pay
     compile cost once per machine, not once per process.
"""
from __future__ import annotations

import os


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SLT_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_comp"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags — cache is best-effort
        pass


def force_cpu() -> None:
    """Force the CPU platform. The env var alone is NOT enough here:
    the host's sitecustomize registers the axon TPU plugin and calls
    `jax.config.update("jax_platforms", "axon,cpu")` at interpreter
    start, overriding JAX_PLATFORMS — so this must config-update too
    (possible any time before first backend init)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
