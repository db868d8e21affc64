"""Persistent XLA compilation cache.

First compiles cost tens of seconds (a 400² eval image paid ~2 min for its
lax.map program); the persistent cache makes every later process start warm.
Enabled by the CLI entry points; set ``DDNERF_CACHE_DIR=''`` to disable or a
path to relocate (default ``~/.cache/ddnerf_tpu/xla``).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    cache_dir = os.environ.get(
        "DDNERF_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ddnerf_tpu", "xla"),
    )
    if not cache_dir:
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a failure
