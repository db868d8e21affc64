"""Platform-selection hygiene for hosted environments.

Some deployments force-select a JAX platform from a ``sitecustomize`` via
``jax.config.update("jax_platforms", ...)``, which outranks the
``JAX_PLATFORMS`` environment variable jax itself reads at import.  Without
intervention, ``JAX_PLATFORMS=cpu python -m ddnerf_tpu.cli.train ...``
silently runs on the remote chip.

:func:`honor_env_platforms` re-asserts an explicitly-set ``JAX_PLATFORMS``
over any such ambient override.  It is called by the CLI entry points and
the benchmark drivers — NOT at package import (an import-time
``jax.config.update`` side effect made every consumer of the package
import-order sensitive; round-3 advisor finding).
"""

from __future__ import annotations

import os


def honor_env_platforms() -> None:
    """If ``JAX_PLATFORMS`` is set and differs from jax's current platform
    selection, re-assert the environment's value.  No hardcoded ambient
    platform names: the comparison is against whatever the hosting
    environment actually configured.  Must run before any backend
    initializes; once one is up, the existing choice stands."""
    env = os.environ.get("JAX_PLATFORMS", "")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass  # backend already up: the caller's choice stands
