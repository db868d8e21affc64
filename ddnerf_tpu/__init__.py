"""ddnerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) reimplementation of
DDNeRF and its bundled mip-NeRF (reference: dadonda89/DDNeRF).

Layers (SURVEY.md §7):

* :mod:`ddnerf_tpu.config` — frozen dataclass config, reference-YAML ingest
* :mod:`ddnerf_tpu.core` — pure jnp math: frustum Gaussians, IPE, samplers,
  volume rendering, depth-distribution loss, schedules
* :mod:`ddnerf_tpu.models` — Flax MLPs and the coarse→fine pipeline
* :mod:`ddnerf_tpu.data` — host-side loaders (blender / LLFF-COLMAP / synthetic)
* :mod:`ddnerf_tpu.train` — jitted+sharded train step, orbax checkpoints
* :mod:`ddnerf_tpu.parallel` — device mesh + sharding helpers
* :mod:`ddnerf_tpu.render` / :mod:`ddnerf_tpu.eval` — tiled rendering, metrics
* :mod:`ddnerf_tpu.kernels` — Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"

import os as _os

# Honor an explicitly-set JAX_PLATFORMS even when the hosting environment's
# sitecustomize has already force-selected a platform via
# ``jax.config.update`` (which outranks the env var jax itself read at
# import).  Without this, ``JAX_PLATFORMS=cpu python -m ddnerf_tpu.cli...``
# silently runs on the remote chip.  The ambient default ("axon") is left
# alone — only a user-divergent value is re-asserted, and only before any
# backend has initialized.
_env_platforms = _os.environ.get("JAX_PLATFORMS", "")
if _env_platforms and _env_platforms != "axon":
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # backend already up: the caller's choice stands
        pass

from ddnerf_tpu.config import Config, load_config  # noqa: F401
