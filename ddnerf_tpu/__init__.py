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

# NOTE: package import is side-effect-free.  The JAX_PLATFORMS re-assert
# that used to live here (overriding a sitecustomize's forced platform)
# moved to ddnerf_tpu.utils.platform.honor_env_platforms(), called by the
# CLI entry points and benchmark drivers where the problem actually occurs
# (round-3 advisor finding: an import-time jax.config.update made every
# consumer import-order sensitive and hardcoded the ambient platform name).

from ddnerf_tpu.config import Config, load_config  # noqa: F401
