"""Device mesh + sharding helpers.

The reference has **no** distributed code — its only device logic is a global
cuda-if-available pick (train_model.py:54-57) and serial ray chunking
(models.py:53).  This module is the TPU-native scaling layer (SURVEY.md §2
parallelism inventory, §5):

* **data parallelism over rays** — the ray axis of a train batch is sharded
  across a 1-D ``("data",)`` mesh; parameters are replicated.  XLA inserts the
  gradient ``psum`` over ICI automatically from the sharding annotations
  (the scaling-book recipe: annotate, don't hand-write collectives);
* **render-tile parallelism** — whole-image eval/video rendering shards pixel
  rows the same way, with the gather back to host serving as the only
  all-gather;
* the per-ray sample axis stays *inside* a device (fused compute), so no
  sequence-style parallelism is needed — that axis is bounded (≤ ~129) and
  rides VMEM.

On multi-host pods each host feeds its local shard via
``jax.make_array_from_process_local_data``; collectives then ride ICI within
a slice and DCN across slices without further code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddnerf_tpu.config import Config


def make_mesh(num_devices: int = 0, axis_name: str = "data", devices=None) -> Mesh:
    """1-D mesh over ``num_devices`` (0 = all visible devices)."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def mesh_from_config(cfg: Config) -> Mesh:
    return make_mesh(cfg.parallel.num_devices, cfg.parallel.data_axis)


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (rays / pixels) over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put each array of a ray batch with dim-0 sharded."""
    sh = ray_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def make_sharded_train_step(cfg: Config, pipeline, mesh: Mesh):
    """jit the train step with explicit shardings: state replicated, batch
    ray-sharded.  The gradient all-reduce over the data axis is inserted by
    XLA from these annotations (ICI-resident on a real slice)."""
    from ddnerf_tpu.train.step import make_train_step

    step_fn = make_train_step(cfg, pipeline)
    repl = replicated(mesh)
    rays = ray_sharding(mesh)
    batch_sharding = {k: rays for k in ("origins", "directions", "radii", "rgb")}

    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sharding),
        out_shardings=(repl, repl),
        donate_argnums=0 if cfg.parallel.donate_state else (),
    )


def make_sharded_store_train_step(cfg: Config, pipeline, mesh: Mesh):
    """Device-store variant: the ray store is replicated (it is read-only and
    gathered randomly; replication avoids an all-gather per step), state
    replicated, sampling + compute sharded by XLA's SPMD partitioner."""
    from ddnerf_tpu.train.step import make_train_step_from_store

    step_fn = make_train_step_from_store(cfg, pipeline)
    repl = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=0 if cfg.parallel.donate_state else (),
    )


def make_sharded_eval_step(cfg: Config, pipeline, mesh: Mesh,
                           mode: str = "validation"):
    """Whole-image render step: pixels sharded over the mesh (render-tile
    parallelism, BASELINE.json config 5)."""
    from ddnerf_tpu.train.step import make_eval_step

    eval_fn = make_eval_step(cfg, pipeline, mode=mode)
    repl = replicated(mesh)
    rays = ray_sharding(mesh)
    batch_sharding = {k: rays for k in ("origins", "directions", "radii")}
    # Output shardings are propagated by the SPMD partitioner: per-ray arrays
    # stay ray-sharded, scalar losses resolve to replicated.
    return jax.jit(
        eval_fn,
        in_shardings=(repl, batch_sharding, repl, repl),
    )
