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
from ddnerf_tpu.utils.compile import step_compiler_options


def make_mesh(num_devices: int = 0, axis_name: str = "data", devices=None) -> Mesh:
    """1-D mesh over ``num_devices`` (0 = all visible devices)."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def mesh_from_config(cfg: Config) -> Mesh:
    return make_mesh(cfg.parallel.num_devices, cfg.parallel.data_axis)


def maybe_mesh(cfg: Config):
    """The mesh every driver (train / eval / video) should run on: all
    visible devices unless the config pins ``parallel.num_devices: 1``.
    Returns None on a single device (plain jit paths)."""
    if jax.device_count() > 1 and cfg.parallel.num_devices != 1:
        return mesh_from_config(cfg)
    return None


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (rays / pixels) over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put each array of a ray batch with dim-0 sharded."""
    sh = ray_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def _effective_batch(num_rays: int, n_dev: int) -> int:
    """The single source of the sharded sampler's rounding rule: the
    per-device draw is ceil-rounded, so the effective batch is
    ``ceil(num_rays / D) * D``."""
    return -(-num_rays // n_dev) * n_dev


def effective_train_rays(cfg: Config, mesh) -> int:
    """Rays actually drawn per step by the sharded store sampler on
    ``mesh``.  Throughput and metric accounting must use this, not the
    configured value (round-3 advisor finding)."""
    if mesh is None:
        return cfg.nerf.train.num_random_rays
    return _effective_batch(cfg.nerf.train.num_random_rays,
                            int(mesh.devices.size))


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
        compiler_options=step_compiler_options(cfg),
    )


def make_sharded_store_sampler(mesh: Mesh, num_rays: int,
                               single_image_mode: bool):
    """Per-shard in-step batch sampler over a pixel-axis-sharded ray store.

    Returns ``sample(store, rng) -> rows`` where ``store`` is the global
    ``[n_img, n_pix, 10]`` array sharded ``P(None, data)`` and ``rows`` is a
    ``[num_rays, 10]`` ray-sharded batch: each device draws its
    ``num_rays/D`` rows from its resident pixel block (no collective).

    In ``single_image_mode`` the image key is shared (NOT folded with the
    device index) so every device samples the same image — the reference's
    all-rays-of-one-image semantics (dataset.py:50-55) survive sharding.

    When ``num_rays`` does not divide the mesh width, the per-device draw is
    rounded UP, so the effective batch is ``ceil(num_rays/D)*D`` rays.  Every
    drawn ray is still an i.i.d. uniform sample (no duplication bias) — the
    batch is just marginally larger than requested, which any ``num_rays`` /
    pod-width combination tolerates.  The effective size is exposed as
    ``sampler.effective_num_rays``.
    """
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    per_dev = _effective_batch(num_rays, n_dev) // n_dev
    if per_dev * n_dev != num_rays:
        import warnings

        warnings.warn(
            f"num_random_rays={num_rays} does not divide the {n_dev}-device "
            f"mesh; the effective batch is {per_dev * n_dev} rays per step "
            "(loss means, gradient scale, and rays/s accounting use the "
            "effective size — see sampler.effective_num_rays)",
            stacklevel=2,
        )

    def sample_local(store_shard, rng):
        # store_shard: this device's [n_img, n_pix/D, 10] block.
        r_img, r_idx = jax.random.split(rng)
        r_idx = jax.random.fold_in(r_idx, jax.lax.axis_index(axis))
        n_img, n_pix_local, _ = store_shard.shape
        if single_image_mode:
            img = jax.random.randint(r_img, (), 0, n_img)
            idx = jax.random.randint(r_idx, (per_dev,), 0, n_pix_local)
            rows = store_shard[img, idx]
        else:
            flat = jax.random.randint(r_idx, (per_dev,), 0, n_img * n_pix_local)
            rows = store_shard.reshape(n_img * n_pix_local, -1)[flat]
        return rows

    sampler = jax.shard_map(
        sample_local,
        mesh=mesh,
        in_specs=(P(None, axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    sampler.effective_num_rays = per_dev * n_dev
    return sampler


def make_sharded_store_train_step(cfg: Config, pipeline, mesh: Mesh,
                                  stack_steps: int = 0):
    """Train step over a **pixel-axis-sharded** ray store.

    Each device holds a 1/D pixel-slice of every image
    (:func:`ddnerf_tpu.parallel.distributed.store_sharding`) and, inside the
    jitted step, samples its 1/D of the ray batch from that resident shard
    under ``shard_map`` — so per-chip HBM for the store is ``total/D`` and
    **no collective touches ray data**.  The only cross-device traffic per
    step is the gradient ``psum`` XLA inserts from the replicated-params /
    ray-sharded-batch layout (ICI-resident on a real slice).

    Sampling semantics vs the reference (dataset.py:50-59):

    * normal mode — each device draws uniformly from its pixel columns;
      the union is stratified-uniform over pixel-column blocks, statistically
      equivalent to global uniform sampling;
    * ``single_image_mode`` — the image index comes from a key that is NOT
      folded with the device index, so all devices pick the SAME image and
      the batch is all-rays-of-one-image exactly like the reference.
    """
    from ddnerf_tpu.parallel.distributed import store_sharding
    from ddnerf_tpu.train.step import make_train_step

    inner = make_train_step(cfg, pipeline)
    sample_sharded = make_sharded_store_sampler(
        mesh, cfg.nerf.train.num_random_rays, cfg.dataset.single_image_mode
    )

    def step(state, store):
        rng = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), 0x5A17
        )
        rows = sample_sharded(store, rng)
        batch = {
            "origins": rows[:, 0:3],
            "directions": rows[:, 3:6],
            "radii": rows[:, 6:7],
            "rgb": rows[:, 7:10],
        }
        return inner(state, batch)

    if stack_steps:
        # ``stack_steps`` steps per dispatch with per-step scalars stacked
        # [stack_steps] on device (device-buffered observability — see
        # train.step.make_stacked_train_step_from_store).
        single = step

        def step(state, store):  # noqa: F811 — scan wrapper over `single`
            def body(carry, _):
                return single(carry, store)

            return jax.lax.scan(body, state, None, length=stack_steps)

    repl = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, store_sharding(mesh)),
        out_shardings=(repl, repl),
        donate_argnums=0 if cfg.parallel.donate_state else (),
        compiler_options=step_compiler_options(cfg),
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
    # Outputs are REPLICATED (an XLA all-gather over the mesh): the host
    # fetches whole maps, and on a multi-process pod every host can read
    # them locally — ray-sharded outputs would span non-addressable devices
    # and be unfetchable off-process.
    return jax.jit(
        eval_fn,
        in_shardings=(repl, batch_sharding, repl, repl),
        out_shardings=repl,
    )
