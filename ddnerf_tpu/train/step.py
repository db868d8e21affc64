"""The jitted train / eval step.

Replaces the hot loop body of ``/root/reference/train_model.py:132-177``:
schedule evaluation, forward (coarse→fine), loss assembly
(Σ coefⱼ·MSE + dp_coef·dp_loss), backward, and the optimizer update — all one
XLA program.  The serial ray-chunk loop of the reference (models.py:53) does
not exist: memory is managed by batch size and sharding, not host loops.

Two batch sources:

* :func:`make_train_step` — batch passed in (host sampling or an external
  loader);
* :func:`make_train_step_from_store` — rays sampled *on device* from a
  resident ray store, eliminating the reference's per-iteration
  host→device transfer (dataset.py:50-59).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ddnerf_tpu.config import Config
from ddnerf_tpu.core import schedules
from ddnerf_tpu.core.math import mse2psnr
from ddnerf_tpu.data.datasets import sample_rays_on_device
from ddnerf_tpu.models.nerf import NerfPipeline, RayBatch, ScheduleValues
from ddnerf_tpu.train.state import TrainState, make_optimizer


def schedule_values(cfg: Config, step) -> ScheduleValues:
    return ScheduleValues(
        gaussian_smooth_factor=schedules.gaussian_smooth_factor(step, cfg),
        pdf_padding=schedules.pdf_padding(step, cfg),
    )


def compute_loss(
    cfg: Config,
    pipeline: NerfPipeline,
    params,
    rays: RayBatch,
    target,
    rng,
    sched: ScheduleValues,
    mode: str = "train",
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss assembly mirroring train_model.py:156-167."""
    out = pipeline.render_rays(params, rays, rng, sched, mode)

    loss_coarse = jnp.mean((out[0]["rgb"] - target) ** 2)
    loss_fine = jnp.mean((out[1]["rgb"] - target) ** 2)
    coefs = cfg.train_params.loss_coeficients
    loss = coefs[0] * loss_coarse + coefs[1] * loss_fine

    # PSNR is intentionally NOT computed here: under microbatch accumulation
    # metrics are averaged across chunks, and mean-of-PSNR != PSNR-of-mean-MSE.
    # The train step derives psnr_{coarse,fine} once from the aggregated MSEs.
    metrics = {
        "loss_coarse": loss_coarse,
        "loss_fine": loss_fine,
    }
    if cfg.is_ddnerf():
        dp_loss = out[1]["dp_loss"]
        loss = loss + cfg.train_params.dp_coeficient * dp_loss
        metrics["dp_loss"] = dp_loss
        metrics["mus_loss"] = out[0]["mus_loss"]
        metrics["sig_loss"] = out[0]["sig_loss"]
        metrics["mus_reg"] = out[0]["mus_reg"]
        metrics["sig_reg"] = out[0]["sig_reg"]
    metrics["loss"] = loss
    return loss, metrics


def _scan_accumulate(grad_of, rng, chunked, k):
    """Sum (grads, metrics) over k microbatches: the first runs inline to
    seed the carry structure, the remaining k-1 run under ``lax.scan``."""
    first = {name: v[0] for name, v in chunked.items()}
    rest = {name: v[1:] for name, v in chunked.items()}
    init = grad_of(first, jax.random.fold_in(rng, 0))

    def body(carry, xs):
        idx, part = xs
        g, m = grad_of(part, jax.random.fold_in(rng, idx))
        return (
            jax.tree_util.tree_map(jnp.add, carry[0], g),
            jax.tree_util.tree_map(jnp.add, carry[1], m),
        ), None

    (g_sum, m_sum), _ = jax.lax.scan(body, init, (jnp.arange(1, k), rest))
    return g_sum, m_sum


def make_train_step(cfg: Config, pipeline: NerfPipeline):
    """Returns ``train_step(state, batch) -> (state, metrics)`` ready for
    ``jax.jit`` (donate state for in-place HBM updates)."""
    tx = make_optimizer(cfg)
    near = cfg.dataset.near
    far = cfg.dataset.far

    mb = cfg.parallel.microbatch_rays

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        step = state.step
        sched = schedule_values(cfg, step)
        rng = jax.random.fold_in(state.rng, step)

        def grad_of(batch_part, part_rng):
            rays = RayBatch.create(
                batch_part["origins"], batch_part["directions"],
                batch_part["radii"], near, far,
            )

            def loss_fn(params):
                return compute_loss(
                    cfg, pipeline, params, rays, batch_part["rgb"],
                    part_rng, sched, "train",
                )

            return jax.grad(loss_fn, has_aux=True)(state.params)

        num_rays = batch["origins"].shape[0]
        if mb and num_rays > mb and num_rays % mb == 0:
            # Gradient accumulation over equal microbatches: mean of chunk
            # means == global mean, so loss/grads match the monolithic step
            # up to summation order.  Keeps every backward matmul at the
            # row count XLA tiles well (parallel.microbatch_rays).
            k = num_rays // mb
            chunked = {
                name: v.reshape(k, mb, *v.shape[1:]) for name, v in batch.items()
            }

            g_sum, m_sum = _scan_accumulate(grad_of, rng, chunked, k)
            grads = jax.tree_util.tree_map(lambda x: x / k, g_sum)
            metrics = jax.tree_util.tree_map(lambda x: x / k, m_sum)
        else:
            grads, metrics = grad_of(batch, rng)
        # PSNR from the aggregated MSEs (exact for the whole batch even when
        # microbatched — matches the monolithic step's reporting).
        metrics["psnr_coarse"] = mse2psnr(metrics["loss_coarse"])
        metrics["psnr_fine"] = mse2psnr(metrics["loss_fine"])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["lr"] = schedules.make_lr_schedule(cfg)(step)
        new_state = state.replace(
            step=step + 1, params=params, opt_state=opt_state
        )
        return new_state, metrics

    return train_step


def make_train_step_from_store(cfg: Config, pipeline: NerfPipeline):
    """Train step that samples its ray batch from a device-resident store
    ([n_img, n_pix, 10]) inside the jitted program — zero per-step host
    traffic (TPU-native replacement for dataset.py:50-59)."""
    inner = make_train_step(cfg, pipeline)
    num_rays = cfg.nerf.train.num_random_rays
    single = cfg.dataset.single_image_mode

    def train_step(state: TrainState, store: jax.Array):
        r_sample = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), 0x5A17
        )
        ro, rd, radii, rgb = sample_rays_on_device(store, r_sample, num_rays, single)
        batch = {"origins": ro, "directions": rd, "radii": radii, "rgb": rgb}
        return inner(state, batch)

    return train_step


def make_scan_train_step(cfg: Config, pipeline: NerfPipeline, num_steps: int):
    """K train steps chained inside ONE jitted program via ``lax.scan``.

    Each dispatch costs a host->device RPC (measured ~4 ms through the
    relayed backend — comparable to the ~2.6 ms device time of a whole
    2048-ray step).  Scanning K steps per dispatch amortizes that to nothing:
    ``scan_step(state, store) -> (state, metrics_of_last_step)``.

    The step body is identical to :func:`make_train_step_from_store`
    (device-resident sampling); trajectories match K individual calls up to
    fusion-order float rounding (~1e-8).
    """
    inner = make_train_step_from_store(cfg, pipeline)

    def scan_step(state: TrainState, store: jax.Array):
        def body(carry, _):
            new_state, metrics = inner(carry, store)
            return new_state, None

        state, _ = jax.lax.scan(body, state, None, length=num_steps - 1)
        # Final step outside the scan so its metrics are returned without
        # stacking K copies.
        return inner(state, store)

    return scan_step


def make_stacked_train_step_from_store(cfg: Config, pipeline: NerfPipeline,
                                       length: int):
    """``length`` train steps in ONE jitted program, returning the per-step
    scalar metrics STACKED ``[length]`` (device-buffered observability).

    This is how per-iteration train curves (the reference writes TB scalars
    every iter, documentation.py:11-26) stay near-free on TPU: the scalars
    accumulate in a scan carry on device and are fetched once per block
    instead of once per step.  ``stacked(state, store) -> (state, metrics)``.
    """
    inner = make_train_step_from_store(cfg, pipeline)

    def stacked(state: TrainState, store: jax.Array):
        def body(carry, _):
            new_state, metrics = inner(carry, store)
            return new_state, metrics

        return jax.lax.scan(body, state, None, length=length)

    return stacked


def make_eval_step(cfg: Config, pipeline: NerfPipeline, mode: str = "validation"):
    """Returns ``eval_step(params, batch, rng, sched) -> outputs`` for a flat
    ray batch (no grads).  ``mode="validation"`` includes the dp loss (the
    reference computes it for validation metrics, train_model.py:217-220);
    ``mode="render"`` skips it for pure image synthesis.  Rendering full
    images tiles over this via :mod:`ddnerf_tpu.render`."""
    near = cfg.dataset.near
    far = cfg.dataset.far

    def eval_step(params, batch, rng, sched: ScheduleValues):
        rays = RayBatch.create(
            batch["origins"], batch["directions"], batch["radii"], near, far
        )
        return pipeline.render_rays(params, rays, rng, sched, mode)

    return eval_step
