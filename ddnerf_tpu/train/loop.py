"""The training loop driver.

Rewrite of ``/root/reference/train_model.py:19-264``: config load + snapshot,
seeding, dataset/model/optimizer build, optional checkpoint resume, the train
loop with per-step metrics, periodic whole-image validation (incl. NDC depth
un-warping and depth-analysis plots), and rolling checkpoints.

TPU-native differences:

* the ray store lives on device; sampling happens inside the jitted step
  (no per-iter host transfer, cf. dataset.py:50-59);
* annealing = pure schedules of the step counter (no config mutation);
* with >1 device, the step is pjit-sharded over the ray axis.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.core.rays import switch_t_ndc_to_regular
from ddnerf_tpu.data.assembly import get_datasets
from ddnerf_tpu.eval.depth_analysis import run_depth_analysis
from ddnerf_tpu.models.nerf import NerfPipeline
from ddnerf_tpu.render.renderer import DEFAULT_KEYS, ImageRenderer
from ddnerf_tpu.train import checkpoint as ckpt
from ddnerf_tpu.train.state import create_train_state
from ddnerf_tpu.train.step import make_train_step, make_train_step_from_store, schedule_values
from ddnerf_tpu.viz.documentation import Documenter


def train(cfg: Config, load_checkpoint: str = "", max_iters: Optional[int] = None,
          use_tensorboard: bool = True, verbose: bool = True,
          profile_steps: int = 0):
    """Run training.  Returns (state, logdir).

    ``profile_steps`` > 0 captures a jax.profiler trace of that many steady-
    state steps under ``logdir`` (TensorBoard-viewable; SURVEY.md §5 tracing).
    """
    logdir = os.path.join(cfg.experiment.logdir, cfg.experiment.id)
    os.makedirs(logdir, exist_ok=True)
    doc = Documenter(logdir, use_tensorboard=use_tensorboard)

    # Dataset build may rescale near/far (pose normalization).
    train_ds, val_ds, cfg = get_datasets(cfg)
    ckpt.save_config_snapshot(cfg, logdir)

    rng = jax.random.PRNGKey(cfg.experiment.randomseed)
    pipeline = NerfPipeline(cfg)
    state = create_train_state(cfg, pipeline, rng)

    mesh = None
    if jax.device_count() > 1 and cfg.parallel.num_devices != 1:
        from ddnerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.parallel.num_devices)

    manager = ckpt.CheckpointManager(
        logdir, max_to_keep=cfg.experiment.max_keep_ckpts
    )
    if load_checkpoint:
        other = ckpt.CheckpointManager(load_checkpoint) \
            if os.path.isdir(os.path.join(load_checkpoint, ckpt.CKPT_DIR)) else manager
        state = other.restore(state)
        # Round-robin parity on resume (train_model.py:81).
        val_ds.current_idx = (
            int(state.step) // cfg.experiment.validate_every
        ) % len(val_ds)
    elif manager.latest_step() is not None:
        state = manager.restore(state)
        val_ds.current_idx = (
            int(state.step) // cfg.experiment.validate_every
        ) % len(val_ds)

    # ---- jitted step.  Default: device-resident ray store with in-step
    # sampling.  Datasets too large for HBM (> ~6 GB of rays) fall back to
    # host-side sampling + per-step transfer (the reference's only mode).
    host_store = train_ds.device_store()
    use_device_store = host_store.nbytes < 6 * 1024**3
    if use_device_store:
        store = jnp.asarray(host_store)
        if mesh is not None:
            from ddnerf_tpu.parallel.mesh import make_sharded_store_train_step

            step_fn = make_sharded_store_train_step(cfg, pipeline, mesh)
        else:
            step_fn = jax.jit(
                make_train_step_from_store(cfg, pipeline),
                donate_argnums=0 if cfg.parallel.donate_state else (),
            )
    else:
        del host_store
        host_rng = np.random.default_rng(cfg.experiment.randomseed)
        if mesh is not None:
            from ddnerf_tpu.parallel.mesh import make_sharded_train_step, shard_batch

            batch_step = make_sharded_train_step(cfg, pipeline, mesh)
        else:
            batch_step = jax.jit(
                make_train_step(cfg, pipeline),
                donate_argnums=0 if cfg.parallel.donate_state else (),
            )

        def step_fn(state, _unused):
            ro, rd, radii, rgb = train_ds.sample_batch(
                host_rng, cfg.nerf.train.num_random_rays
            )
            batch = {
                "origins": jnp.asarray(ro),
                "directions": jnp.asarray(rd),
                "radii": jnp.asarray(radii),
                "rgb": jnp.asarray(rgb),
            }
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            return batch_step(state, batch)

        store = None

    # ---- validation renderer
    extract = list(DEFAULT_KEYS)
    if cfg.is_ddnerf():
        extract += ["weights", "mus", "sigmas", "smoothed_sigmas", "dp_loss"]
    renderer = ImageRenderer(cfg, pipeline, mesh, extract_keys=tuple(extract))

    if cfg.train_params.depth_analysis_rays:
        da = val_ds.load_depth_analysis_rays(cfg)
        da_origins, da_directions, da_rad, da_depth, da_rgb = da

    total_iters = max_iters or cfg.experiment.train_iters
    start = int(state.step)
    t_start = time.time()
    metrics = {}

    for i in range(start, total_iters):
        if profile_steps and i == start + 2:  # skip compile + first dispatch
            from ddnerf_tpu.utils.profiling import trace as profiler_trace

            with profiler_trace(logdir):
                for _ in range(profile_steps):
                    state, metrics = step_fn(state, store)
                jax.block_until_ready(metrics["loss"])
            profile_steps = 0
        state, metrics = step_fn(state, store)

        if i % cfg.experiment.print_every == 0 or i == total_iters - 1:
            m = {k: float(v) for k, v in metrics.items()}
            # rays/sec is the north-star throughput metric (SURVEY.md §5);
            # recorded alongside the training scalars.
            rate = (i - start + 1) * cfg.nerf.train.num_random_rays / (
                time.time() - t_start
            )
            m["rays_per_sec"] = rate
            if verbose:
                print(
                    f"[TRAIN] iter {i} loss {m['loss']:.4f} "
                    f"psnr {m['psnr_fine']:.2f} lr {m['lr']:.2e} "
                    f"({rate:,.0f} rays/s)"
                )
            doc.write_train_iter(i, m, extra_scalars={"train/rays_per_sec": rate})

        # ------------------------------------------------------ validation
        if i % cfg.experiment.validate_every == 0 or i == total_iters - 1:
            t_val = time.time()
            sched = schedule_values(cfg, state.step)
            ro, rd, radii, gt = val_ds.get_next_validation_rays()
            out = renderer.render_image(state.params, ro, rd, radii, sched=sched)

            vm = _validation_metrics(cfg, out, gt)
            if cfg.dataset.ndc_rays:
                ro_reg, rd_reg, _ = val_ds.get_current_regular_validation_rays()
                for j in (0, 1):
                    out[j]["depth"] = switch_t_ndc_to_regular(
                        out[j]["depth"], ro_reg, rd_reg
                    )
            if cfg.is_ddnerf() and "weights" in out[0]:
                w = out[0]["weights"].reshape(-1, out[0]["weights"].shape[-1])
                pdf = w / np.maximum(w.sum(-1, keepdims=True), 1e-12)
                mask = pdf > 0.1
                for key in ("mus", "sigmas", "smoothed_sigmas"):
                    flat = out[0][key].reshape(-1, pdf.shape[-1])
                    out[0][f"{key}_hist"] = flat[mask]
            doc.write_valid_iter(i, vm, out, gt, cfg.is_ddnerf())

            if cfg.train_params.depth_analysis_rays:
                da_out = run_depth_analysis(
                    cfg, pipeline, state.params, da_origins, da_directions,
                    da_rad, sched,
                )
                doc.write_depth_analysis_rays(
                    i, da_out, da_depth, cfg.dataset.near, cfg.dataset.far
                )
            if verbose:
                print(
                    f"[VAL] iter {i} loss {vm['loss']:.4f} "
                    f"psnr {vm['psnr_fine']:.2f} time {time.time()-t_val:.1f}s"
                )

        if i > 0 and (i % cfg.experiment.save_every == 0 or i == total_iters - 1):
            manager.save(state)

    manager.wait()
    doc.close()
    return state, logdir


def _validation_metrics(cfg: Config, out, gt):
    """Whole-image validation losses (train_model.py:209-223)."""
    gt = np.asarray(gt, np.float32)
    loss_coarse = float(np.mean((out[0]["rgb"] - gt) ** 2))
    loss_fine = float(np.mean((out[1]["rgb"] - gt) ** 2))
    coefs = cfg.train_params.loss_coeficients
    loss = coefs[0] * loss_coarse + coefs[1] * loss_fine
    m = {
        "loss_coarse": loss_coarse,
        "loss_fine": loss_fine,
        "psnr_coarse": -10.0 * np.log10(max(loss_coarse, 1e-5)),
        "psnr_fine": -10.0 * np.log10(max(loss_fine, 1e-5)),
    }
    if cfg.is_ddnerf() and "dp_loss" in out[1]:
        dp = float(out[1]["dp_loss"])
        loss += cfg.train_params.dp_coeficient * dp
        m["dp_loss"] = dp
    m["loss"] = loss
    return m
