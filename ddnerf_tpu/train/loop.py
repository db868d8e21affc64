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
from ddnerf_tpu.utils.compile import step_compiler_options
from ddnerf_tpu.viz.documentation import Documenter


def train(cfg: Config, load_checkpoint: str = "", max_iters: Optional[int] = None,
          use_tensorboard: bool = True, verbose: bool = True,
          profile_steps: int = 0):
    """Run training.  Returns (state, logdir).

    ``profile_steps`` > 0 captures a jax.profiler trace of that many steady-
    state steps under ``logdir`` (TensorBoard-viewable; SURVEY.md §5 tracing).
    """
    logdir = os.path.join(cfg.experiment.logdir, cfg.experiment.id)
    primary = jax.process_index() == 0  # pod hygiene: one writer per logdir
    if primary:
        os.makedirs(logdir, exist_ok=True)
    doc = Documenter(logdir, use_tensorboard=use_tensorboard)

    # Dataset build may rescale near/far (pose normalization).
    train_ds, val_ds, cfg = get_datasets(cfg)
    if primary:
        ckpt.save_config_snapshot(cfg, logdir)

    rng = jax.random.PRNGKey(cfg.experiment.randomseed)
    pipeline = NerfPipeline(cfg)
    state = create_train_state(cfg, pipeline, rng)

    from ddnerf_tpu.parallel.mesh import maybe_mesh

    mesh = maybe_mesh(cfg)

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
    # sampling.  On a mesh the store is sharded over the pixel axis, so the
    # per-chip footprint is total/D and grows datasets scale out with the
    # pod (parallel/distributed.py).  Only datasets whose *per-chip* share
    # exceeds ~6 GB fall back to host-side sampling + per-step transfer
    # (the reference's only mode).
    host_store = train_ds.device_store()
    rays_per_iter = cfg.nerf.train.num_random_rays
    n_store_shards = int(mesh.devices.size) if mesh is not None else 1
    use_device_store = (
        host_store.nbytes / n_store_shards
        < cfg.parallel.max_store_gb * 1024**3
    )
    if use_device_store:
        if mesh is not None:
            from ddnerf_tpu.parallel import distributed as dist
            from ddnerf_tpu.parallel.mesh import make_sharded_store_train_step

            # Multi-process: every host feeds only its pixel block; the
            # assembled array is globally [n_img, n_pix_padded, 10].
            store = dist.build_sharded_store(mesh, host_store)
            step_fn = make_sharded_store_train_step(cfg, pipeline, mesh)
            # The sharded sampler ceil-rounds the per-device draw; rays/s
            # accounting must use the effective batch, not the configured
            # one (mesh.effective_train_rays).
            from ddnerf_tpu.parallel.mesh import effective_train_rays

            rays_per_iter = effective_train_rays(cfg, mesh)
        else:
            store = jnp.asarray(host_store)
            step_fn = jax.jit(
                make_train_step_from_store(cfg, pipeline),
                donate_argnums=0 if cfg.parallel.donate_state else (),
                compiler_options=step_compiler_options(cfg),
            )
        del host_store
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
                compiler_options=step_compiler_options(cfg),
            )

        def sample_upload():
            """Sample on host and start the (async) device transfer."""
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
            return batch

        # Double-buffering: batch N+1 is sampled and its device_put issued
        # right after step N is dispatched, so the host sampling + transfer
        # overlap step N's device compute instead of serializing with it
        # (the reference's per-iter sample->transfer->step chain,
        # dataset.py:50-59, is the anti-pattern being hidden).  The host rng
        # is drawn in the same order as the synchronous loop, so batch
        # contents are identical.  The prefetch is skipped once every
        # remaining step has a batch (the entry prefetch counts as one), so
        # the final step neither wastes an upload nor advances the host rng
        # past the synchronous loop's draw count.
        prefetched = [sample_upload()]
        upload_calls = [1]

        def _steps_expected():
            n = total_iters - start
            if requested_profile_steps and start + 2 < total_iters:
                n += requested_profile_steps  # extra profiled-block steps
            return n

        def step_fn(state, _unused):
            batch = prefetched[0]
            result = batch_step(state, batch)  # async dispatch
            if upload_calls[0] < _steps_expected():
                prefetched[0] = sample_upload()  # overlaps the running step
                upload_calls[0] += 1
            else:
                prefetched[0] = None
            return result

        store = None

    # ---- validation renderer
    extract = list(DEFAULT_KEYS)
    if cfg.is_ddnerf():
        extract += ["weights", "mus", "sigmas", "smoothed_sigmas", "dp_loss"]
    renderer = ImageRenderer(cfg, pipeline, mesh, extract_keys=tuple(extract))

    total_iters = max_iters or cfg.experiment.train_iters
    start = int(state.step)
    t_start = time.time()
    metrics = {}

    _run_validation_cb = _make_validation_cb(
        cfg, doc, renderer, val_ds, verbose,
        cfg.train_params.depth_analysis_rays, pipeline,
    )

    requested_profile_steps = profile_steps
    scalars_every = cfg.experiment.train_scalars_every
    # Device-buffered per-iteration scalars: run print_every-sized lax.scan
    # blocks that stack every step's metrics on device, flushed in one fetch
    # (reference-density TB curves, documentation.py:11-26, at ~zero cost).
    block_mode = use_device_store and scalars_every >= 1

    def train_rate(iters_done: int) -> float:
        # rays/sec is the north-star throughput metric (SURVEY.md §5).
        # rays_per_iter is the EFFECTIVE per-step batch (the sharded store
        # sampler ceil-rounds the per-device draw).
        return iters_done * rays_per_iter / (time.time() - t_start)

    def print_train(i, m, rate):
        if verbose:
            print(
                f"[TRAIN] iter {i} loss {m['loss']:.4f} "
                f"psnr {m['psnr_fine']:.2f} lr {m['lr']:.2e} "
                f"({rate:,.0f} rays/s)"
            )

    def is_event(i, every):
        return i % every == 0 or i == total_iters - 1

    if not block_mode:
        for i in range(start, total_iters):
            if profile_steps and i == start + 2:  # skip compile + dispatch
                from ddnerf_tpu.utils.profiling import trace as profiler_trace

                with profiler_trace(logdir):
                    for _ in range(profile_steps):
                        state, metrics = step_fn(state, store)
                    jax.block_until_ready(metrics["loss"])
                profile_steps = 0
            state, metrics = step_fn(state, store)

            if is_event(i, cfg.experiment.print_every):
                m = {k: float(v) for k, v in metrics.items()}
                rate = train_rate(i - start + 1)
                m["rays_per_sec"] = rate
                print_train(i, m, rate)
                doc.write_train_iter(
                    i, m, extra_scalars={"train/rays_per_sec": rate}
                )
            elif scalars_every >= 1 and i % scalars_every == 0:
                # Host-sampling fallback honors the density knob too, at the
                # cost of a per-write device fetch (the device-store path
                # buffers these on device instead — see block driver below).
                doc.write_train_iter(i, {k: float(v) for k, v in metrics.items()})
            if is_event(i, cfg.experiment.validate_every):
                state = _run_validation_cb(i, state)
            if i > 0 and is_event(i, cfg.experiment.save_every):
                manager.save(state)
    else:
        from ddnerf_tpu.train.step import make_stacked_train_step_from_store

        if mesh is not None:
            from ddnerf_tpu.parallel.mesh import make_sharded_store_train_step

            def make_block(k):
                return make_sharded_store_train_step(
                    cfg, pipeline, mesh, stack_steps=k
                )
        else:

            def make_block(k):
                return jax.jit(
                    make_stacked_train_step_from_store(cfg, pipeline, k),
                    donate_argnums=0 if cfg.parallel.donate_state else (),
                    compiler_options=step_compiler_options(cfg),
                )

        blocks = {}

        def run_block(state, k):
            if k not in blocks:
                blocks[k] = make_block(k)
            return blocks[k](state, store)

        def next_boundary(i):
            """Last iteration of the block starting at ``i``: the nearest
            event iteration (print / validate / save / final), so every
            event still sees the exact post-step state."""
            ends = [total_iters - 1]
            for every in (cfg.experiment.print_every,
                          cfg.experiment.validate_every,
                          cfg.experiment.save_every):
                ends.append(i if i % every == 0 else i + every - i % every)
            return min(ends)

        i = start
        profiled = False
        while i < total_iters:
            k = next_boundary(i) - i + 1
            state, stacked = run_block(state, k)
            if profile_steps and not profiled and i > start:
                # Trace one block of profile_steps.  AOT-compile first so the
                # traced run is warm WITHOUT executing a throwaway block —
                # state.step advances by exactly profile_steps (the same
                # drift as the per-iter driver), not 2x.
                from ddnerf_tpu.utils.profiling import trace as profiler_trace

                if profile_steps not in blocks:
                    blocks[profile_steps] = make_block(profile_steps)
                compiled = blocks[profile_steps].lower(state, store).compile()
                with profiler_trace(logdir):
                    state, _ps = compiled(state, store)
                    jax.block_until_ready(_ps["loss"])
                profiled = True
            last = i + k - 1

            # One fetch for the whole block, then per-iter scalar writes.
            mh = {name: np.asarray(v) for name, v in stacked.items()}
            rate = train_rate(last - start + 1)
            print_event = is_event(last, cfg.experiment.print_every)
            for j in range(k):
                it = i + j
                # Print events always get a record (per-iter driver parity),
                # even when not divisible by train_scalars_every.
                if (it % scalars_every == 0 or it == total_iters - 1
                        or (it == last and print_event)):
                    rec = {name: float(v[j]) for name, v in mh.items()}
                    if it == last:
                        # rays/s in the jsonl payload, like the per-iter
                        # driver's print-event records.
                        rec["rays_per_sec"] = rate
                    doc.write_train_iter(
                        it, rec,
                        extra_scalars={"train/rays_per_sec": rate}
                        if it == last else None,
                    )
            if print_event:
                print_train(last, {n: float(v[-1]) for n, v in mh.items()}, rate)
            if is_event(last, cfg.experiment.validate_every):
                state = _run_validation_cb(last, state)
            if last > 0 and is_event(last, cfg.experiment.save_every):
                manager.save(state)
            i = last + 1

    if requested_profile_steps and verbose:
        # Automated device-trace digest of the captured profile (the
        # analysis PERF.md tabulates; SURVEY.md §5 tracing).
        from ddnerf_tpu.utils.trace_summary import summarize_logdir

        try:
            print(summarize_logdir(logdir, steps=requested_profile_steps))
        except Exception as e:  # trace formats vary across backends
            print(f"[profile] trace summary unavailable: {e}")

    manager.wait()
    doc.close()
    return state, logdir


def _make_validation_cb(cfg, doc, renderer, val_ds, verbose,
                        depth_analysis, pipeline):
    """Builds the per-event validation callback shared by both loop drivers:
    whole-image render, metrics, NDC depth un-warp, DD histograms,
    depth-analysis figures (train_model.py:196-246)."""
    da_origins = da_directions = da_rad = da_depth = None
    if depth_analysis:
        da = val_ds.load_depth_analysis_rays(cfg)
        da_origins, da_directions, da_rad, da_depth, _da_rgb = da

    def run_validation(i, state):
        t_val = time.time()
        sched = schedule_values(cfg, state.step)
        # Rays for the val image are generated on device from the pose
        # (pose-only upload; renderer.render_image_from_pose).
        pose, gt = val_ds.get_next_validation_pose()
        out = renderer.render_image_from_pose(
            state.params, pose, val_ds.H, val_ds.W, val_ds.focal, sched=sched
        )

        vm = _validation_metrics(cfg, out, gt)
        if cfg.dataset.ndc_rays:
            ro_reg, rd_reg, _ = val_ds.get_current_regular_validation_rays(
                fixed=cfg.dataset.fix_validation_unwarp_rays
            )
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
        return state

    return run_validation


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
