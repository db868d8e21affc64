"""Full-stack integration: train loop (with validation + checkpointing) →
resume → eval driver → video renderer, all on the synthetic scene."""

import glob
import os

import numpy as np
import pytest

from ddnerf_tpu.config import Config
from ddnerf_tpu.train.loop import train


@pytest.fixture(scope="module")
def trained_logdir(tmp_path_factory):
    logdir_root = str(tmp_path_factory.mktemp("logs"))
    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "smoke",
                "logdir": logdir_root,
                "train_iters": 12,
                "validate_every": 5,
                "save_every": 5,
                "print_every": 5,
            },
            "train_params": {"max_pdf_pad_iters": 6, "finnish_smooth": 12},
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 64,
                          "radiance_field_noise_std": 0.0, "chunksize": 1024},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "chunksize": 1024},
            },
            "dataset": {"type": "blender", "synthetic": True,
                        "single_image_mode": False},
            "parallel": {"num_devices": 1},
        }
    ).resolved()
    state, logdir = train(cfg, use_tensorboard=False, verbose=False)
    return cfg, logdir, int(state.step)


def test_train_loop_runs_and_checkpoints(trained_logdir):
    cfg, logdir, final_step = trained_logdir
    assert final_step == 12
    assert os.path.exists(os.path.join(logdir, "config.yml"))
    assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))
    assert os.path.isdir(os.path.join(logdir, "checkpoint"))
    # metrics.jsonl has train + validation records
    import json

    kinds = set()
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        for line in f:
            kinds.add(json.loads(line)["kind"])
    assert kinds == {"train", "validation"}


def test_resume_from_checkpoint(trained_logdir):
    cfg, logdir, final_step = trained_logdir
    cfg2 = cfg.replace_at("experiment.train_iters", 15)
    state, _ = train(cfg2, use_tensorboard=False, verbose=False)
    assert int(state.step) == 15  # resumed from 12, not restarted


def test_eval_driver(trained_logdir):
    cfg, logdir, _ = trained_logdir
    from ddnerf_tpu.eval.evaluate import eval_model

    summary, per_image = eval_model(logdir, save_images=True, extract_ptc=True,
                                    max_images=1)
    assert "psnr_fine" in summary and np.isfinite(summary["psnr_fine"][0])
    assert "ssim_v2_fine" in summary
    results = os.path.join(logdir, "validation", "results.txt")
    assert os.path.exists(results)
    content = open(results).read()
    assert "average overall results" in content
    assert os.path.exists(os.path.join(logdir, "validation", "0", "rgb_fine.png"))
    assert glob.glob(os.path.join(logdir, "validation", "ptc_*.npy"))


def test_video_renderer(trained_logdir):
    cfg, logdir, _ = trained_logdir
    from ddnerf_tpu.render.video import render_model_video

    render_model_video(logdir, save_images=True, max_frames=2)
    assert os.path.exists(os.path.join(logdir, "video", "video.avi"))
    assert os.path.exists(os.path.join(logdir, "video", "frame_0000.png"))


def test_train_loop_with_depth_analysis(tmp_path):
    """Training loop with depth_analysis_rays enabled: keypoint rays loaded,
    per-ray distribution figures written to TB (train_model.py:232-236)."""
    keypoints = tmp_path / "kp.yml"
    keypoints.write_text(
        "img_idx: 0\nresized_by: 1\n"
        "pixels_and_depth:\n  0: [10, 12, 3.1]\n  1: [40, 40, 4.0]\n"
    )
    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "da_smoke", "logdir": str(tmp_path), "train_iters": 3,
                "validate_every": 2, "save_every": 100, "print_every": 2,
            },
            "train_params": {"depth_analysis_rays": True,
                             "depth_analysis_path": str(keypoints)},
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 32,
                          "radiance_field_noise_std": 0.0, "chunksize": 1024},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "chunksize": 1024},
            },
            "dataset": {"type": "blender", "synthetic": True,
                        "downsample_factor": 1, "single_image_mode": False},
            "parallel": {"num_devices": 1},
        }
    ).resolved()
    state, logdir = train(cfg, use_tensorboard=True, verbose=False)
    assert int(state.step) == 3
    import glob

    events = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 10000  # figures included


def test_checkpoint_retention_and_step_selection(tmp_path):
    """max_keep_ckpts > 1 retains history; eval can select a specific step
    (reference eval_nerf.py:173-178 --checkpoint)."""
    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "keep", "logdir": str(tmp_path), "train_iters": 12,
                "validate_every": 100, "save_every": 5, "print_every": 100,
                "max_keep_ckpts": 3,
            },
            "nerf": {
                "type": "GeneralMipNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 32,
                          "radiance_field_noise_std": 0.0, "chunksize": 1024},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "chunksize": 1024},
            },
            "dataset": {"type": "blender", "synthetic": True,
                        "single_image_mode": False},
            "parallel": {"num_devices": 1},
        }
    ).resolved()
    state, logdir = train(cfg, use_tensorboard=False, verbose=False)

    import jax

    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.train import checkpoint as ckpt
    from ddnerf_tpu.train.state import create_train_state

    mgr = ckpt.CheckpointManager(logdir, max_to_keep=3)
    # saves happen after the in-step increment: iter i saves state.step=i+1,
    # plus the final-iter save at train_iters
    steps = sorted(mgr.all_steps())
    assert steps == [6, 11, 12]

    template = create_train_state(cfg, NerfPipeline(cfg), jax.random.PRNGKey(0))
    restored = mgr.restore(template, step=6)
    assert int(restored.step) == 6
    restored_latest = mgr.restore(template)
    assert int(restored_latest.step) == 12
    with pytest.raises(FileNotFoundError):
        mgr.restore(template, step=7)

    # eval driver end-to-end with an explicit step
    from ddnerf_tpu.eval.evaluate import eval_model

    summary, _ = eval_model(logdir, save_images=False, max_images=1,
                            checkpoint_step=6)
    assert np.isfinite(summary["psnr_fine"][0])


def test_renderer_scalar_chunk_weighting():
    """Per-chunk scalars (dp_loss) are combined with valid-ray weights, not
    equal chunk weight: a render whose tail chunk is mostly padding must agree
    with the single-chunk (unpadded) render (reference concat-then-mean,
    models.py:57-61)."""
    import jax

    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = Config.from_dict(
        {
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "radiance_field_noise_std": 0.0,
                               "chunksize": 64},
            },
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": {"num_devices": 1},
        }
    ).resolved()
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    sched = ScheduleValues.for_eval(cfg)

    rng = np.random.default_rng(0)
    n = 65  # chunk=64 -> two chunks, tail has 1 valid + 63 padded rays
    ro = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    radii = np.full((n, 1), 0.002, np.float32)

    keys = ("rgb", "dp_loss")
    chunked = ImageRenderer(cfg, pipe, extract_keys=keys).render_flat(
        params, ro, rd, radii, sched=sched)

    cfg_one = cfg.replace_at("nerf.validation.chunksize", 128)
    whole = ImageRenderer(cfg_one, pipe, extract_keys=keys).render_flat(
        params, ro, rd, radii, sched=sched)

    np.testing.assert_allclose(chunked[1]["rgb"], whole[1]["rgb"],
                               atol=1e-4)
    # dp_loss: tail chunk still contains duplicated pad rays in its own mean,
    # so agreement is approximate — but equal chunk weighting would be off by
    # ~the chunk imbalance (63/65 of the weight on 1 ray), far outside this
    # tolerance.
    assert chunked[1]["dp_loss"] == pytest.approx(
        float(whole[1]["dp_loss"]), rel=0.05)


def test_block_mode_per_iter_scalars(tmp_path):
    """train_scalars_every=1 must produce one train record per iteration
    (reference-density curves, documentation.py:11-26) with steps 0..N-1,
    via the device-buffered scan-block driver, and still validate/save on
    the exact boundaries."""
    import json

    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "blockmode",
                "logdir": str(tmp_path),
                "train_iters": 13,
                "validate_every": 6,
                "save_every": 6,
                "print_every": 4,
                "train_scalars_every": 1,
            },
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 64,
                          "radiance_field_noise_std": 0.0, "chunksize": 1024},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "chunksize": 1024},
            },
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": {"num_devices": 1},
        }
    ).resolved()
    state, logdir = train(cfg, use_tensorboard=False, verbose=False)
    assert int(state.step) == 13

    train_steps, val_steps = [], []
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            (train_steps if rec["kind"] == "train" else val_steps).append(
                rec["step"]
            )
    assert train_steps == list(range(13))  # every iteration, in order
    assert val_steps == [0, 6, 12]
    assert os.path.isdir(os.path.join(logdir, "blockmode", "checkpoint")) or \
        os.path.isdir(os.path.join(logdir, "checkpoint"))


def test_block_mode_matches_per_iter_driver(tmp_path):
    """The scan-block driver must produce the same training trajectory as
    the per-iter driver (identical rng fold per step)."""
    base = {
        "experiment": {
            "logdir": str(tmp_path),
            "train_iters": 9,
            "validate_every": 100,
            "save_every": 100,
            "print_every": 3,
        },
        "nerf": {
            "type": "DDNerfModel",
            "coarse_hidden_size": 16,
            "fine_hidden_size": 16,
            "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 64,
                      "radiance_field_noise_std": 0.0, "chunksize": 1024},
            "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                           "chunksize": 1024},
        },
        "dataset": {"type": "blender", "synthetic": True},
        "parallel": {"num_devices": 1, "donate_state": False},
    }
    cfg_a = Config.from_dict({**base, "experiment": {**base["experiment"], "id": "a"}}).resolved()
    cfg_b = Config.from_dict({**base, "experiment": {
        **base["experiment"], "id": "b", "train_scalars_every": 1}}).resolved()

    state_a, _ = train(cfg_a, use_tensorboard=False, verbose=False)
    state_b, _ = train(cfg_b, use_tensorboard=False, verbose=False)

    import jax

    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)


def test_eval_driver_mesh_matches_single_device(tmp_path):
    """eval_model must produce the same metrics whether it renders on one
    device or sharded over the 8-device mesh (render-tile parallelism is
    now wired into the eval/video drivers, not just the train loop)."""
    import jax
    import json

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "mesh_eval", "logdir": str(tmp_path), "train_iters": 3,
                "validate_every": 10, "save_every": 2, "print_every": 10,
            },
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 64,
                          "radiance_field_noise_std": 0.0, "chunksize": 1024},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "radiance_field_noise_std": 0.0,
                               "chunksize": 1024},
            },
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": {"num_devices": 1},
        }
    ).resolved()
    state, logdir = train(cfg, use_tensorboard=False, verbose=False)

    from ddnerf_tpu.eval.evaluate import eval_model

    summary_1, _ = eval_model(logdir, max_images=1)

    # Re-point the snapshot at the full mesh and evaluate again.
    snap = os.path.join(logdir, "config.yml")
    text = open(snap).read().replace("num_devices: 1", "num_devices: 0")
    open(snap, "w").write(text)
    summary_8, _ = eval_model(logdir, max_images=1)

    for key in ("psnr_fine", "psnr_coarse", "ssim_v2_fine"):
        np.testing.assert_allclose(summary_1[key], summary_8[key],
                                   rtol=1e-3, atol=1e-4)


def test_eval_metrics_independent_of_fetch_dtype(trained_logdir):
    """The eval driver forces the exact f32 fetch wire regardless of the
    snapshot's ``parallel.fetch_dtype``, so results.txt never depends on
    the transfer-speed knob (round-4 verdict #3; the reference computes
    acceptance metrics from full-precision renders, eval_nerf.py:128-160).
    Identity must be EXACT — bitwise-equal metrics, byte-equal results.txt."""
    cfg, logdir, _ = trained_logdir
    from ddnerf_tpu.eval.evaluate import eval_model

    snap = os.path.join(logdir, "config.yml")
    original = open(snap).read()
    assert "fetch_dtype: float32" in original  # the fixture's default wire

    summary_f32, per_f32 = eval_model(logdir, save_images=False, max_images=1)
    results_f32 = open(os.path.join(logdir, "validation", "results.txt")).read()

    try:
        open(snap, "w").write(
            original.replace("fetch_dtype: float32", "fetch_dtype: float16")
        )
        summary_f16, per_f16 = eval_model(logdir, save_images=False,
                                          max_images=1)
        results_f16 = open(
            os.path.join(logdir, "validation", "results.txt")).read()
    finally:
        open(snap, "w").write(original)

    for key in summary_f32:
        if key == "model_time_sec":  # wall timing, run-dependent
            continue
        np.testing.assert_array_equal(
            np.asarray(summary_f32[key][:1]), np.asarray(summary_f16[key][:1]),
            err_msg=key)
    assert per_f32.keys() == per_f16.keys()
    for i in per_f32:
        assert per_f32[i] == per_f16[i], i

    def strip_timing(text):
        return "\n".join(l for l in text.splitlines()
                         if not l.startswith("model_time_sec"))

    assert strip_timing(results_f32) == strip_timing(results_f16)


def test_host_sampling_fallback_path(tmp_path):
    """parallel.max_store_gb below the dataset size forces the host-side
    sampling + per-step transfer branch (the reference's only mode) — on a
    mesh it routes through the batch-sharded step.  The loop must train and
    checkpoint identically well through that branch."""
    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "hostfall", "logdir": str(tmp_path), "train_iters": 6,
                "validate_every": 5, "save_every": 5, "print_every": 5,
            },
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 64,
                          "radiance_field_noise_std": 0.0, "chunksize": 1024},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "chunksize": 1024},
            },
            "dataset": {"type": "blender", "synthetic": True},
            # max_store_gb 0 forces the fallback.  num_devices 1 + donation
            # off so train()'s step and the reference loop below compile the
            # SAME program: the 8-way sharded step's grad-psum reduction
            # order differs from the single-device sum at ~1e-5 after Adam,
            # and this exactness check is about rng/batch semantics, not
            # cross-program float association.
            "parallel": {"max_store_gb": 0.0, "num_devices": 1,
                         "donate_state": False},
        }
    ).resolved()
    state, logdir = train(cfg, use_tensorboard=False, verbose=False)
    assert int(state.step) == 6
    assert os.path.isdir(os.path.join(logdir, "checkpoint"))

    # The double-buffered fallback must reproduce the synchronous
    # sample->transfer->step semantics exactly: same host rng draw order,
    # same batches, same final params.
    import jax
    import jax.numpy as jnp

    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.train.state import create_train_state
    from ddnerf_tpu.train.step import make_train_step

    train_ds, _, cfg2 = get_datasets(cfg)
    pipe = NerfPipeline(cfg2)
    ref_state = create_train_state(
        cfg2, pipe, jax.random.PRNGKey(cfg2.experiment.randomseed)
    )
    step = jax.jit(make_train_step(cfg2, pipe))
    host_rng = np.random.default_rng(cfg2.experiment.randomseed)
    for _ in range(6):
        ro, rd, radii, rgb = train_ds.sample_batch(host_rng, 64)
        batch = {"origins": jnp.asarray(ro), "directions": jnp.asarray(rd),
                 "radii": jnp.asarray(radii), "rgb": jnp.asarray(rgb)}
        ref_state, m = step(ref_state, batch)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_render_video_frame_matches_host_casts(trained_logdir):
    """The on-device uint8 video quantization must match the host casts
    (cast_to_image / cast_to_disparity_image) applied to the f32 maps, up
    to one quantization step of float fusion rounding."""
    import jax

    from ddnerf_tpu.config import Config as _C
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render.renderer import ImageRenderer
    from ddnerf_tpu.train import checkpoint as ckpt
    from ddnerf_tpu.train.state import create_train_state
    from ddnerf_tpu.viz.visualization import (
        cast_to_disparity_image,
        cast_to_image,
    )

    cfg, logdir, _ = trained_logdir
    cfg2 = ckpt.load_config_snapshot(logdir)
    _, val_ds, cfg2 = get_datasets(cfg2)
    pipe = NerfPipeline(cfg2)
    state = create_train_state(cfg2, pipe, jax.random.PRNGKey(0))
    state = ckpt.CheckpointManager(logdir).restore(state)
    sched = ScheduleValues.for_eval(cfg2)

    renderer = ImageRenderer(cfg2, pipe, mode="render",
                             extract_keys=("rgb", "disp"))
    ro, rd, radii = val_ds._bundle(val_ds.poses[0])

    out = renderer.render_image(state.params, ro, rd, radii, sched=sched)
    want_rgb = cast_to_image(out[1]["rgb"]).transpose(1, 2, 0)
    want_disp = cast_to_disparity_image(out[1]["disp"]).squeeze()

    rgb, disp = renderer.render_video_frame(state.params, ro, rd, radii,
                                            sched=sched)
    assert rgb.dtype == np.uint8 and disp.dtype == np.uint8
    assert rgb.shape == want_rgb.shape and disp.shape == want_disp.shape
    assert np.max(np.abs(rgb.astype(int) - want_rgb.astype(int))) <= 1
    assert np.max(np.abs(disp.astype(int) - want_disp.astype(int))) <= 1


def test_render_video_frame_from_pose_matches_ray_path(trained_logdir):
    """Device-side ray generation (pose-only upload) must reproduce the
    host-bundled ray path's uint8 frame (±1 quantization step)."""
    import jax

    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render.renderer import ImageRenderer
    from ddnerf_tpu.train import checkpoint as ckpt
    from ddnerf_tpu.train.state import create_train_state

    cfg, logdir, _ = trained_logdir
    cfg2 = ckpt.load_config_snapshot(logdir)
    _, val_ds, cfg2 = get_datasets(cfg2)
    pipe = NerfPipeline(cfg2)
    state = create_train_state(cfg2, pipe, jax.random.PRNGKey(0))
    state = ckpt.CheckpointManager(logdir).restore(state)
    sched = ScheduleValues.for_eval(cfg2)

    renderer = ImageRenderer(cfg2, pipe, mode="render",
                             extract_keys=("rgb", "disp"))
    pose = val_ds.render_poses[0]
    ro, rd, radii = val_ds._bundle(pose)

    want_rgb, want_disp = renderer.render_video_frame(
        state.params, ro, rd, radii, sched=sched)
    rgb, disp = renderer.render_video_frame_from_pose(
        state.params, pose, val_ds.H, val_ds.W, val_ds.focal, sched=sched)

    assert np.max(np.abs(rgb.astype(int) - want_rgb.astype(int))) <= 1
    assert np.max(np.abs(disp.astype(int) - want_disp.astype(int))) <= 1


def test_device_ray_bundle_matches_host():
    """get_ray_bundle_device must reproduce the host bundle (incl. the NDC
    projection via the xp backend switch) to f32 precision."""
    import jax.numpy as jnp

    from ddnerf_tpu.core.rays import (
        get_ray_bundle,
        get_ray_bundle_device,
        ndc_mipnerf_rays,
    )
    from ddnerf_tpu.data.synthetic import pose_spherical

    pose = pose_spherical(37.0, -25.0, 4.0)
    h, w, focal = 12, 16, 14.0
    ro, rd, rr = get_ray_bundle(h, w, focal, pose)
    dro, drd, drr = get_ray_bundle_device(h, w, focal, pose)
    np.testing.assert_allclose(np.asarray(dro), ro, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(drd), rd, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(drr), rr, rtol=1e-6, atol=1e-9)

    no, nd, nr = ndc_mipnerf_rays(h, w, focal, ro, rd)
    jno, jnd, jnr = ndc_mipnerf_rays(h, w, focal, jnp.asarray(ro),
                                     jnp.asarray(rd), xp=jnp)
    np.testing.assert_allclose(np.asarray(jno), no, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnd), nd, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnr), nr, rtol=1e-5, atol=1e-8)


def test_render_image_from_pose_matches_ray_path(trained_logdir):
    """Device-side ray generation for whole-image rendering must reproduce
    the host-bundled path's maps (f32, tight tolerance) for all extract
    keys including the per-chunk dp_loss scalar."""
    import jax

    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render.renderer import DEFAULT_KEYS, ImageRenderer
    from ddnerf_tpu.train import checkpoint as ckpt
    from ddnerf_tpu.train.state import create_train_state

    cfg, logdir, _ = trained_logdir
    cfg2 = ckpt.load_config_snapshot(logdir)
    cfg2 = cfg2.replace_at("nerf.validation.radiance_field_noise_std", 0.0)
    _, val_ds, cfg2 = get_datasets(cfg2)
    pipe = NerfPipeline(cfg2)
    state = create_train_state(cfg2, pipe, jax.random.PRNGKey(0))
    state = ckpt.CheckpointManager(logdir).restore(state)
    sched = ScheduleValues.for_eval(cfg2)

    keys = tuple(DEFAULT_KEYS) + ("dp_loss",)
    renderer = ImageRenderer(cfg2, pipe, extract_keys=keys)
    pose = val_ds.poses[0]
    ro, rd, radii = val_ds._bundle(pose)

    want = renderer.render_image(state.params, ro, rd, radii, sched=sched)
    got = renderer.render_image_from_pose(
        state.params, pose, val_ds.H, val_ds.W, val_ds.focal, sched=sched)

    for cyc in (0, 1):
        for key in keys:
            if key not in want[cyc]:
                continue
            np.testing.assert_allclose(
                np.asarray(got[cyc][key]), np.asarray(want[cyc][key]),
                rtol=5e-4, atol=5e-5, err_msg=f"cycle {cyc} {key}")


def test_host_sampling_draw_count_matches_steps(tmp_path, monkeypatch):
    """The double-buffered host driver must draw exactly one batch per
    executed step — the entry prefetch counts, and the final step's
    prefetch is skipped (round-3 advisor: one wasted upload per train()
    call and a host rng advanced one draw past the synchronous loop)."""
    from ddnerf_tpu.data.datasets import TrainRayDataset

    calls = {"n": 0}
    orig = TrainRayDataset.sample_batch

    def counting(self, rng, num_rays):
        calls["n"] += 1
        return orig(self, rng, num_rays)

    monkeypatch.setattr(TrainRayDataset, "sample_batch", counting)

    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "drawcount", "logdir": str(tmp_path), "train_iters": 4,
                "validate_every": 10, "save_every": 10, "print_every": 10,
            },
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 32,
                          "radiance_field_noise_std": 0.0, "chunksize": 1024},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "chunksize": 1024},
            },
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": {"max_store_gb": 0.0, "num_devices": 1,
                         "donate_state": False},
        }
    ).resolved()
    state, _ = train(cfg, use_tensorboard=False, verbose=False)
    assert int(state.step) == 4
    assert calls["n"] == 4
