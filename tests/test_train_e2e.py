"""End-to-end training smoke tests on the procedural synthetic scene —
the role of the reference's debug tiny-images mode (load_blender.py:115-128),
but asserting that optimization actually works: loss falls, PSNR climbs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.data.assembly import get_datasets
from ddnerf_tpu.models.nerf import NerfPipeline
from ddnerf_tpu.train.state import create_train_state, param_count
from ddnerf_tpu.train.step import make_train_step, make_train_step_from_store


def smoke_cfg(nerf_type="DDNerfModel", iters=60):
    return Config.from_dict(
        {
            "experiment": {"train_iters": iters, "randomseed": 0},
            "train_params": {
                "max_pdf_pad_iters": iters // 2,
                "finnish_smooth": iters,
                "dp_coeficient": 0.1,
            },
            "nerf": {
                "type": nerf_type,
                "coarse_hidden_size": 32,
                "fine_hidden_size": 32,
                "train": {
                    "num_coarse": 8,
                    "num_fine": 8,
                    "num_random_rays": 256,
                    "radiance_field_noise_std": 0.0,
                },
                "validation": {"num_coarse": 8, "num_fine": 8, "perturb": False},
            },
            "dataset": {"type": "blender", "synthetic": True, "near": 2.0, "far": 6.0,
                        "single_image_mode": False},
            "optimizer": {"lr_init": 3e-3, "lr_final": 3e-4, "lr_delay_steps": 0},
        }
    ).resolved()


@pytest.mark.parametrize("nerf_type", ["GeneralMipNerfModel", "DDNerfModel"])
def test_training_reduces_loss(nerf_type):
    cfg = smoke_cfg(nerf_type)
    train_ds, _, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(cfg, pipe), donate_argnums=0)

    rng = np.random.default_rng(0)
    first_losses, last_losses = [], []
    for i in range(cfg.experiment.train_iters):
        ro, rd, radii, rgb = train_ds.sample_batch(rng, cfg.nerf.train.num_random_rays)
        batch = {
            "origins": jnp.asarray(ro),
            "directions": jnp.asarray(rd),
            "radii": jnp.asarray(radii),
            "rgb": jnp.asarray(rgb),
        }
        state, metrics = step_fn(state, batch)
        if i < 5:
            first_losses.append(float(metrics["loss_fine"]))
        if i >= cfg.experiment.train_iters - 5:
            last_losses.append(float(metrics["loss_fine"]))

    assert np.mean(last_losses) < np.mean(first_losses) * 0.7, (
        f"fine loss did not improve: {np.mean(first_losses):.4f} -> "
        f"{np.mean(last_losses):.4f}"
    )
    assert int(state.step) == cfg.experiment.train_iters


def test_device_store_step_matches_host_sampling_distribution():
    """The device-resident sampling path trains equivalently (same loss
    scale) and runs fully jitted."""
    cfg = smoke_cfg("DDNerfModel", iters=20)
    train_ds, _, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    store = jnp.asarray(train_ds.device_store())
    step_fn = jax.jit(make_train_step_from_store(cfg, pipe), donate_argnums=0)

    losses = []
    for _ in range(cfg.experiment.train_iters):
        state, metrics = step_fn(state, store)
        losses.append(float(metrics["loss_fine"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # training is stable


def test_metrics_contents():
    cfg = smoke_cfg("DDNerfModel", iters=3)
    train_ds, _, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(cfg, pipe))
    rng = np.random.default_rng(0)
    ro, rd, radii, rgb = train_ds.sample_batch(rng, 64)
    batch = {
        "origins": jnp.asarray(ro), "directions": jnp.asarray(rd),
        "radii": jnp.asarray(radii), "rgb": jnp.asarray(rgb),
    }
    _, metrics = step_fn(state, batch)
    for key in ["loss", "loss_coarse", "loss_fine", "psnr_coarse", "psnr_fine",
                "dp_loss", "mus_reg", "sig_reg", "lr"]:
        assert key in metrics and np.isfinite(float(metrics[key])), key


def test_param_count_scales_with_hidden_size():
    cfg = smoke_cfg("DDNerfModel")
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    assert param_count(params) > 0
    assert set(params.keys()) == {"coarse", "fine"}


def test_ndc_training_reduces_loss():
    """Forward-facing NDC regime (near=0, far=1, llff type): the full DD
    pipeline must train in NDC space (validated at scale on TPU — PERF.md)."""
    from ddnerf_tpu.data.datasets import TrainRayDataset
    from ddnerf_tpu.data.synthetic import _trace

    H = W = 32
    focal = 40.0
    ii, jj = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    dirs_cam = np.stack(
        [(ii - W / 2) / focal, -(jj - H / 2) / focal, -np.ones_like(ii)], -1
    )
    poses, images = [], []
    for i in range(4):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.3 * (i - 2) / 4
        c2w[2, 3] = 4.0
        rd = np.sum(dirs_cam[..., None, :] * c2w[:3, :3], -1)
        ro = np.broadcast_to(c2w[:3, -1], rd.shape)
        img = _trace(ro, rd)
        images.append(img[..., :3] * img[..., 3:])
        poses.append(c2w)
    train_ds = TrainRayDataset(np.stack(poses), np.stack(images), focal,
                               ndc_rays=True, single_image_mode=False)

    cfg = Config.from_dict(
        {
            "experiment": {"train_iters": 60},
            "dataset": {"type": "llff", "ndc_rays": True, "near": 0.0,
                        "far": 1.0, "single_image_mode": False},
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 8, "num_fine": 8, "num_random_rays": 128,
                          "radiance_field_noise_std": 0.0},
                "validation": {"num_coarse": 8, "num_fine": 8, "perturb": False},
            },
            "optimizer": {"lr_init": 3e-3, "lr_final": 1e-3, "lr_delay_steps": 0},
        }
    ).resolved()
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    store = jnp.asarray(train_ds.device_store())
    step = jax.jit(make_train_step_from_store(cfg, pipe), donate_argnums=0)

    first, last = [], []
    for i in range(60):
        state, m = step(state, store)
        if i < 5:
            first.append(float(m["loss_fine"]))
        if i >= 55:
            last.append(float(m["loss_fine"]))
    assert np.mean(last) < np.mean(first) * 0.8


def test_training_is_deterministic():
    """Same seed -> bitwise-identical training trajectory (explicit PRNG keys
    + jit; the torch reference is only statistically reproducible)."""
    def run():
        cfg = smoke_cfg("DDNerfModel", iters=8)
        train_ds, _, cfg2 = get_datasets(cfg)
        pipe = NerfPipeline(cfg2)
        state = create_train_state(cfg2, pipe, jax.random.PRNGKey(0))
        store = jnp.asarray(train_ds.device_store())
        step = jax.jit(make_train_step_from_store(cfg2, pipe))
        losses = []
        for _ in range(8):
            state, m = step(state, store)
            losses.append(float(m["loss"]))
        return losses

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_scan_step_matches_individual_steps():
    """K scanned steps == K individual calls (up to fusion-order rounding,
    observed ~1e-8)."""
    from ddnerf_tpu.train.step import make_scan_train_step

    cfg = smoke_cfg("DDNerfModel", iters=6)
    train_ds, _, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    store = jnp.asarray(train_ds.device_store())

    s1 = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    single = jax.jit(make_train_step_from_store(cfg, pipe))
    for _ in range(6):
        s1, m1 = single(s1, store)

    s2 = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    scan6 = jax.jit(make_scan_train_step(cfg, pipe, 6))
    s2, m2 = scan6(s2, store)

    assert int(s1.step) == int(s2.step) == 6
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
        s1.params, s2.params,
    )
