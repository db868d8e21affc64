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
