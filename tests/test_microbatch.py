"""Microbatch gradient accumulation (parallel.microbatch_rays): the scan
over equal chunks must reproduce the monolithic step's loss, metrics, and
parameter update (means of equal-sized chunk means == global mean)."""

import numpy as np

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.data.assembly import get_datasets
from ddnerf_tpu.models.nerf import NerfPipeline
from ddnerf_tpu.train.state import create_train_state
from ddnerf_tpu.train.step import make_train_step


def _cfg(mb, model="DDNerfModel"):
    return Config.from_dict(
        {
            "nerf": {
                "type": model,
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                # Deterministic forward (no noise / perturb) so the per-
                # microbatch rng folding cannot change the math.
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 64,
                          "radiance_field_noise_std": 0.0, "perturb": False},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False},
            },
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": {"donate_state": False, "microbatch_rays": mb},
        }
    ).resolved()


def _batch(cfg, n=64):
    ds, _, cfg = get_datasets(cfg)
    rng = np.random.default_rng(0)
    ro, rd, rr, rgb = ds.sample_batch(rng, n)
    return cfg, {
        "origins": jnp.asarray(ro), "directions": jnp.asarray(rd),
        "radii": jnp.asarray(rr), "rgb": jnp.asarray(rgb),
    }


def test_microbatch_matches_monolithic():
    cfg0, batch = _batch(_cfg(0))
    pipe = NerfPipeline(cfg0)
    state = create_train_state(cfg0, pipe, jax.random.PRNGKey(0))
    s_ref, m_ref = jax.jit(make_train_step(cfg0, pipe))(state, batch)

    for mb in (16, 32):
        cfg = _cfg(mb)
        s_mb, m_mb = jax.jit(make_train_step(cfg, NerfPipeline(cfg)))(state, batch)
        np.testing.assert_allclose(float(m_ref["loss"]), float(m_mb["loss"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(m_ref["dp_loss"]), float(m_mb["dp_loss"]),
                                   rtol=1e-5, atol=1e-7)
        # Reported PSNR must equal the monolithic step's: PSNR is derived
        # once from the aggregated MSE, not averaged per-microbatch
        # (mean-of-PSNR != PSNR-of-mean-MSE).
        for key in ("psnr_coarse", "psnr_fine"):
            np.testing.assert_allclose(float(m_ref[key]), float(m_mb[key]),
                                       rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                        jax.tree_util.tree_leaves(s_mb.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)


def test_microbatch_ignored_when_batch_not_divisible():
    """num_rays % microbatch != 0 falls back to the monolithic step."""
    cfg, batch = _batch(_cfg(24))  # 64 % 24 != 0
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    s, m = jax.jit(make_train_step(cfg, pipe))(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(s.step) == 1


def test_microbatch_trains_multiple_steps():
    cfg, batch = _batch(_cfg(16))
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, pipe))
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizes on a fixed batch
