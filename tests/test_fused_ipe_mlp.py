"""Fused IPE+MLP kernel (v2): encoding-in-kernel parity against the jnp
pipeline (core.math IPE + flax MLP), interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.core import math as mmath
from ddnerf_tpu.kernels.fused_ipe_mlp import (
    _reference_ipe_apply,
    fused_ipe_mlp_apply,
    fused_ipe_mlp_forward,
)
from ddnerf_tpu.models.mlp import DepthMipMLP, MipMLP


def _setup(depth_head, n=48, hidden=64, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    covs = jnp.asarray((rng.uniform(0, 1, (n, 3)) * 0.01).astype(np.float32))
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    module = (DepthMipMLP if depth_head else MipMLP)(hidden_size=hidden)
    ipe = mmath.integrated_pos_enc((means, covs))
    pe = mmath.positional_encoding(dirs, num_freqs=4)
    params = module.init(jax.random.PRNGKey(seed), ipe, pe)["params"]
    return module, params, means, covs, dirs, ipe, pe


@pytest.mark.parametrize("depth_head", [False, True])
def test_ipe_kernel_matches_jnp_pipeline(depth_head):
    module, params, means, covs, dirs, ipe, pe = _setup(depth_head)
    expect = module.apply({"params": params}, ipe, pe)
    got = fused_ipe_mlp_forward(
        params, means, covs, dirs, depth_head=depth_head, block_rows=16,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_ipe_kernel_large_coords_safe():
    """Coordinates large enough that 2^15-scaled phases exceed the safe-sin
    threshold must stay finite and match the jnp twin (which uses safe_sin)."""
    module, params, means, covs, dirs, *_ = _setup(False)
    means = means * 50.0  # phases up to ~3e6
    got = fused_ipe_mlp_forward(
        params, means, covs, dirs, depth_head=False, block_rows=16,
        compute_dtype=jnp.float32, interpret=True,
    )
    expect = _reference_ipe_apply(params, means, covs, dirs, False)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_ipe_kernel_custom_vjp():
    _, params, means, covs, dirs, *_ = _setup(True, n=24)

    def loss_fused(p):
        return jnp.sum(fused_ipe_mlp_apply(p, means, covs, dirs, True, True) ** 2)

    def loss_ref(p):
        return jnp.sum(_reference_ipe_apply(p, means, covs, dirs, True) ** 2)

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-2),
        g_fused, g_ref,
    )
