"""Fused-MLP Pallas kernel: numerical parity against the flax modules
(interpret mode on CPU) and gradient correctness of the custom VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.kernels.fused_mlp import (
    _reference_apply,
    fused_mlp_apply,
    fused_mlp_forward,
)
from ddnerf_tpu.models.mlp import DepthMipMLP, MipMLP


def _setup(depth_head, n=40, hidden=256, seed=0):
    rng = np.random.default_rng(seed)
    ipe = jnp.asarray(rng.standard_normal((n, 96)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((n, 27)).astype(np.float32))
    module = (DepthMipMLP if depth_head else MipMLP)(hidden_size=hidden)
    params = module.init(jax.random.PRNGKey(seed), ipe, dirs)["params"]
    return module, params, ipe, dirs


@pytest.mark.parametrize("depth_head", [False, True])
def test_kernel_matches_flax(depth_head):
    module, params, ipe, dirs = _setup(depth_head)
    expect = module.apply({"params": params}, ipe, dirs)
    got = fused_mlp_forward(
        params, ipe, dirs, depth_head=depth_head, block_rows=32,
        compute_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_kernel_bf16_close_to_f32():
    module, params, ipe, dirs = _setup(True, n=16)
    expect = module.apply({"params": params}, ipe, dirs)
    got = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.bfloat16, interpret=True,
    )
    # bf16 matmuls with f32 accumulation: ~1e-2 relative agreement.
    np.testing.assert_allclose(got, expect, rtol=0.05, atol=0.05)


def test_reference_twin_matches_flax():
    """The jnp twin used for the backward recompute must equal the flax
    module bit-for-bit (same formulation)."""
    module, params, ipe, dirs = _setup(True)
    expect = module.apply({"params": params}, ipe, dirs)
    got = _reference_apply(params, ipe, dirs, True)
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_custom_vjp_gradients():
    _, params, ipe, dirs = _setup(True, n=24)

    def loss_fused(p):
        out = fused_mlp_apply(p, ipe, dirs, True, True)
        return jnp.sum(out**2)

    def loss_ref(p):
        out = _reference_apply(p, ipe, dirs, True)
        return jnp.sum(out**2)

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-2),
        g_fused, g_ref,
    )


def test_row_padding_irrelevant():
    """Rows beyond N (block padding) must not leak into outputs."""
    _, params, ipe, dirs = _setup(False, n=10)
    out_a = fused_mlp_forward(
        params, ipe, dirs, depth_head=False, block_rows=8,
        compute_dtype=jnp.float32, interpret=True,
    )
    out_b = fused_mlp_forward(
        params, ipe, dirs, depth_head=False, block_rows=64,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(out_a, out_b, rtol=1e-5, atol=1e-6)

@pytest.mark.parametrize("raw_lane", [False, True])
def test_ipe_transposed_forward_bit_identical(raw_lane):
    """The feature-major input path (ipe_transposed — see
    core/math.integrated_pos_enc_t) must reproduce the row-major kernel
    exactly: same values, same op order, only the layer-0 contraction
    orientation differs (dim-0 vs dim-1), which interpret mode evaluates
    identically."""
    _, params, ipe, dirs = _setup(True, n=40)
    base = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.bfloat16, interpret=True, raw_lane=raw_lane,
    )
    got = fused_mlp_forward(
        params, ipe.T, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.bfloat16, interpret=True, raw_lane=raw_lane,
        ipe_transposed=True,
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_ipe_transposed_per_ray_dirs():
    """Transposed IPE composes with the per-ray dirs mode (the dir
    projection's row count comes from the transposed lane dim)."""
    rng = np.random.default_rng(3)
    n_rays, s = 6, 5
    ipe = jnp.asarray(rng.standard_normal((n_rays * s, 96)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((n_rays, 27)).astype(np.float32))
    module = DepthMipMLP(hidden_size=64)
    dirs_rows = jnp.repeat(dirs, s, axis=0)
    params = module.init(jax.random.PRNGKey(0), ipe, dirs_rows)["params"]
    base = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, samples_per_ray=s,
        rays_per_block=2,
    )
    got = fused_mlp_forward(
        params, ipe.T, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, samples_per_ray=s,
        rays_per_block=2, ipe_transposed=True,
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


@pytest.mark.parametrize("depth_head", [False, True])
def test_alpha_vpu_forward_matches_flax(depth_head):
    """alpha_vpu computes fc_alpha's single lane on the VPU (broadcast
    multiply + lane reduce); the output must still match the flax module,
    and every non-alpha lane must be bit-identical to the MXU path (only
    the alpha reduction order changes)."""
    module, params, ipe, dirs = _setup(depth_head)
    expect = module.apply({"params": params}, ipe, dirs)
    base = fused_mlp_forward(
        params, ipe, dirs, depth_head=depth_head, block_rows=32,
        compute_dtype=jnp.float32, interpret=True,
    )
    got = fused_mlp_forward(
        params, ipe, dirs, depth_head=depth_head, block_rows=32,
        compute_dtype=jnp.float32, interpret=True, alpha_vpu=True,
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
    keep = [i for i in range(base.shape[-1]) if i != 3]
    np.testing.assert_array_equal(
        np.asarray(base)[:, keep], np.asarray(got)[:, keep]
    )
    np.testing.assert_allclose(
        np.asarray(base)[:, 3], np.asarray(got)[:, 3], rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# In-kernel IPE ("ipe2" render variant): fused_enc_mlp_forward
# ---------------------------------------------------------------------------

def _setup_enc(depth_head, rays=5, samples=8, hidden=256, seed=0):
    from ddnerf_tpu.core import math as mmath

    rng = np.random.default_rng(seed)
    n = rays * samples
    means = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    covs = jnp.asarray(rng.uniform(1e-5, 0.3, (n, 3)).astype(np.float32))
    dirs_ray = jnp.asarray(rng.standard_normal((rays, 3)).astype(np.float32))
    pe = mmath.positional_encoding(dirs_ray, num_freqs=4)  # [rays, 27]
    ipe = mmath.integrated_pos_enc((means, covs), double_angle=False)
    module = (DepthMipMLP if depth_head else MipMLP)(hidden_size=hidden)
    pe_rows = jnp.repeat(pe, samples, axis=0)
    params = module.init(jax.random.PRNGKey(seed), ipe, pe_rows)["params"]
    return module, params, means, covs, pe, ipe, pe_rows


@pytest.mark.parametrize("depth_head", [False, True])
def test_enc_kernel_matches_flax(depth_head):
    """In-kernel IPE (direct form, exact one-hot replication) + net must
    match the flax module fed the XLA direct-form IPE."""
    module, params, means, covs, pe, ipe, pe_rows = _setup_enc(depth_head)
    from ddnerf_tpu.kernels.fused_mlp import fused_enc_mlp_forward

    expect = module.apply({"params": params}, ipe, pe_rows)
    got = fused_enc_mlp_forward(
        params, means, covs, pe, depth_head=depth_head, samples_per_ray=8,
        rays_per_block=2, compute_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_enc_kernel_ipe_is_exact():
    """The in-kernel encoding itself (one-hot replication at HIGHEST +
    f32 VPU chain) reproduces core.math.integrated_pos_enc(double_angle=
    False) bit-for-bit: identity weights would be overkill, so compare
    through a 1-layer-dominant check — the kernel output with the real
    net must match the reference twin fed the jnp IPE to f32 fusion
    tolerance (any encoding error would blow past it at deg 15)."""
    from ddnerf_tpu.kernels.fused_mlp import (
        _reference_apply,
        fused_enc_mlp_forward,
    )

    _, params, means, covs, pe, ipe, pe_rows = _setup_enc(True, seed=3)
    expect = _reference_apply(params, ipe, pe_rows, True)
    got = fused_enc_mlp_forward(
        params, means, covs, pe, depth_head=True, samples_per_ray=8,
        rays_per_block=4, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_enc_kernel_rays_per_block_padding():
    """Ray padding (rays_per_block > rays) must not leak into outputs."""
    from ddnerf_tpu.kernels.fused_mlp import fused_enc_mlp_forward

    _, params, means, covs, pe, _, _ = _setup_enc(False, rays=3, samples=4)
    out_a = fused_enc_mlp_forward(
        params, means, covs, pe, depth_head=False, samples_per_ray=4,
        rays_per_block=1, compute_dtype=jnp.float32, interpret=True,
    )
    out_b = fused_enc_mlp_forward(
        params, means, covs, pe, depth_head=False, samples_per_ray=4,
        rays_per_block=8, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(out_a, out_b, rtol=1e-6, atol=1e-7)
