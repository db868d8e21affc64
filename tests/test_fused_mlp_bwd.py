"""Fused-backward Pallas kernel: gradient parity against jax.grad of the
jnp twin (interpret mode on CPU), block-size invariance, and zero input
grads through the custom VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.kernels.fused_mlp import _reference_apply
from ddnerf_tpu.kernels.fused_mlp_bwd import (
    fused_mlp_backward,
    fused_mlp_train_apply,
)
from ddnerf_tpu.models.mlp import DepthMipMLP, MipMLP


def _setup(depth_head, n=40, hidden=256, seed=0):
    rng = np.random.default_rng(seed)
    ipe = jnp.asarray(rng.standard_normal((n, 96)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((n, 27)).astype(np.float32))
    module = (DepthMipMLP if depth_head else MipMLP)(hidden_size=hidden)
    params = module.init(jax.random.PRNGKey(seed), ipe, dirs)["params"]
    return module, params, ipe, dirs


def _ref_grads(params, ipe, dirs, depth_head, g):
    def loss(p):
        return jnp.sum(_reference_apply(p, ipe, dirs, depth_head) * g)

    return jax.grad(loss)(params)


@pytest.mark.parametrize("depth_head", [False, True])
def test_backward_kernel_matches_autodiff(depth_head):
    """f32 kernel vs f32 jax.grad of the jnp twin: tight agreement."""
    _, params, ipe, dirs = _setup(depth_head, n=40)
    out_dim = 6 if depth_head else 4
    rng = np.random.default_rng(1)
    g = jnp.asarray(
        rng.standard_normal((40, out_dim)).astype(np.float32)
    )
    got = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=depth_head, block_rows=16,
        compute_dtype=jnp.float32, interpret=True,
    )
    want = _ref_grads(params, ipe, dirs, depth_head, g)
    assert set(got.keys()) == set(want.keys())
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-4
        ),
        got, want,
    )


def test_backward_block_size_invariance():
    """Grid accumulation must be exact: one block vs many blocks."""
    _, params, ipe, dirs = _setup(True, n=48)
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.standard_normal((48, 6)).astype(np.float32))
    a = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=True, block_rows=48,
        compute_dtype=jnp.float32, interpret=True,
    )
    b = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=True, block_rows=8,
        compute_dtype=jnp.float32, interpret=True,
    )
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-5),
        a, b,
    )


def test_train_apply_end_to_end_gradients():
    """custom_vjp wiring: grads through fused_mlp_train_apply (bf16 default
    path, interpret mode) track the f32 reference within bf16 tolerance."""
    _, params, ipe, dirs = _setup(True, n=24)

    def loss_fused(p):
        out = fused_mlp_train_apply(p, ipe, dirs, True, True)
        return jnp.sum(out**2)

    def loss_ref(p):
        out = _reference_apply(p, ipe, dirs, True)
        return jnp.sum(out**2)

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-2),
        g_fused, g_ref,
    )


def test_train_apply_input_grads_are_zero():
    """t_vals/viewdirs are stop-gradient'd in the pipeline; the op must
    return structural zeros for its input grads."""
    _, params, ipe, dirs = _setup(False, n=16)

    def loss(p, a, b):
        return jnp.sum(fused_mlp_train_apply(p, a, b, False, True))

    _, d_ipe, d_dirs = jax.grad(loss, argnums=(0, 1, 2))(params, ipe, dirs)
    assert float(jnp.abs(d_ipe).max()) == 0.0
    assert float(jnp.abs(d_dirs).max()) == 0.0


def test_row_padding_does_not_leak_into_grads():
    """Padded rows carry zero cotangent; grads must equal the unpadded ones
    regardless of how much block padding is applied."""
    _, params, ipe, dirs = _setup(True, n=10)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.standard_normal((10, 6)).astype(np.float32))
    a = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=True, block_rows=8,
        compute_dtype=jnp.float32, interpret=True,
    )
    want = _ref_grads(params, ipe, dirs, True, g)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=2e-4, atol=2e-4),
        a, want,
    )


def test_per_ray_dirs_forward_matches_per_sample():
    """samples_per_ray: per-ray dirs + in-kernel broadcast must equal the
    per-sample path (exact one-hot contraction)."""
    import jax.numpy as jnp

    from ddnerf_tpu.kernels.fused_mlp import fused_mlp_forward

    _, params, ipe, _ = _setup(True, n=33 * 5)
    rng = np.random.default_rng(4)
    dirs_ray = jnp.asarray(rng.standard_normal((5, 27)).astype(np.float32))
    dirs_full = jnp.repeat(dirs_ray, 33, axis=0)
    a = fused_mlp_forward(
        params, ipe, dirs_full, depth_head=True, block_rows=66,
        compute_dtype=jnp.float32, interpret=True,
    )
    b = fused_mlp_forward(
        params, ipe, dirs_ray, depth_head=True,
        compute_dtype=jnp.float32, interpret=True,
        samples_per_ray=33, rays_per_block=2,
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_per_ray_dirs_backward_matches_autodiff():
    """Per-ray backward (incl. ray padding to rays_per_block) vs jax.grad
    of the jnp twin on the expanded dirs."""
    import jax.numpy as jnp

    _, params, ipe, _ = _setup(True, n=33 * 5)
    rng = np.random.default_rng(5)
    dirs_ray = jnp.asarray(rng.standard_normal((5, 27)).astype(np.float32))
    dirs_full = jnp.repeat(dirs_ray, 33, axis=0)
    g = jnp.asarray(rng.standard_normal((33 * 5, 6)).astype(np.float32))
    got = fused_mlp_backward(
        params, ipe, dirs_ray, g, depth_head=True,
        compute_dtype=jnp.float32, interpret=True,
        samples_per_ray=33, rays_per_block=4,  # 5 rays -> pads to 8
    )
    want = _ref_grads(params, ipe, dirs_full, True, g)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        got, want,
    )


def test_stash_forward_matches_plain():
    """stash=True must not change the forward output, and the stashed slabs
    must equal what the backward's recompute would produce."""
    from ddnerf_tpu.kernels.fused_mlp import fused_mlp_forward

    _, params, ipe, dirs = _setup(True, n=40)
    plain = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True,
    )
    out, acts = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, stash=True,
    )
    np.testing.assert_allclose(out, plain, rtol=1e-6, atol=1e-6)
    assert acts.shape[0] == 8 and acts.shape[2] == 256


def test_stash_backward_matches_recompute_exactly():
    """Stash-mode grads must be bit-comparable to recompute-mode grads:
    the recompute is the same bf16 ops on the same inputs."""
    from ddnerf_tpu.kernels.fused_mlp import fused_mlp_forward

    _, params, ipe, dirs = _setup(True, n=48)
    rng = np.random.default_rng(6)
    g = jnp.asarray(rng.standard_normal((48, 6)).astype(np.float32))
    _, acts = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, stash=True,
    )
    a = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, acts=acts,
    )
    b = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True,
    )
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-6),
        a, b,
    )


def test_stash_train_apply_gradients():
    """End-to-end custom_vjp with stash=True vs the f32 reference."""
    _, params, ipe, dirs = _setup(True, n=24)

    def loss_stash(p):
        out = fused_mlp_train_apply(p, ipe, dirs, True, True,
                                    jnp.float32, 0, True)
        return jnp.sum(out**2)

    def loss_ref(p):
        from ddnerf_tpu.kernels.fused_mlp import _reference_apply

        return jnp.sum(_reference_apply(p, ipe, dirs, True) ** 2)

    g_stash = jax.grad(loss_stash)(params)
    g_ref = jax.grad(loss_ref)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        g_stash, g_ref,
    )


def test_stash_composes_with_per_ray_dirs():
    """stash=True and samples_per_ray together: grads still match
    autodiff of the jnp twin (both features touch the same kernels)."""
    from ddnerf_tpu.kernels.fused_mlp import fused_mlp_forward

    _, params, ipe, _ = _setup(True, n=33 * 4)
    rng = np.random.default_rng(7)
    dirs_ray = jnp.asarray(rng.standard_normal((4, 27)).astype(np.float32))
    dirs_full = jnp.repeat(dirs_ray, 33, axis=0)
    g = jnp.asarray(rng.standard_normal((33 * 4, 6)).astype(np.float32))
    _, acts = fused_mlp_forward(
        params, ipe, dirs_ray, depth_head=True, compute_dtype=jnp.float32,
        interpret=True, stash=True, samples_per_ray=33, rays_per_block=2,
    )
    got = fused_mlp_backward(
        params, ipe, dirs_ray, g, depth_head=True,
        compute_dtype=jnp.float32, interpret=True, acts=acts,
        samples_per_ray=33, rays_per_block=2,
    )
    want = _ref_grads(params, ipe, dirs_full, True, g)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        got, want,
    )


def test_split_h_stash_forward_matches_combined():
    """split_h_stash=True must not change the forward output; the stash
    becomes a (trunk slabs, exact-width h slab) tuple whose contents equal
    the combined layout's first-lane values."""
    from ddnerf_tpu.kernels.fused_mlp import fused_mlp_forward

    _, params, ipe, dirs = _setup(True, n=40, hidden=256)
    out_c, acts_c = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, stash=True,
    )
    out_s, acts_s = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, stash=True,
        split_h_stash=True,
    )
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_c))
    trunk, h = acts_s
    dir_hidden = params["dir_0"]["kernel"].shape[1]
    assert trunk.shape == (acts_c.shape[0] - 1, acts_c.shape[1], 256)
    assert h.shape == (acts_c.shape[1], dir_hidden)
    np.testing.assert_array_equal(np.asarray(trunk), np.asarray(acts_c[:-1]))
    np.testing.assert_array_equal(
        np.asarray(h), np.asarray(acts_c[-1, :, :dir_hidden])
    )


def test_split_h_stash_backward_bit_identical():
    """The split layout stashes/reads the SAME values as the combined one,
    so gradients must be bitwise identical between the two stash layouts."""
    from ddnerf_tpu.kernels.fused_mlp import fused_mlp_forward

    _, params, ipe, dirs = _setup(True, n=48, hidden=256)
    rng = np.random.default_rng(17)
    g = jnp.asarray(rng.standard_normal((48, 6)).astype(np.float32))
    _, acts_c = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, stash=True,
    )
    _, acts_s = fused_mlp_forward(
        params, ipe, dirs, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, stash=True,
        split_h_stash=True,
    )
    a = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, acts=acts_c,
    )
    b = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=True, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, acts=acts_s,
    )
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)
        ),
        a, b,
    )


def test_split_h_stash_train_apply_matches_combined():
    """End-to-end custom_vjp on the production static set (bf16, per-ray
    dirs, stash): split vs combined layouts give bitwise-equal grads."""
    rng = np.random.default_rng(19)
    rays, s = 6, 7
    n = rays * s
    ipe = jnp.asarray(rng.standard_normal((n, 96)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((rays, 27)).astype(np.float32))
    module = DepthMipMLP(hidden_size=64)
    params = module.init(
        jax.random.PRNGKey(5), ipe, jnp.zeros((n, 27))
    )["params"]
    sg = jax.lax.stop_gradient

    def loss(p, split):
        out = fused_mlp_train_apply(
            p, sg(ipe), sg(dirs), True, True, jnp.bfloat16, s, True,
            0, True, False, False, split,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_combined = jax.grad(lambda p: loss(p, False))(params)
    g_split = jax.grad(lambda p: loss(p, True))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        g_combined, g_split,
    )


def test_block_rows_override_matches_default():
    """parallel.bwd_block_rows flows through fused_mlp_train_apply to BOTH
    directions (shared plan, so the stash shape stays consistent); a
    non-default block size must reproduce the default's gradients."""
    _, params, ipe, dirs = _setup(True, n=24)

    def loss(p, br):
        out = fused_mlp_train_apply(p, ipe, dirs, True, True,
                                    jnp.float32, 0, True, br)
        return jnp.sum(out**2)

    g_default = jax.grad(lambda p: loss(p, 0))(params)
    g_small = jax.grad(lambda p: loss(p, 256))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5),
        g_default, g_small,
    )

@pytest.mark.parametrize("stash", [False, True])
def test_ipe_transposed_backward_matches_row_major(stash):
    """fused_mlp_train_apply with feature-major IPE must produce the same
    gradients as the row-major path (wgrad contraction orientation flips
    between _mm_t and a standard matmul; interpret mode is exact)."""
    rng = np.random.default_rng(9)
    n = 48
    ipe = jnp.asarray(rng.standard_normal((n, 96)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((n, 27)).astype(np.float32))
    module = DepthMipMLP(hidden_size=64)
    params = module.init(jax.random.PRNGKey(1), ipe, dirs)["params"]
    sg = jax.lax.stop_gradient

    def loss(p, ipe_in, transposed):
        out = fused_mlp_train_apply(
            p, sg(ipe_in), sg(dirs), True, True, jnp.bfloat16, 0, stash,
            16, True, transposed,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_base = jax.grad(loss)(params, ipe, False)
    g_t = jax.grad(loss)(params, ipe.T, True)
    # The layer-0/skip wgrads contract the row dim in a different order
    # (standard matmul vs dim-0 contraction), so f32 accumulation may
    # reassociate — tight allclose instead of bitwise.
    for a, b in zip(jax.tree_util.tree_leaves(g_base),
                    jax.tree_util.tree_leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("depth_head", [False, True])
def test_alpha_vpu_backward_matches_autodiff(depth_head):
    """alpha_vpu moves fc_alpha's dot + both gradients off the MXU
    (broadcast multiply + reduces); every gradient must still track
    jax.grad of the jnp twin."""
    _, params, ipe, dirs = _setup(depth_head, n=40)
    out_dim = 6 if depth_head else 4
    rng = np.random.default_rng(11)
    g = jnp.asarray(rng.standard_normal((40, out_dim)).astype(np.float32))
    got = fused_mlp_backward(
        params, ipe, dirs, g, depth_head=depth_head, block_rows=16,
        compute_dtype=jnp.float32, interpret=True, alpha_vpu=True,
    )
    want = _ref_grads(params, ipe, dirs, depth_head, g)
    assert got["fc_alpha"]["kernel"].shape == want["fc_alpha"]["kernel"].shape
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        got, want,
    )


@pytest.mark.parametrize("stash", [False, True])
def test_alpha_vpu_train_apply_matches_default(stash):
    """The VPU alpha path's products are exact (K == 1 broadcast for the
    dgrad; f32 multiplies for the dots), so against the MXU path only the
    reduction order differs — gradients must agree tightly through the
    full custom_vjp in both stash modes."""
    _, params, ipe, dirs = _setup(True, n=24)
    sg = jax.lax.stop_gradient

    def loss(p, vpu):
        out = fused_mlp_train_apply(
            p, sg(ipe), sg(dirs), True, True, jnp.bfloat16, 0, stash,
            16, True, False, vpu,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_mxu = jax.grad(lambda p: loss(p, False))(params)
    g_vpu = jax.grad(lambda p: loss(p, True))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4),
        g_mxu, g_vpu,
    )


def test_alpha_vpu_composes_with_per_ray_dirs():
    """alpha_vpu + per-ray dirs + stash: the full production static set."""
    rng = np.random.default_rng(13)
    rays, s = 8, 6
    n = rays * s
    ipe = jnp.asarray(rng.standard_normal((n, 96)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((rays, 27)).astype(np.float32))
    module = DepthMipMLP(hidden_size=64)
    params = module.init(
        jax.random.PRNGKey(3), ipe, jnp.zeros((n, 27))
    )["params"]
    sg = jax.lax.stop_gradient

    def loss(p, vpu):
        out = fused_mlp_train_apply(
            p, sg(ipe), sg(dirs), True, True, jnp.bfloat16, s, True,
            0, True, False, vpu,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_mxu = jax.grad(lambda p: loss(p, False))(params)
    g_vpu = jax.grad(lambda p: loss(p, True))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4),
        g_mxu, g_vpu,
    )
