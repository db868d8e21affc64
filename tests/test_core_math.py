"""Golden-parity tests for the pure math core against the torch reference.

The reference implementation at /root/reference is used strictly as an
oracle: identical inputs in, outputs compared to tolerance.  Each test also
has hand-computed sanity assertions so the suite still means something if the
reference is absent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.core import math as mmath
from ddnerf_tpu.core import rendering

from conftest import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)


@pytest.fixture(scope="module")
def ref():
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import general_utils.math_utils as ref_math
    import general_utils.nerf_helpers as ref_helpers
    import general_utils.volume_rendering_utils as ref_vr

    return ref_math, ref_helpers, ref_vr


def rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


# ----------------------------------------------------------------- cast_rays


@requires_reference
def test_cast_rays_parity(ref):
    import torch

    ref_math, _, _ = ref
    rng = np.random.default_rng(0)
    n, s = 4, 8
    t_vals = np.sort(rng.uniform(2.0, 6.0, (n, s + 1)).astype(np.float32), axis=-1)
    origins = rand(rng, n, 3)
    directions = rand(rng, n, 3)
    radii = np.abs(rand(rng, n, 1)) * 0.01

    for shape in ["cone", "cylinder"]:
        means_j, covs_j = mmath.cast_rays(
            jnp.asarray(t_vals), jnp.asarray(origins), jnp.asarray(directions),
            jnp.asarray(radii), ray_shape=shape,
        )
        means_t, covs_t = ref_math.cast_rays(
            torch.tensor(t_vals), torch.tensor(origins), torch.tensor(directions),
            torch.tensor(radii), ray_shape=shape,
        )
        np.testing.assert_allclose(means_j, means_t.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(covs_j, covs_t.numpy(), rtol=1e-5, atol=1e-5)


def test_cast_rays_shapes_and_midpoint():
    # A degenerate frustum (t0 == t1) collapses to a point at distance t0.
    t_vals = jnp.array([[2.0, 2.0]])
    origins = jnp.zeros((1, 3))
    directions = jnp.array([[0.0, 0.0, -1.0]])
    radii = jnp.full((1, 1), 0.01)
    means, covs = mmath.cast_rays(t_vals, origins, directions, radii)
    assert means.shape == (1, 1, 3)
    np.testing.assert_allclose(means[0, 0], [0.0, 0.0, -2.0], atol=1e-6)


# ----------------------------------------------------------------------- IPE


@requires_reference
def test_integrated_pos_enc_parity(ref):
    import torch

    ref_math, _, _ = ref
    rng = np.random.default_rng(1)
    x = rand(rng, 5, 7, 3)
    var = np.abs(rand(rng, 5, 7, 3)) * 0.1

    out_j = mmath.integrated_pos_enc((jnp.asarray(x), jnp.asarray(var)))
    out_t = ref_math.integrated_pos_enc((torch.tensor(x), torch.tensor(var)))
    assert out_j.shape == (5, 7, 96)
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-4, atol=1e-5)


def test_ipe_zero_variance_equals_plain_sin():
    # With zero variance the IPE degenerates to plain sin of scaled coords.
    x = jnp.array([[0.1, 0.2, 0.3]])
    var = jnp.zeros_like(x)
    out = mmath.integrated_pos_enc((x, var), max_deg=1)
    expect = jnp.concatenate([jnp.sin(x), jnp.sin(x + 0.5 * jnp.pi)], axis=-1)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_ipe_large_variance_shrinks_to_zero():
    x = jnp.array([[0.1, 0.2, 0.3]])
    var = jnp.full_like(x, 100.0)
    out = mmath.integrated_pos_enc((x, var), max_deg=1)
    np.testing.assert_allclose(out, jnp.zeros_like(out), atol=1e-6)


@requires_reference
def test_positional_encoding_parity(ref):
    import torch

    _, ref_helpers, _ = ref
    rng = np.random.default_rng(2)
    x = rand(rng, 11, 3)
    out_j = mmath.positional_encoding(jnp.asarray(x), num_freqs=4)
    out_t = ref_helpers.positional_encoding(torch.tensor(x), num_encoding_functions=4)
    assert out_j.shape == (11, 27)
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------- trig / erf


def test_safe_trig_large_args_finite():
    x = jnp.array([1e8, -1e8, 1e4, 0.5])
    assert np.all(np.isfinite(mmath.safe_sin(x)))
    assert np.all(np.isfinite(mmath.safe_cos(x)))


@requires_reference
def test_normal_cdf_parity(ref):
    import torch

    ref_math, _, _ = ref
    x = np.linspace(-4, 4, 101).astype(np.float32)
    np.testing.assert_allclose(
        mmath.normal_cdf(jnp.asarray(x)),
        ref_math.approximate_cdf(torch.tensor(x)).numpy(),
        rtol=1e-5, atol=1e-6,
    )
    u = np.linspace(0.01, 0.99, 51).astype(np.float32)
    np.testing.assert_allclose(
        mmath.normal_inverse_cdf(jnp.asarray(u)),
        ref_math.approximate_inverse_cdf(torch.tensor(u)).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_cdf_inverse_roundtrip():
    u = jnp.linspace(0.05, 0.95, 19)
    np.testing.assert_allclose(
        mmath.normal_cdf(mmath.normal_inverse_cdf(u)), u, atol=1e-5
    )


# ------------------------------------------------------------ volume render


@requires_reference
@pytest.mark.parametrize("white_background", [False, True])
@pytest.mark.parametrize("eps_mask", [False, True])
def test_volume_render_parity(ref, white_background, eps_mask):
    import torch

    ref_math, _, ref_vr = ref
    rng = np.random.default_rng(3)
    n, s = 6, 9
    raw = rand(rng, n, s, 4)
    t_vals = np.sort(rng.uniform(2.0, 6.0, (n, s + 1)).astype(np.float32), axis=-1)
    rd = rand(rng, n, 3)
    mus = 1.0 / (1.0 + np.exp(-rand(rng, n, s)))

    class _C:  # minimal duck-typed cfg for the reference renderer
        class dataset:
            type = "blender" if eps_mask else "llff"
            basedir = "x"

    out_t = ref_vr.volume_render_radiance_field(
        torch.tensor(raw), torch.tensor(t_vals), torch.tensor(rd),
        radiance_field_noise_std=0.0, white_background=white_background,
        mus=torch.tensor(mus), cfg=_C,
    )
    out_j = rendering.volume_render(
        jnp.asarray(raw[..., :3]), jnp.asarray(raw[..., 3]), jnp.asarray(t_vals),
        jnp.asarray(rd), noise_std=0.0, white_background=white_background,
        mus=jnp.asarray(mus), eps_mask_pdf=eps_mask,
    )
    names = ["rgb", "disp", "acc", "weights", "depth", "corrected_disp"]
    for name, t in zip(names, out_t[:6]):
        j = getattr(out_j, name)
        np.testing.assert_allclose(
            j, t.numpy(), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_volume_render_opaque_wall():
    # A single fully-opaque section at depth 3 -> depth map ~= its midpoint.
    n, s = 1, 4
    t_vals = jnp.linspace(2.0, 6.0, s + 1)[None]
    raw_rgb = jnp.zeros((n, s, 3))
    raw_density = jnp.array([[-100.0, 100.0, -100.0, -100.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    out = rendering.volume_render(raw_rgb, raw_density, t_vals, rd)
    np.testing.assert_allclose(out.depth[0], 3.5, atol=0.05)
    np.testing.assert_allclose(out.acc[0], 1.0, atol=1e-3)


def test_cumprod_exclusive():
    x = jnp.array([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(
        rendering.cumprod_exclusive(x), jnp.array([[1.0, 2.0, 6.0]])
    )


# ----------------------------------------------------------------- metrics


def test_mse2psnr():
    np.testing.assert_allclose(mmath.mse2psnr(jnp.asarray(0.01)), 20.0, atol=1e-4)


@requires_reference
def test_bins_for_percentage_parity(ref):
    import torch

    ref_math, _, _ = ref
    rng = np.random.default_rng(4)
    w = np.abs(rand(rng, 5, 16)) + 1e-3
    np.testing.assert_array_equal(
        np.asarray(mmath.bins_for_percentage(jnp.asarray(w), 0.9)),
        ref_math.bins_for_percentage(torch.tensor(w), 0.9).numpy(),
    )


def test_ipe_double_angle_matches_direct():
    """The double-angle recurrence (IPE_DOUBLE_ANGLE) must agree with the
    direct per-degree evaluation far below bf16 resolution over the scene
    coordinate range; the torch-oracle parity test above covers the direct
    path's absolute correctness."""
    rng = np.random.default_rng(7)
    x = rng.uniform(-6.0, 6.0, (64, 9, 3)).astype(np.float32)
    var = np.abs(rng.normal(0.0, 0.05, (64, 9, 3))).astype(np.float32)
    prev = mmath.IPE_DOUBLE_ANGLE
    try:
        mmath.IPE_DOUBLE_ANGLE = False
        direct = np.asarray(mmath.integrated_pos_enc((jnp.asarray(x), jnp.asarray(var))))
        mmath.IPE_DOUBLE_ANGLE = True
        rec = np.asarray(mmath.integrated_pos_enc((jnp.asarray(x), jnp.asarray(var))))
    finally:
        mmath.IPE_DOUBLE_ANGLE = prev
    assert np.max(np.abs(direct - rec)) < 2e-4  # bf16 eps is 3.9e-3

def test_ipe_one_concat_bit_identical():
    """IPE_ONE_CONCAT (the measured-negative single-concatenate assembly,
    see core/math.py) must stay bit-identical to the shipped stack+reshape
    layout so the A/B switch measures pure memory layout, never values."""
    rng = np.random.default_rng(11)
    x = rng.uniform(-6.0, 6.0, (33, 3)).astype(np.float32)
    var = np.abs(rng.normal(0.0, 0.05, (33, 3))).astype(np.float32)
    prev = mmath.IPE_ONE_CONCAT
    try:
        mmath.IPE_ONE_CONCAT = False
        a = np.asarray(mmath._ipe_double_angle(jnp.asarray(x), jnp.asarray(var), 0, 16))
        mmath.IPE_ONE_CONCAT = True
        b = np.asarray(mmath._ipe_double_angle(jnp.asarray(x), jnp.asarray(var), 0, 16))
    finally:
        mmath.IPE_ONE_CONCAT = prev
    np.testing.assert_array_equal(a, b)

def test_integrated_pos_enc_t_is_exact_transpose():
    """integrated_pos_enc_t (the fused kernels' feature-major input) must
    equal integrated_pos_enc(...).T bit-for-bit on both sin/cos paths."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.uniform(-6, 6, (37, 3)).astype(np.float32))
    v = jnp.asarray(np.abs(rng.normal(0, 0.05, (37, 3))).astype(np.float32))
    for da in (True, False):
        a = mmath.integrated_pos_enc((x, v), double_angle=da)
        b = mmath.integrated_pos_enc_t((x, v), double_angle=da)
        np.testing.assert_array_equal(np.asarray(a).T, np.asarray(b))


def test_ipe_early_cast_bit_identical():
    """integrated_pos_enc(out_dtype=bf16) must equal
    integrated_pos_enc().astype(bf16) bit-for-bit on both sin/cos paths:
    the per-degree cast commutes with the stack/reshape/concat assembly."""
    import jax.numpy as jnp

    from ddnerf_tpu.core import math as m

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-4, 4, (37, 3)).astype(np.float32))
    v = jnp.asarray(rng.uniform(1e-6, 0.5, (37, 3)).astype(np.float32))
    for da in (True, False):
        late = m.integrated_pos_enc((x, v), double_angle=da).astype(
            jnp.bfloat16
        )
        early = m.integrated_pos_enc((x, v), double_angle=da,
                                     out_dtype=jnp.bfloat16)
        assert early.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(early, np.float32),
                                      np.asarray(late, np.float32))
        # Same contract for the feature-major form (ipe_transposed path).
        late_t = m.integrated_pos_enc_t((x, v), double_angle=da).astype(
            jnp.bfloat16
        )
        early_t = m.integrated_pos_enc_t((x, v), double_angle=da,
                                         out_dtype=jnp.bfloat16)
        assert early_t.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(early_t, np.float32),
                                      np.asarray(late_t, np.float32))


def test_integrated_pos_enc_fused_matches_direct():
    """integrated_pos_enc_fused (concat-free single-fusion assembly) must
    equal the direct path elementwise — same multiply/phase/exp/safe_sin
    per feature in the same (half, l, dim) order (values identical; the
    sin half's literal +0.0 phase may rewrite -0.0 to +0.0, which still
    compares equal)."""
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.uniform(-6, 6, (41, 3)).astype(np.float32))
    v = jnp.asarray(np.abs(rng.normal(0, 0.05, (41, 3))).astype(np.float32))
    direct = mmath.integrated_pos_enc((x, v), double_angle=False)
    fused = mmath.integrated_pos_enc_fused((x, v))
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(fused))
    # out_dtype folds the cast into the same fusion, bit-identically.
    fused_b = mmath.integrated_pos_enc_fused((x, v), out_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(fused_b, np.float32),
        np.asarray(direct.astype(jnp.bfloat16), np.float32))
