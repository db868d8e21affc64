"""Pipeline-level tests: MLP parity with the torch backbones, render output
shapes, and jit-ability of the full coarse→fine pass."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.models.mlp import DepthMipMLP, MipMLP
from ddnerf_tpu.models.nerf import NerfPipeline, RayBatch, ScheduleValues

from conftest import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)


def tiny_cfg(nerf_type="DDNerfModel"):
    return Config.from_dict(
        {
            "nerf": {
                "type": nerf_type,
                "coarse_hidden_size": 32,
                "fine_hidden_size": 32,
                "train": {"num_coarse": 6, "num_fine": 6, "num_random_rays": 16,
                          "radiance_field_noise_std": 0.0},
                "validation": {"num_coarse": 6, "num_fine": 6, "perturb": False,
                               "radiance_field_noise_std": 0.0},
            },
            "dataset": {"type": "blender", "near": 2.0, "far": 6.0},
        }
    ).resolved()


def make_rays(n=16, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.standard_normal((n, 3)).astype(np.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True) * 0.8  # non-unit norms
    radii = np.abs(rng.standard_normal((n, 1))).astype(np.float32) * 0.01
    return RayBatch.create(jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(radii), 2.0, 6.0)


# ------------------------------------------------------------ MLP parity


@requires_reference
@pytest.mark.parametrize("depth_head", [False, True])
def test_mlp_matches_torch_architecture(depth_head):
    """Same weights in -> same outputs out: validates layer graph, skip
    position, and head wiring against base_architectures.py."""
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    import models.base_architectures as ref_arch

    hidden = 32
    torch_model = (
        ref_arch.DepthMipNeRFModel if depth_head else ref_arch.MipNeRFModel
    )(hidden_size=hidden, include_input_dir=True, use_viewdirs=True)
    torch_model.eval()

    jax_model = (DepthMipMLP if depth_head else MipMLP)(hidden_size=hidden)

    rng = np.random.default_rng(0)
    ipe = rng.standard_normal((5, 96)).astype(np.float32)
    dirs = rng.standard_normal((5, 27)).astype(np.float32)

    params = jax_model.init(jax.random.PRNGKey(0), jnp.asarray(ipe), jnp.asarray(dirs))[
        "params"
    ]

    # Copy torch weights into the flax param tree.
    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    new_params = dict(params)
    for i in range(8):
        new_params[f"trunk_{i}"] = {
            "kernel": t2j(torch_model.layers_xyz[i].weight).T,
            "bias": t2j(torch_model.layers_xyz[i].bias),
        }
    new_params["fc_feat"] = {
        "kernel": t2j(torch_model.fc_feat.weight).T,
        "bias": t2j(torch_model.fc_feat.bias),
    }
    new_params["fc_alpha"] = {
        "kernel": t2j(torch_model.fc_alpha.weight).T,
        "bias": t2j(torch_model.fc_alpha.bias),
    }
    new_params["dir_0"] = {
        "kernel": t2j(torch_model.layers_dir[0].weight).T,
        "bias": t2j(torch_model.layers_dir[0].bias),
    }
    new_params["fc_rgb"] = {
        "kernel": t2j(torch_model.fc_rgb.weight).T,
        "bias": t2j(torch_model.fc_rgb.bias),
    }
    if depth_head:
        new_params["fc_mu_sigma"] = {
            "kernel": t2j(torch_model.fc_mu_sigma.weight).T,
            "bias": t2j(torch_model.fc_mu_sigma.bias),
        }

    out_jax = jax_model.apply({"params": new_params}, jnp.asarray(ipe), jnp.asarray(dirs))
    with torch.no_grad():
        x = torch.tensor(np.concatenate([ipe, dirs], axis=-1))
        out_torch = torch_model(x).numpy()
        if depth_head:
            # torch emits [rgb, alpha, mu, sigma]; ours matches that order.
            pass
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, rtol=1e-4, atol=1e-5)


def test_mlp_param_count_matches_reference_formula():
    """Trunk 8x(256), skip at 5, feat+alpha+dir+rgb heads: the DepthMipMLP
    adds exactly one 128->2 layer over MipMLP (base_architectures.py:99)."""
    m = MipMLP(hidden_size=256)
    d = DepthMipMLP(hidden_size=256)
    ipe = jnp.zeros((1, 96))
    dirs = jnp.zeros((1, 27))
    pm = m.init(jax.random.PRNGKey(0), ipe, dirs)["params"]
    pd = d.init(jax.random.PRNGKey(0), ipe, dirs)["params"]
    count = lambda p: sum(x.size for x in jax.tree_util.tree_leaves(p))
    assert count(pd) - count(pm) == 128 * 2 + 2


# ------------------------------------------------------- full pipeline


@pytest.mark.parametrize("nerf_type", ["GeneralMipNerfModel", "DDNerfModel"])
def test_render_rays_shapes(nerf_type):
    cfg = tiny_cfg(nerf_type)
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    rays = make_rays(16)
    sched = ScheduleValues.for_eval(cfg)
    out = pipe.render_rays(params, rays, jax.random.PRNGKey(1), sched, "train")

    for i in (0, 1):
        assert out[i]["rgb"].shape == (16, 3)
        assert out[i]["disp"].shape == (16,)
        assert out[i]["acc"].shape == (16,)
        assert out[i]["depth"].shape == (16,)
    assert out[0]["weights"].shape == (16, 6)  # num_coarse sections
    assert out[1]["weights"].shape == (16, 6)  # num_fine+1 fenceposts -> 6 sections

    if nerf_type == "DDNerfModel":
        assert out[0]["mus"].shape == (16, 6)
        assert np.isfinite(float(out[1]["dp_loss"]))
        assert out[0]["corrected_disp_map"].shape == (16,)


def test_render_rays_jit_and_grad():
    cfg = tiny_cfg("DDNerfModel")
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    rays = make_rays(8)
    sched = ScheduleValues.for_eval(cfg)
    target = jnp.zeros((8, 3))

    @jax.jit
    def loss_fn(params):
        out = pipe.render_rays(params, rays, jax.random.PRNGKey(1), sched, "train")
        return (
            jnp.mean((out[0]["rgb"] - target) ** 2)
            + jnp.mean((out[1]["rgb"] - target) ** 2)
            + 0.1 * out[1]["dp_loss"]
        )

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # dp_loss + rgb losses must touch both networks.
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_skip_fold_trunk0_exact():
    """SKIP_FOLD_TRUNK0 (off by default — measured slower on chip, kept as a
    documented variant) must stay exact vs the split-skip trunk: same param
    tree, forward and grads within f32 rounding."""
    from ddnerf_tpu.models import mlp as M

    ipe = jnp.asarray(np.random.RandomState(0).randn(8, 5, 96).astype(np.float32))
    dirs = jnp.asarray(np.random.RandomState(1).randn(8, 1, 27).astype(np.float32))
    model = DepthMipMLP()
    prev = M.SKIP_FOLD_TRUNK0
    try:
        M.SKIP_FOLD_TRUNK0 = False
        params = model.init(jax.random.PRNGKey(0), ipe, dirs)
        out = model.apply(params, ipe, dirs)
        grads = jax.grad(lambda p: jnp.sum(model.apply(p, ipe, dirs) ** 2))(params)
        M.SKIP_FOLD_TRUNK0 = True
        params_f = model.init(jax.random.PRNGKey(0), ipe, dirs)
        out_f = model.apply(params, ipe, dirs)
        grads_f = jax.grad(lambda p: jnp.sum(model.apply(p, ipe, dirs) ** 2))(params)
    finally:
        M.SKIP_FOLD_TRUNK0 = prev
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_f), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(grads_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_weights_from_alpha_custom_vjp():
    """The analytic composite adjoint (parallel.composite_custom_vjp) must
    match autodiff through the exclusive-cumprod chain: same forward bits,
    f32-tight gradients — including saturated alphas (transmittance
    underflow) and near-zero alphas."""
    from ddnerf_tpu.core.rendering import weights_from_alpha

    rng = np.random.RandomState(0)
    alpha = jnp.asarray(
        np.clip(rng.rand(16, 33).astype(np.float32), 1e-6, 1.0 - 1e-6)
    )
    # Edge rows: fully saturated (alpha == 1 -> divisor is exactly 1e-10)
    # and fully transparent.
    alpha = alpha.at[0].set(1.0).at[1].set(0.0)
    gw = jnp.asarray(rng.randn(16, 33).astype(np.float32))

    f_auto = lambda a: jnp.vdot(weights_from_alpha(a, analytic_vjp=False), gw)
    f_ana = lambda a: jnp.vdot(weights_from_alpha(a, analytic_vjp=True), gw)

    np.testing.assert_array_equal(
        np.asarray(weights_from_alpha(alpha, analytic_vjp=False)),
        np.asarray(weights_from_alpha(alpha, analytic_vjp=True)),
    )
    g_auto = np.asarray(jax.grad(f_auto)(alpha))
    g_ana = np.asarray(jax.grad(f_ana)(alpha))
    assert np.isfinite(g_ana).all()
    np.testing.assert_allclose(g_ana, g_auto, rtol=2e-5, atol=2e-5)


def test_weights_from_alpha_custom_vjp_jitted_saturation():
    """The analytic adjoint must stay finite under jax.jit at an INTERIOR
    exactly-saturated alpha (== 1.0 from exp underflow).

    Regression: under --xla_allow_excess_precision (forced on the TPU
    terminal), XLA reassociated the bare divisor ``1 - alpha + 1e-10`` to
    ``(1 + 1e-10) - alpha`` == exact 0 at alpha == 1, so the jitted
    backward produced 0/0 = NaN at the first saturated fine sample and
    killed a 5k-iter training run (eager grad and autodiff were clean,
    which is why the eager test above never caught it).  The divisor is
    now clamped with maximum(., 1e-10) — the identity whenever the guard
    survives compilation."""
    from ddnerf_tpu.core.rendering import weights_from_alpha

    rng = np.random.RandomState(1)
    alpha = jnp.asarray(
        np.clip(rng.rand(8, 32).astype(np.float32), 1e-6, 1.0 - 1e-6)
    )
    # Interior saturation with live samples after it — the observed
    # on-chip failure row (ray 279, sample 29 of 32).
    alpha = alpha.at[3, 29].set(1.0).at[3, 30].set(2e-6).at[3, 31].set(0.0)

    gw = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    f_auto = lambda a: jnp.vdot(weights_from_alpha(a, analytic_vjp=False), gw)
    f_ana = lambda a: jnp.vdot(weights_from_alpha(a, analytic_vjp=True), gw)

    g_ana = np.asarray(jax.jit(jax.grad(f_ana))(alpha))
    g_auto = np.asarray(jax.jit(jax.grad(f_auto))(alpha))
    assert np.isfinite(g_ana).all()
    np.testing.assert_allclose(g_ana, g_auto, rtol=2e-5, atol=2e-5)


def test_composite_custom_vjp_full_step_parity():
    """Flipping parallel.composite_custom_vjp must leave the full DDNeRF
    train gradients f32-tight (it only changes the adjoint's op order)."""
    cfg = tiny_cfg("DDNerfModel")
    cfg_v = cfg.replace_at("parallel.composite_custom_vjp", True)
    pipe, pipe_v = NerfPipeline(cfg), NerfPipeline(cfg_v)
    params = pipe.init_params(jax.random.PRNGKey(0))
    rays = make_rays(12)
    sched = ScheduleValues.for_eval(cfg)

    def loss(p, pp):
        out = pp.render_rays(p, rays, jax.random.PRNGKey(3), sched, "train")
        return (
            jnp.mean((out[0]["rgb"] - 0.5) ** 2)
            + jnp.mean((out[1]["rgb"] - 0.5) ** 2)
            + 0.1 * out[1]["dp_loss"]
        )

    g_a = jax.grad(lambda p: loss(p, pipe))(params)
    g_b = jax.grad(lambda p: loss(p, pipe_v))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
