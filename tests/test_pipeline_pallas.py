"""Pipeline with the fused Pallas MLP enabled (interpret mode on CPU) must
match the plain-XLA pipeline."""

import numpy as np
import pytest

import jax

from ddnerf_tpu.config import Config
from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues

from test_pipeline import make_rays, tiny_cfg


@pytest.mark.parametrize("nerf_type", ["GeneralMipNerfModel", "DDNerfModel"])
def test_pallas_pipeline_matches_xla(nerf_type):
    cfg = tiny_cfg(nerf_type)
    # float32 compute so the comparison is tight.
    cfg = cfg.replace_at("parallel.compute_dtype", "float32")
    rays = make_rays(8)
    sched = ScheduleValues.for_eval(cfg)

    pipe_xla = NerfPipeline(cfg)
    params = pipe_xla.init_params(jax.random.PRNGKey(0))
    out_xla = pipe_xla.render_rays(params, rays, jax.random.PRNGKey(1), sched,
                                   "validation")

    pipe_pallas = NerfPipeline(cfg.replace_at("parallel.use_pallas_mlp", True))
    out_pallas = pipe_pallas.render_rays(params, rays, jax.random.PRNGKey(1),
                                         sched, "validation")

    for i in (0, 1):
        for key in ("rgb", "disp", "depth", "weights"):
            np.testing.assert_allclose(
                np.asarray(out_pallas[i][key]), np.asarray(out_xla[i][key]),
                rtol=2e-3, atol=2e-3, err_msg=f"cycle {i} {key}",
            )


@pytest.mark.parametrize("nerf_type", ["GeneralMipNerfModel", "DDNerfModel"])
def test_train_policy_gradients_match_xla(nerf_type):
    """pallas_mlp="train": full train-loss gradients through the fused
    Pallas backward kernel (interpret mode on CPU) must match the XLA path.

    f32 compute so the only differences are summation order inside the
    kernels."""
    import jax.numpy as jnp

    from ddnerf_tpu.train.step import compute_loss, schedule_values

    cfg = tiny_cfg(nerf_type).replace_at("parallel.compute_dtype", "float32")
    rays = make_rays(8)
    target = jax.random.uniform(jax.random.PRNGKey(7), (8, 3))
    sched = schedule_values(cfg, 10)
    rng = jax.random.PRNGKey(3)

    pipe_xla = NerfPipeline(cfg)
    params = pipe_xla.init_params(jax.random.PRNGKey(0))

    def grads_for(pipe):
        def loss_fn(p):
            loss, _ = compute_loss(pipe.cfg, pipe, p, rays, target, rng, sched)
            return loss

        return jax.grad(loss_fn)(params)

    g_xla = grads_for(pipe_xla)
    g_pallas = grads_for(
        NerfPipeline(cfg.replace_at("parallel.pallas_mlp", "train"))
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            rtol=5e-3, atol=5e-5 * max(1.0, float(jnp.abs(b).max())),
        ),
        g_pallas, g_xla,
    )


@pytest.mark.parametrize("nerf_type", ["GeneralMipNerfModel", "DDNerfModel"])
def test_render_kernel_mlp_variant_matches_xla(nerf_type):
    """The fused_mlp-based render variant (_RENDER_KERNEL_VARIANT="mlp")
    must match the XLA pipeline."""
    import ddnerf_tpu.models.nerf as nerf_mod

    cfg = tiny_cfg(nerf_type).replace_at("parallel.compute_dtype", "float32")
    rays = make_rays(8)
    sched = ScheduleValues.for_eval(cfg)

    pipe_xla = NerfPipeline(cfg)
    params = pipe_xla.init_params(jax.random.PRNGKey(0))
    out_xla = pipe_xla.render_rays(params, rays, jax.random.PRNGKey(1),
                                   sched, "validation")

    old = nerf_mod._RENDER_KERNEL_VARIANT
    nerf_mod._RENDER_KERNEL_VARIANT = "mlp"
    try:
        pipe_k = NerfPipeline(cfg.replace_at("parallel.use_pallas_mlp", True))
        out_k = pipe_k.render_rays(params, rays, jax.random.PRNGKey(1),
                                   sched, "validation")
    finally:
        nerf_mod._RENDER_KERNEL_VARIANT = old

    for i in (0, 1):
        for key in ("rgb", "disp", "depth", "weights"):
            np.testing.assert_allclose(
                np.asarray(out_k[i][key]), np.asarray(out_xla[i][key]),
                rtol=2e-3, atol=2e-3, err_msg=f"cycle {i} {key}",
            )

@pytest.mark.parametrize("nerf_type", ["GeneralMipNerfModel", "DDNerfModel"])
def test_render_kernel_ipe2_variant_matches_xla(nerf_type):
    """The in-kernel-IPE render variant (render_kernel_variant="ipe2",
    fused_enc_mlp_forward) must match the XLA pipeline; the direct-form
    in-kernel IPE differs from the shipped double-angle recurrence only by
    float rounding far below the 2e-3 tolerance."""
    import ddnerf_tpu.models.nerf as nerf_mod

    cfg = tiny_cfg(nerf_type).replace_at("parallel.compute_dtype", "float32")
    rays = make_rays(8)
    sched = ScheduleValues.for_eval(cfg)

    pipe_xla = NerfPipeline(cfg)
    params = pipe_xla.init_params(jax.random.PRNGKey(0))
    out_xla = pipe_xla.render_rays(params, rays, jax.random.PRNGKey(1),
                                   sched, "validation")

    old = nerf_mod._RENDER_KERNEL_VARIANT
    nerf_mod._RENDER_KERNEL_VARIANT = "ipe2"
    try:
        pipe_k = NerfPipeline(cfg.replace_at("parallel.use_pallas_mlp", True))
        out_k = pipe_k.render_rays(params, rays, jax.random.PRNGKey(1),
                                   sched, "validation")
    finally:
        nerf_mod._RENDER_KERNEL_VARIANT = old

    for i in (0, 1):
        for key in ("rgb", "disp", "depth", "weights"):
            np.testing.assert_allclose(
                np.asarray(out_k[i][key]), np.asarray(out_xla[i][key]),
                rtol=2e-3, atol=2e-3, err_msg=f"cycle {i} {key}",
            )


def test_render_block_rows_is_blocking_only():
    """parallel.render_block_rows re-tiles the forward-only render kernel
    (rays_per_block = rows // samples, plan_blocks) without touching the
    math: per-row outputs are row-independent, so any block size must
    reproduce the default bit-for-bit."""
    import ddnerf_tpu.models.nerf as nerf_mod

    cfg = (tiny_cfg("DDNerfModel")
           .replace_at("parallel.compute_dtype", "float32")
           .replace_at("parallel.use_pallas_mlp", True))
    rays = make_rays(8)
    sched = ScheduleValues.for_eval(cfg)

    old = nerf_mod._RENDER_KERNEL_VARIANT
    nerf_mod._RENDER_KERNEL_VARIANT = "mlp"
    try:
        pipe = NerfPipeline(cfg)
        params = pipe.init_params(jax.random.PRNGKey(0))
        out = pipe.render_rays(params, rays, jax.random.PRNGKey(1), sched,
                               "validation")
        pipe_b = NerfPipeline(cfg.replace_at("parallel.render_block_rows", 64))
        out_b = pipe_b.render_rays(params, rays, jax.random.PRNGKey(1), sched,
                                   "validation")
    finally:
        nerf_mod._RENDER_KERNEL_VARIANT = old

    for i in (0, 1):
        for key in ("rgb", "disp", "depth", "weights"):
            np.testing.assert_array_equal(
                np.asarray(out_b[i][key]), np.asarray(out[i][key]),
                err_msg=f"cycle {i} {key}",
            )


def test_train_policy_ipe_transposed_matches_row_major():
    """parallel.ipe_transposed=True (feature-major kernel IPE, see
    core/math.integrated_pos_enc_t) must reproduce the row-major fused
    train path's full train-loss gradients through the pipeline."""
    import jax.numpy as jnp

    from ddnerf_tpu.train.step import compute_loss, schedule_values

    cfg = (tiny_cfg("DDNerfModel")
           .replace_at("parallel.compute_dtype", "float32")
           .replace_at("parallel.pallas_mlp", "train"))
    rays = make_rays(8)
    target = jax.random.uniform(jax.random.PRNGKey(7), (8, 3))
    sched = schedule_values(cfg, 10)
    rng = jax.random.PRNGKey(3)

    def grads_for(pipe):
        params = pipe.init_params(jax.random.PRNGKey(0))

        def loss_fn(p):
            loss, _ = compute_loss(pipe.cfg, pipe, p, rays, target, rng, sched)
            return loss

        return jax.grad(loss_fn)(params)

    g_base = grads_for(NerfPipeline(cfg))
    g_t = grads_for(NerfPipeline(cfg.replace_at("parallel.ipe_transposed", True)))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            rtol=1e-5, atol=1e-6 * max(1.0, float(jnp.abs(b).max())),
        ),
        g_t, g_base,
    )
