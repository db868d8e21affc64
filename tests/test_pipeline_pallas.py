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
