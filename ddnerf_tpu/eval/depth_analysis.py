"""Depth-analysis diagnostics: densified per-ray PDFs for annotated keypoint
rays (the reference's closest thing to a regression harness — SURVEY.md §4).

The reference computes these inside ``predict`` when
``depth_analysis_validation=True`` (models.py:309-319).  Here they are a
post-processing step over the pipeline's normal outputs (t_vals, weights,
mus, sigmas), keeping the hot path free of diagnostics.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.core import dd
from ddnerf_tpu.core.math import truncated_gaussian_tails
from ddnerf_tpu.models.nerf import NerfPipeline, RayBatch, ScheduleValues


def run_depth_analysis(
    cfg: Config,
    pipeline: NerfPipeline,
    params,
    da_origins,
    da_directions,
    da_radii,
    sched: ScheduleValues = None,
    rng=None,
) -> Dict[int, Dict[str, np.ndarray]]:
    """Render the (few) annotated rays and attach densified pdf curves:
    ``uniform_incell_pdf`` per cycle (math_utils.py:210-233) and, for DDNeRF,
    ``gaussian_incell_pdf`` + ``smoothed_gaussian_incell_pdf``
    (models.py:310-319)."""
    if sched is None:
        sched = ScheduleValues.for_eval(cfg)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    rays = RayBatch.create(
        jnp.asarray(np.asarray(da_origins, np.float32)),
        jnp.asarray(np.asarray(da_directions, np.float32)),
        jnp.asarray(np.asarray(da_radii, np.float32)),
        cfg.dataset.near,
        cfg.dataset.far,
    )
    out = pipeline.render_rays(params, rays, rng, sched, "validation")

    near, far = cfg.dataset.near, cfg.dataset.far
    result: Dict[int, Dict[str, np.ndarray]] = {}
    for i in (0, 1):
        result[i] = {k: np.asarray(v) for k, v in out[i].items()
                     if hasattr(v, "shape")}
        result[i]["uniform_incell_pdf"] = np.asarray(
            dd.uniform_incell_pdf(out[i]["t_vals"], out[i]["weights"], near, far)
        )

    if cfg.is_ddnerf():
        t0 = out[0]["t_vals"]
        w0 = out[0]["weights"]
        mus = out[0]["mus"]
        sigmas = out[0]["sigmas"]
        smoothed = out[0]["smoothed_sigmas"]
        _, pib = truncated_gaussian_tails(mus, sigmas)
        _, pib_s = truncated_gaussian_tails(mus, smoothed)
        result[1]["gaussian_incell_pdf"] = np.asarray(
            dd.gaussian_incell_pdf(t0, w0, mus, sigmas, pib, near, far)
        )
        result[1]["smoothed_gaussian_incell_pdf"] = np.asarray(
            dd.gaussian_incell_pdf(t0, w0, mus, smoothed, pib_s, near, far)
        )
    return result
