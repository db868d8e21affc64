"""Edge-case sampler tests: combined (uniform+log) 360 sampling, single-bin
resampling, and renderer chunk-padding invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.core import sampling
from ddnerf_tpu.core import math as mmath

from conftest import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)


def test_combined_samples_structure():
    """Half the fenceposts uniform in [near, split], half log-spaced in
    [split, far] (reference samplers.py:6-27)."""
    near = jnp.full((4, 1), 1.0)
    far = jnp.full((4, 1), 14.0)
    t = sampling.sample_first_cycle(
        jax.random.PRNGKey(0), near, far, 16, perturb=False,
        combined=True, combined_near=1.0, combined_split=2.0,
    )
    t = np.asarray(t)
    assert t.shape == (4, 17)
    np.testing.assert_allclose(t[:, 0], 1.0, atol=1e-6)
    # First half: uniform spacing in [near=1, split=2].
    np.testing.assert_allclose(np.diff(t[0, :9]), 0.125, atol=1e-5)
    assert t[0, 8] == pytest.approx(2.0, abs=1e-5)
    # Second half: increasing toward far.
    second = t[0, 8:]
    assert (np.diff(second) > 0).all()
    assert second[-1] == pytest.approx(14.0, rel=1e-5)


@requires_reference
def test_combined_samples_parity():
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    import models.samplers as ref_samplers
    from general_utils.cfgnode import CfgNode

    cfg = CfgNode(
        {
            "nerf": {"train": {"num_coarse": 16}},
            "dataset": {"near": 1.0, "combined_split": 2.0},
        }
    )
    near = torch.full((4, 1), 1.0)
    far = torch.full((4, 1), 14.0)
    out_ref = ref_samplers.get_combined_samples(cfg, near, far, "train").numpy()

    out = sampling.combined_samples(
        16, jnp.full((4, 1), 1.0), jnp.full((4, 1), 14.0), 1.0, 2.0
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-5, atol=1e-5)


def test_mu_sigma_single_bin_case():
    """bins.shape[-1] == 2: the special single-coarse-section branch
    (reference samplers.py:185-190)."""
    bins = jnp.asarray([[2.0, 6.0], [2.0, 6.0]])
    weights = jnp.ones((2, 1))
    mus = jnp.full((2, 1), 0.5)
    sigmas = jnp.full((2, 1), 0.2)
    lt, pib = mmath.truncated_gaussian_tails(mus, sigmas)
    out = sampling.sample_pdf_with_mu_sigma(
        jax.random.PRNGKey(0), bins, weights, mus, sigmas, pib, lt, 9,
        near=2.0, far=6.0, pdf_padding=jnp.asarray(True), det=True,
    )
    out = np.asarray(out)
    assert out.shape == (2, 9)
    np.testing.assert_allclose(out[:, 0], 2.0)
    np.testing.assert_allclose(out[:, -1], 6.0)
    assert (np.diff(out, axis=-1) >= 0).all()
    # Samples concentrate around mu=0.5 of the section -> near 4.0.
    assert 3.0 < np.median(out) < 5.0


def test_renderer_chunk_padding_invariance():
    """Rendering N rays must give identical results for any chunk size
    (pad rays must not leak)."""
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.render.renderer import ImageRenderer
    from test_pipeline import make_rays, tiny_cfg

    cfg = tiny_cfg("DDNerfModel")
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    rays = make_rays(20)

    outs = []
    for chunk in (7, 64):
        c = cfg.replace_at("nerf.validation.chunksize", chunk)
        r = ImageRenderer(c, pipe)
        outs.append(
            r.render_flat(params, np.asarray(rays.origins),
                          np.asarray(rays.directions), np.asarray(rays.radii))
        )
    for key in ("rgb", "disp", "depth"):
        np.testing.assert_allclose(
            outs[0][1][key], outs[1][1][key], rtol=1e-4, atol=1e-5,
            err_msg=key,
        )
