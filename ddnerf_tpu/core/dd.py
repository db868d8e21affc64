"""DDNeRF depth-distribution utilities: the KL "depth prediction" loss and
densified in-cell PDFs for depth-analysis plots.

TPU-native rewrite of ``/root/reference/models/dd_utils.py`` (the one *active*
loss — the six dead experimental variants in loss.py are deliberately not
carried over, SURVEY.md §2 #12) and the plotting PDFs
(``general_utils/math_utils.py:210-278``).

The reference filters zero-density rays with boolean masking that produces
dynamic shapes (dd_utils.py:16-28) — impossible under jit.  Here the loss is
computed for every ray with fixed shapes and the filter becomes a masked mean,
which is arithmetically identical: the torch path takes
``kl_div(reduction='mean')`` over ``N_kept × S`` elements and multiplies by
``S`` (models.py:288), i.e. the mean over kept rays of per-ray KL sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ddnerf_tpu.core.math import normal_cdf
from ddnerf_tpu.core.sampling import fetch_sections, interval_one_hot

_EPS = 1e-12


def estimate_dp_loss(
    t_vals_1,
    t_vals_0,
    pdf_1,
    pdf_0,
    mus_0,
    sigmas_0,
    left_tails_0,
    part_inside_cells_0,
    *,
    filter_empty_rays: bool,
    variant: str = "kl",
    fetch_precision: str = "highest",
):
    """KL divergence between the fine weight distribution and the coarse
    truncated-Gaussian depth distribution evaluated at the fine fenceposts
    (reference dd_utils.py:6-78).

    Args:
      t_vals_1: [N, M+1] fine fenceposts (stop-gradient upstream).
      t_vals_0: [N, S+1] coarse fenceposts.
      pdf_1: [N, M] fine weights (the supervision target, detached).
      pdf_0: [N, S] coarse weights (gradients flow into the coarse net).
      mus_0, sigmas_0: [N, S] section-space truncated-Gaussian params.
      left_tails_0, part_inside_cells_0: [N, S] truncation-normalizers
        (detached upstream, models.py:287-288).
      filter_empty_rays: blender/segmented mode — exclude rays whose fine
        weights sum below 1e-10 (dd_utils.py:12-28), as a mask not a reshape.

    Returns scalar: mean over (kept rays × fine sections) of
    ``pdf_1 * (log pdf_1 - log estimated_pdf_1)`` — the exact contract of
    ``torch.nn.functional.kl_div(reduction='mean')`` at dd_utils.py:76, which
    the caller multiplies by M (models.py:288).

    Deliberate fix vs the reference: the blender filter at dd_utils.py:22-28
    drops empty rows from every tensor *except* ``left_tails_0``, so the
    subsequent row-aligned gather (dd_utils.py:57) reads left tails from the
    wrong rays whenever any ray is empty.  The masked formulation here keeps
    all rows aligned, which is the intended semantics; parity with the torch
    code is exact when no ray is filtered.
    """
    keep = jnp.sum(pdf_1, axis=1) > 1e-10  # [N]

    pdf_0 = (pdf_0 + _EPS) / jnp.sum(pdf_0 + _EPS, axis=-1, keepdims=True)
    pdf_1 = (pdf_1 + _EPS) / jnp.sum(pdf_1 + _EPS, axis=-1, keepdims=True)

    # mu, sigma from section space to ray space (dd_utils.py:34-36)
    seg = t_vals_0[..., 1:] - t_vals_0[..., :-1]
    mus_ray = t_vals_0[..., :-1] + mus_0 * seg
    sigmas_ray = sigmas_0 * seg

    cdf = jnp.minimum(1.0, jnp.cumsum(pdf_0[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )  # [N, S+1]

    # Containing coarse section for each fine fencepost.  The reference uses
    # a strict ">" broadcast mask (dd_utils.py:43); the one-hot here comes
    # straight from that comparison (sampling.interval_one_hot) and all six
    # per-fencepost values are fetched in ONE [M+1, S] @ [S, 6] contraction —
    # TPU gathers are scalar addressing and dominated the step otherwise.
    oh = interval_one_hot(t_vals_1, t_vals_0, strict=True)  # [N, M+1, S]
    est_cdf, mus, sigmas, part_inside, left_tails, pdf_sec = fetch_sections(
        oh,
        cdf[..., :-1],  # cdf at the section's start fencepost
        mus_ray, sigmas_ray, part_inside_cells_0, left_tails_0, pdf_0,
        precision=fetch_precision,
    )

    x = (t_vals_1 - mus) / sigmas
    additional = ((normal_cdf(x) - left_tails) / part_inside) * pdf_sec
    est_cdf = jnp.minimum(est_cdf + additional, 1.0)

    est_pdf_1 = jnp.maximum(est_cdf[..., 1:] - est_cdf[..., :-1], 0.0)
    est_pdf_1 = (est_pdf_1 + _EPS) / jnp.sum(est_pdf_1 + _EPS, axis=-1, keepdims=True)

    tgt = jax.lax.stop_gradient(pdf_1)
    if variant == "kl":
        kl = tgt * (jnp.log(tgt) - jnp.log(est_pdf_1))  # [N, M]
    elif variant == "js":
        # Jensen-Shannon form from the reference's experimental v6 ``mse``
        # branch (loss.py:468-470): KL(m||target) + KL(m||estimate) with
        # m = (estimate + target)/2.
        m = (est_pdf_1 + tgt) / 2.0
        kl = m * (jnp.log(m) - jnp.log(tgt)) + m * (jnp.log(m) - jnp.log(est_pdf_1))
    else:
        raise ValueError(f"unknown dp loss variant {variant!r}")
    per_ray = jnp.mean(kl, axis=-1)

    if filter_empty_rays:
        count = jnp.maximum(jnp.sum(keep), 1)
        return jnp.sum(jnp.where(keep, per_ray, 0.0)) / count
    return jnp.mean(per_ray)


# --------------------------------------------------------------------------
# Densified PDFs for depth-analysis plots (math_utils.py:210-278)
# --------------------------------------------------------------------------


def uniform_incell_pdf(t_vals, weights, near, far, num_bins=1000):
    """Densify a per-section histogram into ``num_bins`` uniform cells
    (reference math_utils.py:210-233), vectorized over sections instead of a
    python loop — [N, S, B] broadcast then a section-axis reduction."""
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)  # [N, S]
    bins = jnp.linspace(near, far, num_bins)  # [B]

    start = t_vals[..., :-1, None]  # [N, S, 1]
    end = t_vals[..., 1:, None]
    relevant = (bins >= start) & (bins < end)  # [N, S, B]
    divided_by = jnp.maximum(jnp.sum(relevant, axis=-1, keepdims=True), 1)
    return jnp.sum(relevant * pdf[..., None] / divided_by, axis=-2)  # [N, B]


def gaussian_incell_pdf(
    t_vals, weights, mus, sigmas, part_inside_cells, near, far, num_bins=1000
):
    """Densify the truncated-Gaussian in-cell distribution onto ``num_bins``
    partitions (reference math_utils.py:236-278), vectorized."""
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)  # [N, S]

    seg = t_vals[..., 1:] - t_vals[..., :-1]
    mus_ray = t_vals[..., :-1] + mus * seg  # [N, S]
    sigmas_ray = sigmas * seg

    partitions = jnp.linspace(near, far, num_bins + 1)  # [B+1]
    x0 = partitions[:-1]  # [B]
    x1 = partitions[1:]

    start = t_vals[..., :-1, None]  # [N, S, 1]
    end = t_vals[..., 1:, None]
    relevant = (x0 >= start) & (x1 <= end)  # [N, S, B]

    z0 = (x0 - mus_ray[..., None]) / sigmas_ray[..., None]
    z1 = (x1 - mus_ray[..., None]) / sigmas_ray[..., None]
    cells_cdf = (normal_cdf(z1) - normal_cdf(z0)) / part_inside_cells[..., None]

    est = jnp.sum(relevant * cells_cdf * pdf[..., None], axis=-2)  # [N, B]

    # Fill zero cells with the mean of their neighbors (math_utils.py:274-276).
    left = jnp.roll(est, 1, axis=-1).at[..., 0].set(est[..., 0])
    right = jnp.roll(est, -1, axis=-1).at[..., -1].set(est[..., -1])
    return jnp.where(est == 0, (left + right) / 2.0, est)
