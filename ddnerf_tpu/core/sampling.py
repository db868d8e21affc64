"""Ray-section samplers: stratified, PDF, and truncated-Gaussian PDF.

TPU-native rewrite of ``/root/reference/models/samplers.py``.  Differences
from the reference that matter for TPU/XLA:

* The reference locates CDF intervals with an O(S·M)-memory broadcast-mask
  ``find_interval`` trick (samplers.py:106-119).  Here the interval index is
  computed with one masked *count* reduction (``sum(u >= cdf) - 1``) and the
  per-interval quantities are fetched with ``take_along_axis`` — same result
  (both exploit that the CDF is sorted), one [.., S+1, M] boolean instead of
  four, and single-pass gathers that XLA lowers to cheap dynamic-slices.
* ``pdf_padding`` flips from True to False mid-training
  (train_model.py:140-142).  It enters here as a *traced* boolean so the flip
  does not trigger recompilation; both padding variants are a handful of VPU
  ops, so computing both and selecting is free.
* Randomness is explicit ``jax.random`` keys instead of global torch RNG.
* No ``torch.nn.Parameter`` wrapping of samples (samplers.py:121,215) — a
  gradient-irrelevant quirk deliberately dropped (SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ddnerf_tpu.core import math as mmath


# --------------------------------------------------------------------------
# First-cycle (coarse) sampling — reference samplers.py:6-62
# --------------------------------------------------------------------------


def combined_samples(num_coarse, near, far, combined_near, combined_split):
    """Half-uniform-then-log section spacing for unbounded 360 scenes
    (reference samplers.py:6-27).  ``near``/``far``: [N, 1] per-ray bounds;
    ``combined_near``/``combined_split``: dataset-level scalars."""
    t = jnp.linspace(0.0, 1.0, num_coarse // 2 + 1, dtype=near.dtype)
    t_uniform = combined_near * (1.0 - t) + combined_split * t

    min_d = combined_split
    # Combined sampling treats ``far`` as a single scene-wide bound (every
    # current config sets dataset-level near/far, so all rows are equal; the
    # reference reads cfg.dataset.far the same way, samplers.py:17).  If a
    # dataset ever carries per-ray far values this produces one shared grid
    # from row 0 — checked where the batch is built (models/nerf.py uses the
    # RayBatch scalar bounds, which cannot vary per ray).
    max_d = far[0, 0] if far.ndim == 2 else far.reshape(-1)[0]
    d_i = min_d * (1.0 - t) + max_d * t
    t_nonuniform = min_d + jnp.sort(
        1.0 - (jnp.log2(d_i - min_d + 1.0) / jnp.log2(max_d - min_d + 1.0))
    ) * (max_d - min_d)

    t_vals = jnp.concatenate([t_uniform, t_nonuniform[1:]])
    return jnp.broadcast_to(t_vals, near.shape[:-1] + (num_coarse + 1,))


def sample_first_cycle(
    rng,
    near,
    far,
    num_coarse,
    *,
    lindisp=False,
    perturb=True,
    combined=False,
    combined_near=None,
    combined_split=None,
):
    """Coarse fenceposts: linspace in depth (or disparity), optionally
    stratified-perturbed with the endpoints pinned to near/far
    (reference samplers.py:30-62).

    ``near``/``far``: [N, 1].  Returns t_vals [N, num_coarse+1].
    """
    t = jnp.linspace(0.0, 1.0, num_coarse + 1, dtype=near.dtype)
    if lindisp:
        t_vals = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        t_vals = near * (1.0 - t) + far * t

    if combined:
        t_vals = combined_samples(num_coarse, near, far, combined_near, combined_split)

    if perturb:
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        upper = jnp.concatenate([mids, t_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([t_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(rng, t_vals.shape, dtype=t_vals.dtype)
        t_vals = lower + (upper - lower) * t_rand
        t_vals = t_vals.at[..., 0].set(near[..., 0])
        t_vals = t_vals.at[..., -1].set(far[..., 0])

    return t_vals


# --------------------------------------------------------------------------
# Weight blur / padding — shared prologue of both resamplers
# (reference samplers.py:69-86 and 130-146)
# --------------------------------------------------------------------------


def _blur_and_pad_weights(weights, pdf_padding):
    """mip-NeRF weight filter.  ``pdf_padding`` is a traced bool: True ->
    maxpool+0.5 blur + 0.01 pad; False -> 0.8/0.1/0.1 neighbor mix + 0.01."""
    weights_pad = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], axis=-1
    )
    weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
    weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])

    prev = weights_pad[..., :-2]
    nxt = weights_pad[..., 2:]
    mixed = 0.8 * weights + 0.1 * prev + 0.1 * nxt

    return jnp.where(pdf_padding, weights_blur, mixed) + 0.01


def _build_cdf(weights):
    """PDF-normalize and build the S+1 CDF fenceposts [0, ..., 1]
    (reference samplers.py:87-91)."""
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    return jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )


def _interval_index(u, cdf):
    """Index of the CDF interval containing each u.

    Equivalent to the reference's broadcast-mask ``find_interval``
    (samplers.py:106-119): because ``cdf`` is sorted, the interval is
    ``(#fenceposts <= u) - 1``.  Returns int32 [..., M] in [0, S-1].
    """
    num_bins = cdf.shape[-1] - 1
    mask = u[..., None, :] >= cdf[..., :, None]  # [..., S+1, M]
    ind = jnp.sum(mask, axis=-2, dtype=jnp.int32) - 1
    return jnp.clip(ind, 0, num_bins - 1)


def _one_hot_of(ind, depth):
    """[..., M] int32 -> [..., M, depth] f32 selection matrix.

    Per-sample section values are fetched with one-hot contractions
    (``einsum('...ms,...s->...m', one_hot(ind), x)``) instead of
    ``take_along_axis``: TPU gathers are effectively scalar addressing and
    measured as the dominant cost of the resampler + dp loss (~40% of an
    eval step), while with S ≈ 33 the dense contraction is cheap VPU/MXU
    work — the same insight behind the reference's broadcast-mask
    ``find_interval`` (samplers.py:106-119), which never gathers either.
    The one-hot matrix is built once per call site and shared across all
    fetched arrays.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, ind.shape + (depth,), ind.ndim)
    return (ind[..., None] == iota).astype(jnp.float32)


def _take(x, ind):
    """Single-array gather (host-side / tiny shapes)."""
    return jnp.take_along_axis(x, ind, axis=-1)


def interval_one_hot(x, fences, strict=False):
    """f32 one-hot [..., M, S] of ``clip(interval_index(x), 0, S-1)`` over
    sorted ``fences`` [..., S+1] — built straight from the comparison mask,
    with no integer indices at all.

    Because the fences are sorted, the comparison row
    ``c_s = (x >= fences_s)`` is a decreasing 0/1 sequence, and the one-hot
    of the clipped interval index is exactly its adjacent difference with the
    ends pinned: ``oh_0 = 1 - c_1``, ``oh_s = c_s - c_{s+1}``,
    ``oh_{S-1} = c_{S-1}``.  Compared to the earlier
    mask -> int32-sum -> iota-compare pipeline this skips the integer
    reduction, the iota equality, the clip, and the roll — it is one
    comparison against the *inner* fences plus a subtract, and the
    coefficients stay exactly 0/1 (no float error).

    ``strict`` selects ``>`` (the dp-loss convention, dd_utils.py:43) vs
    ``>=`` (the CDF inverse convention, samplers.py:106-119).  Both clip the
    index into [0, S-1] like the reference.
    """
    inner = fences[..., None, 1:-1]  # the S-1 interior fenceposts
    c = (x[..., :, None] > inner) if strict else (x[..., :, None] >= inner)
    c = c.astype(fences.dtype)
    edge = jnp.ones_like(c[..., :1])
    left = jnp.concatenate([edge, c], axis=-1)
    right = jnp.concatenate([c, jnp.zeros_like(edge)], axis=-1)
    return left - right


# Trace-time override of the fetch_sections precision (None = follow the
# ``precision`` argument, which production threads from
# ``cfg.parallel.fetch_precision``).  Semantics of the three values:
#
# * "mixed" (production default): per-operand (DEFAULT, HIGHEST) — the 0/1
#   one-hot lhs is exactly representable in one bf16 pass, so only the
#   values rhs is 3-split.  Gather-EXACT (verified 0 ulp on v5e vs a real
#   gather at production shapes) at the same 3-pass MXU cost as "high"
#   (speed-tied on chip: 476.5k vs 476.4k rays/s median).
#
# * "highest": 6-pass bf16x6 decomposition — full f32-mantissa passthrough,
#   bit-identical to a gather for exact 0/1 one-hot rows.  The safe default:
#   the default TPU matmul precision is plain bf16, which quantizes the
#   fetched CDF values so u - cdf_g0 can flip sign and NaN the
#   truncated-Gaussian inverse CDF (observed: training diverged at ~1k
#   iters on v5e).
# * "high": 3-pass bf16x3 decomposition, ~2x cheaper on the MXU.  NOT exact
#   — measured on v5e: the flagship warm-step loss moves by ~1.5e-7
#   relative, i.e. the fetched values carry a ~2^-16 relative error (three
#   passes keep ~16 mantissa bits of the split operand, not 24).  The error
#   is orders of magnitude below the resampler's own stochastic jitter and
#   the sign-flip hazard is closed by the frac clamp in
#   sample_pdf_with_mu_sigma; quality gate is the 5k-iter on-chip soak
#   (PERF.md round-4).
FETCH_PRECISION = None


def fetch_sections(oh, *arrays, precision="highest"):
    """Fetch per-sample values from K section arrays in ONE contraction.

    ``oh``: [..., M, S] one-hot; each array: [..., S].  Stacks the arrays
    into [..., S, K] and contracts with the shared one-hot — a single
    [M, S] @ [S, K] batched matmul instead of K separate einsums, which is
    the hot non-matmul op of the train step (PERF.md: convert/reduce tail).
    ``precision`` ("highest" = gather-exact, "high" = ~16-bit, faster; see
    FETCH_PRECISION above).  Returns a tuple of K [..., M] arrays.
    """
    stacked = jnp.stack(arrays, axis=-1)
    name = FETCH_PRECISION if FETCH_PRECISION is not None else precision
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            # Per-operand: the one-hot lhs is exact 0/1 (bf16-representable,
            # a single pass suffices); only the fetched-values rhs needs the
            # 3-split bf16x3 decomposition that covers all 24 f32 mantissa
            # bits.  Gather-exact like "highest" at "high"'s 3-pass cost —
            # IF the backend honors asymmetric operand precision (measured
            # on chip before shipping; see config.fetch_precision).
            "mixed": (jax.lax.Precision.DEFAULT,
                      jax.lax.Precision.HIGHEST)}[name]
    out = jnp.einsum("...ms,...sk->...mk", oh, stacked, precision=prec)
    return tuple(out[..., k] for k in range(len(arrays)))


# --------------------------------------------------------------------------
# Plain inverse-CDF resampler — reference samplers.py:64-121
# --------------------------------------------------------------------------


def sample_pdf(rng, bins, weights, num_samples, *, pdf_padding, det=True,
               fetch_precision="highest"):
    """Inverse-transform resampling of ``num_samples`` fenceposts from the
    histogram (bins [N,S+1], weights [N,S]) with uniform-in-cell placement
    (reference samplers.py:64-121)."""
    weights = _blur_and_pad_weights(weights, pdf_padding)
    cdf = _build_cdf(weights)
    shape = cdf.shape[:-1] + (num_samples,)

    if det:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=weights.dtype)
        u = jnp.broadcast_to(u, shape)
    else:
        s = 1.0 / num_samples
        u = jnp.arange(num_samples, dtype=weights.dtype) * s
        u = jnp.broadcast_to(u, shape)
        u = u + jax.random.uniform(rng, shape, dtype=weights.dtype) / (
            (1.0 / s) + 1e-5
        )
        u = jnp.minimum(u, 0.9999)

    # ind and ind+1 fetches share one [M, S] one-hot: y[ind] contracts with
    # y[:-1], y[ind+1] with y[1:] (ind <= S-1 after clipping).
    oh = interval_one_hot(u, cdf)
    bins_g0, bins_g1, cdf_g0, cdf_g1 = fetch_sections(
        oh, bins[..., :-1], bins[..., 1:], cdf[..., :-1], cdf[..., 1:],
        precision=fetch_precision,
    )

    denom = cdf_g1 - cdf_g0
    t = jnp.clip(jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom > 0, denom, 1.0), 0.0), 0.0, 1.0)
    return bins_g0 + t * (bins_g1 - bins_g0)


# --------------------------------------------------------------------------
# Truncated-Gaussian inverse-CDF resampler — the DDNeRF contribution
# (reference samplers.py:124-215)
# --------------------------------------------------------------------------


def sample_pdf_with_mu_sigma(
    rng,
    bins,
    weights,
    mus,
    sigmas,
    part_inside_bins,
    left_tail,
    num_samples,
    *,
    near,
    far,
    pdf_padding,
    det=True,
    fetch_precision="highest",
    skip_sort=False,
):
    """Resample fenceposts through the per-section truncated-Gaussian inverse
    CDF (reference samplers.py:124-215).

    Within the interval chosen by the histogram CDF, a uniform variate is
    mapped through the section's N(mu, sigma) truncated to [0, 1]:
    ``z = ((u-cdf0)/(cdf1-cdf0))*part_inside + left_tail`` -> ``Φ⁻¹(z)`` ->
    ``t = clip(z*σ+μ, 0, 0.99999)`` -> lerp inside the section.  Endpoints are
    forced to near/far and the result re-sorted (samplers.py:210-213).

    All clamp constants (0.999 on z, 0.99999 on t, 0.9999 on u) match the
    reference exactly — SURVEY.md §7 flags them as parity-critical.
    """
    weights = _blur_and_pad_weights(weights, pdf_padding)
    cdf = _build_cdf(weights)
    shape = cdf.shape[:-1] + (num_samples,)

    if det:
        u = jnp.linspace(0.0, 0.9999, num_samples, dtype=weights.dtype)
        u = jnp.broadcast_to(u, shape)
    else:
        s = 1.0 / (num_samples - 1)
        u = jnp.arange(num_samples, dtype=weights.dtype) * s
        u = jnp.broadcast_to(u, shape)
        u = u + jax.random.uniform(rng, shape, dtype=weights.dtype) / (
            num_samples + 1e-5
        )
        u = jnp.clip(u, 0.0, 0.9999)

    if bins.shape[-1] == 2:
        # Single coarse section (reference samplers.py:185-190).
        z = u * part_inside_bins + left_tail
        new_mus, new_sigmas = mus, sigmas
        bins_g0 = bins[..., 0:1]
        bins_g1 = bins[..., 1:2]
    else:
        # One [M, S] one-hot shared by all eight fetches, contracted in a
        # single [M, S] @ [S, 8] batched matmul (fetch_sections).
        oh = interval_one_hot(u, cdf)
        (bins_g0, bins_g1, cdf_g0, cdf_g1, pib, lt, new_mus, new_sigmas) = \
            fetch_sections(
                oh,
                bins[..., :-1], bins[..., 1:],
                cdf[..., :-1], cdf[..., 1:],
                part_inside_bins, left_tail, mus, sigmas,
                precision=fetch_precision,
            )

        denom = cdf_g1 - cdf_g0
        frac = jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom > 0, denom, 1.0), 0.0)
        # In exact arithmetic u lies inside [cdf_g0, cdf_g1] by construction
        # of the interval search, so this clamp is the identity under the
        # "highest" fetch.  Under the "high" fetch the fetched cdf values
        # carry ~2^-16 relative error, and an unclamped frac < 0 would push
        # z below left_tail and NaN the inverse CDF (erfinv outside (-1, 1)).
        frac = jnp.clip(frac, 0.0, 1.0)
        z = jnp.minimum(frac * pib + lt, 0.999)

    z = mmath.normal_inverse_cdf(z)
    t = jnp.clip(z * new_sigmas + new_mus, 0.0, 0.99999)
    samples = bins_g0 + t * (bins_g1 - bins_g0)

    samples = samples.at[..., 0].set(near)
    samples = samples.at[..., -1].set(far)
    if SKIP_RESAMPLER_SORT if SKIP_RESAMPLER_SORT is not None else skip_sort:
        return samples
    return jnp.sort(samples, axis=-1)


# Trace-time override (None = follow the ``skip_sort`` argument, threaded
# from ``cfg.parallel.skip_resampler_sort``).  The reference re-sorts the
# resampled fenceposts (samplers.py:213), but the inverse-CDF construction
# already emits them sorted: u is sorted, the interval index is therefore
# monotone; within a section the map
# u -> frac -> z -> Φ⁻¹ -> clip(zσ+μ) -> lerp is non-decreasing, and a
# section's samples lie inside [section start, section end] so cross-section
# order follows from the sorted fences; the near/far endpoint overrides are
# the global min/max.  ``jnp.sort`` is thus the identity here — pure cost
# (a bitonic network on TPU) kept only for defensive parity.  Fuzz-tested
# (test_samplers::test_resampler_output_already_sorted) and confirmed on
# chip (warm-step loss bit-identical with the sort skipped, +0.6% rays/s —
# PERF.md round-4), so skipping ships as the config default.
SKIP_RESAMPLER_SORT = None
