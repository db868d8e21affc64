"""Pure-jnp mip-NeRF / DDNeRF math core.

TPU-native rewrite of the reference math layer
(``/root/reference/general_utils/math_utils.py``).  Every function here is a
pure function of jnp arrays — safe under ``jit``/``vmap``/``grad`` and
shardable with ``pjit``.  Shapes use ``[..., S]`` for per-ray sample axes so
the same code serves a single ray, a batch, or a whole sharded image.

Conventions
-----------
* ``t_vals`` are the S+1 "fencepost" distances of S sections along a ray.
* All trig goes through :func:`safe_sin`/:func:`safe_cos` — the reference
  itself warns that raw sin/cos NaN on TPU for large arguments
  (math_utils.py:155-166).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 100*pi: past this magnitude TPU transcendentals lose all precision; wrap.
_TRIG_THRESHOLD = 100.0 * jnp.pi


def safe_sin(x: jax.Array) -> jax.Array:
    """sin with argument range-reduction (reference math_utils.py:155-166)."""
    return jnp.sin(jnp.where(jnp.abs(x) < _TRIG_THRESHOLD, x, x % _TRIG_THRESHOLD))


def safe_cos(x: jax.Array) -> jax.Array:
    """cos with argument range-reduction (reference math_utils.py:155-166)."""
    return jnp.cos(jnp.where(jnp.abs(x) < _TRIG_THRESHOLD, x, x % _TRIG_THRESHOLD))


# --------------------------------------------------------------------------
# Conical frustum -> Gaussian (reference math_utils.py:7-110)
# --------------------------------------------------------------------------


def lift_gaussian(d, t_mean, t_var, r_var, diag=True):
    """Lift a 1-D Gaussian along ray direction ``d`` into 3-D coordinates.

    Reference: math_utils.py:34-54.  ``d``: [..., 3]; ``t_mean``/``t_var``/
    ``r_var``: [..., S].  Returns means [..., S, 3] and (diagonal) covariances
    [..., S, 3].
    """
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1, keepdims=True))
    if diag:
        d_outer_diag = d**2
        null_outer_diag = 1.0 - d_outer_diag / d_mag_sq
        t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
        xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag
    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1], dtype=d.dtype)
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag=True):
    """Stable Gaussian approximation of a conical frustum (mip-NeRF eq. 7).

    Reference: math_utils.py:57-88 (``stable=True`` branch only; the unstable
    closed form "will cause catastrophic failure" per its own docstring, so it
    is deliberately not carried over).
    """
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    denom = 3.0 * mu**2 + hw**2
    t_mean = mu + (2.0 * mu * hw**2) / denom
    t_var = hw**2 / 3.0 - (4.0 / 15.0) * ((hw**4 * (12.0 * mu**2 - hw**2)) / denom**2)
    r_var = base_radius**2 * (
        mu**2 / 4.0 + (5.0 / 12.0) * hw**2 - (4.0 / 15.0) * hw**4 / denom
    )
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag=True):
    """Gaussian approximation of a cylinder (reference math_utils.py:91-110)."""
    t_mean = (t0 + t1) / 2.0
    r_var = radius**2 / 4.0
    t_var = (t1 - t0) ** 2 / 12.0
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(t_vals, origins, directions, radii, ray_shape="cone", diag=True):
    """Featurize ray sections as Gaussians (reference math_utils.py:7-31).

    ``t_vals``: [..., S+1]; ``origins``/``directions``: [..., 3]; ``radii``:
    [..., 1].  Returns (means [..., S, 3], covs [..., S, 3]).
    """
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]
    if ray_shape == "cone":
        gaussian_fn = conical_frustum_to_gaussian
    elif ray_shape == "cylinder":
        gaussian_fn = cylinder_to_gaussian
    else:
        raise ValueError(f"unknown ray_shape {ray_shape!r}")
    means, covs = gaussian_fn(directions, t0, t1, radii, diag)
    return means + origins[..., None, :], covs


# --------------------------------------------------------------------------
# Integrated positional encoding (reference math_utils.py:112-152)
# --------------------------------------------------------------------------


def expected_sin(x, x_var):
    """E[sin z], Var[sin z] for z ~ N(x, x_var) (math_utils.py:146-152)."""
    y = jnp.exp(-0.5 * x_var) * safe_sin(x)
    y_var = jnp.maximum(
        0.0, 0.5 * (1.0 - jnp.exp(-2.0 * x_var) * safe_cos(2.0 * x)) - y**2
    )
    return y, y_var


# Trace-time switch: compute the per-degree sin/cos features by the
# double-angle recurrence instead of 2*3*L direct transcendental evaluations.
# sin(2^(l+1) x) = 2 sin(2^l x) cos(2^l x), cos(2^(l+1) x) = 1 - 2 sin^2 —
# one sin+cos pair at the base frequency plus 2 FMAs per level replaces 96
# polynomial sin expansions (each ~40 VPU ops with range reduction).  The
# recurrence is *more* accurate than direct f32 sin at high degrees (the
# direct argument 2^15 x has an f32 ulp of ~0.002 rad; the recurrence never
# forms it), and its level-to-level drift (~1e-5 relative by degree 16) is
# far below the bf16 quantization (eps 2^-8) applied when the features enter
# the MXU.  The exp attenuation is still evaluated directly per degree
# (repeated squaring of exp would amplify relative error 4x per level).
# On-chip interleaved A/B (benchmarks/ab.py, flagship step): direct
# median 355.3k, double-angle 359.7k rays/s (+1.2%, consistent across all
# rounds); warm losses agree to 1e-7.
#
# Production reads come from ``cfg.parallel.ipe_double_angle`` (threaded by
# the pipeline through ``double_angle=``, recorded in the config snapshot);
# this module global is a trace-time OVERRIDE for the A/B harness — a bool
# here wins over the caller's argument.
IPE_DOUBLE_ANGLE = None


# Trace-time A/B override for the feature assembly below (None = shipped
# default = False).  True: ONE last-axis concatenate of the 2L per-degree
# [..., 3] pieces; False: stack(axis=-2) + reshape per half + concat.  Both
# are bit-identical in the same (l, dim) order — this was a memory-layout
# experiment against the ~0.13 ms of layout-transposed reshape/copies the
# stack+reshape path shows at the kernel boundary (round-4 trace digest,
# ops reshape.4763/copy.970/971).  MEASURED NEGATIVE on chip (v5e, 6
# interleaved rounds, flagship step): one-concat 227.6k vs stack+reshape
# 477.0k rays/s median — the 32-piece lane-dim concatenate becomes a
# standalone unfusable HLO that forces the whole IPE prologue out of the
# consumers, costing 2x the step.  Kept as the documented counterfactual.
IPE_ONE_CONCAT = None


def _ipe_double_angle(x, x_cov_diag, min_deg, max_deg, out_dtype=None):
    base = x * (2.0**min_deg)
    s, c = safe_sin(base), safe_cos(base)  # [..., 3]
    sin_feats, cos_feats = [], []
    var_scale = 4.0**min_deg
    for deg in range(min_deg, max_deg):
        w = jnp.exp((-0.5 * var_scale) * x_cov_diag)
        # out_dtype: cast each per-degree feature BEFORE the stack/reshape/
        # concat assembly below.  Elementwise cast commutes with assembly,
        # so the result is bit-identical to casting the assembled [.., 96]
        # array — but the assembly arrays (and the consumer-facing copy at
        # a Pallas kernel boundary) carry half the bytes.  The recurrence
        # itself stays f32 (accuracy note above).
        sf, cf = w * s, w * c
        if out_dtype is not None:
            sf, cf = sf.astype(out_dtype), cf.astype(out_dtype)
        sin_feats.append(sf)
        cos_feats.append(cf)
        if deg + 1 < max_deg:
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            var_scale = var_scale * 4.0
    # Same feature layout as the direct path: [sin(2^l x) by (l, dim) | cos].
    one_concat = False if IPE_ONE_CONCAT is None else IPE_ONE_CONCAT
    if one_concat:
        return jnp.concatenate(sin_feats + cos_feats, axis=-1)
    shape = x.shape[:-1] + (-1,)
    sin_half = jnp.reshape(jnp.stack(sin_feats, axis=-2), shape)
    cos_half = jnp.reshape(jnp.stack(cos_feats, axis=-2), shape)
    return jnp.concatenate([sin_half, cos_half], axis=-1)


def integrated_pos_enc(means_covs, min_deg=0, max_deg=16, diag=True,
                       double_angle=True, out_dtype=None):
    """IPE over degrees ``[min_deg, max_deg)`` (math_utils.py:112-144).

    Input: ``(means [..., 3], covs [..., 3])`` diagonal Gaussians.
    Output: [..., 2*3*(max_deg-min_deg)] — sin/cos features attenuated by the
    per-frequency variance.  Pure elementwise work: XLA fuses the whole thing
    into the consuming matmul's prologue on TPU.

    ``double_angle`` selects the recurrence path (see IPE_DOUBLE_ANGLE above;
    the module global, when not None, overrides this argument).
    ``out_dtype``: return the features in this dtype, with the cast applied
    per degree BEFORE assembly on the double-angle path — bit-identical to
    ``integrated_pos_enc(...).astype(out_dtype)`` (cast commutes with
    stack/reshape/concat) at half the assembly bytes.  For consumers that
    cast anyway (the fused Pallas kernels).
    """
    if not diag:
        raise NotImplementedError("full-covariance IPE not used by any config")
    x, x_cov_diag = means_covs
    if IPE_DOUBLE_ANGLE if IPE_DOUBLE_ANGLE is not None else double_angle:
        return _ipe_double_angle(x, x_cov_diag, min_deg, max_deg,
                                 out_dtype=out_dtype)
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], dtype=x.dtype)
    shape = x.shape[:-1] + (-1,)
    # [..., D, 3] * [L, 1] -> [..., L, 3] -> [..., L*3]
    y = jnp.reshape(x[..., None, :] * scales[:, None], shape)
    y_var = jnp.reshape(x_cov_diag[..., None, :] * scales[:, None] ** 2, shape)
    out = expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var] * 2, axis=-1),
    )[0]
    return out if out_dtype is None else out.astype(out_dtype)


def integrated_pos_enc_fused(means_covs, min_deg=0, max_deg=16,
                             out_dtype=None):
    """Direct-form IPE assembled WITHOUT stack or concat — one XLA fusion.

    Identical values to ``integrated_pos_enc(double_angle=False)`` — the
    same per-feature multiply / phase-add / exp / safe_sin in the same
    (half, l, dim) output order, bit-exact up to the sign of zeros (the
    sin half adds a literal 0.0 phase, which rewrites -0.0 to +0.0; the
    values compare equal) — pinned in test_core_math.py.  Built for the fused-kernel render/train paths
    where the [N, 96] feature array must be MATERIALIZED in HBM for a
    ``pallas_call`` (XLA cannot fuse a prologue into a custom call): the
    stack/reshape/concat assembly of the other paths lowers to ~4 full
    HBM round-trips of relayout copies there (~105 ms of a 612 ms 800x800
    render, round-5 trace digest), while this form is a broadcast-multiply
    -add-reshape-elementwise chain with no concatenate at all, which XLA
    emits as a single output fusion writing the final array once.

    The cos half rides the sin evaluation via a per-feature phase vector
    (cos z = sin(z + pi/2) — exactly the reference's direct form,
    math_utils.py:112-152, which concatenates [y, y + 0.5*pi]): scales2 =
    [2^l | l] twice, phase2 = [0]*L + [pi/2]*L, so

        feat = exp(-0.5 * cov * scales2^2) * safe_sin(x * scales2 + phase2)

    over a [..., 2L, 3] broadcast, reshaped (inside the fusion) to
    [..., 6L].  ``out_dtype`` folds the consumer's cast into the same
    fusion (bit-identical to casting after).
    """
    x, x_cov_diag = means_covs
    L = max_deg - min_deg
    scales = [2.0**i for i in range(min_deg, max_deg)]
    scales2 = jnp.asarray(scales + scales, dtype=x.dtype)[:, None]  # [2L, 1]
    phase2 = jnp.asarray([0.0] * L + [0.5 * jnp.pi] * L,
                         dtype=x.dtype)[:, None]
    shape = x.shape[:-1] + (-1,)
    y = x[..., None, :] * scales2 + phase2            # [..., 2L, 3]
    y_var = x_cov_diag[..., None, :] * scales2**2
    out = jnp.reshape(jnp.exp(-0.5 * y_var) * safe_sin(y), shape)
    return out if out_dtype is None else out.astype(out_dtype)


def integrated_pos_enc_t(means_covs, min_deg=0, max_deg=16,
                         double_angle=True, out_dtype=None):
    """Feature-major IPE: the exact transpose of :func:`integrated_pos_enc`.

    Input: ``(means [N, 3], covs [N, 3])``; output ``[2*3*L, N]`` with row
    ``k`` equal to column ``k`` of the standard layout (sin by (l, dim),
    then cos).  Built for the fused Pallas kernels (kernels/fused_mlp.py
    ``ipe_transposed``): the per-degree elementwise work runs on [3, N]
    arrays (N in lanes — full VPU utilization, vs 3/128 in the row-major
    form), the [96, N] result is born in default row-major layout (no
    relayout copy at the pallas_call boundary, which requires
    default-layout operands), and layer 0 contracts dim 0 on the MXU
    (``lax.dot_general`` (((0,), (0,)), ...) — the same orientation the
    backward kernel's wgrads already use).

    Values are bit-identical to ``integrated_pos_enc(...).T``: the
    elementwise chain is orientation-independent and assembly is pure
    stack/reshape (tested in test_core_math.py).

    ``out_dtype``: cast each per-degree feature BEFORE the stack/reshape/
    concat assembly (the ``ipe_early_cast`` semantics of the row-major
    form) — bit-identical to casting the assembled array, at half the
    assembly bytes.  On the double-angle path only; the direct path casts
    after.
    """
    x, x_cov_diag = means_covs
    x_t, v_t = x.T, x_cov_diag.T  # [3, N]
    if IPE_DOUBLE_ANGLE if IPE_DOUBLE_ANGLE is not None else double_angle:
        base = x_t * (2.0**min_deg)
        s, c = safe_sin(base), safe_cos(base)  # [3, N]
        sin_feats, cos_feats = [], []
        var_scale = 4.0**min_deg
        for deg in range(min_deg, max_deg):
            w = jnp.exp((-0.5 * var_scale) * v_t)
            sf, cf = w * s, w * c
            if out_dtype is not None:
                sf, cf = sf.astype(out_dtype), cf.astype(out_dtype)
            sin_feats.append(sf)
            cos_feats.append(cf)
            if deg + 1 < max_deg:
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                var_scale = var_scale * 4.0
        half = x_t.shape[:-2] + (-1, x_t.shape[-1])
        sin_half = jnp.reshape(jnp.stack(sin_feats, axis=0), half)
        cos_half = jnp.reshape(jnp.stack(cos_feats, axis=0), half)
        return jnp.concatenate([sin_half, cos_half], axis=0)
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)],
                         dtype=x.dtype)
    shape = (-1,) + x_t.shape[-1:]
    # [L, 1, 1] * [3, N] -> [L, 3, N] -> [L*3, N]
    y = jnp.reshape(scales[:, None, None] * x_t[None], shape)
    y_var = jnp.reshape(scales[:, None, None] ** 2 * v_t[None], shape)
    out = expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=0),
        jnp.concatenate([y_var] * 2, axis=0),
    )[0]
    return out if out_dtype is None else out.astype(out_dtype)


def positional_encoding(x, num_freqs=4, include_input=True, log_sampling=True):
    """Classic NeRF PE used for view directions (nerf_helpers.py:127-171).

    Frequency bands 2^0..2^(num_freqs-1), log- or linearly-sampled; output
    layout matches the reference:
    ``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]``.
    """
    if num_freqs == 0:
        return x
    if log_sampling:
        freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # [..., F, D]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # [..., F, 2, D]
    enc = enc.reshape(x.shape[:-1] + (-1,))
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


# --------------------------------------------------------------------------
# Truncated-Gaussian CDF machinery (reference math_utils.py:193-208)
# --------------------------------------------------------------------------

_SQRT2 = 1.4142135623730951


def normal_cdf(x):
    """Standard normal CDF Φ(x) via erf (math_utils.py:193-199)."""
    return 0.5 * (1.0 + jax.lax.erf(x / _SQRT2))


def normal_inverse_cdf(x):
    """Standard normal inverse CDF Φ⁻¹(x) via erfinv (math_utils.py:202-208)."""
    return _SQRT2 * jax.lax.erf_inv(2.0 * x - 1.0)


# Backwards-compatible aliases matching the reference naming.
approximate_cdf = normal_cdf
approximate_inverse_cdf = normal_inverse_cdf


def truncated_gaussian_tails(mus, sigmas):
    """Tail mass of per-section N(mu, sigma) truncated to [0, 1].

    Returns ``(left_tail, part_inside_bins)`` = (Φ((0-μ)/σ),
    Φ((1-μ)/σ) - Φ((0-μ)/σ)) — the quantities DDNeRF uses to renormalize the
    in-cell Gaussian (reference models/models.py:254-258).
    """
    x0 = (0.0 - mus) / sigmas
    x1 = (1.0 - mus) / sigmas
    left_tail = normal_cdf(x0)
    part_inside_bins = normal_cdf(x1) - left_tail
    return left_tail, part_inside_bins


# --------------------------------------------------------------------------
# Metrics helpers (reference nerf_helpers.py:8-16, math_utils.py:169-181)
# --------------------------------------------------------------------------


def img2mse(img_src, img_tgt):
    return jnp.mean((img_src - img_tgt) ** 2)


def mse2psnr(mse):
    mse = jnp.maximum(mse, 1e-5)
    return -10.0 * jnp.log10(mse)


def bins_for_percentage(weights, percentage):
    """Number of bins holding ``percentage`` of the ray's probability mass
    (reference math_utils.py:169-181) — an info-concentration diagnostic."""
    pdf = weights / jnp.sum(weights, axis=1, keepdims=True)
    info_sorted = jnp.sort(pdf, axis=-1)[..., ::-1]
    info_sum = jnp.cumsum(info_sorted[..., :-1], axis=-1)
    return jnp.sum(info_sum < percentage, axis=1) + 1
