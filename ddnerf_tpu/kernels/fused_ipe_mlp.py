"""Pallas TPU kernel v2: IPE + viewdir PE + full MLP in one kernel.

Extends :mod:`ddnerf_tpu.kernels.fused_mlp` by moving the integrated
positional encoding (core/math.py ``integrated_pos_enc``) and the viewdir
positional encoding *inside* the kernel.  Inputs shrink from [R, 96]+[R, 27]
encoded features to [R, 3]×3 raw (means, covs, viewdirs) — the encodings are
computed per row-block in VMEM and never touch HBM.

The per-row encoding is expressed as two constant matmuls plus elementwise
transcendentals, keeping everything MXU/VPU friendly:

*   ``Y = means @ S_y + b_y`` where ``S_y[j, i*3+j] = S_y[j, 48+i*3+j] = 2^i``
    maps each coordinate to its 16 frequency lanes (sin half at lanes 0..47,
    cos half at 48..95 with a +π/2 bias — cos(x) = sin(x+π/2));
*   ``V = covs @ S_v`` with ``4^i`` entries gives the per-frequency variance;
*   ``ipe = exp(-0.5 V) * sin(wrap(Y))`` — wrap is the reference's safe-sin
    range reduction (math_utils.py:155-166);
*   the 27-lane viewdir PE uses the same trick with identity lanes 0..2.

Backward: custom VJP recomputing through the pure-jnp twin (core.math IPE +
the reference MLP formulation), as in fused_mlp.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddnerf_tpu.core import math as mmath
from ddnerf_tpu.kernels.fused_mlp import (
    LANE,
    NUM_TRUNK,
    SKIP_LAYER,
    _mm,
    _pack_params,
    _pad_to,
    _reference_apply,
)

_MAX_DEG = 16
_DIR_FREQS = 4
_TRIG_T = float(100.0 * np.pi)


def _encoding_constants():
    """The constant matrices mapping raw coords -> frequency lanes."""
    s_y = np.zeros((LANE, LANE), np.float32)
    s_v = np.zeros((LANE, LANE), np.float32)
    b_y = np.zeros((1, LANE), np.float32)
    for i in range(_MAX_DEG):
        for j in range(3):
            s_y[j, i * 3 + j] = 2.0**i
            s_y[j, 48 + i * 3 + j] = 2.0**i
            s_v[j, i * 3 + j] = 4.0**i
            s_v[j, 48 + i * 3 + j] = 4.0**i
    b_y[0, 48:96] = 0.5 * np.pi

    # Viewdir PE: lanes 0..2 identity (handled by select), then per freq i:
    # sin lanes 3+6i..5+6i, cos lanes 6+6i..8+6i.
    s_d = np.zeros((LANE, LANE), np.float32)
    b_d = np.zeros((1, LANE), np.float32)
    for i in range(_DIR_FREQS):
        for j in range(3):
            s_d[j, 3 + 6 * i + j] = 2.0**i
            s_d[j, 6 + 6 * i + j] = 2.0**i
        b_d[0, 6 + 6 * i : 9 + 6 * i] = 0.5 * np.pi
    return (
        jnp.asarray(s_y),
        jnp.asarray(s_v),
        jnp.asarray(b_y),
        jnp.asarray(s_d),
        jnp.asarray(b_d),
    )


def _safe_sin(x):
    return jnp.sin(jnp.where(jnp.abs(x) < _TRIG_T, x, x % _TRIG_T))


def _kernel(means_ref, covs_ref, dirs_ref, *refs):
    """refs = [s_y, s_v, b_y, s_d, b_d, <packed mlp weights...>], out last."""
    out_ref = refs[-1]
    s_y, s_v, b_y, s_d, b_d = refs[0:5]
    w = refs[5:-1]

    trunk = [w[i] for i in range(NUM_TRUNK)]
    w5i = w[NUM_TRUNK]
    b_trunk = w[NUM_TRUNK + 1]
    wf, bf = w[NUM_TRUNK + 2], w[NUM_TRUNK + 3]
    wa = w[NUM_TRUNK + 4]
    wd_feat, wd_dirs, bd = w[NUM_TRUNK + 5 : NUM_TRUNK + 8]
    w_heads, b_heads, b_alpha = w[NUM_TRUNK + 8 : NUM_TRUNK + 11]

    means = means_ref[:]
    dtype = means.dtype

    # ---- integrated positional encoding, in VMEM
    y = _mm(means, s_y[:]) + b_y[:]
    v = _mm(covs_ref[:], s_v[:])
    ipe = (jnp.exp(-0.5 * v) * _safe_sin(y)).astype(dtype)

    # ---- viewdir PE: identity lanes 0..2, sin lanes elsewhere
    d_raw = dirs_ref[:]
    d_freq = _mm(d_raw, s_d[:]) + b_d[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, d_freq.shape, 1)
    pe = jnp.where(lane < 3, d_raw.astype(jnp.float32), jnp.sin(d_freq))
    pe = jnp.where(lane < 3 + 6 * _DIR_FREQS, pe, 0.0).astype(dtype)

    # ---- trunk + heads (same dataflow as fused_mlp._kernel)
    x = ipe
    for i in range(NUM_TRUNK):
        acc = _mm(x, trunk[i][:])
        if i == SKIP_LAYER:
            acc = acc + _mm(ipe, w5i[:])
        x = jnp.maximum(acc + b_trunk[i, :][None, :], 0.0).astype(dtype)

    feat = (_mm(x, wf[:]) + bf[:]).astype(dtype)
    alpha = _mm(feat, wa[:]) + b_alpha[:]

    h = _mm(feat, wd_feat[:]) + _mm(pe, wd_dirs[:]) + bd[:]
    h = jnp.maximum(h, 0.0).astype(dtype)
    heads = _mm(h, w_heads[:]) + b_heads[:]

    out_ref[:] = jnp.concatenate(
        [heads[:, 0:3], alpha[:, 0:1], heads[:, 3 : LANE - 1]], axis=-1
    )


def fused_ipe_mlp_forward(
    params: dict,
    means: jax.Array,
    covs: jax.Array,
    dirs: jax.Array,
    *,
    depth_head: bool,
    block_rows: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """[R, 3] means/covs/viewdirs -> [R, 4 or 6] (rgb, alpha[, mu, sigma])."""
    n = means.shape[0]
    out_dim = 6 if depth_head else 4
    n_pad = -(-max(n, 1) // block_rows) * block_rows

    # Raw coords stay f32 into the encoding matmuls: frequency lane values
    # reach |x|*2^15 and bf16 would destroy the phase.
    means_p = _pad_to(means.astype(jnp.float32), rows=n_pad, cols=LANE)
    covs_p = _pad_to(covs.astype(jnp.float32), rows=n_pad, cols=LANE)
    dirs_p = _pad_to(dirs.astype(jnp.float32), rows=n_pad, cols=LANE)

    consts = _encoding_constants()
    packed = _pack_params(params, depth_head, compute_dtype)

    grid = (n_pad // block_rows,)
    row_spec = pl.BlockSpec(
        (block_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [row_spec, row_spec, row_spec] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in (*consts, *packed)
    ]

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        interpret=interpret,
    )(means_p, covs_p, dirs_p, *consts, *packed)
    return out[:n, :out_dim]


def _reference_ipe_apply(params, means, covs, dirs, depth_head):
    """jnp twin: core.math IPE + PE + the reference MLP formulation."""
    ipe = mmath.integrated_pos_enc((means, covs))
    pe = mmath.positional_encoding(dirs, num_freqs=_DIR_FREQS)
    return _reference_apply(params, ipe, pe, depth_head)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_ipe_mlp_apply(params, means, covs, dirs, depth_head: bool,
                        interpret: bool = False):
    return fused_ipe_mlp_forward(
        params, means, covs, dirs, depth_head=depth_head, interpret=interpret
    )


def _fwd(params, means, covs, dirs, depth_head, interpret):
    out = fused_ipe_mlp_forward(
        params, means, covs, dirs, depth_head=depth_head, interpret=interpret
    )
    return out, (params, means, covs, dirs)


def _bwd(depth_head, interpret, res, g):
    params, means, covs, dirs = res
    _, vjp = jax.vjp(
        lambda p, m, c, d: _reference_ipe_apply(p, m, c, d, depth_head),
        params, means, covs, dirs,
    )
    return vjp(g)


fused_ipe_mlp_apply.defvjp(_fwd, _bwd)
