"""Flax MLP backbones: MipMLP and DepthMipMLP.

TPU-native rewrite of ``/root/reference/models/base_architectures.py``.
Identical architecture: 8-layer trunk with a skip concat of the IPE input at
layer 5, a density head off ``fc_feat``, a single 128-wide view-direction
layer feeding the rgb head, and (DepthMipMLP only) a ``fc_mu_sigma`` head
emitting the per-section truncated-Gaussian parameters
(base_architectures.py:24-37, 85-101).

TPU-first choices:

* inputs stay factored as ``(ipe [..., 96], dirs [..., 27])`` rather than the
  reference's pre-concatenated 123-dim rows (models.py:133) — XLA fuses the
  concat into the first matmul and the dir features are only needed at the
  head, so they never ride through the trunk;
* a ``dtype`` knob runs the matmuls in bfloat16 on the MXU with float32
  params/accumulation (the torch reference is implicitly float32 cuBLAS);
* weight init matches torch ``nn.Linear`` defaults (kaiming-uniform weights,
  uniform ±1/sqrt(fan_in) bias) so training dynamics are comparable.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# ReLU with a custom VJP that saves its OUTPUT as the residual.  Plain
# jnp.maximum(x, 0) makes AD save the predicate x > 0, which XLA bit-packs
# into u32 masks in the forward fusions and unpacks in the backward — ~0.8 ms
# of VPU pack/unpack per flagship step (trace digest: convert_reduce_fusion /
# and_convert_fusion ops).  The post-activation is already a saved residual
# (it feeds the next layer's wgrad), so deriving the mask as y > 0 in the
# backward costs nothing and the pred residuals disappear entirely.
# Identical gradients except at exactly x == 0 (measure zero).
#
# Two variants: the bf16-residual one saves the bf16 cast of the activation
# — the exact buffer the next layer's matmul consumes (CSE'd into one), so
# the relu residual is FREE.  The mask derived from the bf16 cast differs
# from f32 only for positives below ~1e-40 (bf16 keeps sign/zero).
def _make_relu_save_output(bf16_residual: bool):
    @jax.custom_vjp
    def relu(x):
        return jnp.maximum(x, 0.0)

    def fwd(x):
        y = jnp.maximum(x, 0.0)
        return y, (y.astype(jnp.bfloat16) if bf16_residual else y)

    def bwd(res, g):
        if RELU_BWD_BARRIER:
            # Measured SLOWER (285k vs 346k rays/s interleaved): the barrier
            # forces an extra residual materialization.  Kept for A/B re-runs.
            res = jax.lax.optimization_barrier(res)
        return (jnp.where(res > 0, g, jnp.zeros_like(g)).astype(jnp.float32),)

    relu.defvjp(fwd, bwd)
    return relu


_relu_so_bf16 = _make_relu_save_output(True)
_relu_so_f32 = _make_relu_save_output(False)

# Trace-time OVERRIDES for the A/B harness (None = follow the module fields,
# which the pipeline sets from cfg.parallel.* — the production values live in
# the config snapshot).  On-chip interleaved A/B (2048-ray flagship step):
# plain maximum 257k, save-output f32 residual 324k, bf16 residual 346k
# rays/s; the backward barrier variant regressed to 285k.
RELU_SAVE_OUTPUT = None
RELU_BF16_RESIDUAL = None
RELU_BWD_BARRIER = False  # documented negative; dev-only global

# Skip layer as two partial matmuls (x@W[96:] + ipe@W[:96]) instead of a
# concat — algebraically identical (a concat matmul IS the sum of partials),
# avoids materializing [N,S,352] and its backward relayout.  None = follow
# the module field (config).
SPLIT_SKIP_LAYER = None

# Fold the skip layer's ipe-half into trunk_0's matmul as extra weight
# columns: ipe @ [W0 | Wskip[:96]] -> [..., 512], first half becomes
# trunk_0's pre-activation, second half is carried to the skip layer.  The
# standalone ipe @ Wskip[:96] matmul is K=96 (MXU pads the contraction to
# 128) and its operand rides a ray-minor layout — the trace digest clocks it
# at ~15-30 TF/s vs ~170 for the 256-wide trunk matmuls; amortizing the
# K-pad over 512 output columns and sharing trunk_0's operand read removes
# it entirely.  Exact: identical contractions, param tree unchanged.
# MEASURED: a large NEGATIVE — 279k vs 360k rays/s (benchmarks/ab.py,
# interleaved).  Slicing the [..., 2H] product back into halves and keeping
# skip_ipe live across four layers breaks the trunk's matmul+relu+pack
# fusion chain; the K-pad waste it saves is far smaller than what the
# fusion break costs.  Kept off as a documented negative result.
SKIP_FOLD_TRUNK0 = False


def _relu(x, mlp):
    """The trunk/head activation, variant-selected per module config (with
    the module globals as trace-time A/B overrides)."""
    save = RELU_SAVE_OUTPUT if RELU_SAVE_OUTPUT is not None \
        else mlp.relu_save_output
    if not save:
        return jnp.maximum(x, 0.0)
    bf16 = RELU_BF16_RESIDUAL if RELU_BF16_RESIDUAL is not None \
        else mlp.relu_bf16_residual
    return _relu_so_bf16(x) if bf16 else _relu_so_f32(x)


def _split_skip(mlp) -> bool:
    return SPLIT_SKIP_LAYER if SPLIT_SKIP_LAYER is not None \
        else mlp.split_skip_layer


# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == uniform
# ±sqrt(6/((1+5)*fan_in)) = ±1/sqrt(fan_in); bias uniform ±1/sqrt(fan_in).
def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class _TorchDense(nn.Module):
    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", _torch_linear_kernel_init, (fan_in, self.features)
        )
        bound = 1.0 / jnp.sqrt(fan_in)
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,),
        )
        dtype = self.dtype or x.dtype
        # Matmul inputs ride the MXU in the compute dtype; the result and
        # the activation stay f32.  (Keeping activations bf16 end-to-end was
        # measured: no throughput gain — the backward is wgrad-fusion-bound,
        # not cotangent-dtype-bound — and DDNeRF training NaN'd within 2k
        # iterations.  See PERF.md round-2 notes.)
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype), preferred_element_type=jnp.float32)
        return y + bias


class _TorchParams(nn.Module):
    """Declares a Linear's (kernel, bias) with the SAME param names/shapes as
    :class:`_TorchDense` without applying it — the head layers fetch their
    params through this and run through merged matmuls (below), keeping the
    param tree identical for checkpoints and torch transplant."""

    features: int

    @nn.compact
    def __call__(self, fan_in: int):
        kernel = self.param(
            "kernel", _torch_linear_kernel_init, (fan_in, self.features)
        )
        bound = 1.0 / jnp.sqrt(fan_in)
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,),
        )
        return kernel, bias


def _mlp_trunk(mlp, ipe):
    """The 8-layer trunk with the skip concat at ``mlp.skip_layer``
    (reference base_architectures.py:25-29, 44-49).  With SPLIT_SKIP_LAYER
    the skip layer runs as ``ipe @ W[:96] + x @ W[96:]`` — the exact
    contraction the concat form computes, without materializing [N,S,352]
    (whose backward needed a slow relayout for the wgrad operand)."""
    split = _split_skip(mlp)
    if split and SKIP_FOLD_TRUNK0 and 0 < mlp.skip_layer < mlp.num_trunk_layers:
        return _mlp_trunk_folded(mlp, ipe)
    x = ipe
    for i in range(mlp.num_trunk_layers):
        if i == mlp.skip_layer and split:
            dt = mlp.dtype or x.dtype
            nin = ipe.shape[-1]
            w, b = _TorchParams(mlp.hidden_size, name=f"trunk_{i}")(
                nin + x.shape[-1]
            )
            y = (
                jnp.dot(ipe.astype(dt), w[:nin].astype(dt),
                        preferred_element_type=jnp.float32)
                + jnp.dot(x.astype(dt), w[nin:].astype(dt),
                          preferred_element_type=jnp.float32)
                + b
            )
            x = _relu(y, mlp)
            continue
        if i == mlp.skip_layer:
            x = jnp.concatenate([ipe, x], axis=-1)
        x = _TorchDense(mlp.hidden_size, dtype=mlp.dtype, name=f"trunk_{i}")(x)
        x = _relu(x, mlp)
    return x


def _mlp_trunk_folded(mlp, ipe):
    """Trunk with the skip layer's ipe-half folded into trunk_0 (see
    SKIP_FOLD_TRUNK0).  ``ipe @ [W0 | Ws[:96]]`` yields trunk_0's
    pre-activation and the skip contribution in one [96, 2H] matmul; the
    carried half joins ``x @ Ws[96:]`` at the skip layer.  Every output
    element sees the identical contraction as the unfolded form."""
    dt = mlp.dtype or ipe.dtype
    nin = ipe.shape[-1]
    h = mlp.hidden_size
    w0, b0 = _TorchParams(h, name="trunk_0")(nin)
    ws, bs = _TorchParams(h, name=f"trunk_{mlp.skip_layer}")(nin + h)
    w_merged = jnp.concatenate([w0, ws[:nin]], axis=1).astype(dt)
    y = jnp.dot(ipe.astype(dt), w_merged, preferred_element_type=jnp.float32)
    x = _relu(y[..., :h] + b0, mlp)
    skip_ipe = y[..., h:]
    for i in range(1, mlp.num_trunk_layers):
        if i == mlp.skip_layer:
            x = _relu(
                skip_ipe
                + jnp.dot(x.astype(dt), ws[nin:].astype(dt),
                          preferred_element_type=jnp.float32)
                + bs,
                mlp,
            )
            continue
        x = _TorchDense(mlp.hidden_size, dtype=mlp.dtype, name=f"trunk_{i}")(x)
        x = _relu(x, mlp)
    return x


def _mlp_heads(mlp, ipe, dirs, x, dtype, head_modules):
    """The shared head block of MipMLP / DepthMipMLP with TPU-friendly
    matmul merging.  Three wins over the naive per-head Denses (all exact —
    the merges concatenate weight columns of matmuls that share an input, so
    every output element sees the identical contraction):

    * ``fc_alpha`` rides the feat-half of ``dir_0`` as one ``[256, 1+128]``
      matmul — tiny-output matmuls ([256,1]) are K-serial on the MXU and
      their forward fusion alone measured 0.18 ms (trace digest fusion.1);
    * ``fc_rgb`` (+``fc_mu_sigma``) share one ``[128, 3(+2)]`` matmul;
    * the view-direction half of ``dir_0`` is computed at PER-RAY rank
      ([N,27] @ [27,128]) and broadcast to samples — the reference's concat
      form (models.py:133, base_architectures.py:52-60) recomputes it per
      sample (S× the FLOPs and an [N,S,27] materialization).

    ``head_modules`` maps name -> _TorchParams instance (already named so the
    param tree matches the reference layout).
    """
    hidden_size, dir_hidden = mlp.hidden_size, mlp.dir_hidden
    wf, bf = head_modules["fc_feat"](x.shape[-1])
    wa, ba = head_modules["fc_alpha"](hidden_size)
    wd, bd = head_modules["dir_0"](hidden_size + dirs.shape[-1])

    feat = jnp.dot(
        x.astype(dtype), wf.astype(dtype), preferred_element_type=jnp.float32
    ) + bf
    featd = feat.astype(dtype)

    # [alpha | h_feat] in one matmul over the shared `feat` input.
    w_am = jnp.concatenate([wa, wd[:hidden_size]], axis=1).astype(dtype)
    am = jnp.dot(featd, w_am, preferred_element_type=jnp.float32)
    alpha = am[..., :1] + ba

    # Per-ray dir projection, broadcast over the sample axis by the add.
    dproj = jnp.dot(
        dirs.astype(dtype),
        wd[hidden_size:].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    h = _relu(am[..., 1:] + dproj + bd, mlp)

    ws, bs2 = [], []
    for name in ("fc_rgb", "fc_mu_sigma"):
        if name in head_modules:
            w, b = head_modules[name](dir_hidden)
            ws.append(w)
            bs2.append(b)
    w_heads = jnp.concatenate(ws, axis=1).astype(dtype)
    b_heads = jnp.concatenate(bs2)
    heads = jnp.dot(
        h.astype(dtype), w_heads, preferred_element_type=jnp.float32
    ) + b_heads

    return jnp.concatenate(
        [heads[..., :3], alpha, heads[..., 3:]], axis=-1
    ).astype(jnp.float32)


class MipMLP(nn.Module):
    """mip-NeRF MLP (reference base_architectures.py:3-61).

    ``dirs`` may be per-ray ``[N, 27]`` (broadcast over samples inside) or
    pre-broadcast ``[N, S, 27]``.  Output: ``[..., 4]`` = (rgb 3, alpha 1).
    """

    hidden_size: int = 256
    num_trunk_layers: int = 8
    skip_layer: int = 5
    dir_hidden: int = 128
    dtype: Optional[Any] = None  # compute dtype (e.g. jnp.bfloat16)
    # Numerics/perf switches (cfg.parallel.*; see config.py rationale).
    relu_save_output: bool = True
    relu_bf16_residual: bool = True
    split_skip_layer: bool = True

    @nn.compact
    def __call__(self, ipe, dirs):
        x = _mlp_trunk(self, ipe)
        heads = {
            "fc_feat": _TorchParams(self.hidden_size, name="fc_feat"),
            "fc_alpha": _TorchParams(1, name="fc_alpha"),
            "dir_0": _TorchParams(self.dir_hidden, name="dir_0"),
            "fc_rgb": _TorchParams(3, name="fc_rgb"),
        }
        dtype = self.dtype or ipe.dtype
        return _mlp_heads(self, ipe, dirs, x, dtype, heads)


class DepthMipMLP(nn.Module):
    """DDNeRF coarse MLP with the (mu, sigma) head
    (reference base_architectures.py:64-126).

    Output: ``[..., 6]`` = (rgb 3, alpha 1, raw_mu 1, raw_sigma 1).
    """

    hidden_size: int = 256
    num_trunk_layers: int = 8
    skip_layer: int = 5
    dir_hidden: int = 128
    dtype: Optional[Any] = None
    relu_save_output: bool = True
    relu_bf16_residual: bool = True
    split_skip_layer: bool = True

    @nn.compact
    def __call__(self, ipe, dirs):
        x = _mlp_trunk(self, ipe)
        heads = {
            "fc_feat": _TorchParams(self.hidden_size, name="fc_feat"),
            "fc_alpha": _TorchParams(1, name="fc_alpha"),
            "dir_0": _TorchParams(self.dir_hidden, name="dir_0"),
            "fc_rgb": _TorchParams(3, name="fc_rgb"),
            "fc_mu_sigma": _TorchParams(2, name="fc_mu_sigma"),
        }
        dtype = self.dtype or ipe.dtype
        return _mlp_heads(self, ipe, dirs, x, dtype, heads)
