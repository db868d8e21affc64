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


class MipMLP(nn.Module):
    """mip-NeRF MLP (reference base_architectures.py:3-61).

    Output: ``[..., 4]`` = (rgb raw 3, alpha raw 1).
    """

    hidden_size: int = 256
    num_trunk_layers: int = 8
    skip_layer: int = 5
    dir_hidden: int = 128
    dtype: Optional[Any] = None  # compute dtype (e.g. jnp.bfloat16)

    @nn.compact
    def __call__(self, ipe, dirs):
        x = ipe
        for i in range(self.num_trunk_layers):
            if i == self.skip_layer:
                x = jnp.concatenate([ipe, x], axis=-1)
            x = _TorchDense(self.hidden_size, dtype=self.dtype, name=f"trunk_{i}")(x)
            x = nn.relu(x)
        feat = _TorchDense(self.hidden_size, dtype=self.dtype, name="fc_feat")(x)
        alpha = _TorchDense(1, dtype=self.dtype, name="fc_alpha")(feat)
        h = _TorchDense(
            self.dir_hidden, dtype=self.dtype, name="dir_0"
        )(jnp.concatenate([feat, dirs], axis=-1))
        h = nn.relu(h)
        rgb = _TorchDense(3, dtype=self.dtype, name="fc_rgb")(h)
        return jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)


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

    @nn.compact
    def __call__(self, ipe, dirs):
        x = ipe
        for i in range(self.num_trunk_layers):
            if i == self.skip_layer:
                x = jnp.concatenate([ipe, x], axis=-1)
            x = _TorchDense(self.hidden_size, dtype=self.dtype, name=f"trunk_{i}")(x)
            x = nn.relu(x)
        feat = _TorchDense(self.hidden_size, dtype=self.dtype, name="fc_feat")(x)
        alpha = _TorchDense(1, dtype=self.dtype, name="fc_alpha")(feat)
        h = _TorchDense(
            self.dir_hidden, dtype=self.dtype, name="dir_0"
        )(jnp.concatenate([feat, dirs], axis=-1))
        h = nn.relu(h)
        rgb = _TorchDense(3, dtype=self.dtype, name="fc_rgb")(h)
        mu_sigma = _TorchDense(2, dtype=self.dtype, name="fc_mu_sigma")(h)
        return jnp.concatenate([rgb, alpha, mu_sigma], axis=-1).astype(jnp.float32)
