"""AlexNet-LPIPS in JAX.

The perceptual metric of Zhang et al. 2018, as used by the reference
(eval_nerf.py:92, ``lpips.LPIPS(net='alex')``): AlexNet conv features at 5
taps, channel-unit-normalized, squared-difference, 1x1 linear weighting,
spatial mean, summed over taps.

Weights must be supplied locally (zero-egress environment) as an .npz with
keys ``conv{0..4}_w``, ``conv{0..4}_b`` (AlexNet features, OIHW) and
``lin{0..4}_w`` (LPIPS linear layers, [C]).  See eval.metrics.Lpips.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# AlexNet feature extractor structure: (out_ch, kernel, stride, pad), with
# maxpool(3,2) after taps 0 and 1 per torchvision's layout.
_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]

# ImageNet normalization used by LPIPS ("scaling layer").
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _features(weights, x):
    taps = []
    for i, (_, _, stride, pad) in enumerate(_CONVS):
        x = _conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"], stride, pad)
        x = jax.nn.relu(x)
        taps.append(x)
        if i in (0, 1):
            x = _maxpool(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(weights, image, target):
    """image/target: [H, W, 3] in [0, 1].  Returns scalar LPIPS distance."""

    def prep(img):
        img = jnp.asarray(img, jnp.float32) * 2.0 - 1.0  # [-1, 1]
        img = (img - _SHIFT) / _SCALE
        return jnp.transpose(img, (2, 0, 1))[None]  # NCHW

    x0 = prep(image)
    x1 = prep(target)
    taps0 = _features(weights, x0)
    taps1 = _features(weights, x1)

    total = 0.0
    for i, (f0, f1) in enumerate(zip(taps0, taps1)):
        d = (_unit_normalize(f0) - _unit_normalize(f1)) ** 2
        lin = jnp.asarray(weights[f"lin{i}_w"]).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total
