"""Host-side ray generation: pixel grid -> (origins, directions, mip radii),
NDC projection, and NDC-depth un-warping.

Rewrite of ``get_ray_bundle`` (/root/reference/general_utils/nerf_helpers.py:67-125),
``ndc_mipnerf_rays`` / ``switch_t_ndc_to_regular``
(/root/reference/data_utils/dataset_helpers.py:3-48) and ``ndc_rays``
(nerf_helpers.py:182-208).

These run once per image at dataset-init time (the reference precomputes every
ray of every training image, dataset.py:28-48 — a design that maps directly
onto a TPU host-side loader), so they are plain NumPy: float64-capable,
no device round-trips, trivially parallel over images.
"""

from __future__ import annotations

import numpy as np


def get_ray_bundle(height: int, width: int, focal_length, c2w: np.ndarray):
    """One ray per pixel plus the mip-NeRF base radius.

    Mirrors nerf_helpers.py:67-125 including its quirks: the zero-component
    epsilon nudge (:114-115) and ``radii = dx * 2/sqrt(12)`` from x-neighbor
    direction distances (:117-123).

    Returns (origins [H, W, 3], directions [H, W, 3], radii [H, W, 1]),
    float32.
    """
    c2w = np.asarray(c2w, dtype=np.float32)
    ii, jj = np.meshgrid(
        np.arange(width, dtype=np.float32),
        np.arange(height, dtype=np.float32),
        indexing="xy",
    )
    directions = np.stack(
        [
            (ii - width * 0.5) / focal_length,
            -(jj - height * 0.5) / focal_length,
            -np.ones_like(ii),
        ],
        axis=-1,
    )  # [H, W, 3] camera-frame
    ray_directions = np.sum(directions[..., None, :] * c2w[:3, :3], axis=-1)
    ray_origins = np.broadcast_to(c2w[:3, -1], ray_directions.shape).copy()

    epsilon = 1e-5
    ray_origins[ray_origins == 0] += epsilon
    ray_directions[ray_directions == 0] += epsilon

    dx = np.sqrt(np.sum((directions[:-1, :, :] - directions[1:, :, :]) ** 2, -1))
    dx = np.concatenate([dx, dx[-2:-1, :]], axis=0)
    radii = dx[..., None] * 2.0 / np.sqrt(12.0)

    return (
        ray_origins.astype(np.float32),
        ray_directions.astype(np.float32),
        radii.astype(np.float32),
    )


def get_ray_bundle_device(height: int, width: int, focal_length, c2w):
    """Device-side (jnp) twin of :func:`get_ray_bundle`, same quirks
    (epsilon nudge, x-neighbor radii).  Used by the video renderer so each
    frame uploads a [4,4] pose instead of H*W*7 floats of precomputed rays
    — the ray math is pure arithmetic and fuses into the render program.
    ``height``/``width`` are static; ``focal_length``/``c2w`` may be traced.
    """
    import jax.numpy as jnp

    c2w = jnp.asarray(c2w, jnp.float32)
    ii, jj = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32),
        jnp.arange(height, dtype=jnp.float32),
        indexing="xy",
    )
    directions = jnp.stack(
        [
            (ii - width * 0.5) / focal_length,
            -(jj - height * 0.5) / focal_length,
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )
    ray_directions = jnp.sum(directions[..., None, :] * c2w[:3, :3], axis=-1)
    ray_origins = jnp.broadcast_to(c2w[:3, -1], ray_directions.shape)

    epsilon = 1e-5
    ray_origins = jnp.where(ray_origins == 0, epsilon, ray_origins)
    ray_directions = jnp.where(ray_directions == 0, epsilon, ray_directions)

    dx = jnp.sqrt(jnp.sum((directions[:-1] - directions[1:]) ** 2, -1))
    dx = jnp.concatenate([dx, dx[-2:-1, :]], axis=0)
    radii = dx[..., None] * 2.0 / jnp.sqrt(12.0)
    return ray_origins, ray_directions, radii


def ndc_mipnerf_rays(H, W, focal, rays_o, rays_d, near=1.0, xp=np):
    """Project rays to NDC space and recompute mip radii from x/y neighbor
    distances on the NDC origins (reference dataset_helpers.py:3-42).

    ``rays_o``/``rays_d``: [H, W, 3].  Returns (rays_o, rays_d, radii[H, W]).
    ``xp`` selects the array backend: ``np`` for the host loaders (default),
    ``jax.numpy`` inside jitted render programs (device-side ray gen).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = (
        -1.0
        / (W / (2.0 * focal))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0
        / (H / (2.0 * focal))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = xp.stack([o0, o1, o2], axis=-1).astype(xp.float32)
    rays_d = xp.stack([d0, d1, d2], axis=-1).astype(xp.float32)

    mat = rays_o
    dx = xp.sqrt(xp.sum((mat[:-1, :, :] - mat[1:, :, :]) ** 2, -1))
    dx = xp.concatenate([dx, dx[-2:-1, :]], axis=0)
    dy = xp.sqrt(xp.sum((mat[:, :-1, :] - mat[:, 1:, :]) ** 2, -1))
    dy = xp.concatenate([dy, dy[:, -2:-1]], axis=1)
    radii = ((0.5 * (dx + dy)) * 2.0 / xp.sqrt(12.0)).astype(xp.float32)

    return rays_o, rays_d, radii


def switch_t_ndc_to_regular(ndc_depth, rays_o, rays_d):
    """NDC-space depth -> metric depth (reference dataset_helpers.py:45-48),
    used to un-warp validation depth maps (train_model.py:225-228).

    Works for NumPy or jnp inputs (pure arithmetic).
    """
    return ndc_depth * rays_o[..., -1] / (rays_d[..., -1] - ndc_depth * rays_d[..., -1]) + 1.0
