"""Multi-host (pod-scale) helpers for the sharded ray store.

On a multi-host TPU pod each process sees only its local devices; globally
sharded arrays are assembled from per-host shards.  The reference has no
multi-process support at all (SURVEY.md §2); these helpers define the
DCN-aware feeding pattern for the ray store and per-step batches.

Store layout: the ray store is ``[n_img, n_pix, 10]`` and is sharded over the
**pixel axis** (axis 1), not the image axis.  Rationale:

* every device holds a 1/D pixel-slice of *every* image, so
  ``single_image_mode`` ("all rays of one image per step",
  reference dataset.py:50-55) keeps its exact semantics — all devices pick
  the same image with a shared key and sample their pixel columns locally;
* per-step sampling needs **no collective at all**: each device draws its
  1/D of the batch from its resident shard (stratified-uniform over pixel
  columns — statistically equivalent to global uniform sampling);
* ``n_pix = H*W`` is large (160k–760k), so any realistic mesh width divides
  it after negligible wrap-padding, whereas ``n_img`` (tens of images) often
  would not.

Per-chip HBM for the store is therefore ``total_bytes / n_devices`` and stays
constant as the pod grows; gradient all-reduce stays on ICI within a slice.
Nothing communicates over DCN except the initial store placement.

Single-process multi-device (the common dev case, and the CI virtual mesh)
works through the same entry points.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def store_sharding(mesh: Mesh) -> NamedSharding:
    """Ray-store sharding: pixel axis (axis 1) over the mesh's data axis."""
    return NamedSharding(mesh, P(None, mesh.axis_names[0]))


def pad_store_pixels(store: np.ndarray, n_shards: int) -> np.ndarray:
    """Pad the pixel axis to a multiple of ``n_shards`` by wrapping.

    The duplicated rays are real rays of the same images, so they are valid
    training samples; the bias is at most ``(n_shards-1)/n_pix`` — e.g.
    7/160000 for blender-at-400² on an 8-wide mesh.
    """
    n_pix = store.shape[1]
    pad = (-n_pix) % n_shards
    if pad == 0:
        return store
    # np.take with mode="wrap" handles pad > n_pix (a tiny store on a wide
    # mesh) by cycling the pixel axis as many times as needed.
    idx = np.arange(n_pix + pad) % n_pix
    return np.take(store, idx, axis=1)


def process_ray_slice(num_rays: int) -> slice:
    """The contiguous ray range this host is responsible for loading."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = -(-num_rays // n_proc)
    return slice(idx * per, min((idx + 1) * per, num_rays))


def process_pixel_slice(n_pix_padded: int, n_shards: int) -> slice:
    """This process's contiguous pixel-column block of the (padded) store.

    A 1-D mesh in default device order gives each process a contiguous run of
    devices, hence a contiguous run of pixel columns — exactly the layout
    ``jax.make_array_from_process_local_data`` wants.
    """
    n_proc = jax.process_count()
    if n_shards % n_proc:
        raise ValueError(
            f"mesh width {n_shards} must be a multiple of the process count "
            f"{n_proc}: each host feeds whole device shards"
        )
    per_dev = n_pix_padded // n_shards
    devs_per_proc = n_shards // n_proc
    idx = jax.process_index()
    width = per_dev * devs_per_proc
    return slice(idx * width, (idx + 1) * width)


def host_local_store_slice(store: np.ndarray, n_shards: int) -> np.ndarray:
    """Pad + slice a host ``[n_img, n_pix, C]`` ray store down to this
    process's pixel block.  On a pod, call this on each host and pass the
    result to :func:`global_store` — no host ever materializes rays it does
    not own on-device."""
    store = pad_store_pixels(store, n_shards)
    return store[:, process_pixel_slice(store.shape[1], n_shards)]


def global_store(mesh: Mesh, local: np.ndarray) -> jax.Array:
    """Assemble per-host store slices into one globally sharded array
    (pixel axis over the mesh's data axis)."""
    sharding = store_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    # process_pixel_slice assumed each process owns one contiguous device run
    # in mesh order; validate instead of mis-assembling on exotic topologies.
    procs = [d.process_index for d in mesh.devices.flat]
    first_seen = {}
    for pos, p in enumerate(procs):
        if p in first_seen:
            if procs[pos - 1] != p:
                raise ValueError(
                    "mesh devices of one process are not contiguous in mesh "
                    "order; the per-process pixel-slice feeding pattern "
                    f"(process_pixel_slice) requires contiguity, got {procs}"
                )
        else:
            first_seen[p] = pos
    return jax.make_array_from_process_local_data(sharding, local)


def build_sharded_store(mesh: Mesh, host_store: np.ndarray) -> jax.Array:
    """One-call path from a full host store to the global sharded store
    (single-process) or from this process's implied slice (multi-process).

    Multi-process callers that want to avoid materializing the full store on
    every host should precompute only their slice and call
    :func:`global_store` directly; this convenience accepts the full store
    and slices it here.
    """
    n_shards = mesh.devices.size
    return global_store(mesh, host_local_store_slice(host_store, n_shards))


def global_batch(mesh: Mesh, local_batch: dict) -> dict:
    """Per-host ray batches -> one globally ray-sharded batch."""
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in local_batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local_batch.items()
    }
