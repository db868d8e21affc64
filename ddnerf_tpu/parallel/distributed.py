"""Multi-host (pod-scale) helpers.

On a multi-host TPU pod each process sees only its local devices; globally
sharded arrays are assembled from per-host shards.  The reference has no
multi-process support at all (SURVEY.md §2); these helpers define the
DCN-aware feeding pattern for the ray store and per-step batches:

* every host loads only its slice of the ray store
  (:func:`host_local_store_slice`) and contributes it to one global array
  (:func:`global_store`) — HBM per chip stays constant as the pod grows;
* gradient all-reduce stays on ICI within a slice; nothing here communicates
  over DCN except the initial store placement.

Single-process multi-device (the common dev case, and the CI virtual mesh)
works through the same entry points.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_ray_slice(num_rays: int) -> slice:
    """The contiguous ray range this host is responsible for loading."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = -(-num_rays // n_proc)
    return slice(idx * per, min((idx + 1) * per, num_rays))


def host_local_store_slice(store: np.ndarray) -> np.ndarray:
    """Slice a [n_img, n_pix, C] host ray store down to this process's image
    range (sharding over the image axis keeps rays of one image together)."""
    n_img = store.shape[0]
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = -(-n_img // n_proc)
    return store[idx * per : (idx + 1) * per]


def global_store(mesh: Mesh, local: np.ndarray) -> jax.Array:
    """Assemble the per-host store slices into one globally sharded array
    (image axis over the mesh's data axis)."""
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def global_batch(mesh: Mesh, local_batch: dict) -> dict:
    """Per-host ray batches -> one globally ray-sharded batch."""
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in local_batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local_batch.items()
    }
