"""Multi-host helper tests on the virtual 8-device mesh (single process —
process_count()==1 paths — plus slicing math for the multi-process case)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.parallel import distributed as dist
from ddnerf_tpu.parallel.mesh import make_mesh

requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_process_ray_slice_single_process():
    s = dist.process_ray_slice(100)
    assert (s.start, s.stop) == (0, 100)


def test_host_local_store_slice_identity():
    store = np.zeros((16, 4, 10), np.float32)
    local = dist.host_local_store_slice(store)
    assert local.shape == store.shape


@requires_multidevice
def test_global_store_sharded_over_images():
    mesh = make_mesh(8)
    store = np.arange(16 * 4 * 10, dtype=np.float32).reshape(16, 4, 10)
    g = dist.global_store(mesh, store)
    assert g.shape == (16, 4, 10)
    shards = g.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (2, 4, 10) for s in shards)
    np.testing.assert_array_equal(np.asarray(g), store)


@requires_multidevice
def test_global_batch_ray_sharded():
    mesh = make_mesh(8)
    batch = {"origins": np.zeros((64, 3), np.float32)}
    g = dist.global_batch(mesh, batch)
    assert all(s.data.shape == (8, 3) for s in g["origins"].addressable_shards)


@requires_multidevice
def test_mesh_sizes_divide_rays():
    """Sharded step works for several mesh widths (2/4/8) on the same batch."""
    import jax.numpy as jnp

    from ddnerf_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_batch
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.train.state import create_train_state
    from test_parallel import batch_for, tiny_cfg

    cfg = tiny_cfg()
    cfg, batch = batch_for(cfg)
    pipe = NerfPipeline(cfg)
    state0 = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    losses = []
    for n in (2, 4, 8):
        mesh = make_mesh(n)
        step = make_sharded_train_step(
            cfg.replace_at("parallel.donate_state", False), pipe, mesh
        )
        _, m = step(state0, shard_batch(mesh, batch))
        losses.append(float(m["loss"]))
    assert max(losses) - min(losses) < 1e-4  # identical math on any width
