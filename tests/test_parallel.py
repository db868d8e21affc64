"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4d): the sharded train step must (a) run, (b) produce the same
numbers as the single-device step, (c) actually distribute the ray axis.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.data.assembly import get_datasets
from ddnerf_tpu.models.nerf import NerfPipeline
from ddnerf_tpu.parallel import mesh as pmesh
from ddnerf_tpu.train.state import create_train_state
from ddnerf_tpu.train.step import make_train_step

requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def tiny_cfg(iters=8):
    return Config.from_dict(
        {
            "experiment": {"train_iters": iters},
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 64,
                          "radiance_field_noise_std": 0.0, "perturb": False},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False},
            },
            "dataset": {"type": "blender", "synthetic": True,
                        "single_image_mode": False},
        }
    ).resolved()


def batch_for(cfg, n=64, seed=0):
    train_ds, _, cfg = get_datasets(cfg)
    rng = np.random.default_rng(seed)
    ro, rd, radii, rgb = train_ds.sample_batch(rng, n)
    return cfg, {
        "origins": jnp.asarray(ro), "directions": jnp.asarray(rd),
        "radii": jnp.asarray(radii), "rgb": jnp.asarray(rgb),
    }


@requires_multidevice
def test_sharded_step_matches_single_device():
    cfg = tiny_cfg()
    cfg, batch = batch_for(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))

    # Single-device baseline.
    single = jax.jit(make_train_step(cfg, pipe))
    s1, m1 = single(state, batch)

    # 8-way ray-sharded.
    mesh = pmesh.make_mesh(8)
    sharded_step = pmesh.make_sharded_train_step(
        cfg.replace_at("parallel.donate_state", False), pipe, mesh
    )
    sbatch = pmesh.shard_batch(mesh, batch)
    s8, m8 = sharded_step(state, sbatch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)
    ):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), rtol=1e-3, atol=1e-5)


@requires_multidevice
def test_batch_actually_sharded():
    mesh = pmesh.make_mesh(8)
    batch = {"origins": jnp.zeros((64, 3))}
    sharded = pmesh.shard_batch(mesh, batch)
    shard_shapes = [s.data.shape for s in sharded["origins"].addressable_shards]
    assert all(s == (8, 3) for s in shard_shapes)
    assert len(shard_shapes) == 8


@requires_multidevice
def test_sharded_training_multiple_steps():
    cfg = tiny_cfg()
    cfg, batch = batch_for(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    mesh = pmesh.make_mesh(8)
    step = pmesh.make_sharded_train_step(cfg, pipe, mesh)
    sbatch = pmesh.shard_batch(mesh, batch)
    for _ in range(4):
        state, metrics = step(state, sbatch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 4


@requires_multidevice
def test_sharded_eval_step():
    cfg = tiny_cfg()
    cfg, batch = batch_for(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    mesh = pmesh.make_mesh(8)
    eval_step = pmesh.make_sharded_eval_step(cfg, pipe, mesh)

    from ddnerf_tpu.models.nerf import ScheduleValues

    ray_batch = {k: batch[k] for k in ("origins", "directions", "radii")}
    sbatch = pmesh.shard_batch(mesh, ray_batch)
    out = eval_step(
        state.params, sbatch, jax.random.PRNGKey(0), ScheduleValues.for_eval(cfg)
    )
    assert out[1]["rgb"].shape == (64, 3)
    assert np.isfinite(np.asarray(out[1]["rgb"])).all()
