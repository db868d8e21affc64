"""Multi-host helper tests on the virtual 8-device mesh.

Covers the single-process (``process_count()==1``) code paths plus the
slicing math used on real pods, and — in ``test_two_process_cpu_pod`` —
a genuine 2-process ``jax.distributed`` run over subprocesses, so the
``make_array_from_process_local_data`` branches execute for real.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from ddnerf_tpu.parallel import distributed as dist
from ddnerf_tpu.parallel.mesh import make_mesh

requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_process_ray_slice_single_process():
    s = dist.process_ray_slice(100)
    assert (s.start, s.stop) == (0, 100)


def test_pad_store_pixels_wraps():
    store = np.arange(2 * 10 * 3, dtype=np.float32).reshape(2, 10, 3)
    padded = dist.pad_store_pixels(store, 8)
    assert padded.shape == (2, 16, 3)
    np.testing.assert_array_equal(padded[:, 10:], store[:, :6])
    # already divisible -> unchanged object
    assert dist.pad_store_pixels(store, 5) is store


def test_pad_store_pixels_tiny_store_wide_mesh():
    """pad > n_pix (3 pixels on a 16-wide mesh) cycles the pixel axis
    instead of under-padding (ADVICE r2)."""
    store = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    padded = dist.pad_store_pixels(store, 16)
    assert padded.shape == (2, 16, 4)
    np.testing.assert_array_equal(padded, store[:, np.arange(16) % 3])


def test_process_pixel_slice_single_process():
    # 1 process, 8 shards, 16 padded pixels -> the whole range.
    s = dist.process_pixel_slice(16, 8)
    assert (s.start, s.stop) == (0, 16)


def test_host_local_store_slice_identity():
    store = np.zeros((4, 16, 10), np.float32)
    local = dist.host_local_store_slice(store, n_shards=8)
    assert local.shape == store.shape


@requires_multidevice
def test_global_store_sharded_over_pixels():
    mesh = make_mesh(8)
    store = np.arange(3 * 16 * 10, dtype=np.float32).reshape(3, 16, 10)
    g = dist.global_store(mesh, store)
    assert g.shape == (3, 16, 10)
    shards = g.addressable_shards
    assert len(shards) == 8
    # pixel axis split, image axis whole on every device
    assert all(s.data.shape == (3, 2, 10) for s in shards)
    np.testing.assert_array_equal(np.asarray(g), store)


@requires_multidevice
def test_build_sharded_store_pads_odd_pixels():
    mesh = make_mesh(8)
    store = np.random.default_rng(0).standard_normal((2, 13, 10)).astype(np.float32)
    g = dist.build_sharded_store(mesh, store)
    assert g.shape == (2, 16, 10)  # 13 -> padded to 16
    np.testing.assert_array_equal(np.asarray(g)[:, :13], store)


@requires_multidevice
def test_global_batch_ray_sharded():
    mesh = make_mesh(8)
    batch = {"origins": np.zeros((64, 3), np.float32)}
    g = dist.global_batch(mesh, batch)
    assert all(s.data.shape == (8, 3) for s in g["origins"].addressable_shards)


@requires_multidevice
def test_mesh_sizes_divide_rays():
    """Sharded step works for several mesh widths (2/4/8) on the same batch."""
    from ddnerf_tpu.parallel.mesh import make_sharded_train_step, shard_batch
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


# --------------------------------------------------------------- 2-process

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=proc_id,
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 4

    import numpy as np
    sys.path.insert(0, "/root/repo")
    from ddnerf_tpu.config import Config
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.parallel import distributed as dist
    from ddnerf_tpu.parallel.mesh import make_mesh, make_sharded_store_train_step
    from ddnerf_tpu.train.state import create_train_state

    cfg = Config.from_dict({
        "experiment": {"train_iters": 4},
        "nerf": {
            "type": "DDNerfModel",
            "coarse_hidden_size": 16, "fine_hidden_size": 16,
            "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 16,
                      "radiance_field_noise_std": 0.0, "perturb": False},
            "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False},
        },
        "dataset": {"type": "blender", "synthetic": True},
        "parallel": {"donate_state": False},
    }).resolved()

    mesh = make_mesh()  # all 4 global devices
    # Every host materializes the same logical store, keeps only its block.
    rs = np.random.default_rng(0)
    host_store = rs.standard_normal((2, 10, 10)).astype(np.float32)
    host_store[..., 6:7] = 0.002
    local = dist.host_local_store_slice(host_store, n_shards=4)
    assert local.shape == (2, 6, 10)  # 10 -> pad 12, half per process
    store = dist.global_store(mesh, local)
    assert store.shape == (2, 12, 10)

    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = make_sharded_store_train_step(cfg, pipe, mesh)
    state, metrics = step(state, store)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"RESULT {proc_id} {loss:.10f}", flush=True)
    """
)


def test_two_process_cpu_pod(tmp_path):
    """Real multi-process run: 2 processes x 2 virtual CPU devices, global
    store assembled via ``jax.make_array_from_process_local_data``, one
    sharded-store train step; losses must agree bit-for-bit across hosts."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd="/root/repo/tests",
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, f"no RESULT line:\n{out}"
        losses.append(lines[0].split()[2])
    assert losses[0] == losses[1]


_TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    proc_id = int(sys.argv[1]); port = sys.argv[2]; logroot = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=proc_id,
    )
    sys.path.insert(0, "/root/repo")
    from ddnerf_tpu.config import Config
    from ddnerf_tpu.train.loop import train

    cfg = Config.from_dict({
        "experiment": {
            "id": "pod", "logdir": logroot, "train_iters": 6,
            "validate_every": 5, "save_every": 5, "print_every": 5,
        },
        "nerf": {
            "type": "DDNerfModel",
            "coarse_hidden_size": 16, "fine_hidden_size": 16,
            "train": {"num_coarse": 4, "num_fine": 4, "num_random_rays": 16,
                      "radiance_field_noise_std": 0.0, "perturb": False,
                      "chunksize": 1024},
            "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                           "chunksize": 1024},
        },
        "dataset": {"type": "blender", "synthetic": True},
        "parallel": {"donate_state": False},
    }).resolved()
    state, logdir = train(cfg, use_tensorboard=False, verbose=False)
    assert int(state.step) == 6
    print(f"RESULT {proc_id} step={int(state.step)}", flush=True)
    """
)


def test_two_process_full_train_loop(tmp_path):
    """The COMPLETE train() driver on a real 2-process CPU pod: sharded
    store assembly, sharded train step, sharded validation render,
    collective orbax save, and process-0-only artifact writing."""
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER)
    logroot = str(tmp_path / "logs")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), logroot],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "RESULT" in out

    logdir = os.path.join(logroot, "pod")
    # process-0-only artifacts, written exactly once
    assert os.path.exists(os.path.join(logdir, "config.yml"))
    assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))
    # collective orbax checkpoint restored by step
    assert os.path.isdir(os.path.join(logdir, "checkpoint"))
    import json

    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        kinds = [json.loads(l)["kind"] for l in f]
    assert kinds.count("train") >= 1 and kinds.count("validation") >= 1
