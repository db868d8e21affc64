"""Pod-width stress beyond the suite's 8-device mesh (VERDICT r2 item 9).

A subprocess gets 16 virtual CPU devices (the device count is fixed at
backend init, so the suite's 8-device process can't widen itself) and runs
the production mesh paths at width 16: store sharding with wrap-padding,
per-shard in-step sampling (normal + single_image_mode), the stacked scan
block, and the pose-only sharded renderer.
"""

import os
import subprocess
import sys
import textwrap

from conftest import REPO_ROOT

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() == 16

    import numpy as np
    sys.path.insert(0, "/root/repo")
    from ddnerf_tpu.config import Config
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.parallel import distributed as dist
    from ddnerf_tpu.parallel import mesh as pmesh
    from ddnerf_tpu.render.renderer import ImageRenderer
    from ddnerf_tpu.train.state import create_train_state

    W = 16

    def cfg_with(**train_over):
        train = {"num_coarse": 4, "num_fine": 4, "num_random_rays": 2 * W,
                 "radiance_field_noise_std": 0.0, "perturb": False,
                 "chunksize": 64}
        train.update(train_over)
        return Config.from_dict({
            "experiment": {"train_iters": 4},
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16, "fine_hidden_size": 16,
                "train": train,
                "validation": {"num_coarse": 4, "num_fine": 4,
                               "perturb": False, "chunksize": 64},
            },
            "dataset": {"type": "blender", "synthetic": True,
                        "single_image_mode": train_over.get("_single", False)},
            "parallel": {"donate_state": False},
        }).resolved()

    mesh = pmesh.make_mesh(W)

    # Store with a pixel count that does NOT divide 16 -> wrap-padding, and
    # a marker channel to prove shard-local sampling at width 16.
    n_img, n_pix = 3, 16 * 3 + 5
    rs = np.random.default_rng(0)
    host_store = rs.standard_normal((n_img, n_pix, 10)).astype(np.float32)
    host_store[..., 6:7] = 0.002
    host_store[..., 7] = np.arange(n_img, dtype=np.float32)[:, None]
    store = dist.build_sharded_store(mesh, host_store)
    assert store.shape[1] % W == 0 and store.shape[1] >= n_pix

    # --- normal-mode sharded-store step, indivisible num_rays (30 on 16
    # devices -> padded per-device draw).
    cfg = cfg_with(num_random_rays=30)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = pmesh.make_sharded_store_train_step(cfg, pipe, mesh)
    for _ in range(2):
        state, metrics = step(state, store)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2

    # --- single_image_mode at width 16: every device must pick the SAME
    # image.
    sampler = pmesh.make_sharded_store_sampler(mesh, 2 * W,
                                               single_image_mode=True)
    for seed in range(3):
        rows = np.asarray(sampler(store, jax.random.PRNGKey(seed)))
        assert np.unique(rows[:, 7]).size == 1, rows[:, 7]

    # --- stacked scan block (the train_scalars_every driver's mesh path).
    stacked = pmesh.make_sharded_store_train_step(cfg, pipe, mesh,
                                                  stack_steps=3)
    state, ms = stacked(state, store)
    assert ms["loss"].shape == (3,)
    assert np.isfinite(np.asarray(ms["loss"])).all()

    # --- pose-only sharded renderer at width 16 (h*w=64 rays, chunk 64
    # divides the mesh).
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 4.0
    r = ImageRenderer(cfg, pipe, mesh, mode="render",
                      extract_keys=("rgb", "disp"))
    rgb_u8, disp_u8 = r.render_video_frame_from_pose(
        state.params, pose, 8, 8, focal=8.0)
    assert rgb_u8.shape == (8, 8, 3) and rgb_u8.dtype == np.uint8
    assert disp_u8.shape == (8, 8)

    print("WIDE_MESH_OK", flush=True)
    """
)


def test_sixteen_device_mesh(tmp_path):
    script = tmp_path / "wide_worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["DDNERF_CACHE_DIR"] = os.environ.get(
        "DDNERF_CACHE_DIR", "/tmp/ddnerf_tpu_test_xla_cache"
    )
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        cwd=REPO_ROOT, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "WIDE_MESH_OK" in proc.stdout
