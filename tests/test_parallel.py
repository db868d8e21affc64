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


# ----------------------------------------------- pixel-axis-sharded store


def marker_store(n_img=3, n_pix=64):
    """Store whose rgb encodes (image idx, normalized pixel idx) so sampled
    rows can be traced back to their origin."""
    store = np.zeros((n_img, n_pix, 10), np.float32)
    store[..., 6] = 0.002  # radii
    store[..., 7] = np.arange(n_img, dtype=np.float32)[:, None]  # image idx
    store[..., 8] = np.arange(n_pix, dtype=np.float32)[None, :] / n_pix
    return store


@requires_multidevice
def test_store_sampler_draws_from_local_shard_only():
    """Device i's block of the batch must come from pixel columns
    [i/8, (i+1)/8) — proving sampling is shard-local (no collective)."""
    from ddnerf_tpu.parallel.distributed import global_store

    mesh = pmesh.make_mesh(8)
    store = global_store(mesh, marker_store())
    sample = pmesh.make_sharded_store_sampler(mesh, 64, single_image_mode=False)
    rows = np.asarray(sample(store, jax.random.PRNGKey(3)))
    assert rows.shape == (64, 10)
    per = 64 // 8
    for i in range(8):
        block = rows[i * per:(i + 1) * per, 8]  # normalized pixel idx
        assert (block >= i / 8).all() and (block < (i + 1) / 8).all()


@requires_multidevice
def test_store_sampler_single_image_mode_spans_one_image():
    """All devices must pick the SAME image (shared key) while sampling
    their own pixel columns."""
    from ddnerf_tpu.parallel.distributed import global_store

    mesh = pmesh.make_mesh(8)
    store = global_store(mesh, marker_store())
    sample = pmesh.make_sharded_store_sampler(mesh, 64, single_image_mode=True)
    for seed in range(4):
        rows = np.asarray(sample(store, jax.random.PRNGKey(seed)))
        imgs = np.unique(rows[:, 7])
        assert imgs.size == 1, f"seed {seed}: batch spans images {imgs}"


@requires_multidevice
def test_store_sampler_pads_indivisible_batch():
    """63 rays on an 8-wide mesh rounds the per-device draw UP: the batch is
    ceil(63/8)*8 = 64 valid i.i.d. rays, still shard-local per device."""
    from ddnerf_tpu.parallel.distributed import global_store

    mesh = pmesh.make_mesh(8)
    store = global_store(mesh, marker_store())
    sample = pmesh.make_sharded_store_sampler(mesh, 63, single_image_mode=False)
    assert sample.effective_num_rays == 64
    rows = np.asarray(sample(store, jax.random.PRNGKey(3)))
    assert rows.shape == (64, 10)
    per = 64 // 8
    for i in range(8):
        block = rows[i * per:(i + 1) * per, 8]
        assert (block >= i / 8).all() and (block < (i + 1) / 8).all()


@requires_multidevice
def test_store_sharded_step_indivisible_num_rays():
    """The full store-sharded train step runs with num_random_rays that does
    not divide the mesh width (VERDICT r2 item 5)."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.parallel.distributed import build_sharded_store

    cfg = tiny_cfg().replace_at("nerf.train.num_random_rays", 60)
    train_ds, _, cfg = get_datasets(cfg)
    mesh = pmesh.make_mesh(8)
    store = build_sharded_store(mesh, train_ds.device_store())
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = pmesh.make_sharded_store_train_step(
        cfg.replace_at("parallel.donate_state", False), pipe, mesh
    )
    for _ in range(2):
        state, metrics = step(state, store)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


@requires_multidevice
def test_store_sharded_train_step_end_to_end():
    """Full production path: build -> pad -> shard -> sample -> step; the
    store must actually be distributed (1/8 pixel block per device) and
    training must advance with finite loss."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.parallel.distributed import build_sharded_store

    cfg = tiny_cfg()
    train_ds, _, cfg = get_datasets(cfg)
    host_store = train_ds.device_store()

    mesh = pmesh.make_mesh(8)
    store = build_sharded_store(mesh, host_store)
    n_pix_padded = -(-host_store.shape[1] // 8) * 8
    assert store.shape == (host_store.shape[0], n_pix_padded, 10)
    assert all(
        s.data.shape == (host_store.shape[0], n_pix_padded // 8, 10)
        for s in store.addressable_shards
    )

    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = pmesh.make_sharded_store_train_step(
        cfg.replace_at("parallel.donate_state", False), pipe, mesh
    )
    for _ in range(3):
        state, metrics = step(state, store)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3


@requires_multidevice
def test_sharded_renderer_matches_single_device():
    """ImageRenderer through the mesh path must produce the same image as
    the single-device on-device-chunked path."""
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = tiny_cfg()
    # Zero the validation density noise: the two paths draw different rng
    # streams per chunk, so only the deterministic render can be compared.
    cfg = cfg.replace_at("nerf.validation.radiance_field_noise_std", 0.0)
    cfg, batch = batch_for(cfg, n=64)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))

    ro = np.asarray(batch["origins"]).reshape(8, 8, 3)
    rd = np.asarray(batch["directions"]).reshape(8, 8, 3)
    rr = np.asarray(batch["radii"]).reshape(8, 8, 1)

    single = ImageRenderer(cfg, pipe, mesh=None)
    out1 = single.render_image(state.params, ro, rd, rr)

    mesh = pmesh.make_mesh(8)
    sharded = ImageRenderer(cfg, pipe, mesh=mesh)
    out8 = sharded.render_image(state.params, ro, rd, rr)

    np.testing.assert_allclose(out1[1]["rgb"], out8[1]["rgb"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out1[1]["depth"], out8[1]["depth"], rtol=2e-3, atol=2e-4)


@requires_multidevice
def test_store_sharded_step_with_microbatch():
    """parallel.microbatch_rays composes with the mesh store path: the scan
    chunks stay ray-sharded and the result matches the un-microbatched
    sharded step (deterministic cfg)."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.parallel.distributed import build_sharded_store

    cfg = tiny_cfg()
    train_ds, _, cfg = get_datasets(cfg)
    mesh = pmesh.make_mesh(8)
    store = build_sharded_store(mesh, train_ds.device_store())
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))

    base = cfg.replace_at("parallel.donate_state", False)
    s_ref, m_ref = pmesh.make_sharded_store_train_step(base, pipe, mesh)(state, store)

    cfg_mb = base.replace_at("parallel.microbatch_rays", 16)
    s_mb, m_mb = pmesh.make_sharded_store_train_step(
        cfg_mb, NerfPipeline(cfg_mb), mesh
    )(state, store)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_mb["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_mb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@requires_multidevice
def test_store_sharded_step_stacked_scan():
    """stack_steps: K steps in one dispatch over the sharded store, metrics
    stacked [K] (the block-mode train driver's mesh path)."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.parallel.distributed import build_sharded_store

    cfg = tiny_cfg()
    train_ds, _, cfg = get_datasets(cfg)
    cfg = cfg.replace_at("parallel.donate_state", False)
    mesh = pmesh.make_mesh(8)
    store = build_sharded_store(mesh, train_ds.device_store())
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))

    # 3 single steps vs one stacked block of 3 — same rng folding per step.
    single = pmesh.make_sharded_store_train_step(cfg, pipe, mesh)
    s1 = state
    singles = []
    for _ in range(3):
        s1, m = single(s1, store)
        singles.append(float(m["loss"]))

    stacked_step = pmesh.make_sharded_store_train_step(cfg, pipe, mesh,
                                                       stack_steps=3)
    s3, stacked = stacked_step(state, store)
    assert stacked["loss"].shape == (3,)
    np.testing.assert_allclose(np.asarray(stacked["loss"]), singles, rtol=1e-5)
    assert int(s3.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@requires_multidevice
def test_video_frame_mesh_matches_single_device():
    """render_video_frame_from_pose on the mesh (pose-only upload, on-device
    ray gen + uint8 quantization, rows sharded over the data axis) must match
    the single-device on-device path within one uint8 step."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = tiny_cfg()
    cfg = cfg.replace_at("nerf.validation.radiance_field_noise_std", 0.0)
    _, val_ds, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    pose = val_ds.render_poses[0]

    single = ImageRenderer(cfg, pipe, mesh=None, mode="render",
                           extract_keys=("rgb", "disp"))
    rgb1, disp1 = single.render_video_frame_from_pose(
        state.params, pose, val_ds.H, val_ds.W, val_ds.focal)

    mesh = pmesh.make_mesh(8)
    sharded = ImageRenderer(cfg, pipe, mesh=mesh, mode="render",
                            extract_keys=("rgb", "disp"))
    rgb8, disp8 = sharded.render_video_frame_from_pose(
        state.params, pose, val_ds.H, val_ds.W, val_ds.focal)

    assert rgb8.dtype == np.uint8 and disp8.dtype == np.uint8
    assert np.max(np.abs(rgb1.astype(int) - rgb8.astype(int))) <= 1
    assert np.max(np.abs(disp1.astype(int) - disp8.astype(int))) <= 1


@requires_multidevice
def test_image_from_pose_mesh_matches_single_device():
    """render_image_from_pose on the mesh (on-device ray gen, sharded rows)
    must match the single-device pose path."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = tiny_cfg()
    cfg = cfg.replace_at("nerf.validation.radiance_field_noise_std", 0.0)
    _, val_ds, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    pose = val_ds.render_poses[0]

    single = ImageRenderer(cfg, pipe, mesh=None, mode="render",
                           extract_keys=("rgb", "disp", "depth"))
    out1 = single.render_image_from_pose(
        state.params, pose, val_ds.H, val_ds.W, val_ds.focal)

    mesh = pmesh.make_mesh(8)
    sharded = ImageRenderer(cfg, pipe, mesh=mesh, mode="render",
                            extract_keys=("rgb", "disp", "depth"))
    out8 = sharded.render_image_from_pose(
        state.params, pose, val_ds.H, val_ds.W, val_ds.focal)

    np.testing.assert_allclose(out1[1]["rgb"], out8[1]["rgb"],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out1[1]["depth"], out8[1]["depth"],
                               rtol=2e-3, atol=2e-4)


@requires_multidevice
def test_image_from_pose_mesh_f16_wire():
    """parallel.fetch_dtype=float16 composes with the mesh pose program:
    the cast runs before the replicating all-gather (halving it too) and
    the host sees f32 maps within one half-precision rounding of the f32
    wire."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = tiny_cfg()
    cfg = cfg.replace_at("nerf.validation.radiance_field_noise_std", 0.0)
    _, val_ds, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    pose = val_ds.render_poses[0]
    mesh = pmesh.make_mesh(8)

    keys = ("rgb", "disp", "depth")
    f32 = ImageRenderer(cfg, pipe, mesh=mesh, mode="render",
                        extract_keys=keys)
    want = f32.render_image_from_pose(
        state.params, pose, val_ds.H, val_ds.W, val_ds.focal)

    f16 = ImageRenderer(cfg.replace_at("parallel.fetch_dtype", "float16"),
                        pipe, mesh=mesh, mode="render", extract_keys=keys)
    got = f16.render_image_from_pose(
        state.params, pose, val_ds.H, val_ds.W, val_ds.focal)

    for key in keys:
        g = np.asarray(got[1][key])
        assert g.dtype == np.float32
        np.testing.assert_allclose(g, want[1][key], rtol=2e-3, atol=2e-3,
                                   err_msg=key)


@requires_multidevice
def test_sharded_step_with_fused_backward_kernel():
    """pallas_mlp="train" composes with the ray-sharded step: the fused
    Pallas forward/backward kernels run per-shard under shard_map
    (interpret mode on the CPU mesh) and match the single-device XLA step."""
    cfg = tiny_cfg().replace_at("parallel.pallas_mlp", "train")
    cfg, batch = batch_for(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))

    ref_pipe = NerfPipeline(cfg.replace_at("parallel.pallas_mlp", "off"))
    single = jax.jit(make_train_step(cfg, ref_pipe))
    s1, m1 = single(state, batch)

    mesh = pmesh.make_mesh(8)
    sharded_step = pmesh.make_sharded_train_step(
        cfg.replace_at("parallel.donate_state", False), pipe, mesh
    )
    sbatch = pmesh.shard_batch(mesh, batch)
    s8, m8 = sharded_step(state, sbatch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l8), rtol=2e-3, atol=2e-5
        )


@requires_multidevice
def test_store_sharded_step_with_fused_kernel_scan():
    """The full production mesh path with the fused train kernels:
    pixel-axis-sharded store -> per-shard sampling -> stacked scan blocks,
    with pallas_mlp="train" (interpret kernels on the CPU mesh)."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.parallel.distributed import build_sharded_store

    cfg = tiny_cfg().replace_at("parallel.pallas_mlp", "train")
    train_ds, _, cfg = get_datasets(cfg)
    mesh = pmesh.make_mesh(8)
    store = build_sharded_store(mesh, train_ds.device_store())

    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = pmesh.make_sharded_store_train_step(
        cfg.replace_at("parallel.donate_state", False), pipe, mesh,
        stack_steps=2,
    )
    state, stacked = step(state, store)
    assert stacked["loss"].shape == (2,)
    assert np.isfinite(np.asarray(stacked["loss"])).all()
    assert int(state.step) == 2


def test_pipelined_pose_renders_match_serial():
    """render_images_from_poses / render_video_frames_from_poses (one image
    of dispatch lookahead) must reproduce the per-image calls exactly —
    the lookahead changes scheduling, not values (same per-image rng)."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = tiny_cfg()
    cfg = cfg.replace_at("nerf.validation.radiance_field_noise_std", 0.0)
    _, val_ds, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    poses = [val_ds.render_poses[i] for i in range(3)]
    h, w, focal = val_ds.H, val_ds.W, val_ds.focal

    r = ImageRenderer(cfg, pipe, mesh=None, mode="render",
                      extract_keys=("rgb", "disp"))
    serial = [r.render_image_from_pose(state.params, p, h, w, focal)
              for p in poses]
    piped = list(r.render_images_from_poses(state.params, poses, h, w, focal))
    assert len(piped) == len(serial)
    for a, b in zip(piped, serial):
        for i in (0, 1):
            for key in a[i]:
                np.testing.assert_array_equal(a[i][key], b[i][key])

    serial_v = [r.render_video_frame_from_pose(state.params, p, h, w, focal)
                for p in poses]
    piped_v = list(r.render_video_frames_from_poses(state.params, poses,
                                                    h, w, focal))
    for (ra, da), (rb, db) in zip(piped_v, serial_v):
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(da, db)


@requires_multidevice
def test_pipelined_pose_renders_on_mesh():
    """The lookahead generator composes with the sharded pose program
    (render-tile parallelism): same maps as the single-device serial call."""
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = tiny_cfg()
    cfg = cfg.replace_at("nerf.validation.radiance_field_noise_std", 0.0)
    _, val_ds, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    poses = [val_ds.render_poses[i] for i in range(2)]
    h, w, focal = val_ds.H, val_ds.W, val_ds.focal

    single = ImageRenderer(cfg, pipe, mesh=None, mode="render",
                           extract_keys=("rgb", "disp"))
    serial = [single.render_image_from_pose(state.params, p, h, w, focal)
              for p in poses]

    mesh = pmesh.make_mesh(8)
    sharded = ImageRenderer(cfg, pipe, mesh=mesh, mode="render",
                            extract_keys=("rgb", "disp"))
    piped = list(sharded.render_images_from_poses(state.params, poses,
                                                  h, w, focal))
    for a, b in zip(piped, serial):
        np.testing.assert_allclose(a[1]["rgb"], b[1]["rgb"],
                                   rtol=2e-4, atol=2e-5)
