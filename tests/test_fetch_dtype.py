"""parallel.fetch_dtype — half-width wire format for the render map fetch.

The pipelined pose render is fetch-bound on relayed/slow host links
(PERF.md round-4 tenth pass: ~36 MB of f32 maps vs 0.62 s device time at
800x800).  ``fetch_dtype: float16|bfloat16`` casts the maps on device at
the END of the render program and upcasts back to f32 on host, so
consumers see identical dtypes and the maps differ from the f32 wire
only by one half-precision rounding.
"""

import numpy as np
import pytest

from ddnerf_tpu.config import Config


def _tiny_cfg(**parallel):
    return Config.from_dict(
        {
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4},
                "validation": {"num_coarse": 4, "num_fine": 4,
                               "perturb": False,
                               "radiance_field_noise_std": 0.0,
                               "chunksize": 64},
            },
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": {"num_devices": 1, **parallel},
        }
    ).resolved()


@pytest.mark.parametrize("wire", ["float16", "bfloat16"])
def test_fetch_dtype_narrow_wire_matches_f32(wire):
    """The narrow-wire maps must equal the f32-wire maps up to one
    half-precision rounding, arrive as f32 on host, and cover both fetch
    paths (on-device chunked render + the pose program)."""
    import jax

    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = _tiny_cfg()
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    sched = ScheduleValues.for_eval(cfg)

    rng = np.random.default_rng(0)
    n = 65  # two chunks at chunksize=64 -> padded tail exercised
    ro = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    radii = np.full((n, 1), 0.002, np.float32)

    keys = ("rgb", "disp", "dp_loss")
    base = ImageRenderer(cfg, pipe, extract_keys=keys)
    narrow = ImageRenderer(_tiny_cfg(fetch_dtype=wire), pipe,
                           extract_keys=keys)

    want = base.render_flat(params, ro, rd, radii, sched=sched)
    got = narrow.render_flat(params, ro, rd, radii, sched=sched)
    # bf16 keeps f32's exponent but only 8 mantissa bits
    tol = dict(rtol=1e-2, atol=1e-2) if wire == "bfloat16" else dict(
        rtol=2e-3, atol=2e-3)
    for cyc in (0, 1):
        for key in keys:
            if key not in want[cyc]:
                continue
            g = np.asarray(got[cyc][key])
            if g.ndim:  # per-chunk scalars ride the f64 weighted mean
                assert g.dtype == np.float32, (cyc, key, g.dtype)
            np.testing.assert_allclose(
                g, np.asarray(want[cyc][key]),
                err_msg=f"cycle {cyc} {key}", **tol)

    # Pose program path (the pipelined eval/video fetch)
    from ddnerf_tpu.data.synthetic import pose_spherical

    pose = pose_spherical(30.0, -30.0, 4.0)
    h = w = 12
    focal = 12.0
    want_p = base.render_image_from_pose(params, pose, h, w, focal,
                                         sched=sched)
    got_p = narrow.render_image_from_pose(params, pose, h, w, focal,
                                          sched=sched)
    for cyc in (0, 1):
        for key in keys:
            if key not in want_p[cyc]:
                continue
            g = np.asarray(got_p[cyc][key])
            if g.ndim:
                assert g.dtype == np.float32, (cyc, key, g.dtype)
            np.testing.assert_allclose(
                g, np.asarray(want_p[cyc][key]),
                err_msg=f"pose cycle {cyc} {key}", **tol)


def test_fetch_dtype_f32_wire_is_identity():
    """The default wire is exactly the old path: no cast ops are inserted
    (the cast helper returns its input tree unchanged)."""
    import jax.numpy as jnp

    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = _tiny_cfg()
    r = ImageRenderer(cfg, NerfPipeline(cfg))
    tree = {"a": jnp.ones((2, 2), jnp.float32)}
    assert r._cast_for_fetch(tree) is tree
    arr = np.ones(3, np.float16)
    assert r._host_f32(arr) is arr  # f32 wire: no host-side conversion


def test_packed_fetch_is_exact(monkeypatch):
    """The packed pose fetch (one wire array, column-split on host) must be
    BIT-identical to the unpacked per-map fetch on the f32 wire — concat/
    split round-trips exactly."""
    import jax

    from ddnerf_tpu.data.synthetic import pose_spherical
    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render import renderer as rmod
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = _tiny_cfg()
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    sched = ScheduleValues.for_eval(cfg)
    pose = pose_spherical(30.0, -30.0, 4.0)
    h = w = 9  # k*chunk > n -> padded tail exercised
    focal = 9.0
    keys = ("rgb", "disp", "acc", "depth", "corrected_disp_map", "dp_loss")

    # The module default must be packed, else "packed" below is vacuously
    # identical to the unpacked control and the contract goes untested.
    assert rmod.PACKED_FETCH
    packed = ImageRenderer(cfg, pipe, extract_keys=keys)
    got = packed.render_image_from_pose(params, pose, h, w, focal,
                                        sched=sched)
    monkeypatch.setattr(rmod, "PACKED_FETCH", False)
    unpacked = ImageRenderer(cfg, pipe, extract_keys=keys)
    want = unpacked.render_image_from_pose(params, pose, h, w, focal,
                                           sched=sched)

    for cyc in (0, 1):
        assert set(got[cyc]) == set(want[cyc]), cyc
        for key in want[cyc]:
            np.testing.assert_array_equal(
                np.asarray(got[cyc][key]), np.asarray(want[cyc][key]),
                err_msg=f"cycle {cyc} {key}")


def test_packed_fetch_is_exact_ondevice_path(monkeypatch):
    """Same bit-exactness pin for the on-device chunked render path
    (``render_flat`` -> ``_ondevice_render``), which packs through the
    shared ``_split_maps_scalars`` helper: packed vs unpacked must agree
    bit-for-bit on the f32 wire, including the padded tail chunk and the
    per-chunk-scalar weighted mean."""
    import jax

    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render import renderer as rmod
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = _tiny_cfg()
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    sched = ScheduleValues.for_eval(cfg)

    rng = np.random.default_rng(1)
    n = 65  # two chunks at chunksize=64 -> padded tail exercised
    ro = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    radii = np.full((n, 1), 0.002, np.float32)
    keys = ("rgb", "disp", "acc", "depth", "corrected_disp_map", "dp_loss")

    assert rmod.PACKED_FETCH  # see the pose-path twin above
    packed = ImageRenderer(cfg, pipe, extract_keys=keys)
    got = packed.render_flat(params, ro, rd, radii, sched=sched)
    monkeypatch.setattr(rmod, "PACKED_FETCH", False)
    unpacked = ImageRenderer(cfg, pipe, extract_keys=keys)
    want = unpacked.render_flat(params, ro, rd, radii, sched=sched)

    for cyc in (0, 1):
        assert set(got[cyc]) == set(want[cyc]), cyc
        for key in want[cyc]:
            np.testing.assert_array_equal(
                np.asarray(got[cyc][key]), np.asarray(want[cyc][key]),
                err_msg=f"cycle {cyc} {key}")


def test_fetch_dtype_rejects_unknown_value():
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.render.renderer import ImageRenderer

    cfg = _tiny_cfg(fetch_dtype="float8")
    with pytest.raises(ValueError, match="fetch_dtype"):
        ImageRenderer(cfg, NerfPipeline(cfg))
