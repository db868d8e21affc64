"""Metrics (SSIM/PSNR), LR-schedule parity, and config-system tests."""

import numpy as np
import pytest

from ddnerf_tpu.config import Config
from ddnerf_tpu.core import schedules
from ddnerf_tpu.eval import metrics as M

from conftest import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)


# ------------------------------------------------------------------ SSIM


def test_ssim_identity_is_one():
    img = np.random.default_rng(0).uniform(0, 1, (32, 32))
    assert M.ssim(img, img, data_range=1.0) == pytest.approx(1.0, abs=1e-6)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 48))
    light = np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1)
    heavy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
    s_light = M.ssim(img, light, data_range=1.0)
    s_heavy = M.ssim(img, heavy, data_range=1.0)
    assert 1.0 > s_light > s_heavy > 0.0


def test_ssim_brute_force_window():
    """Cross-check the cumsum-based uniform filter against a naive O(n^2 w^2)
    windowed implementation."""
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (20, 20))
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)

    win, k1, k2, dr = 7, 0.01, 0.03, 1.0
    pad = win // 2
    ap = np.pad(a, pad, mode="symmetric")
    bp = np.pad(b, pad, mode="symmetric")
    n = win * win
    cov_norm = n / (n - 1)
    vals = []
    for i in range(pad, pad + a.shape[0]):
        for j in range(pad, pad + a.shape[1]):
            wa = ap[i - pad : i + pad + 1, j - pad : j + pad + 1]
            wb = bp[i - pad : i + pad + 1, j - pad : j + pad + 1]
            ux, uy = wa.mean(), wb.mean()
            vx = cov_norm * (np.mean(wa * wa) - ux * ux)
            vy = cov_norm * (np.mean(wb * wb) - uy * uy)
            vxy = cov_norm * (np.mean(wa * wb) - ux * uy)
            c1, c2 = (k1 * dr) ** 2, (k2 * dr) ** 2
            vals.append(
                ((2 * ux * uy + c1) * (2 * vxy + c2))
                / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
            )
    # Crop like the fast path does.
    grid = np.array(vals).reshape(a.shape)
    expect = grid[pad:-pad, pad:-pad].mean()
    got = M.ssim(a, b, data_range=1.0)
    assert got == pytest.approx(expect, abs=1e-9)


def test_calc_ssim_two_variants():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    tgt = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(np.float32)
    v1, v2 = M.calc_ssim(img, tgt)
    assert 0 < v1 < 1 and 0 < v2 < 1
    assert v1 != v2  # different data_range conventions


def test_psnr():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert M.psnr(a, b) == pytest.approx(20.0, abs=1e-6)


# ------------------------------------------------------------ LR schedule


@requires_reference
def test_lr_schedule_parity():
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from general_utils.nerf_helpers import learning_rate_decay as ref_lr

    for step in [0, 100, 2500, 50000, 200000]:
        ours = float(
            schedules.learning_rate_decay(
                step, 5e-4, 5e-6, 200001, lr_delay_steps=2500, lr_delay_mult=0.01
            )
        )
        theirs = float(ref_lr(step, 5e-4, 5e-6, 200001, 2500, 0.01))
        assert ours == pytest.approx(theirs, rel=1e-5), step


def test_schedule_values():
    cfg = Config.from_dict(
        {"train_params": {"max_pdf_pad_iters": 100, "gaussian_smooth_factor": 2.0,
                          "final_smooth": 1.0, "finnish_smooth": 1000}}
    )
    assert bool(schedules.pdf_padding(99, cfg))
    assert not bool(schedules.pdf_padding(100, cfg))
    assert float(schedules.gaussian_smooth_factor(0, cfg)) == pytest.approx(2.0)
    assert float(schedules.gaussian_smooth_factor(500, cfg)) == pytest.approx(1.5)
    assert float(schedules.gaussian_smooth_factor(5000, cfg)) == pytest.approx(1.0)


def test_pdf_padding_respects_initial_config_value():
    """A config that starts with pdf_padding: False never pads — the
    reference only ever flips the configured value off."""
    cfg = Config.from_dict(
        {"train_params": {"pdf_padding": False, "max_pdf_pad_iters": 100}}
    )
    assert not bool(schedules.pdf_padding(0, cfg))
    assert not bool(schedules.pdf_padding(99, cfg))


def test_for_eval_pdf_padding_gate():
    """eval_nerf.py:53-55 parity: the eval fixup (padding off, final smooth)
    applies ONLY if training passed max_pdf_pad_iters (VERDICT r2 item 3)."""
    from ddnerf_tpu.models.nerf import ScheduleValues

    base = {
        "train_params": {"pdf_padding": True, "max_pdf_pad_iters": 100,
                         "gaussian_smooth_factor": 2.0, "final_smooth": 1.0,
                         "finnish_smooth": 1000},
    }
    # Training passed the flip -> padding off, final smooth.
    cfg = Config.from_dict({**base, "experiment": {"train_iters": 200}})
    s = ScheduleValues.for_eval(cfg)
    assert not bool(s.pdf_padding)
    assert float(s.gaussian_smooth_factor) == pytest.approx(1.0)
    # Training never reached the flip -> padding stays ON, initial smooth.
    cfg = Config.from_dict({**base, "experiment": {"train_iters": 100}})
    s = ScheduleValues.for_eval(cfg)
    assert bool(s.pdf_padding)
    assert float(s.gaussian_smooth_factor) == pytest.approx(2.0)
    # pdf_padding: False in config stays off either way.
    cfg = Config.from_dict(
        {"train_params": {**base["train_params"], "pdf_padding": False},
         "experiment": {"train_iters": 100}}
    )
    assert not bool(ScheduleValues.for_eval(cfg).pdf_padding)


# ---------------------------------------------------------------- config


def test_config_reads_reference_yaml_verbatim():
    """Our config must ingest the reference's own YAML files unchanged."""
    import os

    path = os.path.join(REFERENCE_PATH, "configs", "config_blender.yml")
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    cfg = Config.from_yaml(path).resolved()
    assert cfg.nerf.type == "DDNerfModel"
    assert cfg.nerf.train.num_coarse == 32
    assert cfg.dataset.near == 2 and cfg.dataset.far == 6
    assert cfg.train_params.gaussian_smooth_factor == 1.7
    # auto dist_reg: clip(1/32, .01, .12) = 0.03125 (train_model.py:124-126)
    assert cfg.train_params.dist_reg_coeficient == pytest.approx(1 / 32)


def test_config_roundtrip_and_replace():
    cfg = Config()
    dumped = cfg.dump()
    cfg2 = Config.from_yaml_str(dumped) if hasattr(Config, "from_yaml_str") else None
    import io

    cfg2 = Config.from_yaml(io.StringIO(dumped))
    assert cfg2 == cfg
    cfg3 = cfg.replace_at("nerf.train.num_coarse", 64)
    assert cfg3.nerf.train.num_coarse == 64
    assert cfg.nerf.train.num_coarse == 32  # frozen original untouched


def test_own_config_files_load():
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = glob.glob(os.path.join(repo, "configs", "*.yml"))
    assert len(files) >= 6
    for f in files:
        cfg = Config.from_yaml(f).resolved()
        assert cfg.nerf.type in ("DDNerfModel", "GeneralMipNerfModel"), f


# ------------------------------------------------- CLI config overrides


def test_merge_from_list_basic():
    """YACS-style `key value` override pairs (cfgnode.py:208)."""
    cfg = Config()
    out = cfg.merge_from_list(
        ["nerf.train.num_coarse", "64",
         "optimizer.lr_init", "1e-3",
         "dataset.type", "llff",
         "nerf.validation.perturb", "true",
         "train_params.loss_coeficients", "[0.5, 2.0]"]
    )
    assert out.nerf.train.num_coarse == 64
    assert out.optimizer.lr_init == pytest.approx(1e-3)
    assert out.dataset.type == "llff"
    assert out.nerf.validation.perturb is True
    assert out.train_params.loss_coeficients == (0.5, 2.0)
    # original untouched (frozen dataclasses)
    assert cfg.nerf.train.num_coarse == 32


def test_merge_from_list_rejects_bad_input():
    cfg = Config()
    with pytest.raises(ValueError):
        cfg.merge_from_list(["nerf.train.num_coarse"])  # odd length
    with pytest.raises(ValueError):
        cfg.merge_from_list(["nerf.train.num_coarse", "not_an_int"])
    with pytest.raises(AttributeError):
        cfg.merge_from_list(["nerf.train.no_such_key", "1"])
    with pytest.raises(ValueError):
        cfg.merge_from_list(["nerf.validation.perturb", "3"])  # bool field


def test_merge_from_list_int_to_float_coercion():
    cfg = Config()
    out = cfg.merge_from_list(["optimizer.lr_init", "1"])
    assert out.optimizer.lr_init == 1.0
    assert isinstance(out.optimizer.lr_init, float)


def test_yaml11_off_keyword_reaches_str_fields():
    """``parallel.pallas_mlp off`` must mean the string "off", not False.

    YAML 1.1 (pyyaml's safe_load) coerces bare off/on/yes/no to booleans,
    which broke the documented kernel escape hatch both on the CLI and in
    a config file (the synthetic_smoke.yml docstring advertises
    ``pallas_mlp: off``).
    """
    cfg = Config()
    out = cfg.merge_from_list(["parallel.pallas_mlp", "off"])
    assert out.parallel.pallas_mlp == "off"

    d = Config().to_dict()
    d["parallel"]["pallas_mlp"] = False  # what `pallas_mlp: off` loads as
    assert Config.from_dict(d).parallel.pallas_mlp == "off"
    d["parallel"]["pallas_mlp"] = True
    assert Config.from_dict(d).parallel.pallas_mlp == "on"


# ---------------------------------------------------------------------------
# Numerics/perf switches promoted into config (round-4): the snapshot must
# round-trip every switch, the pipeline must honor it, and the module
# globals must act as trace-time overrides (None = follow config).
# ---------------------------------------------------------------------------

_SWITCHES = {
    "remat_ipe": False,
    "kernel_stash_acts": False,
    "kernel_per_ray_dirs": True,
    "bwd_block_rows": 512,
    "render_kernel_variant": "mlp",
    "render_block_rows": 2048,
    "relu_save_output": False,
    "relu_bf16_residual": False,
    "split_skip_layer": False,
    "ipe_double_angle": False,
    "alpha_vpu": True,
    "split_h_stash": True,
    "fetch_dtype": "float16",
}


def test_switches_roundtrip_through_snapshot():
    """config.dump() -> from_yaml reproduces every numerics switch (the
    config-snapshot contract, reference train_model.py:44-46)."""
    import io

    cfg = Config()
    for k, v in _SWITCHES.items():
        cfg = cfg.replace_at(f"parallel.{k}", v)
    back = Config.from_yaml(io.StringIO(cfg.dump()))
    for k, v in _SWITCHES.items():
        assert getattr(back.parallel, k) == v, k


def test_kernel_selector_configs_validated_at_init():
    """Config-reachable kernel/IPE selectors are validated at pipeline
    construction: a bad value surfacing later inside the render-kernel
    probe would be swallowed by the backend-fallback guard and
    misattributed to 'kernel unavailable' (silent slow renders)."""
    import pytest as _pytest

    from ddnerf_tpu.config import Config
    from ddnerf_tpu.models.nerf import NerfPipeline

    def cfg(**parallel):
        return Config.from_dict({
            "nerf": {"type": "DDNerfModel", "coarse_hidden_size": 16,
                     "fine_hidden_size": 16},
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": parallel,
        }).resolved()

    with _pytest.raises(ValueError, match="render_kernel_variant"):
        NerfPipeline(cfg(render_kernel_variant="ipe"))  # retired round 5
    with _pytest.raises(ValueError, match="ipe_variant"):
        NerfPipeline(cfg(ipe_variant="floor"))  # module-override only
    with _pytest.raises(ValueError, match="ipe_transposed"):
        NerfPipeline(cfg(ipe_variant="fused", ipe_transposed=True))
    NerfPipeline(cfg(render_kernel_variant="ipe2", ipe_variant="fused"))


def test_switches_reach_the_modules():
    """The pipeline threads the config switches into the flax modules and
    the IPE path; exact-rewrite switches leave the forward identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddnerf_tpu.models.nerf import NerfPipeline, RayBatch, ScheduleValues

    base = Config.from_dict(
        {
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4,
                          "radiance_field_noise_std": 0.0},
                "validation": {"num_coarse": 4, "num_fine": 4,
                               "perturb": False},
            },
            "dataset": {"type": "blender", "synthetic": True},
        }
    )
    flipped = base
    for k, v in _SWITCHES.items():
        flipped = flipped.replace_at(f"parallel.{k}", v)

    pa, pb = NerfPipeline(base), NerfPipeline(flipped)
    assert pa.coarse.relu_save_output and not pb.coarse.relu_save_output
    assert pa.fine.split_skip_layer and not pb.fine.split_skip_layer

    rng = np.random.default_rng(0)
    ro = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
    rd = rng.standard_normal((8, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rays = RayBatch.create(
        jnp.asarray(ro), jnp.asarray(rd), jnp.full((8, 1), 0.002), 2.0, 6.0
    )
    params = pa.init_params(jax.random.PRNGKey(0))
    sched = ScheduleValues.for_eval(base)
    key = jax.random.PRNGKey(1)
    out_a = pa.render_rays(params, rays, key, sched, "validation")
    out_b = pb.render_rays(params, rays, key, sched, "validation")
    # relu variant / split-skip / remat are exact rewrites; the IPE path
    # differs only by the recurrence's ~1e-5 drift at high degrees.
    np.testing.assert_allclose(
        np.asarray(out_a[1]["rgb"]), np.asarray(out_b[1]["rgb"]),
        rtol=2e-4, atol=2e-4,
    )

    # Training (gradient) path runs under both switch sets.
    def loss_fn(p, pipe):
        out = pipe.render_rays(p, rays, key, sched, "train")
        return jnp.mean(out[1]["rgb"]) + out[1]["dp_loss"]

    ga = jax.grad(lambda p: loss_fn(p, pa))(params)
    gb = jax.grad(lambda p: loss_fn(p, pb))(params)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        assert np.isfinite(np.asarray(la)).all()
        assert np.isfinite(np.asarray(lb)).all()


def test_module_override_beats_config():
    from ddnerf_tpu.core import math as mmath
    from ddnerf_tpu.models import nerf as nerf_mod

    assert nerf_mod._ov(None, "cfgval") == "cfgval"
    assert nerf_mod._ov("forced", "cfgval") == "forced"

    import numpy as np
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 3)),
                    jnp.float32)
    var = jnp.full((4, 3), 0.01, jnp.float32)
    direct = np.asarray(
        mmath.integrated_pos_enc((x, var), double_angle=False)
    )
    prev = mmath.IPE_DOUBLE_ANGLE
    try:
        mmath.IPE_DOUBLE_ANGLE = False
        # Caller asks for the recurrence; the override forces direct.
        forced = np.asarray(
            mmath.integrated_pos_enc((x, var), double_angle=True)
        )
    finally:
        mmath.IPE_DOUBLE_ANGLE = prev
    np.testing.assert_array_equal(direct, forced)
