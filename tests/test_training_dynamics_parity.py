"""Training-dynamics parity: both frameworks trained from IDENTICAL initial
weights on identical data for the same number of steps; loss trajectories
must match statistically (RNG streams differ, so bitwise equality is not
expected — SURVEY.md §7 'parity must be statistical').

Covers what forward-parity tests cannot: gradients, Adam updates, the LR
schedule in situ, and the coupled coarse/fine + dp-loss dynamics.  Widened
matrix: DDNerfModel and GeneralMipNerfModel, and both dataset regimes
(llff: eps-free pdf; blender: eps-masked pdf + empty-ray dp filter).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.models.nerf import NerfPipeline
from ddnerf_tpu.train.state import create_train_state
from ddnerf_tpu.train.step import make_train_step

from conftest import REFERENCE_PATH, reference_available
from test_e2e_parity import _cfg_dict, _transplant

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)

N_ITERS = 120
N_RAYS = 64


def _reference_schedule_mirror(ref_cfg, model):
    """Per-iteration mutator mirroring the reference train loop's schedule
    handling EXACTLY (train_model.py:121-141): linear gaussian-smooth
    anneal over ``finnish_smooth`` iters, pdf-padding flipped off at
    ``i == max_pdf_pad_iters``.  Without this the torch side trains at
    constant schedules while the JAX step applies its production schedules
    internally — a harness-side dynamics mismatch, not framework parity.
    Snapshot the initial/delta values NOW: the mutation below writes to the
    same shared CfgNode."""
    tp = ref_cfg.train_params
    dsmooth = (tp.gaussian_smooth_factor - tp.final_smooth) / tp.finnish_smooth
    initial_smooth = tp.gaussian_smooth_factor

    def apply(i):
        if i < tp.finnish_smooth:
            model.cfg.train_params.gaussian_smooth_factor = (
                initial_smooth - dsmooth * i)
        else:
            model.cfg.train_params.gaussian_smooth_factor = tp.final_smooth
        if i == tp.max_pdf_pad_iters:
            model.cfg.train_params.pdf_padding = False

    return apply


def _scene_rays(seed=0, n=4096):
    """A consistent random 'scene': rays with targets derived from direction
    (a learnable smooth function)."""
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    radii = np.full((n, 1), 0.01, np.float32)
    rgb = (0.5 + 0.5 * np.stack(
        [np.sin(3 * rd[:, 0]), np.cos(2 * rd[:, 1]), np.sin(rd[:, 2])], -1
    )).astype(np.float32)
    return ro, rd, radii, rgb


def _cotrain(nerf_type, ds_type, n_iters=N_ITERS, extra_cfg=None):
    """Train the torch reference and this framework from the same initial
    weights on the same ray-index stream; returns (ref_losses, jax_losses)."""
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    from general_utils.cfgnode import CfgNode
    from general_utils.nerf_helpers import learning_rate_decay as ref_lr
    from models import models as ref_models

    is_dd = nerf_type == "DDNerfModel"
    d = _cfg_dict(nerf_type, ds_type)
    d["nerf"]["train"]["perturb"] = True
    d["experiment"]["train_iters"] = n_iters
    d["optimizer"] = {"lr_init": 3e-3, "lr_final": 1e-3, "lr_delay_steps": 0,
                      "lr_delay_mult": 1.0}
    for section, over in (extra_cfg or {}).items():
        d.setdefault(section, {}).update(over)

    # Build the JAX config FIRST (eager deep copy): CfgNode(d) shares the
    # dict, and the reference-style schedule mirror below mutates the cfg
    # in place during torch training.
    cfg = Config.from_dict(d)

    # ---- torch side
    ref_cfg = CfgNode(d)
    torch.manual_seed(0)
    ref_model = getattr(ref_models, nerf_type)(ref_cfg)
    ref_model.train()
    # Snapshot the INITIAL weights (jnp copies) before torch training
    # mutates them in place.
    if is_dd:
        params0 = {"coarse": _transplant(ref_model.coarse),
                   "fine": _transplant(ref_model.fine)}
        optims = [torch.optim.Adam(ref_model.coarse.parameters(), lr=3e-3),
                  torch.optim.Adam(ref_model.fine.parameters(), lr=3e-3)]
    else:
        # GeneralMipNerfModel shares one net across cycles (models.py:28) —
        # a single optimizer, else the shared params would double-step.
        params0 = {"coarse": _transplant(ref_model.coarse)}
        optims = [torch.optim.Adam(ref_model.coarse.parameters(), lr=3e-3)]

    ro, rd, radii, rgb = _scene_rays()
    t_ro, t_rd, t_radii, t_rgb = map(torch.tensor, (ro, rd, radii, rgb))

    host = np.random.default_rng(42)
    idx_stream = [host.integers(0, len(ro), N_RAYS) for _ in range(n_iters)]

    mirror_schedules = _reference_schedule_mirror(ref_cfg, ref_model)

    ref_losses = []
    for i in range(n_iters):
        mirror_schedules(i)
        lr = float(ref_lr(i, 3e-3, 1e-3, n_iters, 0, 1.0))
        for opt in optims:
            for g in opt.param_groups:
                g["lr"] = lr
        idx = idx_stream[i]
        out = ref_model.run_iter(t_ro[idx], t_rd[idx], t_radii[idx],
                                 mode="train", rgb_target=t_rgb[idx])
        loss = (torch.nn.functional.mse_loss(out[0]["rgb"], t_rgb[idx])
                + torch.nn.functional.mse_loss(out[1]["rgb"], t_rgb[idx]))
        if is_dd:
            loss = loss + 0.1 * out[1]["dp_loss"].mean()
        loss.backward()
        for opt in optims:
            opt.step()
            opt.zero_grad()
        ref_losses.append(float(loss))

    # ---- jax side, SAME initial weights and SAME ray index stream
    # (cfg was snapshotted before the torch loop's schedule mutation)
    pipe = NerfPipeline(cfg)
    from ddnerf_tpu.train.state import make_optimizer

    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = state.replace(params=params0, opt_state=tx.init(params0))
    step = jax.jit(make_train_step(cfg, pipe))
    jax_losses = []
    for i in range(n_iters):
        idx = idx_stream[i]
        batch = {"origins": jnp.asarray(ro[idx]), "directions": jnp.asarray(rd[idx]),
                 "radii": jnp.asarray(radii[idx]), "rgb": jnp.asarray(rgb[idx])}
        state, m = step(state, batch)
        jax_losses.append(float(m["loss"]))

    return ref_losses, jax_losses


def _assert_trajectories_match(ref_losses, jax_losses, tol=0.35):
    ref_start, ref_end = np.mean(ref_losses[:10]), np.mean(ref_losses[-20:])
    jax_start, jax_end = np.mean(jax_losses[:10]), np.mean(jax_losses[-20:])

    # Both must learn, and end losses must agree within tol.
    assert ref_end < ref_start * 0.8
    assert jax_end < jax_start * 0.8
    assert abs(jax_end - ref_end) / ref_end < tol, (
        f"trajectories diverged: torch {ref_start:.4f}->{ref_end:.4f}, "
        f"jax {jax_start:.4f}->{jax_end:.4f}"
    )


@requires_reference
def test_cotrained_ddnerf_llff():
    _assert_trajectories_match(*_cotrain("DDNerfModel", "llff"))


@requires_reference
def test_cotrained_ddnerf_real360_combined():
    """real360 family: combined (half-uniform / half-log) first-cycle
    sampling (reference samplers.py:6-27, config_360.yml:45-47) co-trained
    end to end."""
    ref_losses, jax_losses = _cotrain(
        "DDNerfModel", "real360",
        extra_cfg={"dataset": {"combined_sampling_method": True,
                               "combined_split": 2.0,
                               "near": 0.5, "far": 10.0}},
    )
    _assert_trajectories_match(ref_losses, jax_losses)


@requires_reference
def test_cotrained_ddnerf_long_horizon():
    """500 co-trained steps with statistical bounds: end-loss agreement AND
    windowed trajectory tracking over the whole horizon (VERDICT r2 item 8:
    the best available substitute for real-dataset parity)."""
    ref_losses, jax_losses = _cotrain("DDNerfModel", "llff", n_iters=500)
    _assert_trajectories_match(ref_losses, jax_losses, tol=0.3)
    # Windowed check: in every 100-step window the mean losses must agree
    # within 35% — catches mid-run divergence end-only checks miss.
    ref_w = np.asarray(ref_losses).reshape(5, 100).mean(axis=1)
    jax_w = np.asarray(jax_losses).reshape(5, 100).mean(axis=1)
    rel = np.abs(jax_w - ref_w) / ref_w
    assert (rel < 0.35).all(), f"windowed means diverged: {rel}"


# ---------------------------------------------------------------------------
# PSNR-delta quality gate (round-4 verdict #2): co-train both frameworks on
# the IMAGE-FORMING synthetic scene, render the same held-out pose in both,
# and gate on the PSNR/SSIM deltas — the strongest locally-runnable
# approximation of BASELINE.json's "PSNR parity with the torch reference"
# (reference eval_nerf.py:128-135).
# ---------------------------------------------------------------------------

_IMG_H = 32
_IMG_BATCH = 128


def _image_scene():
    """8 train views + 1 held-out view of the procedural sphere scene at
    32x32, as flat ray arrays (black-composited targets — white_background
    False in _cfg_dict, identical arrays fed to both frameworks)."""
    from ddnerf_tpu.core.rays import get_ray_bundle
    from ddnerf_tpu.data.synthetic import generate_synthetic_blender

    h = w = _IMG_H
    images, poses, _, hwf, i_split = generate_synthetic_blender(
        num_train=8, num_val=1, height=h, width=w)
    focal = hwf[2]
    rgbs = images[..., :3] * images[..., 3:4]

    tro, trd, trr, trgb = [], [], [], []
    for i in i_split[0]:
        ro, rd, radii = get_ray_bundle(h, w, focal, poses[i])
        tro.append(ro.reshape(-1, 3))
        trd.append(rd.reshape(-1, 3))
        trr.append(radii.reshape(-1, 1))
        trgb.append(rgbs[i].reshape(-1, 3))
    train = tuple(np.concatenate(a).astype(np.float32)
                  for a in (tro, trd, trr, trgb))
    vi = i_split[1][0]
    vro, vrd, vra = get_ray_bundle(h, w, focal, poses[vi])
    val = (vro.reshape(-1, 3).astype(np.float32),
           vrd.reshape(-1, 3).astype(np.float32),
           vra.reshape(-1, 1).astype(np.float32),
           rgbs[vi].reshape(-1, 3).astype(np.float32))
    return train, val


def _image_cfg_dict(n_iters):
    d = _cfg_dict("DDNerfModel", "blender")
    d["nerf"]["train"]["perturb"] = True
    d["nerf"]["train"]["num_random_rays"] = _IMG_BATCH
    d["experiment"]["train_iters"] = n_iters
    d["optimizer"] = {"lr_init": 3e-3, "lr_final": 1e-3, "lr_delay_steps": 0,
                      "lr_delay_mult": 1.0}
    return d


def _idx_stream(n_rays, n_iters):
    host = np.random.default_rng(42)
    return [host.integers(0, n_rays, _IMG_BATCH) for _ in range(n_iters)]


def _psnr_ssim(img_flat, gt_flat):
    from ddnerf_tpu.eval import metrics as M

    h = w = _IMG_H
    img = np.asarray(img_flat).reshape(h, w, 3)
    gt = gt_flat.reshape(h, w, 3)
    return float(M.psnr(img, gt)), float(M.calc_ssim(img, gt)[0])


def _torch_image_train(d, train, val, n_iters, loop_seed=None):
    """Reference-side training on the image scene with the reference train
    loop's schedule mirror; returns (PSNR, SSIM_v1, initial flax params).
    ``loop_seed`` reseeds torch AFTER construction (same init, different
    perturb draws) — used to measure the reference's own seed envelope."""
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    from general_utils.cfgnode import CfgNode
    from general_utils.nerf_helpers import learning_rate_decay as ref_lr
    from models import models as ref_models

    ro, rd, radii, rgb = train
    ref_cfg = CfgNode(d)
    torch.manual_seed(0)
    m = ref_models.DDNerfModel(ref_cfg)
    m.train()
    params0 = {"coarse": _transplant(m.coarse), "fine": _transplant(m.fine)}
    if loop_seed is not None:
        torch.manual_seed(loop_seed)
    optims = [torch.optim.Adam(m.coarse.parameters(), lr=3e-3),
              torch.optim.Adam(m.fine.parameters(), lr=3e-3)]
    idx_stream = _idx_stream(len(ro), n_iters)
    t = torch.tensor
    t_ro, t_rd, t_rr, t_rgb = t(ro), t(rd), t(radii), t(rgb)
    mirror_schedules = _reference_schedule_mirror(ref_cfg, m)
    for i in range(n_iters):
        mirror_schedules(i)
        lr = float(ref_lr(i, 3e-3, 1e-3, n_iters, 0, 1.0))
        for opt in optims:
            for g in opt.param_groups:
                g["lr"] = lr
        idx = idx_stream[i]
        out = m.run_iter(t_ro[idx], t_rd[idx], t_rr[idx], mode="train",
                         rgb_target=t_rgb[idx])
        loss = (torch.nn.functional.mse_loss(out[0]["rgb"], t_rgb[idx])
                + torch.nn.functional.mse_loss(out[1]["rgb"], t_rgb[idx])
                + 0.1 * out[1]["dp_loss"].mean())
        loss.backward()
        for opt in optims:
            opt.step()
            opt.zero_grad()
    m.eval()
    vro, vrd, vra, vgt = val
    with torch.no_grad():
        outv = m.run_iter(t(vro), t(vrd), t(vra), mode="validation",
                          rgb_target=t(vgt))
    p, s = _psnr_ssim(outv[1]["rgb"].numpy(), vgt)
    return p, s, params0


def _jax_image_train(cfg, params0, train, val, n_iters):
    """JAX-side training from the same initial weights on the same ray
    index stream; returns (PSNR, SSIM_v1) on the held-out view."""
    from ddnerf_tpu.models.nerf import RayBatch
    from ddnerf_tpu.train.state import make_optimizer

    ro, rd, radii, rgb = train
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = state.replace(params=params0, opt_state=tx.init(params0))
    step = jax.jit(make_train_step(cfg, pipe))
    for idx in _idx_stream(len(ro), n_iters):
        batch = {"origins": jnp.asarray(ro[idx]),
                 "directions": jnp.asarray(rd[idx]),
                 "radii": jnp.asarray(radii[idx]),
                 "rgb": jnp.asarray(rgb[idx])}
        state, _ = step(state, batch)
    from ddnerf_tpu.models.nerf import ScheduleValues

    vro, vrd, vra, vgt = val
    sched = ScheduleValues.for_eval(cfg)
    rays = RayBatch.create(jnp.asarray(vro), jnp.asarray(vrd),
                           jnp.asarray(vra), 2.0, 6.0)
    out = pipe.render_rays(state.params, rays, jax.random.PRNGKey(0), sched,
                           "validation")
    return _psnr_ssim(out[1]["rgb"], vgt)


@requires_reference
def test_cotrained_psnr_delta_gate():
    """|PSNR_jax - PSNR_torch| <= 0.5 dB (and SSIM within 0.1) on the same
    held-out pose after 150 co-trained steps from identical weights — the
    horizon covers the full schedule transitions (finnish_smooth=100,
    pdf-padding cutoff at 100) and formed images (PSNR ~18), while the
    frameworks' float-level chaos has not yet decorrelated the weights.

    Calibration (round 5, this harness): delta 0.171 dB @130 iters,
    0.320 dB @150; at 600 iters even a fully DETERMINISTIC co-training
    (perturb off) drifts 1.02 dB apart while the reference's own
    perturb-seed spread reaches 2.2 dB — long-horizon point deltas measure
    chaos, not framework bias, which is what the seed-envelope test below
    covers."""
    n_iters = 150
    train, val = _image_scene()
    d = _image_cfg_dict(n_iters)
    cfg = Config.from_dict(d)  # snapshot BEFORE CfgNode shares the dict
    p_ref, s_ref, params0 = _torch_image_train(d, train, val, n_iters)
    p_jax, s_jax = _jax_image_train(cfg, params0, train, val, n_iters)

    assert p_ref > 15 and p_jax > 15, (p_ref, p_jax)  # images formed
    assert abs(p_jax - p_ref) <= 0.5, (
        f"PSNR delta {abs(p_jax - p_ref):.3f} dB > 0.5 "
        f"(torch {p_ref:.3f}, jax {p_jax:.3f})")
    assert abs(s_jax - s_ref) <= 0.1, (s_ref, s_jax)


@requires_reference
def test_cotrained_psnr_seed_envelope():
    """Long-horizon statistical gate: after 600 co-trained steps the JAX
    held-out PSNR must land inside the reference's own perturb-seed
    envelope (min/max over three torch runs differing only in the
    stochastic draws) widened by 1 dB.  At this horizon the reference
    disagrees with ITSELF by up to 2.2 dB across seeds (measured:
    {19.44, 17.69, 16.75} for the three seeds used here, jax 17.21), so a
    point-delta gate would measure seed chaos; the envelope asserts the
    JAX dynamics land in the same quality regime while still catching any
    real regression (a broken resampler/schedule costs far more than
    1 dB)."""
    n_iters = 600
    train, val = _image_scene()
    d = _image_cfg_dict(n_iters)
    cfg = Config.from_dict(d)
    psnrs = []
    p_ref, _, params0 = _torch_image_train(d, train, val, n_iters)
    psnrs.append(p_ref)
    for seed in (1000, 3000):
        d_s = _image_cfg_dict(n_iters)  # fresh dict: the mirror mutates it
        p_s, _, _ = _torch_image_train(d_s, train, val, n_iters,
                                       loop_seed=seed)
        psnrs.append(p_s)
    p_jax, _ = _jax_image_train(cfg, params0, train, val, n_iters)

    lo, hi = min(psnrs) - 1.0, max(psnrs) + 1.0
    assert lo <= p_jax <= hi, (
        f"jax PSNR {p_jax:.3f} outside torch seed envelope "
        f"[{lo:.3f}, {hi:.3f}] (torch runs: {psnrs})")


@requires_reference
def test_torch_trained_checkpoint_eval_parity(tmp_path):
    """--torch-checkpoint round trip on TRAINED weights: torch-train the
    reference for 40 steps, save its checkpoint.ckpt format, import through
    torch_compat, and require elementwise forward parity of both cycles
    (VERDICT r2 item 8; reference train_model.py:248-263 checkpoint layout)."""
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    from general_utils.cfgnode import CfgNode
    from models import models as ref_models

    from ddnerf_tpu.models.nerf import RayBatch, ScheduleValues
    from ddnerf_tpu.train.torch_compat import load_torch_checkpoint

    d = _cfg_dict("DDNerfModel", "blender")
    d["nerf"]["train"]["perturb"] = True
    ref_cfg = CfgNode(d)
    torch.manual_seed(3)
    ref_model = ref_models.DDNerfModel(ref_cfg)
    ref_model.train()
    opt = torch.optim.Adam(ref_model.parameters(), lr=3e-3)

    ro, rd, radii, rgb = _scene_rays(seed=5)
    t = lambda x: torch.tensor(x)
    host = np.random.default_rng(7)
    for i in range(40):
        idx = host.integers(0, len(ro), N_RAYS)
        out = ref_model.run_iter(t(ro[idx]), t(rd[idx]), t(radii[idx]),
                                 mode="train", rgb_target=t(rgb[idx]))
        loss = (torch.nn.functional.mse_loss(out[0]["rgb"], t(rgb[idx]))
                + torch.nn.functional.mse_loss(out[1]["rgb"], t(rgb[idx]))
                + 0.1 * out[1]["dp_loss"].mean())
        loss.backward()
        opt.step()
        opt.zero_grad()

    # Reference checkpoint format (train_model.py:248-263).
    path = str(tmp_path / "checkpoint.ckpt")
    torch.save({
        "iter": 40,
        "model_1_state_dict": ref_model.coarse.state_dict(),
        "model_2_state_dict": ref_model.fine.state_dict(),
    }, path)

    loaded = load_torch_checkpoint(path)
    assert loaded["step"] == 40

    # Deterministic forward on fresh rays: both sides must agree elementwise.
    ref_model.eval()
    n_eval = 32
    ro_e, rd_e, radii_e = ro[:n_eval], rd[:n_eval], radii[:n_eval]
    with torch.no_grad():
        out_ref = ref_model.run_iter(
            t(ro_e), t(rd_e), t(radii_e), mode="validation",
            rgb_target=t(rgb[:n_eval]),
        )

    cfg = Config.from_dict(d)
    pipe = NerfPipeline(cfg)
    sched = ScheduleValues.for_eval(cfg)
    # Eval fixup parity: train_iters=100 > max_pdf_pad_iters=100 is false,
    # so padding stays on — both sides must agree on that.
    assert bool(sched.pdf_padding) == bool(ref_cfg.train_params.pdf_padding)
    rays = RayBatch.create(
        jnp.asarray(ro_e), jnp.asarray(rd_e), jnp.asarray(radii_e), 2.0, 6.0
    )
    out = pipe.render_rays(loaded["params"], rays, jax.random.PRNGKey(0),
                           sched, "validation")
    for i in (0, 1):
        for key in ("rgb", "disp", "acc", "depth"):
            np.testing.assert_allclose(
                np.asarray(out[i][key]), out_ref[i][key].numpy(),
                rtol=2e-3, atol=2e-4, err_msg=f"cycle {i} {key}",
            )


@requires_reference
def test_cotrained_ddnerf_blender():
    """Blender regime: eps-masked pdf + the empty-ray dp-loss filter path."""
    _assert_trajectories_match(*_cotrain("DDNerfModel", "blender"))


@requires_reference
def test_cotrained_mipnerf_llff():
    """Shared-net family (GeneralMipNerfModel): one Adam on the shared MLP."""
    _assert_trajectories_match(*_cotrain("GeneralMipNerfModel", "llff"))
