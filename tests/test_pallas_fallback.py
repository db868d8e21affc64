"""Graceful degradation when the fused Pallas kernels cannot compile.

All shipped configs default ``parallel.pallas_mlp: auto`` (fused backward
for training + fused forward for whole-image render), so a TPU generation
or toolchain that rejects either kernel must NOT crash the CLI: the
pipeline probe-compiles each direction once and falls back to the XLA path
(round-4 verdict item 2; cf. the reference's unconditional CPU fallback,
/root/reference/train_model.py:54-57).
"""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.models.nerf import NerfPipeline
from ddnerf_tpu.train.state import create_train_state
from ddnerf_tpu.train.step import make_train_step


def _tiny_cfg(pallas: str) -> Config:
    return Config.from_dict(
        {
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4,
                          "num_random_rays": 16,
                          "radiance_field_noise_std": 0.0},
                "validation": {"num_coarse": 4, "num_fine": 4,
                               "perturb": False},
            },
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": {"pallas_mlp": pallas, "donate_state": False},
        }
    ).resolved()


def _batch(n=16):
    rng = np.random.default_rng(0)
    ro = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return {
        "origins": jnp.asarray(ro),
        "directions": jnp.asarray(rd),
        "radii": jnp.full((n, 1), 0.002, jnp.float32),
        "rgb": jnp.zeros((n, 3), jnp.float32),
    }


def test_kernel_compile_failure_falls_back_to_xla(monkeypatch):
    """A pallas_call that raises at probe time must degrade to the XLA
    step — training proceeds and matches the pallas_mlp: off pipeline."""
    from ddnerf_tpu.kernels import fused_mlp_bwd

    def boom(*a, **k):
        raise RuntimeError("Mosaic rejected the kernel (simulated)")

    monkeypatch.setattr(fused_mlp_bwd, "fused_mlp_train_apply", boom)

    cfg = _tiny_cfg("train")
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, pipe))

    batch = _batch()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
    assert pipe._fused_train_ok is False
    assert any("falling back to the XLA train step" in str(w.message)
               for w in caught)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

    # The fallback step IS the XLA step: identical loss to pallas_mlp: off.
    cfg_off = _tiny_cfg("off")
    pipe_off = NerfPipeline(cfg_off)
    state_off = create_train_state(cfg_off, pipe_off, jax.random.PRNGKey(0))
    _, metrics_off = jax.jit(make_train_step(cfg_off, pipe_off))(
        state_off, batch
    )
    assert float(metrics["loss"]) == pytest.approx(
        float(metrics_off["loss"]), abs=1e-6
    )


def test_block_size_rejection_downgrades_before_xla(monkeypatch):
    """Middle rung of the ladder: if only the configured block size fails
    (the shipped 2048 needs the raised scoped-VMEM cap), the pipeline
    retries at the kernel default (1024) and KEEPS the fused kernels."""
    from ddnerf_tpu.kernels import fused_mlp_bwd

    orig = fused_mlp_bwd.fused_mlp_train_apply

    # Accept the full (current and future) signature: a stale arity here
    # turns every probe rung into a TypeError and masks the ladder under
    # test as a total fused-kernel failure.
    def picky(params, ipe, dirs, depth_head, *args, **kwargs):
        block_rows = kwargs.get(
            "block_rows", args[4] if len(args) > 4 else 0
        )
        if block_rows == 2048:
            raise RuntimeError(
                "Scoped allocation ... exceeded scoped vmem limit (simulated)"
            )
        return orig(params, ipe, dirs, depth_head, *args, **kwargs)

    monkeypatch.setattr(fused_mlp_bwd, "fused_mlp_train_apply", picky)

    cfg = _tiny_cfg("train")
    assert cfg.parallel.bwd_block_rows == 2048  # the shipped default
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, pipe))

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        state, metrics = step(state, _batch())
        jax.block_until_ready(metrics["loss"])

    assert pipe._fused_train_ok is True
    assert pipe._train_block_rows() == fused_mlp_bwd.BWD_BLOCK_ROWS == 1024
    assert any("retrying at the kernel default" in str(w.message)
               for w in caught)
    assert not any("falling back to the XLA train step" in str(w.message)
                   for w in caught)
    assert np.isfinite(float(metrics["loss"]))


def test_step_compiler_options_tpu_only():
    """The scoped-VMEM override must reach jit only on TPU backends — the
    CPU/GPU PJRT compilers reject unknown option overrides."""
    from ddnerf_tpu.utils.compile import step_compiler_options

    cfg = _tiny_cfg("train")
    assert cfg.parallel.scoped_vmem_limit_kib == 32768  # shipped default
    # These tests run on CPU (conftest): no override despite the config.
    assert step_compiler_options(cfg) is None
    # 0 disables regardless of backend (short-circuits before jax import).
    cfg_off = cfg.merge_from_list(["parallel.scoped_vmem_limit_kib", "0"])
    assert step_compiler_options(cfg_off) is None


def test_step_compiler_options_on_tpu_backend(monkeypatch):
    import ddnerf_tpu.utils.compile as C

    cfg = _tiny_cfg("train")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert C.step_compiler_options(cfg) == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"
    }


def test_auto_policy_routes_train_through_fused_kernel():
    """pallas_mlp="auto" must train exactly like "train" (the fused
    backward kernel) and gate the render kernel off under interpret."""
    cfg = _tiny_cfg("auto")
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    batch = _batch()
    _, metrics = jax.jit(make_train_step(cfg, pipe))(state, batch)
    assert pipe._fused_train_ok is True  # the train probe ran and passed
    # Interpret mode (CPU) never auto-enables the render kernel: it is a
    # correctness tool, not a fast path — and the probe must not even run.
    assert pipe._use_pallas("validation") is False
    assert pipe._fused_render_ok is None

    cfg_t = _tiny_cfg("train")
    pipe_t = NerfPipeline(cfg_t)
    state_t = create_train_state(cfg_t, pipe_t, jax.random.PRNGKey(0))
    _, metrics_t = jax.jit(make_train_step(cfg_t, pipe_t))(state_t, batch)
    assert float(metrics["loss"]) == pytest.approx(
        float(metrics_t["loss"]), abs=1e-6
    )


def test_auto_policy_enables_render_kernel_on_hardware(monkeypatch):
    """On a real backend (simulated), "auto" probes the render kernel once
    and enables it for the whole-image modes only."""
    cfg = _tiny_cfg("auto")
    pipe = NerfPipeline(cfg)
    pipe._pallas_interpret_cached = False  # pretend: real hardware

    calls = {"n": 0}

    def fake_probe(self):
        calls["n"] += 1

    monkeypatch.setattr(NerfPipeline, "_probe_fused_render", fake_probe)
    assert pipe._use_pallas("validation") is True
    assert pipe._use_pallas("render") is True
    assert pipe._use_pallas("train") is False  # train uses the bwd kernel
    assert calls["n"] == 1  # probe result is cached


def test_render_kernel_compile_failure_falls_back_to_xla(monkeypatch):
    """A render-kernel probe failure must degrade to the XLA render path —
    whole-image outputs identical to pallas_mlp: off."""
    from ddnerf_tpu.models.nerf import RayBatch, ScheduleValues

    cfg = _tiny_cfg("auto")
    pipe = NerfPipeline(cfg)
    pipe._pallas_interpret_cached = False  # pretend: real hardware

    def boom(self):
        raise RuntimeError("Mosaic rejected the kernel (simulated)")

    monkeypatch.setattr(NerfPipeline, "_probe_fused_render", boom)

    b = _batch()
    rays = RayBatch.create(b["origins"], b["directions"], b["radii"],
                           cfg.dataset.near, cfg.dataset.far)
    sched = ScheduleValues.for_eval(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = pipe.render_rays(params, rays, jax.random.PRNGKey(1), sched,
                               "validation")
    assert pipe._fused_render_ok is False
    assert any("falling back to the XLA render path" in str(w.message)
               for w in caught)

    pipe_off = NerfPipeline(_tiny_cfg("off"))
    out_off = pipe_off.render_rays(params, rays, jax.random.PRNGKey(1),
                                   sched, "validation")
    for i in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(out[i]["rgb"]), np.asarray(out_off[i]["rgb"])
        )


def test_probe_success_keeps_kernels(monkeypatch):
    """With a healthy kernel (interpret mode) the probe passes once and the
    fused path stays enabled; the probe is not re-run per trace."""
    cfg = _tiny_cfg("train")
    pipe = NerfPipeline(cfg)

    calls = {"n": 0}
    orig = NerfPipeline._probe_fused_train

    def counting_probe(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(NerfPipeline, "_probe_fused_train", counting_probe)

    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, pipe))
    batch = _batch()
    state, metrics = step(state, batch)
    assert pipe._fused_train_ok is True
    assert np.isfinite(float(metrics["loss"]))
    # Second trace shape: probe must not re-run.
    step2 = jax.jit(make_train_step(cfg, pipe))
    step2(state, batch)
    assert calls["n"] == 1
