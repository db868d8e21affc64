"""Torch-checkpoint import: a reference-format .ckpt round-trips into our
parameter tree and produces identical MLP outputs."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)


@requires_reference
def test_torch_checkpoint_roundtrip(tmp_path):
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    import models.base_architectures as ref_arch

    from ddnerf_tpu.models.mlp import DepthMipMLP, MipMLP
    from ddnerf_tpu.train.torch_compat import load_torch_checkpoint

    torch.manual_seed(0)
    coarse = ref_arch.DepthMipNeRFModel(hidden_size=32, include_input_dir=True)
    fine = ref_arch.MipNeRFModel(hidden_size=32, include_input_dir=True)

    path = os.path.join(tmp_path, "checkpoint.ckpt")
    torch.save(
        {
            "iter": 1234,
            "model_1_state_dict": coarse.state_dict(),
            "model_2_state_dict": fine.state_dict(),
        },
        path,
    )

    loaded = load_torch_checkpoint(path)
    assert loaded["step"] == 1234
    params = loaded["params"]
    assert set(params.keys()) == {"coarse", "fine"}

    rng = np.random.default_rng(0)
    ipe = rng.standard_normal((7, 96)).astype(np.float32)
    dirs = rng.standard_normal((7, 27)).astype(np.float32)

    with torch.no_grad():
        out_c = coarse(torch.tensor(np.concatenate([ipe, dirs], -1))).numpy()
        out_f = fine(torch.tensor(np.concatenate([ipe, dirs], -1))).numpy()

    got_c = DepthMipMLP(hidden_size=32).apply(
        {"params": params["coarse"]}, jnp.asarray(ipe), jnp.asarray(dirs)
    )
    got_f = MipMLP(hidden_size=32).apply(
        {"params": params["fine"]}, jnp.asarray(ipe), jnp.asarray(dirs)
    )
    np.testing.assert_allclose(got_c, out_c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_f, out_f, rtol=1e-5, atol=1e-5)


@requires_reference
def test_eval_driver_with_torch_checkpoint(tmp_path):
    """End-to-end: a reference-format checkpoint evaluates through the full
    eval driver (metrics + results.txt)."""
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    import models.base_architectures as ref_arch

    from ddnerf_tpu.config import Config
    from ddnerf_tpu.eval.evaluate import eval_model
    from ddnerf_tpu.train.checkpoint import save_config_snapshot

    logdir = os.path.join(tmp_path, "run")
    os.makedirs(logdir, exist_ok=True)
    cfg = Config.from_dict(
        {
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4,
                          "radiance_field_noise_std": 0.0},
                "validation": {"num_coarse": 4, "num_fine": 4, "perturb": False,
                               "chunksize": 2048},
            },
            "dataset": {"type": "blender", "synthetic": True,
                        "single_image_mode": False},
        }
    ).resolved()
    save_config_snapshot(cfg, logdir)

    torch.manual_seed(0)
    coarse = ref_arch.DepthMipNeRFModel(hidden_size=16, include_input_dir=True)
    fine = ref_arch.MipNeRFModel(hidden_size=16, include_input_dir=True)
    ckpt_path = os.path.join(tmp_path, "checkpoint.ckpt")
    torch.save(
        {"iter": 7, "model_1_state_dict": coarse.state_dict(),
         "model_2_state_dict": fine.state_dict()},
        ckpt_path,
    )

    summary, per_image = eval_model(
        logdir, save_images=False, max_images=1, torch_checkpoint=ckpt_path
    )
    assert np.isfinite(summary["psnr_fine"][0])
    assert os.path.exists(os.path.join(logdir, "validation", "results.txt"))
