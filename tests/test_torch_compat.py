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
