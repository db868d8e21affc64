"""Torch-checkpoint import: load a reference ``checkpoint.ckpt`` into this
framework's parameter tree.

A user of the torch reference can bring an existing training run over:
``torch.save`` checkpoints hold ``model_1_state_dict`` (coarse) and, for
DDNeRF, ``model_2_state_dict`` (fine) with ``nn.Linear`` weights
(train_model.py:248-263).  Layer-name mapping to our flax modules
(models/mlp.py):

  layers_xyz.{i}.*  -> trunk_{i}
  fc_feat / fc_alpha / fc_rgb / fc_mu_sigma -> same names
  layers_dir.0.*    -> dir_0

Optimizer state is NOT imported (Adam moments are transferable in principle
but step-coupled with the torch LR mutation; fine-tuning re-warms quickly).

Requires torch only at call time (the framework itself never imports it).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp

_HEAD_NAMES = ("fc_feat", "fc_alpha", "fc_rgb", "fc_mu_sigma")


def state_dict_to_params(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """One torch module state_dict -> flax param dict (transposed kernels)."""

    def t2j(t):
        return jnp.asarray(np.asarray(t.detach() if hasattr(t, "detach") else t))

    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] == "layers_xyz":
            name = f"trunk_{parts[1]}"
            leaf = parts[2]
        elif parts[0] == "layers_dir":
            name = f"dir_{parts[1]}"
            leaf = parts[2]
        elif parts[0] in _HEAD_NAMES:
            name = parts[0]
            leaf = parts[1]
        else:
            raise KeyError(f"unrecognized reference parameter {key!r}")
        entry = params.setdefault(name, {})
        if leaf == "weight":
            entry["kernel"] = t2j(value).T
        elif leaf == "bias":
            entry["bias"] = t2j(value)
        else:
            raise KeyError(f"unrecognized leaf {leaf!r} in {key!r}")
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference ``checkpoint.ckpt`` -> ``{"params": ..., "step": n}``.

    ``params`` has the {"coarse": ..., "fine"?: ...} layout of
    NerfPipeline.init_params.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = {"coarse": state_dict_to_params(ckpt["model_1_state_dict"])}
    if "model_2_state_dict" in ckpt:
        params["fine"] = state_dict_to_params(ckpt["model_2_state_dict"])
    return {"params": params, "step": int(ckpt.get("iter", 0))}
