#!/usr/bin/env python
"""Convert AlexNet-LPIPS weights to the .npz schema of eval/lpips_net.py.

The reference computes LPIPS through the ``lpips`` pip package, which
downloads torchvision's AlexNet backbone + the LPIPS linear calibration
layers at first use (``/root/reference/eval_nerf.py:92``).  This framework's
JAX LPIPS net (ddnerf_tpu/eval/lpips_net.py) is download-free: it loads one
local ``.npz`` with keys

    conv{0..4}_w  — AlexNet ``features`` conv kernels, OIHW float32
    conv{0..4}_b  — matching biases
    lin{0..4}_w   — LPIPS 1x1 linear calibration weights, [C] float32

This script produces that file from any ONE of three sources (first
available wins):

1. ``--alexnet-pth`` + ``--lpips-pth`` — raw torch checkpoint files
   (torchvision ``alexnet-owt-*.pth`` and lpips ``alex.pth``); needs only
   ``torch`` (CPU), no torchvision/lpips packages.
2. ``--from-lpips-package`` — instantiate ``lpips.LPIPS(net='alex')`` and
   read both nets from it (downloads weights if the environment allows).
3. ``--from-torchvision`` + ``--lpips-pth`` — torchvision supplies the
   backbone, the lpips lin layers still come from a file.

Usage:
    python scripts/convert_lpips_weights.py \
        --alexnet-pth ~/.cache/torch/hub/checkpoints/alexnet-owt-7be5be79.pth \
        --lpips-pth   <site-packages>/lpips/weights/v0.1/alex.pth \
        --out lpips_alex.npz

Then:  ddnerf-eval --logdir ... --lpips-weights lpips_alex.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# torchvision AlexNet ``features`` indices of the five conv layers.
_ALEXNET_CONV_IDX = (0, 3, 6, 8, 10)
_EXPECTED_OUT_CH = (64, 192, 384, 256, 256)


def _to_npz_dict(conv_state, lin_state):
    """conv_state: {idx -> (w, b)} torch tensors or arrays (OIHW);
    lin_state: {tap -> w} of shape [1, C, 1, 1] or [C]."""
    out = {}
    for tap, idx in enumerate(_ALEXNET_CONV_IDX):
        w, b = conv_state[idx]
        w = np.asarray(w, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        if w.shape[0] != _EXPECTED_OUT_CH[tap]:
            raise ValueError(
                f"conv{tap}: expected {_EXPECTED_OUT_CH[tap]} output channels,"
                f" got {w.shape}"
            )
        out[f"conv{tap}_w"] = w
        out[f"conv{tap}_b"] = b
    for tap in range(5):
        w = np.asarray(lin_state[tap], dtype=np.float32).reshape(-1)
        if w.shape[0] != _EXPECTED_OUT_CH[tap]:
            raise ValueError(
                f"lin{tap}: expected [{_EXPECTED_OUT_CH[tap]}], got {w.shape}"
            )
        out[f"lin{tap}_w"] = w
    return out


def _load_torch_state(path):
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}


def from_raw_files(alexnet_pth: str, lpips_pth: str) -> dict:
    alex = _load_torch_state(alexnet_pth)
    lp = _load_torch_state(lpips_pth)
    conv_state = {
        idx: (alex[f"features.{idx}.weight"], alex[f"features.{idx}.bias"])
        for idx in _ALEXNET_CONV_IDX
    }
    # lpips alex.pth layout: lin{i}.model.1.weight, [1, C, 1, 1]
    lin_state = {}
    for tap in range(5):
        for key in (f"lin{tap}.model.1.weight", f"lins.{tap}.model.1.weight"):
            if key in lp:
                lin_state[tap] = lp[key]
                break
        else:
            raise KeyError(
                f"no lin{tap} weight in {lpips_pth} "
                f"(keys: {sorted(lp)[:8]}...)"
            )
    return _to_npz_dict(conv_state, lin_state)


def from_lpips_package() -> dict:
    import lpips as lpips_pkg

    net = lpips_pkg.LPIPS(net="alex")
    feats = net.net  # alexnet wrapper with slice1..slice5
    convs = []
    for slice_name in ("slice1", "slice2", "slice3", "slice4", "slice5"):
        for layer in getattr(feats, slice_name):
            if layer.__class__.__name__ == "Conv2d":
                convs.append(
                    (layer.weight.detach().numpy(), layer.bias.detach().numpy())
                )
    conv_state = {idx: convs[i] for i, idx in enumerate(_ALEXNET_CONV_IDX)}
    lin_state = {
        tap: net.lins[tap].model[-1].weight.detach().numpy()
        for tap in range(5)
    }
    return _to_npz_dict(conv_state, lin_state)


def from_torchvision(lpips_pth: str) -> dict:
    import torchvision

    alex = torchvision.models.alexnet(weights="DEFAULT")
    conv_state = {
        idx: (
            alex.features[idx].weight.detach().numpy(),
            alex.features[idx].bias.detach().numpy(),
        )
        for idx in _ALEXNET_CONV_IDX
    }
    lp = _load_torch_state(lpips_pth)
    lin_state = {tap: lp[f"lin{tap}.model.1.weight"] for tap in range(5)}
    return _to_npz_dict(conv_state, lin_state)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--alexnet-pth", help="torchvision alexnet .pth state dict")
    p.add_argument("--lpips-pth", help="lpips alex.pth lin-layer state dict")
    p.add_argument("--from-lpips-package", action="store_true",
                   help="read everything from the installed lpips package")
    p.add_argument("--from-torchvision", action="store_true",
                   help="backbone from torchvision (lin layers still need "
                        "--lpips-pth)")
    p.add_argument("--out", default="lpips_alex.npz")
    args = p.parse_args(argv)

    if args.from_lpips_package:
        weights = from_lpips_package()
    elif args.from_torchvision:
        if not args.lpips_pth:
            p.error("--from-torchvision also needs --lpips-pth")
        weights = from_torchvision(args.lpips_pth)
    elif args.alexnet_pth and args.lpips_pth:
        weights = from_raw_files(args.alexnet_pth, args.lpips_pth)
    else:
        p.error("supply --alexnet-pth + --lpips-pth, or --from-lpips-package,"
                " or --from-torchvision + --lpips-pth")

    np.savez(args.out, **weights)
    total = sum(v.size for v in weights.values())
    print(f"wrote {args.out}: {len(weights)} arrays, {total:,} parameters")
    return 0


if __name__ == "__main__":
    sys.exit(main())
