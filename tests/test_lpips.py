"""LPIPS: weights conversion + structural behavior of the JAX net.

Real AlexNet weights cannot be downloaded here (zero egress); these tests
build correctly-shaped random checkpoints, push them through the converter
script, and check the metric behaves like a distance — so the full
weights-file -> eval pipeline is proven and real weights drop straight in
(VERDICT.md round-1 item 4; reference eval_nerf.py:92, 137-151).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import REPO_ROOT

SCRIPT = os.path.join(REPO_ROOT, "scripts", "convert_lpips_weights.py")

_CONV_SHAPES = [
    (64, 3, 11, 11),
    (192, 64, 5, 5),
    (384, 192, 3, 3),
    (256, 384, 3, 3),
    (256, 256, 3, 3),
]
_FEATURE_IDX = (0, 3, 6, 8, 10)


def _fake_checkpoints(tmp_path, seed=0):
    g = torch.Generator().manual_seed(seed)
    alex = {}
    for idx, shape in zip(_FEATURE_IDX, _CONV_SHAPES):
        alex[f"features.{idx}.weight"] = 0.05 * torch.randn(shape, generator=g)
        alex[f"features.{idx}.bias"] = 0.01 * torch.randn(shape[0], generator=g)
    lp = {}
    for tap, shape in enumerate(_CONV_SHAPES):
        lp[f"lin{tap}.model.1.weight"] = torch.rand(
            (1, shape[0], 1, 1), generator=g
        )
    alex_pth = str(tmp_path / "alexnet.pth")
    lpips_pth = str(tmp_path / "alex.pth")
    torch.save(alex, alex_pth)
    torch.save(lp, lpips_pth)
    return alex_pth, lpips_pth


@pytest.fixture(scope="module")
def converted_npz(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("lpips")
    alex_pth, lpips_pth = _fake_checkpoints(tmp_path)
    out = str(tmp_path / "lpips_alex.npz")
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--alexnet-pth", alex_pth,
         "--lpips-pth", lpips_pth, "--out", out],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    return out


def test_converter_writes_expected_schema(converted_npz):
    data = np.load(converted_npz)
    for tap, shape in enumerate(_CONV_SHAPES):
        assert data[f"conv{tap}_w"].shape == shape
        assert data[f"conv{tap}_w"].dtype == np.float32
        assert data[f"conv{tap}_b"].shape == (shape[0],)
        assert data[f"lin{tap}_w"].shape == (shape[0],)


def test_lpips_metric_behaves_like_distance(converted_npz):
    from ddnerf_tpu.eval import metrics as M

    lpips = M.Lpips(converted_npz)
    assert lpips.available

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    light = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(np.float32)
    heavy = np.clip(img + rng.normal(0, 0.4, img.shape), 0, 1).astype(np.float32)

    d_self = lpips(img, img)
    d_light = lpips(img, light)
    d_heavy = lpips(img, heavy)
    assert d_self == pytest.approx(0.0, abs=1e-6)
    assert 0.0 < d_light < d_heavy


def _torch_lpips_oracle(npz, image, target):
    """The LPIPS forward of Zhang et al. 2018 written directly against
    torch.nn.functional — an independent oracle for the JAX net's numerics
    (the `lpips` package itself is not installed here): scaling layer ->
    AlexNet conv taps (maxpool(3,2) after taps 0 and 1) -> channel
    unit-normalize -> squared diff -> 1x1 linear weighting -> spatial mean
    -> sum over taps.  Mirrors lpips/lpips.py (LPIPS.forward) and
    lpips/pretrained_networks.py (alexnet slices)."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    strides = [4, 1, 1, 1, 1]
    pads = [2, 2, 1, 1, 1]

    def feats(img_hwc):
        x = torch.from_numpy(np.ascontiguousarray(img_hwc)).permute(2, 0, 1)[None]
        x = x * 2.0 - 1.0  # lpips in_01 preprocessing
        x = (x - shift) / scale
        taps = []
        for i in range(5):
            w = torch.from_numpy(npz[f"conv{i}_w"])
            b = torch.from_numpy(npz[f"conv{i}_b"])
            x = F.relu(F.conv2d(x, w, b, stride=strides[i], padding=pads[i]))
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, kernel_size=3, stride=2)
        return taps

    def unit_norm(x, eps=1e-10):
        return x / (torch.sqrt(torch.sum(x**2, dim=1, keepdim=True)) + eps)

    total = torch.zeros(())
    for i, (f0, f1) in enumerate(zip(feats(image), feats(target))):
        d = (unit_norm(f0) - unit_norm(f1)) ** 2
        lin = torch.from_numpy(npz[f"lin{i}_w"]).view(1, -1, 1, 1)
        total = total + torch.mean(torch.sum(d * lin, dim=1))
    return float(total)


def test_lpips_numerics_match_torch_oracle(converted_npz):
    """Elementwise agreement of eval/lpips_net.py with the independent torch
    forward on the same weights/images (VERDICT r2 item 2): after this, the
    only remaining LPIPS risk is the weights file itself."""
    from ddnerf_tpu.eval.lpips_net import lpips_distance

    npz = {k: v for k, v in np.load(converted_npz).items()}
    rng = np.random.default_rng(7)
    for hw in ((64, 64), (67, 53)):  # odd sizes exercise pool/stride edges
        img = rng.uniform(0, 1, hw + (3,)).astype(np.float32)
        tgt = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
            np.float32
        )
        ours = float(lpips_distance(npz, img, tgt))
        oracle = _torch_lpips_oracle(npz, img, tgt)
        np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=1e-7)


def test_lpips_unavailable_without_weights():
    from ddnerf_tpu.eval import metrics as M

    lpips = M.Lpips(None)
    assert not lpips.available
    assert lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3))) is None


def test_converter_rejects_wrong_shapes(tmp_path):
    alex_pth, lpips_pth = _fake_checkpoints(tmp_path)
    bad = torch.load(alex_pth, weights_only=True)
    bad["features.0.weight"] = torch.zeros((32, 3, 11, 11))
    torch.save(bad, alex_pth)
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--alexnet-pth", alex_pth,
         "--lpips-pth", lpips_pth, "--out", str(tmp_path / "o.npz")],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode != 0
    assert "expected 64 output channels" in proc.stderr


def test_eval_driver_reports_lpips_with_weights(converted_npz, tmp_path):
    """End-to-end: eval_model emits lpips_coarse/fine whenever a weights
    file exists (VERDICT 'Done =' criterion)."""
    from ddnerf_tpu.config import Config
    from ddnerf_tpu.eval.evaluate import eval_model
    from ddnerf_tpu.train.loop import train

    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "lp", "logdir": str(tmp_path), "train_iters": 2,
                "validate_every": 100, "save_every": 2, "print_every": 100,
            },
            "nerf": {
                "type": "GeneralMipNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 4, "num_fine": 4,
                          "num_random_rays": 32,
                          "radiance_field_noise_std": 0.0, "chunksize": 1024},
                "validation": {"num_coarse": 4, "num_fine": 4,
                               "perturb": False, "chunksize": 1024},
            },
            "dataset": {"type": "blender", "synthetic": True,
                        "single_image_mode": False},
            "parallel": {"num_devices": 1},
        }
    ).resolved()
    _, logdir = train(cfg, use_tensorboard=False, verbose=False)
    summary, per_image = eval_model(
        logdir, save_images=False, max_images=1, lpips_weights=converted_npz
    )
    assert "lpips_fine" in summary and np.isfinite(summary["lpips_fine"][0])
    results = open(os.path.join(logdir, "validation", "results.txt")).read()
    assert "lpips_fine" in results
