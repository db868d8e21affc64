"""End-to-end test of the LPIPS .pth -> .npz conversion
(scripts/convert_lpips_weights.py, round-3 verdict: "the only remaining
risk is the untested real .pth->npz conversion").

Real weights cannot be downloaded (zero egress), so the torch checkpoints
are SYNTHESIZED with exactly the upstream layouts:

* torchvision ``alexnet-owt-*.pth``: a flat state dict with
  ``features.{0,3,6,8,10}.weight/bias`` (OIHW) plus classifier keys;
* lpips ``alex.pth``: ``lin{0..4}.model.1.weight`` of shape [1, C, 1, 1]
  (verified against the lpips-package source layout the reference uses,
  /root/reference/eval_nerf.py:92).

The converted .npz must load through eval.metrics.Lpips and produce a
finite, sane distance (0 for identical images, > 0 for different ones).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REPO_ROOT

torch = pytest.importorskip("torch")

_CONV_SHAPES = {
    0: (64, 3, 11, 11),
    3: (192, 64, 5, 5),
    6: (384, 192, 3, 3),
    8: (256, 384, 3, 3),
    10: (256, 256, 3, 3),
}
_LIN_CH = (64, 192, 384, 256, 256)


def _fake_alexnet_pth(path):
    g = torch.Generator().manual_seed(0)
    state = {}
    for idx, shape in _CONV_SHAPES.items():
        state[f"features.{idx}.weight"] = torch.randn(shape, generator=g) * 0.05
        state[f"features.{idx}.bias"] = torch.randn(shape[0], generator=g) * 0.05
    # Non-feature keys the real checkpoint carries; must be ignored.
    state["classifier.1.weight"] = torch.zeros(4096, 9216)
    state["classifier.1.bias"] = torch.zeros(4096)
    torch.save(state, path)


def _fake_lpips_pth(path):
    g = torch.Generator().manual_seed(1)
    state = {
        f"lin{tap}.model.1.weight": torch.rand((1, c, 1, 1), generator=g)
        for tap, c in enumerate(_LIN_CH)
    }
    torch.save(state, path)


def test_convert_and_score(tmp_path):
    alex_pth = tmp_path / "alexnet.pth"
    lpips_pth = tmp_path / "alex.pth"
    out_npz = tmp_path / "lpips_alex.npz"
    _fake_alexnet_pth(alex_pth)
    _fake_lpips_pth(lpips_pth)

    # Drive the script exactly as a user would.
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "scripts",
                                      "convert_lpips_weights.py"),
         "--alexnet-pth", str(alex_pth), "--lpips-pth", str(lpips_pth),
         "--out", str(out_npz)],
        capture_output=True, text=True, cwd=REPO_ROOT,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    assert "10" in r.stdout or "15" in r.stdout  # array-count summary line

    data = np.load(out_npz)
    for tap, c in enumerate(_LIN_CH):
        assert data[f"conv{tap}_w"].shape[0] == c
        assert data[f"conv{tap}_w"].dtype == np.float32
        assert data[f"lin{tap}_w"].shape == (c,)

    from ddnerf_tpu.eval.metrics import Lpips

    scorer = Lpips(str(out_npz))
    assert scorer.available

    rng = np.random.default_rng(0)
    img = rng.random((33, 37, 3)).astype(np.float32)  # odd dims on purpose
    other = np.clip(img + 0.3 * rng.random((33, 37, 3), np.float32), 0, 1)
    same = scorer(img, img)
    diff = scorer(img, other.astype(np.float32))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(diff) and diff > 0


def test_convert_rejects_wrong_shapes(tmp_path):
    alex_pth = tmp_path / "alexnet.pth"
    lpips_pth = tmp_path / "alex.pth"
    _fake_alexnet_pth(alex_pth)
    state = {f"lin{t}.model.1.weight": torch.rand((1, 8, 1, 1))
             for t in range(5)}
    torch.save(state, lpips_pth)

    sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))
    try:
        import convert_lpips_weights as cvt
    finally:
        sys.path.pop(0)
    with pytest.raises(ValueError, match="lin0"):
        cvt.from_raw_files(str(alex_pth), str(lpips_pth))
