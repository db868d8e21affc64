"""Blender-format disk loader tests: a synthetic scene is written to disk in
the transforms_*.json + PNG layout and driven through load_blender_data,
including testskip, half_res, and debug tiny-image modes."""

import json
import os

import numpy as np
import pytest

from ddnerf_tpu.data.blender import load_blender_data
from ddnerf_tpu.data.synthetic import generate_synthetic_blender


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    import imageio.v2 as imageio

    base = str(tmp_path_factory.mktemp("blender_scene"))
    images, poses, render_poses, hwf, i_split = generate_synthetic_blender(
        num_train=4, num_val=2, height=64, width=64
    )
    H, W, focal = hwf
    camera_angle_x = 2.0 * np.arctan(0.5 * W / focal)

    splits = {"train": i_split[0], "val": i_split[1], "test": i_split[2]}
    for split, idxs in splits.items():
        frames = []
        for i in idxs:
            rel = f"./{split}/r_{i}"
            os.makedirs(os.path.join(base, split), exist_ok=True)
            imageio.imwrite(
                os.path.join(base, f"{rel}.png"),
                (images[i] * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": rel, "transform_matrix": poses[i].tolist()}
            )
        with open(os.path.join(base, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    return base, images, poses, focal


def test_load_blender_roundtrip(blender_dir):
    base, images, poses, focal = blender_dir
    imgs, loaded_poses, render_poses, hwf, i_split = load_blender_data(base)
    assert imgs.shape == (8, 64, 64, 4)
    np.testing.assert_allclose(hwf[2], focal, rtol=1e-4)
    np.testing.assert_allclose(loaded_poses[0], poses[0], atol=1e-5)
    # PNG quantization: within 1/255.
    np.testing.assert_allclose(imgs[0], images[0], atol=1.5 / 255)
    assert render_poses.shape == (180, 4, 4)
    assert [len(s) for s in i_split] == [4, 2, 2]


def test_load_blender_testskip(blender_dir):
    base, *_ = blender_dir
    imgs, _, _, _, i_split = load_blender_data(base, testskip=2)
    assert [len(s) for s in i_split] == [4, 1, 1]


def test_load_blender_half_res(blender_dir):
    base, *_ = blender_dir
    imgs, _, _, hwf, _ = load_blender_data(base, half_res=True)
    assert imgs.shape[1:3] == (32, 32)
    assert hwf[0] == 32


def test_load_blender_debug_mode(blender_dir):
    """Tiny-image smoke mode (reference load_blender.py:115-128)."""
    base, *_ = blender_dir
    imgs, _, _, hwf, _ = load_blender_data(base, debug=True)
    assert imgs.shape[1:3] == (25, 25)
    assert hwf[0] == 64 // 32


def test_assembly_from_disk(blender_dir):
    base, *_ = blender_dir
    from ddnerf_tpu.config import Config
    from ddnerf_tpu.data.assembly import get_datasets

    cfg = Config.from_dict(
        {"dataset": {"type": "blender", "basedir": base,
                     "single_image_mode": False},
         "nerf": {"train": {"white_background": True}}}
    )
    train_ds, val_ds, cfg = get_datasets(cfg)
    rng = np.random.default_rng(0)
    ro, rd, radii, rgb = train_ds.sample_batch(rng, 16)
    assert rgb.shape == (16, 3)
    # white background: empty pixels are 1.0
    assert train_ds.target.max() <= 1.0 + 1e-6


def test_synthetic_blender_writer_roundtrip(tmp_path):
    """scripts/make_synthetic_dataset.py (blender format) writes a dataset
    load_blender_data reads back with matching splits, intrinsics, and
    image content (the dress rehearsal's data layer)."""
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), os.pardir)
    out = str(tmp_path / "blender_ds")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts",
                                      "make_synthetic_dataset.py"),
         out, "--size", "32", "--train", "4", "--val", "1", "--test", "1"],
        check=True, cwd=root,
    )

    from ddnerf_tpu.data.blender import load_blender_data
    from ddnerf_tpu.data.synthetic import generate_synthetic_blender

    images, poses, render_poses, hwf, i_split = load_blender_data(out)
    assert images.shape == (6, 32, 32, 4)
    assert [len(s) for s in i_split] == [4, 1, 1]
    h, w, focal = hwf
    assert (h, w) == (32, 32)

    # The writer's source of truth: the same generator call.
    g_images, g_poses, _, g_hwf, g_split = generate_synthetic_blender(
        num_train=4, num_val=2, height=32, width=32, seed=0)
    np.testing.assert_allclose(focal, g_hwf[2], rtol=1e-6)
    # Train split round-trips bit-near (uint8 quantization on disk).
    np.testing.assert_allclose(images[:4], g_images[:4], atol=2 / 255)
    np.testing.assert_allclose(poses[:4], g_poses[:4], atol=1e-6)
