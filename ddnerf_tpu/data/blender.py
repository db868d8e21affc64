"""Blender-synthetic dataset loader.

Rewrite of ``/root/reference/data_utils/load_blender.py``: reads
``transforms_{train,val,test}.json`` + PNGs, computes focal from
``camera_angle_x``, builds the 360° spherical render path, and supports the
half-res and debug tiny-image modes.  Pure NumPy on the host.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ddnerf_tpu.data.synthetic import pose_spherical


def pose_spherical_for_real_world_360(theta, phi, radius, dataset_name=None):
    """Spherical pose with the reference's hardcoded "beta"-scene warp
    (load_blender.py:44-65)."""
    if dataset_name == "beta":
        alpha = 0.7
        if theta <= 180:
            radius = alpha * radius + (abs(90 - theta) / 90) * (1 - alpha) * radius
        else:
            radius = alpha * radius + (abs(270 - theta) / 90) * (1 - alpha) * radius

    def trans(axis, t):
        m = np.eye(4, dtype=np.float32)
        m[axis, 3] = t
        return m

    def rot_phi(phi):
        m = np.eye(4, dtype=np.float32)
        m[1, 1] = m[2, 2] = np.cos(phi)
        m[1, 2] = -np.sin(phi)
        m[2, 1] = np.sin(phi)
        return m

    def rot_theta(th):
        m = np.eye(4, dtype=np.float32)
        m[0, 0] = m[2, 2] = np.cos(th)
        m[0, 2] = -np.sin(th)
        m[2, 0] = np.sin(th)
        return m

    c2w = trans(2, radius)
    c2w = rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = rot_theta(theta / 180.0 * np.pi) @ c2w
    if dataset_name == "beta":
        c2w = rot_phi(10 / 180.0 * np.pi) @ c2w
        c2w = trans(1, -0.30) @ c2w
        c2w = trans(2, -0.03) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    return flip @ c2w


def load_blender_data(basedir, half_res=False, testskip=1, debug=False):
    """Returns (images [N,H,W,4] float32, poses [N,4,4], render_poses,
    [H, W, focal], i_split) — same contract as load_blender.py:68-145."""
    import imageio.v2 as imageio

    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json"), "r") as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"]))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        poses = np.array(poses).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    camera_angle_x = float(metas["train"]["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    render_poses = np.stack(
        [
            pose_spherical(angle, -30.0, 4.0)
            for angle in np.linspace(-180, 180, 181)[:-1]
        ]
    )

    if debug:
        # Tiny-image smoke mode (load_blender.py:115-128).
        import cv2

        H, W = H // 32, W // 32
        focal = focal / 32.0
        imgs = np.stack(
            [
                cv2.resize(imgs[i], dsize=(25, 25), interpolation=cv2.INTER_AREA)
                for i in range(imgs.shape[0])
            ]
        )
        return imgs, poses, render_poses, [H, W, focal], i_split

    if half_res:
        import cv2

        H, W = H // 2, W // 2
        focal = focal / 2.0
        imgs = np.stack(
            [
                cv2.resize(imgs[i], dsize=(W, H), interpolation=cv2.INTER_AREA)
                for i in range(imgs.shape[0])
            ]
        )

    return imgs, poses, render_poses, [H, W, focal], i_split
