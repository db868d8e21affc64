"""LLFF/COLMAP data-path tests: a synthetic COLMAP binary model is written
from scratch, then driven through gen_poses -> poses_bounds.npy ->
load_llff_data -> ray datasets, including NDC."""

import os
import struct

import numpy as np
import pytest

from ddnerf_tpu.config import Config
from ddnerf_tpu.data import colmap
from ddnerf_tpu.data.llff import load_llff_data
from ddnerf_tpu.data.poses import gen_poses


def _rotmat2qvec(R):
    """Inverse of colmap.qvec2rotmat (for fixture writing) — Shepperd's
    method, robust for w ~ 0."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q * np.sign(q[0]) if q[0] != 0 else q


def write_colmap_model(sparse_dir, w2c_list, points, width=64, height=48,
                       focal=60.0):
    os.makedirs(sparse_dir, exist_ok=True)

    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, width, height))  # SIMPLE_PINHOLE
        f.write(struct.pack("<3d", focal, width / 2, height / 2))

    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(w2c_list)))
        for i, (R, t) in enumerate(w2c_list):
            q = _rotmat2qvec(R)
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            # Every image observes every point (dense visibility).
            f.write(struct.pack("<Q", len(points)))
            for j in range(len(points)):
                f.write(struct.pack("<ddq", 1.0, 1.0, j + 1))

    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for j, xyz in enumerate(points):
            f.write(struct.pack("<QdddBBBd", j + 1, *xyz, 128, 128, 128, 0.5))
            f.write(struct.pack("<Q", len(w2c_list)))
            for i in range(len(w2c_list)):
                f.write(struct.pack("<ii", i + 1, j))


@pytest.fixture(scope="module")
def llff_dir(tmp_path_factory):
    """A forward-facing scene: cameras at z~0 looking down -z at points
    around z=-4."""
    import imageio.v2 as imageio

    base = str(tmp_path_factory.mktemp("llff_scene"))
    rng = np.random.default_rng(0)

    n_cams = 8
    w2c_list = []
    target = np.array([0.0, 0.0, 4.5])
    for i in range(n_cams):
        # Cameras on a small arc, each looking toward the point cloud center
        # (varied orientations keep spherify's least-squares well-posed).
        ang = 0.15 * (i - n_cams / 2)
        pos = np.array([2.0 * np.sin(ang), 0.1 * rng.standard_normal(),
                        -0.5 * np.cos(ang)])
        fwd = target - pos
        fwd = fwd / np.linalg.norm(fwd)  # colmap z (forward)
        right = np.cross(np.array([0.0, -1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=0)  # world -> cam rows
        t = -R @ pos
        w2c_list.append((R, t))

    points = rng.uniform(-1, 1, (50, 3))
    points[:, 2] = rng.uniform(3.0, 6.0, 50)  # in front of the cameras

    write_colmap_model(os.path.join(base, "sparse/0"), w2c_list, points)

    imgdir = os.path.join(base, "images")
    os.makedirs(imgdir)
    for i in range(n_cams):
        img = (rng.uniform(0, 1, (48, 64, 3)) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(imgdir, f"img_{i:03d}.png"), img)
    return base


def test_colmap_reader_roundtrip(llff_dir):
    cams, images, pts = colmap.read_model(os.path.join(llff_dir, "sparse/0"))
    assert len(cams) == 1
    cam = next(iter(cams.values()))
    assert (cam.width, cam.height) == (64, 48)
    assert cam.params[0] == 60.0
    assert len(images) == 8
    im = images[1]
    assert im.name == "img_000.png"
    assert im.point3d_ids.shape == (50,)
    assert im.point3d_ids[0] == 1
    assert len(pts) == 50
    assert pts[1].image_ids.shape == (8,)


def test_gen_poses_writes_bounds(llff_dir):
    gen_poses(llff_dir)
    arr = np.load(os.path.join(llff_dir, "poses_bounds.npy"))
    assert arr.shape == (8, 17)
    near, far = arr[:, 15], arr[:, 16]
    # Points sit between z=3 and z=6 in front of the cameras.
    assert (near > 2.0).all() and (far < 7.0).all()
    assert (near < far).all()


def test_load_llff_data_forward_facing(llff_dir):
    cfg = Config.from_dict(
        {"dataset": {"type": "llff", "basedir": llff_dir,
                     "downsample_factor": 2, "bd_factor": 0.75}}
    )
    images, poses, bds, render_poses, i_test = load_llff_data(cfg)
    assert images.shape == (8, 24, 32, 3)
    assert poses.shape == (8, 3, 5)
    assert render_poses.shape[1:] == (3, 5)
    assert 0 <= i_test < 8
    # bd rescale: min bound becomes 1/bd_factor.
    np.testing.assert_allclose(bds.min(), 1.0 / 0.75, rtol=1e-5)
    # factor-2 cache created
    assert os.path.isdir(os.path.join(llff_dir, "images_2"))


def test_load_llff_spherify(llff_dir):
    cfg = Config.from_dict(
        {"dataset": {"type": "llff", "basedir": llff_dir,
                     "downsample_factor": 2, "bd_factor": 0.75,
                     "spherify": True}}
    )
    images, poses, bds, render_poses, i_test = load_llff_data(cfg)
    assert render_poses.shape == (120, 3, 5)
    # Spherified poses are normalized to ~unit radius.
    radii = np.linalg.norm(poses[:, :3, 3], axis=-1)
    assert radii.mean() < 3.0


def test_full_dataset_assembly_llff_ndc(llff_dir):
    from ddnerf_tpu.data.assembly import get_datasets

    cfg = Config.from_dict(
        {
            "dataset": {"type": "llff", "basedir": llff_dir,
                        "downsample_factor": 2, "bd_factor": 0.75,
                        "ndc_rays": True, "llffhold": 4,
                        "single_image_mode": False, "near": 0.0, "far": 1.0},
            "nerf": {"train": {"num_random_rays": 32}},
        }
    )
    train_ds, val_ds, cfg = get_datasets(cfg)
    rng = np.random.default_rng(0)
    ro, rd, radii, rgb = train_ds.sample_batch(rng, 32)
    assert ro.shape == (32, 3) and radii.shape == (32, 1)
    # NDC origins lie in the canonical cube-ish range.
    assert np.abs(ro[:, 2]).max() <= 1.0 + 1e-5
    ro_v, rd_v, radii_v, gt = val_ds.get_next_validation_rays()
    assert gt.shape == (24, 32, 3)


# ------------------------------------------------------- text-format model


def write_colmap_model_text(sparse_dir, w2c_list, points, width=64, height=48,
                            focal=60.0):
    """Same scene as write_colmap_model, in COLMAP's text format."""
    os.makedirs(sparse_dir, exist_ok=True)

    with open(os.path.join(sparse_dir, "cameras.txt"), "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write(f"1 SIMPLE_PINHOLE {width} {height} {focal} {width/2} {height/2}\n")

    with open(os.path.join(sparse_dir, "images.txt"), "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        for i, (R, t) in enumerate(w2c_list):
            q = _rotmat2qvec(R)
            vals = " ".join(f"{v:.17g}" for v in list(q) + list(t))
            f.write(f"{i+1} {vals} 1 img_{i:03d}.png\n")
            f.write(" ".join(f"1 1 {j+1}" for j in range(len(points))) + "\n")

    with open(os.path.join(sparse_dir, "points3D.txt"), "w") as f:
        f.write("# 3D point list with one line of data per point:\n")
        for j, xyz in enumerate(points):
            coords = " ".join(f"{v:.17g}" for v in xyz)
            track = " ".join(f"{i+1} {j}" for i in range(len(w2c_list)))
            f.write(f"{j+1} {coords} 128 128 128 0.5 {track}\n")


def test_colmap_text_reader_matches_binary(llff_dir, tmp_path):
    """The text readers parse the same scene to the same model as the binary
    readers (reference colmap_read_model.py:82-137 text fallback)."""
    rng = np.random.default_rng(3)
    n = 3
    w2c_list = []
    for i in range(n):
        # random rotation via QR
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        w2c_list.append((q, rng.standard_normal(3)))
    points = rng.uniform(-2, 2, (7, 3))

    bin_dir = str(tmp_path / "bin_model")
    txt_dir = str(tmp_path / "txt_model")
    write_colmap_model(bin_dir, w2c_list, points)
    write_colmap_model_text(txt_dir, w2c_list, points)

    assert colmap.detect_model_format(bin_dir) == ".bin"
    assert colmap.detect_model_format(txt_dir) == ".txt"

    cams_b, imgs_b, pts_b = colmap.read_model(bin_dir)
    cams_t, imgs_t, pts_t = colmap.read_model(txt_dir)

    assert cams_b.keys() == cams_t.keys()
    for k in cams_b:
        assert cams_b[k].model == cams_t[k].model == "SIMPLE_PINHOLE"
        assert (cams_b[k].width, cams_b[k].height) == (
            cams_t[k].width, cams_t[k].height)
        np.testing.assert_allclose(cams_b[k].params, cams_t[k].params)

    assert imgs_b.keys() == imgs_t.keys()
    for k in imgs_b:
        np.testing.assert_allclose(imgs_b[k].qvec, imgs_t[k].qvec, atol=1e-15)
        np.testing.assert_allclose(imgs_b[k].tvec, imgs_t[k].tvec, atol=1e-15)
        assert imgs_b[k].name == imgs_t[k].name
        assert imgs_b[k].camera_id == imgs_t[k].camera_id
        np.testing.assert_array_equal(imgs_b[k].point3d_ids,
                                      imgs_t[k].point3d_ids)
        np.testing.assert_allclose(imgs_b[k].xys, imgs_t[k].xys)

    assert pts_b.keys() == pts_t.keys()
    for k in pts_b:
        np.testing.assert_allclose(pts_b[k].xyz, pts_t[k].xyz, atol=1e-15)
        np.testing.assert_array_equal(pts_b[k].rgb, pts_t[k].rgb)
        assert pts_b[k].error == pts_t[k].error
        np.testing.assert_array_equal(pts_b[k].image_ids, pts_t[k].image_ids)
        np.testing.assert_array_equal(pts_b[k].point2d_idxs,
                                      pts_t[k].point2d_idxs)


def test_colmap_text_empty_track_line(tmp_path):
    """COLMAP writes an EMPTY observations line for an image with no 2D
    points; the two-line pairing must survive it."""
    d = str(tmp_path)
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("# comment\n")
        f.write("5 1 0 0 0 0.5 -1 2 1 foo.png\n")
        f.write("\n")  # zero observations
        f.write("6 1 0 0 0 0 0 0 1 bar.png\n")
        f.write("2.0 3.0 -1\n")
    imgs = colmap.read_images_text(os.path.join(d, "images.txt"))
    assert imgs[5].name == "foo.png"
    assert imgs[5].xys.shape == (0, 2)
    assert imgs[6].point3d_ids.tolist() == [-1]
    np.testing.assert_allclose(imgs[6].xys, [[2.0, 3.0]])


def test_colmap_text_truncated_raises(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("5 1 0 0 0 0.5 -1 2 1 foo.png\n")  # header, no track line
    with pytest.raises(ValueError):
        colmap.read_images_text(os.path.join(d, "images.txt"))


def test_read_model_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        colmap.read_model(str(tmp_path / "nope_model"))


def test_synthetic_llff_writer_roundtrip(tmp_path):
    """scripts/make_synthetic_dataset.py --format llff writes a dataset the
    LLFF loader reads back with the intended conventions: the stored
    [-u, r, b] columns come out as [r, u, b] after the loader's swap, the
    images match a re-trace with the loaded (un-recentered) poses, and the
    bounds bracket the scene."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "make_synthetic_dataset",
        os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "make_synthetic_dataset.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class Args:
        outdir = str(tmp_path / "llff_ds")
        size = 40
        train = 5
        val = 1
        test = 1
        seed = 3

    mod._write_llff(Args)

    arr = np.load(os.path.join(Args.outdir, "poses_bounds.npy"))
    assert arr.shape == (7, 17)
    # Reproduce the loader's column swap (llff.py:105-110) on the raw file
    # and check the result is a proper [r, u, b] rotation looking at -z-ish.
    poses = arr[:, :-2].reshape(-1, 3, 5)
    swapped = np.concatenate(
        [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], axis=2)
    for p in swapped:
        R = p[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.9  # right-handed [r, u, b]
        assert R[2, 2] > 0.5  # back vector points +z (camera looks -z)
    # hwf column and bounds
    np.testing.assert_allclose(poses[:, 0, 4], 40)  # H
    np.testing.assert_allclose(poses[:, 1, 4], 40)  # W
    assert (arr[:, -2] > 1.0).all() and (arr[:, -1] > arr[:, -2]).all()

    # Full loader round trip (no factor -> reads images/ directly).
    cfg = Config.from_dict({
        "dataset": {"type": "llff", "basedir": Args.outdir,
                    "downsample_factor": 1, "bd_factor": 0.75,
                    "spherify": False, "llffhold": 0},
    })
    images, lposes, bds, render_poses, i_test = load_llff_data(cfg)
    assert images.shape == (7, 40, 40, 3)
    assert np.isfinite(lposes).all()
    assert len(render_poses) > 0  # spiral path built

    # Image content: re-trace view 0 with the stored (un-swapped-back)
    # camera and compare to the PNG the writer saved.
    import imageio.v2 as imageio

    from ddnerf_tpu.data.synthetic import _trace

    c2w = swapped[0, :3, :4]
    focal = poses[0, 2, 4]
    ii, jj = np.meshgrid(np.arange(40, dtype=np.float32),
                         np.arange(40, dtype=np.float32), indexing="xy")
    dirs_cam = np.stack([(ii - 20.0) / focal, -(jj - 20.0) / focal,
                         -np.ones_like(ii)], axis=-1)
    rd = np.sum(dirs_cam[..., None, :] * c2w[:3, :3], axis=-1)
    ro = np.broadcast_to(c2w[:3, -1], rd.shape)
    rgba = _trace(ro, rd)
    expect = np.clip(rgba[..., :3] * rgba[..., 3:4], 0, 1)
    got = imageio.imread(
        os.path.join(Args.outdir, "images", "image000.png")) / 255.0
    np.testing.assert_allclose(got, expect, atol=2 / 255)
