"""Pose-path parity: spherical render poses (blender + real-world-360 "beta"
warp) against the reference, and the render-pose iterator."""

import numpy as np
import pytest

from ddnerf_tpu.data.blender import pose_spherical_for_real_world_360
from ddnerf_tpu.data.synthetic import pose_spherical

from conftest import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)


@requires_reference
def test_pose_spherical_parity():
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from data_utils.load_blender import pose_spherical as ref_pose

    for theta, phi, r in [(-180.0, -30.0, 4.0), (45.0, -30.0, 4.0),
                          (170.0, -10.0, 2.0)]:
        np.testing.assert_allclose(
            pose_spherical(theta, phi, r), ref_pose(theta, phi, r),
            rtol=1e-5, atol=1e-6,
        )


@requires_reference
@pytest.mark.parametrize("name", [None, "beta"])
def test_pose_spherical_real360_parity(name):
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from data_utils.load_blender import (
        pose_spherical_for_real_world_360 as ref_pose,
    )

    for theta in [0.0, 90.0, 200.0, 350.0]:
        np.testing.assert_allclose(
            pose_spherical_for_real_world_360(theta, -10.0, 0.89, name),
            ref_pose(theta, -10.0, 0.89, name),
            rtol=1e-5, atol=1e-6,
        )


def test_render_pose_iterator_advances():
    from ddnerf_tpu.data.datasets import ValRayDataset

    poses = np.stack([pose_spherical(a, -30.0, 4.0) for a in (0.0, 90.0)])
    images = np.zeros((2, 8, 8, 3), np.float32)
    render_poses = np.stack([pose_spherical(a, -30.0, 4.0)
                             for a in (0.0, 120.0, 240.0)])
    ds = ValRayDataset(poses, images, focal=10.0, render_poses=render_poses)
    ro0, _, _ = ds.get_next_render_pose()
    ro1, _, _ = ds.get_next_render_pose()
    assert ds.render_idx == 2
    assert not np.allclose(ro0, ro1)  # different poses -> different origins

    # validation round-robin wraps
    for _ in range(3):
        ds.get_next_validation_rays()
    assert ds.current_idx == 1


@requires_reference
def test_get_ray_bundle_parity():
    """Pixel->ray generation incl. the epsilon nudge and mip radii
    (reference nerf_helpers.py:67-125)."""
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    from general_utils.nerf_helpers import get_ray_bundle as ref_bundle

    from ddnerf_tpu.core.rays import get_ray_bundle

    c2w = pose_spherical(35.0, -25.0, 4.0)
    ro, rd, radii = get_ray_bundle(12, 16, 20.0, c2w)
    ro_t, rd_t, radii_t = ref_bundle(12, 16, 20.0, torch.tensor(c2w))
    np.testing.assert_allclose(ro, ro_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rd, rd_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(radii, radii_t.numpy(), rtol=1e-5, atol=1e-7)


@requires_reference
def test_ndc_rays_parity():
    """NDC projection + NDC mip radii (reference dataset_helpers.py:3-42)."""
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    from data_utils.dataset_helpers import ndc_mipnerf_rays as ref_ndc
    from data_utils.dataset_helpers import switch_t_ndc_to_regular as ref_unwarp

    from ddnerf_tpu.core.rays import get_ray_bundle, ndc_mipnerf_rays, switch_t_ndc_to_regular

    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.0
    ro, rd, _ = get_ray_bundle(12, 16, 20.0, c2w)
    o_j, d_j, r_j = ndc_mipnerf_rays(12, 16, 20.0, ro, rd, near=1.0)
    o_t, d_t, r_t = ref_ndc(12, 16, 20.0, torch.tensor(ro), torch.tensor(rd), 1)
    np.testing.assert_allclose(o_j, o_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d_j, d_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r_j, r_t.numpy(), rtol=1e-5, atol=1e-7)

    depth = np.random.default_rng(0).uniform(0.1, 0.9, (12, 16)).astype(np.float32)
    np.testing.assert_allclose(
        switch_t_ndc_to_regular(depth, o_j, d_j),
        ref_unwarp(torch.tensor(depth), torch.tensor(o_j), torch.tensor(d_j)).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_validation_unwarp_rays_quirk_and_fix():
    """The NDC-depth un-warp quirk (round-4 verdict item 7, DECIDED):
    default = reference parity (rays of the NEXT image — reference
    dataset.py:137-154 reads current_idx after the advance); fixed=True =
    rays of the image actually served."""
    from ddnerf_tpu.core.rays import get_ray_bundle
    from ddnerf_tpu.data.datasets import ValRayDataset

    poses = np.stack([pose_spherical(a, -30.0, 4.0) for a in (0.0, 90.0, 180.0)])
    images = np.zeros((3, 8, 8, 3), np.float32)
    ds = ValRayDataset(poses, images, focal=10.0, render_poses=poses)

    ds.get_next_validation_rays()  # serves image 0, advances to 1
    quirk_ro, _, _ = ds.get_current_regular_validation_rays()
    fixed_ro, _, _ = ds.get_current_regular_validation_rays(fixed=True)

    next_ro, _, _ = get_ray_bundle(8, 8, 10.0, poses[1])
    served_ro, _, _ = get_ray_bundle(8, 8, 10.0, poses[0])
    np.testing.assert_array_equal(np.asarray(quirk_ro), np.asarray(next_ro))
    np.testing.assert_array_equal(np.asarray(fixed_ro), np.asarray(served_ro))
    assert not np.allclose(np.asarray(quirk_ro), np.asarray(fixed_ro))

    # The pose-based twin records the same served index.
    ds.get_next_validation_pose()  # serves image 1, advances to 2
    fixed_ro2, _, _ = ds.get_current_regular_validation_rays(fixed=True)
    served_ro2, _, _ = get_ray_bundle(8, 8, 10.0, poses[1])
    np.testing.assert_array_equal(np.asarray(fixed_ro2), np.asarray(served_ro2))
