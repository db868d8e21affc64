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
