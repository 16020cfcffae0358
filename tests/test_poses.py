"""Template pose generation: set-parity with the reference assets."""
import numpy as np
import pytest

from sam6d_tpu.render.poses import (
    template_cam_poses,
    template_obj_poses,
    icosphere_vertices,
    match_pose_order,
    nearest_template_indices,
)

REF = "/root/reference/SAM-6D/Instance_Segmentation_Model/utils/poses/predefined_poses"


pytestmark = pytest.mark.core  # sub-5-min correctness core


@pytest.mark.parametrize("level,n", [(0, 42), (1, 162), (2, 642)])
def test_cam_pose_set_matches_reference(level, n):
    ref = np.load(f"{REF}/cam_poses_level{level}.npy")
    got = template_cam_poses(level)
    assert got.shape == (n, 4, 4)
    perm = match_pose_order(got, ref)
    np.testing.assert_allclose(got[perm], ref, atol=5e-2)  # mm scale


@pytest.mark.parametrize("level", [0, 1])
def test_obj_pose_set_matches_reference(level):
    ref = np.load(f"{REF}/obj_poses_level{level}.npy")
    cam_ref = np.load(f"{REF}/cam_poses_level{level}.npy")
    got = template_obj_poses(level)
    perm = match_pose_order(template_cam_poses(level), cam_ref)
    np.testing.assert_allclose(got[perm], ref, atol=5e-2)


def test_rotations_orthonormal():
    p = template_obj_poses(0)
    R = p[:, :3, :3]
    RtR = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-6)


def test_icosphere_vertex_counts():
    assert icosphere_vertices(0).shape == (42, 3)
    assert icosphere_vertices(1).shape == (162, 3)
    norms = np.linalg.norm(icosphere_vertices(1), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)


def test_nearest_template_indices_identity_level2():
    idx = nearest_template_indices(2, 2)
    np.testing.assert_array_equal(idx, np.arange(642))
    idx0 = nearest_template_indices(0, 2)
    assert idx0.shape == (42,)
    # level-0 directions are a subset of level-2 -> exact hits
    a, b = icosphere_vertices(0), icosphere_vertices(2)
    np.testing.assert_allclose(
        np.linalg.norm(a - b[idx0], axis=1), 0.0, atol=1e-9)
