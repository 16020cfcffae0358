"""Pose solver tests: synthetic rigid scenes with known assignments."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.pose.solvers import (
    soft_assignment,
    compute_coarse_Rt,
    compute_fine_Rt,
)
from tests.test_geometry import random_rotation


pytestmark = pytest.mark.core  # sub-5-min correctness core


def make_scene(rng, B=2, N=64, noise=0.0):
    """Model cloud + rigid transform; observed pts1[i] corresponds to pts2[i]."""
    R = np.stack([random_rotation(rng) for _ in range(B)]).astype(np.float32)
    t = (rng.rand(B, 3).astype(np.float32) - 0.5) * 0.5
    pts2 = (rng.rand(B, N, 3).astype(np.float32) - 0.5)  # model frame
    pts1 = np.einsum("bij,bnj->bni", R, pts2) + t[:, None, :]
    if noise:
        pts1 = pts1 + noise * rng.randn(B, N, 3).astype(np.float32)
    return R, t, pts1, pts2


def gt_atten(B, N, scale=50.0):
    """Similarity matrix encoding the identity assignment (incl. bg row/col)."""
    a = np.full((B, N + 1, N + 1), -1.0, np.float32)
    for i in range(N + 1):
        a[:, i, i] = 1.0
    return a * scale


def test_soft_assignment_shapes_and_masks(rng):
    atten = jnp.array(gt_atten(1, 8))
    score, w1, w2, label1, label2 = soft_assignment(atten)
    assert score.shape == (1, 8, 8)
    np.testing.assert_array_equal(np.asarray(label1)[0], np.arange(1, 9))
    assert np.asarray(w1).all() and np.asarray(w2).all()


def test_fine_rt_exact_recovery(rng):
    R, t, pts1, pts2 = make_scene(rng, B=2, N=64)
    atten = jnp.array(gt_atten(2, 64))
    R_est, t_est, score = compute_fine_Rt(atten, jnp.array(pts1), jnp.array(pts2))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-2)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-2)
    assert (np.asarray(score) > 0.95).all()


def test_fine_rt_with_bg_points(rng):
    # half the observed points are background (assigned to bg col)
    R, t, pts1, pts2 = make_scene(rng, B=1, N=64)
    a = gt_atten(1, 64)
    a[:, 33:, :] = -50.0  # rows 33.. prefer nothing
    a[:, 33:, 0] = 50.0   # .. and map to bg
    pts1_noisy = pts1.copy()
    pts1_noisy[:, 32:] += 5.0  # corrupt bg points
    R_est, t_est, score = compute_fine_Rt(
        jnp.array(a), jnp.array(pts1_noisy), jnp.array(pts2))
    np.testing.assert_allclose(np.asarray(R_est)[0], R[0], atol=1e-2)
    np.testing.assert_allclose(np.asarray(t_est)[0], t[0], atol=1e-2)


def test_coarse_rt_recovery(rng):
    R, t, pts1, pts2 = make_scene(rng, B=2, N=64)
    atten = jnp.array(gt_atten(2, 64))
    key = jax.random.PRNGKey(0)
    R_est, t_est = compute_coarse_Rt(
        key, atten, jnp.array(pts1), jnp.array(pts2),
        n_proposal1=600, n_proposal2=60, dist_chunk=30)
    np.testing.assert_allclose(np.asarray(R_est), R, atol=5e-2)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=5e-2)


def test_coarse_rt_robust_to_outlier_rows(rng):
    R, t, pts1, pts2 = make_scene(rng, B=1, N=64, noise=0.005)
    a = gt_atten(1, 64)
    # corrupt a handful of correspondences; sampling + selection must reject
    a[:, 1:6, :] = -50.0
    a[:, 1:6, 40] = 50.0
    key = jax.random.PRNGKey(1)
    R_est, t_est = compute_coarse_Rt(
        key, jnp.array(a), jnp.array(pts1), jnp.array(pts2),
        n_proposal1=600, n_proposal2=60, dist_chunk=30)
    err = np.abs(np.asarray(R_est)[0] - R[0]).max()
    assert err < 0.1
