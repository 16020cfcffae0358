"""Property + parity tests for geometry ops (numpy is the oracle)."""
import numpy as np
import pytest
import jax.numpy as jnp

from sam6d_tpu.ops import (
    pairwise_sq_distance,
    svd3x3,
    symeig3x3,
    weighted_procrustes,
    transform_points,
    inverse_transform_points,
)


pytestmark = pytest.mark.core  # sub-5-min correctness core


def random_rotation(rng):
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_pairwise_sq_distance_matches_numpy(rng):
    x = rng.randn(2, 5, 3).astype(np.float32)
    y = rng.randn(2, 7, 3).astype(np.float32)
    got = np.asarray(pairwise_sq_distance(jnp.array(x), jnp.array(y)))
    want = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_symeig3x3_matches_numpy(rng):
    A = rng.randn(64, 3, 3).astype(np.float32)
    A = A + np.swapaxes(A, -1, -2)
    w, V = symeig3x3(jnp.array(A))
    w, V = np.asarray(w), np.asarray(V)
    w_np = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(w, w_np, atol=1e-3)
    # eigen property A v = w v
    for b in range(4):
        for i in range(3):
            np.testing.assert_allclose(
                A[b] @ V[b][:, i], w[b][i] * V[b][:, i], atol=1e-3
            )


def test_svd3x3_reconstructs(rng):
    H = rng.randn(128, 3, 3).astype(np.float32)
    U, S, V = svd3x3(jnp.array(H))
    U, S, V = np.asarray(U), np.asarray(S), np.asarray(V)
    recon = U @ (S[..., None] * np.swapaxes(V, -1, -2))
    np.testing.assert_allclose(recon, H, atol=2e-3)
    s_np = np.linalg.svd(H, compute_uv=False)
    np.testing.assert_allclose(S, s_np, atol=1e-3)
    # orthonormality
    np.testing.assert_allclose(
        np.swapaxes(U, -1, -2) @ U, np.broadcast_to(np.eye(3), U.shape), atol=1e-3
    )


def test_svd3x3_rank_deficient():
    # rank-1 matrix
    a = np.array([1.0, 2.0, 3.0])
    H = np.outer(a, a).astype(np.float32)[None]
    U, S, V = svd3x3(jnp.array(H))
    recon = np.asarray(U) @ (np.asarray(S)[..., None] * np.swapaxes(np.asarray(V), -1, -2))
    np.testing.assert_allclose(recon, H, atol=1e-3)


def test_weighted_procrustes_exact_recovery(rng):
    R = np.stack([random_rotation(rng) for _ in range(8)]).astype(np.float32)
    t = rng.randn(8, 3).astype(np.float32)
    src = rng.randn(8, 50, 3).astype(np.float32)
    ref = np.einsum("bij,bnj->bni", R, src) + t[:, None, :]
    R_est, t_est = weighted_procrustes(jnp.array(src), jnp.array(ref))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)


def test_weighted_procrustes_ignores_zero_weight_outliers(rng):
    R = random_rotation(rng).astype(np.float32)
    t = rng.randn(3).astype(np.float32)
    src = rng.randn(40, 3).astype(np.float32)
    ref = src @ R.T + t
    # corrupt last 10 points but zero their weights
    ref_bad = ref.copy()
    ref_bad[30:] += 100.0
    w = np.ones(40, dtype=np.float32)
    w[30:] = 0.0
    R_est, t_est = weighted_procrustes(
        jnp.array(src[None]), jnp.array(ref_bad[None]), jnp.array(w[None])
    )
    np.testing.assert_allclose(np.asarray(R_est)[0], R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est)[0], t, atol=1e-3)


def test_transform_roundtrip(rng):
    R = random_rotation(rng).astype(np.float32)[None]
    t = rng.randn(1, 3).astype(np.float32)
    p = rng.randn(1, 20, 3).astype(np.float32)
    cam = transform_points(jnp.array(p), jnp.array(R), jnp.array(t))
    back = inverse_transform_points(cam, jnp.array(R), jnp.array(t))
    np.testing.assert_allclose(np.asarray(back), p, atol=1e-4)
