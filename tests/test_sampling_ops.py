"""Tests for FPS, ball query, grouping, embeddings, pointcloud ops."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.ops import (
    farthest_point_sample,
    gather_points,
    ball_query,
    group_points,
    query_and_group,
    three_nn_interpolate,
    multinomial_from_weights,
    sinusoidal_embedding,
    geometric_embedding_indices,
    depth_to_pointcloud,
    radius_outlier_mask,
    cloud_radius,
)


pytestmark = pytest.mark.core  # sub-5-min correctness core


def fps_numpy(pts, m):
    """Oracle: sequential FPS starting at index 0 (reference CUDA semantics)."""
    n = pts.shape[0]
    idxs = [0]
    mind = np.full(n, 1e10)
    for _ in range(1, m):
        d = ((pts - pts[idxs[-1]]) ** 2).sum(-1)
        mind = np.minimum(mind, d)
        idxs.append(int(np.argmax(mind)))
    return np.array(idxs)


def test_fps_matches_sequential_oracle(rng):
    pts = rng.randn(2, 100, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.array(pts), 16))
    for b in range(2):
        want = fps_numpy(pts[b], 16)
        np.testing.assert_array_equal(got[b], want)


def test_fps_respects_valid_mask(rng):
    pts = rng.randn(1, 64, 3).astype(np.float32)
    pts[0, 32:] += 1000.0  # padded garbage far away — would dominate FPS
    mask = np.zeros((1, 64), dtype=bool)
    mask[0, :32] = True
    idx = np.asarray(farthest_point_sample(jnp.array(pts), 8, jnp.array(mask)))
    assert (idx < 32).all()


def test_fps_covers_clusters(rng):
    # 4 well-separated clusters; 4 samples must hit all of them
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]], np.float32)
    pts = np.concatenate([c + 0.1 * rng.randn(25, 3) for c in centers]).astype(np.float32)
    idx = np.asarray(farthest_point_sample(jnp.array(pts[None]), 4))[0]
    clusters = set(idx // 25)
    assert clusters == {0, 1, 2, 3}


def test_gather_points(rng):
    x = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 5))
    got = np.asarray(gather_points(jnp.array(x), jnp.array(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], x[b][idx[b]])


def ball_query_numpy(radius, nsample, xyz, new_xyz):
    """Oracle replicating the reference CUDA scan semantics."""
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    out = np.zeros((B, M, nsample), np.int32)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = ((xyz[b, k] - new_xyz[b, m]) ** 2).sum()
                if d2 < radius**2:
                    if cnt == 0:
                        out[b, m, :] = k
                    out[b, m, cnt] = k
                    cnt += 1
                    if cnt == nsample:
                        break
    return out


def test_ball_query_matches_reference_semantics(rng):
    xyz = rng.rand(2, 60, 3).astype(np.float32)
    new_xyz = rng.rand(2, 9, 3).astype(np.float32)
    got = np.asarray(ball_query(0.3, 8, jnp.array(xyz), jnp.array(new_xyz)))
    want = ball_query_numpy(0.3, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_two_scale_ball_query_matches_single_scale(rng):
    from sam6d_tpu.ops.ball_query import two_scale_ball_query

    xyz = rng.rand(2, 60, 3).astype(np.float32)
    new_xyz = rng.rand(2, 9, 3).astype(np.float32)
    i1, i2 = two_scale_ball_query(0.2, 4, 0.4, 8,
                                  jnp.array(xyz), jnp.array(new_xyz))
    np.testing.assert_array_equal(np.asarray(i1),
                                  ball_query_numpy(0.2, 4, xyz, new_xyz))
    np.testing.assert_array_equal(np.asarray(i2),
                                  ball_query_numpy(0.4, 8, xyz, new_xyz))


def test_group_points(rng):
    feats = rng.randn(1, 20, 6).astype(np.float32)
    idx = rng.randint(0, 20, size=(1, 4, 3))
    got = np.asarray(group_points(jnp.array(feats), jnp.array(idx)))
    np.testing.assert_array_equal(got[0], feats[0][idx[0]])


def test_group_points_onehot_path_bitexact(rng):
    """The TPU one-hot-matmul gather (bf16 fast path) must reproduce the
    row gather bit-for-bit, including the chunk-padding tail."""
    from sam6d_tpu.ops.ball_query import _group_points_onehot

    B, N, C = 2, 64, 8
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(
        jnp.bfloat16)
    for M, S in ((10, 7), (16, 16)):  # 70 and 256 rows with chunk 32
        idx = rng.randint(0, N, size=(B, M, S)).astype(np.int32)
        flat = jnp.asarray(idx.reshape(B, M * S))
        got = np.asarray(_group_points_onehot(feats, flat, M, S, chunk=32))
        want = np.asarray(jnp.take_along_axis(
            feats, flat[..., None], axis=1).reshape(B, M, S, C))
        np.testing.assert_array_equal(got, want)


def test_query_and_group_channels(rng):
    xyz = rng.rand(1, 30, 3).astype(np.float32)
    out = query_and_group(0.5, 30, jnp.array(xyz), jnp.array(xyz), jnp.array(xyz))
    assert out.shape == (1, 30, 30, 6)
    # first 3 channels are relative xyz; with nsample=N every in-radius point
    # is kept, so each query sees itself with rel == 0
    rel = np.asarray(out)[0, :, :, :3]
    self_dist = np.abs(rel).sum(-1).min(axis=1)
    assert (self_dist < 1e-6).all()
    # last 3 channels are absolute neighbor coords -> rel + center
    absn = np.asarray(out)[0, :, :, 3:]
    np.testing.assert_allclose(absn - rel, np.broadcast_to(xyz[0][:, None], absn.shape), atol=1e-5)


def test_three_nn_interpolate_exact_at_known_points(rng):
    known = rng.rand(1, 10, 3).astype(np.float32)
    feats = rng.randn(1, 10, 5).astype(np.float32)
    got = np.asarray(three_nn_interpolate(jnp.array(known), jnp.array(known), jnp.array(feats)))
    np.testing.assert_allclose(got, feats, atol=1e-3)


def test_multinomial_distribution():
    w = jnp.array([[0.0, 0.0, 1.0, 3.0]])
    idx = np.asarray(multinomial_from_weights(jax.random.PRNGKey(0), w, 4000))
    counts = np.bincount(idx[0], minlength=4)
    assert counts[0] == 0 and counts[1] == 0
    assert abs(counts[3] / counts[2] - 3.0) < 0.4


def test_sinusoidal_embedding_matches_reference_layout():
    d = 8
    x = jnp.array([1.7])
    emb = np.asarray(sinusoidal_embedding(x, d))[0]
    div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
    om = 1.7 * div
    want = np.stack([np.sin(om), np.cos(om)], axis=-1).reshape(-1)
    np.testing.assert_allclose(emb, want, atol=1e-5)


def test_geometric_embedding_indices(rng):
    pts = rng.rand(1, 12, 3).astype(np.float32)
    d_idx, a_idx = geometric_embedding_indices(jnp.array(pts), 0.2, 15.0, 3)
    assert d_idx.shape == (1, 12, 12)
    assert a_idx.shape == (1, 12, 12, 3)
    # distance indices: |pi-pj|/sigma_d
    want = np.linalg.norm(pts[0][:, None] - pts[0][None], axis=-1) / 0.2
    np.testing.assert_allclose(np.asarray(d_idx)[0], want, atol=1e-3)
    # angles in [0, pi] * factor
    factor = 180.0 / (15.0 * np.pi)
    a = np.asarray(a_idx)
    assert a.min() >= -1e-5 and a.max() <= np.pi * factor + 1e-4


def test_depth_to_pointcloud_roundtrip():
    K = jnp.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    depth = jnp.ones((480, 640)) * 2.0
    cloud = np.asarray(depth_to_pointcloud(depth, K))
    # center pixel maps to (0, 0, 2)
    np.testing.assert_allclose(cloud[240, 320], [0, 0, 2.0], atol=1e-5)
    # reproject: u = fx * x / z + cx
    u = 600.0 * cloud[100, 200, 0] / cloud[100, 200, 2] + 320
    v = 600.0 * cloud[100, 200, 1] / cloud[100, 200, 2] + 240
    np.testing.assert_allclose([u, v], [200, 100], atol=1e-4)


def test_radius_outlier_mask(rng):
    cloud = np.zeros((10, 3), np.float32)
    cloud[:9] = rng.rand(9, 3) * 0.1
    cloud[9:] = 5.0  # single mild outlier (center stays near the cluster)
    valid = np.ones(10, bool)
    kept = np.asarray(radius_outlier_mask(jnp.array(cloud), jnp.array(valid), 1.0))
    assert kept[:9].all() and not kept[9:].any()


def test_cloud_radius(rng):
    c = rng.randn(2, 30, 3).astype(np.float32)
    got = np.asarray(cloud_radius(jnp.array(c)))
    want = np.linalg.norm(c, axis=-1).max(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
