"""Fixed-radius ball query + grouping, pure XLA.

TPU-native equivalent of the reference CUDA ops
(`_ext_src/src/ball_query_gpu.cu`, `group_points_gpu.cu`) used by the fine
matching positional encoding (`model/fine_point_matching.py:93-121`).

Instead of a per-thread scan, we compute the (B, M, N) distance matrix as one
MXU matmul-shaped op and extract, per query, the first `nsample` in-radius
indices in ascending index order (the reference kernel's semantics, including
its padding rule: slots beyond the hit count are filled with the first hit).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import pairwise_sq_distance


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
) -> jnp.ndarray:
    """xyz: (B, N, 3) candidates, new_xyz: (B, M, 3) query centers.

    Returns (B, M, nsample) int32 indices into N: the first nsample points
    within `radius` of each center, in index order; tail slots replicate the
    first hit (zero if no hits).
    """
    d2 = pairwise_sq_distance(new_xyz, xyz)  # (B, M, N)
    N = xyz.shape[1]
    hit = d2 < (radius * radius)
    iota = jnp.arange(N, dtype=jnp.int32)
    # key: hits keep their index, misses get index+N — top_k of (-key) yields
    # the lowest-index hits first.
    key = jnp.where(hit, iota, iota + N)
    neg_sorted, _ = jax.lax.top_k(-key, nsample)  # (B, M, nsample)
    idx = -neg_sorted
    valid = idx < N
    first = idx[..., 0:1]
    first = jnp.where(valid[..., 0:1], first, 0)
    return jnp.where(valid, idx, first).astype(jnp.int32)


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats: (B, N, C), idx: (B, M, S) -> (B, M, S, C).

    Replaces reference grouping_operation (group_points_gpu.cu).
    """
    B, N, C = feats.shape
    _, M, S = idx.shape
    flat = idx.reshape(B, M * S)
    out = jnp.take_along_axis(feats, flat[..., None], axis=1)
    return out.reshape(B, M, S, C)


@partial(jax.jit, static_argnames=("nsample", "use_xyz"))
def query_and_group(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    features: jnp.ndarray | None = None,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """Reference QueryAndGroup (pointnet2_utils.py:334-355), channels-last.

    Returns (B, M, nsample, C_out) with C_out = 3 (relative xyz) [+ C feats].
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feats = group_points(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        return grouped_feats
    return grouped_xyz


def three_nn_interpolate(
    unknown: jnp.ndarray, known: jnp.ndarray, known_feats: jnp.ndarray
) -> jnp.ndarray:
    """3-NN inverse-distance feature interpolation.

    unknown: (B, N, 3), known: (B, M, 3), known_feats: (B, M, C) -> (B, N, C).
    Replaces reference three_nn/three_interpolate (interpolate_gpu.cu).
    """
    d2 = pairwise_sq_distance(unknown, known)  # (B, N, M)
    negd, idx = jax.lax.top_k(-d2, 3)  # (B, N, 3)
    dist = jnp.sqrt(jnp.maximum(-negd, 0.0))
    w = 1.0 / (dist + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = group_points(known_feats, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * w[..., None], axis=2)
