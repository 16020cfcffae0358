"""Positional / geometric embeddings (pure functions).

Parity targets: reference `Pose_Estimation_Model/model/transformer.py`
SinusoidalPositionalEmbedding (:257-283) and the pairwise part of
GeometricStructureEmbedding.get_embedding_indices (:302-332).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import pairwise_sq_distance


def sinusoidal_embedding(indices: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """indices: (...,) float -> (..., d_model), interleaved [sin, cos] pairs.

    Matches reference SinusoidalPositionalEmbedding: omega_i = x *
    exp(2i * (-ln 10000 / d)), output layout (..., d/2, 2) flattened.
    """
    if d_model % 2 != 0:
        raise ValueError(f"odd d_model: {d_model}")
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-np.log(10000.0) / d_model)
    )
    omegas = indices[..., None] * div  # (..., d/2)
    emb = jnp.stack([jnp.sin(omegas), jnp.cos(omegas)], axis=-1)  # (..., d/2, 2)
    return emb.reshape(*indices.shape, d_model)


def geometric_embedding_indices(
    points: jnp.ndarray, sigma_d: float, sigma_a: float, angle_k: int
):
    """Distance + wedge-angle embedding indices of GeoTransformer.

    points: (B, N, 3). Returns (d_indices (B, N, N), a_indices (B, N, N, k)).
    Matches reference get_embedding_indices (transformer.py:302-332):
    d = |pi - pj| / sigma_d; angles between (knn ref vectors) and (pj - pi),
    scaled by 180 / (sigma_a * pi).
    """
    B, N, _ = points.shape
    d2 = pairwise_sq_distance(points, points)
    dist = jnp.sqrt(d2)
    d_indices = dist / sigma_d

    k = angle_k
    # k nearest neighbors excluding self: top_k over negative distance, skip 0th
    _, knn_idx = jax.lax.top_k(-d2, k + 1)  # (B, N, k+1) ascending distance
    knn_idx = knn_idx[..., 1:]  # drop self
    flat_idx = knn_idx.reshape(B, N * k)
    knn_pts = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    knn_pts = knn_pts.reshape(B, N, k, 3)
    ref_vec = knn_pts - points[:, :, None, :]  # (B, N, k, 3)
    anc_vec = points[:, None, :, :] - points[:, :, None, :]  # (B, N, N, 3)
    ref_e = ref_vec[:, :, None, :, :]  # (B, N, 1, k, 3)
    anc_e = anc_vec[:, :, :, None, :]  # (B, N, N, 1, 3)
    sin_v = jnp.linalg.norm(jnp.cross(ref_e, anc_e), axis=-1)  # (B, N, N, k)
    cos_v = jnp.sum(ref_e * anc_e, axis=-1)
    angles = jnp.arctan2(sin_v, cos_v)
    factor_a = 180.0 / (sigma_a * np.pi)
    return d_indices, angles * factor_a
