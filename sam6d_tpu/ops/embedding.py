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


def sinusoid_phase_tables(d_model: int, scale: float = 1.0):
    """Interleaved-[sin, cos] embedding as ONE sin: emb[..., 2i] =
    sin(x*div_i), emb[..., 2i+1] = cos(x*div_i) = sin(x*div_i + pi/2), so
    emb = sin(x[..., None] * div2 + phase) with div2 = repeat(div, 2) and
    phase = tile([0, pi/2]). Bit-compatible layout with
    `sinusoidal_embedding` without the (..., d/2, 2)-stack + reshape
    shuffles (TPU: those cost a relayout of the minor dims; the fused form
    is a single broadcasted FMA + sin in the natural layout). `scale`
    folds a multiplicative index factor (e.g. 1/sigma_d) into the table.
    """
    if d_model % 2 != 0:
        raise ValueError(f"odd d_model: {d_model}")
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * (-np.log(10000.0) / d_model))
    div2 = np.repeat(div * scale, 2).astype(np.float32)
    phase = np.tile(np.array([0.0, np.pi / 2], np.float64),
                    d_model // 2).astype(np.float32)
    return jnp.asarray(div2), jnp.asarray(phase)


def pairwise_planar_diffs(points: jnp.ndarray):
    """points (B, N, 3) -> per-component pairwise difference maps
    (ax, ay, az), each (B, N, M) with a*[b, n, m] = p[b, m] - p[b, n].

    TPU layout note: keeping the coordinate axis as three separate (B, N, M)
    arrays (M in lanes) instead of one (B, N, M, 3) tensor (3 in lanes, 42x
    tile waste) is what makes the geometric embedding bandwidth-clean.
    """
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    ax = px[:, None, :] - px[:, :, None]
    ay = py[:, None, :] - py[:, :, None]
    az = pz[:, None, :] - pz[:, :, None]
    return ax, ay, az


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
