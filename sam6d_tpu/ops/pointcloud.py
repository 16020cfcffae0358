"""Depth backprojection and point-cloud preprocessing (device-side).

Parity targets: reference `Pose_Estimation_Model/utils/data_utils.py`
get_point_cloud_from_depth (:92-110) and the per-instance cloud assembly of
`run_inference_custom.py:193-227` — rebuilt as fixed-capacity masked tensor
ops so the whole preprocessing runs inside one jitted program instead of a
Python loop over instances.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_pointcloud(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Backproject a depth map to camera-space points.

    depth: (H, W) in meters; K: (3, 3). Returns (H, W, 3).
    Matches reference get_point_cloud_from_depth (data_utils.py:92-110).
    """
    H, W = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xmap = jnp.arange(W, dtype=depth.dtype)[None, :].repeat(H, axis=0)
    ymap = jnp.arange(H, dtype=depth.dtype)[:, None].repeat(W, axis=1)
    z = depth
    x = (xmap - cx) * z / fx
    y = (ymap - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def masked_depth_mean_translation(
    masks: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray, depth_scale: jnp.ndarray
) -> jnp.ndarray:
    """Mean backprojected point of each masked depth region -> (N, 3).

    Matches reference depth_image_to_pointcloud_translate_torch
    (`Instance_Segmentation_Model/utils/trimesh_utils.py:78-106`): per
    proposal, the mean over mask pixels with depth > 0 of the backprojected
    cloud (in meters; depth * depth_scale / 1000).
    """
    # the reference multiplies the (possibly fractional, bilinearly resized)
    # mask INTO the depth before backprojection, then averages over Z > 0 —
    # fractional mask pixels contribute scaled-down points; replicated.
    Z = (masks.astype(depth.dtype) * depth[None, :, :]
         * depth_scale / 1000.0)                              # (N, H, W)
    H, W = depth.shape
    u = jnp.arange(W, dtype=Z.dtype)[None, None, :]
    v = jnp.arange(H, dtype=Z.dtype)[None, :, None]
    X = (u - K[0, 2]) * Z / K[0, 0]
    Y = (v - K[1, 2]) * Z / K[1, 1]
    valid = (Z > 0).astype(Z.dtype)
    den = jnp.sum(valid, axis=(1, 2))[:, None] + 1e-8
    num = jnp.stack([jnp.sum(X, axis=(1, 2)), jnp.sum(Y, axis=(1, 2)),
                     jnp.sum(Z, axis=(1, 2))], axis=1)
    return num / den


def radius_outlier_mask(
    cloud: jnp.ndarray, valid: jnp.ndarray, radius_limit: jnp.ndarray
) -> jnp.ndarray:
    """Keep points within `radius_limit` of the valid-point centroid.

    cloud: (N, 3), valid: (N,) bool, radius_limit: scalar. Returns (N,) bool.
    Matches the outlier cut of the reference instance assembly
    (run_inference_custom.py:215-221: |p - mean| < radius * 1.2).
    """
    vf = valid.astype(cloud.dtype)[:, None]
    center = jnp.sum(cloud * vf, axis=0) / jnp.maximum(jnp.sum(vf), 1.0)
    d = jnp.linalg.norm(cloud - center, axis=1)
    return valid & (d < radius_limit)


def normalize_cloud_by_radius(clouds: jnp.ndarray, radius: jnp.ndarray):
    """Divide (..., N, 3) clouds by per-batch radius (...,), eps-guarded
    (reference feature_extraction.py:139-157)."""
    return clouds / (radius[..., None, None] + 1e-6)


def cloud_radius(cloud: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Max point norm over the (valid) cloud: (..., N, 3) -> (...,)."""
    n = jnp.linalg.norm(cloud, axis=-1)
    if valid is not None:
        n = jnp.where(valid, n, 0.0)
    return jnp.max(n, axis=-1)
