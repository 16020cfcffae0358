"""ISM matching scores as pure masked tensor functions.

Parity targets (reference `Instance_Segmentation_Model/model/detector.py` and
`model/loss.py`):
- semantic score: cosine(query cls, all object/template cls), aggregated
  avg-top5 per object, best object + confidence threshold (:260-296)
- appearance score: masked-patch matrix similarity vs the best template
  (loss.py compute_straight :52-62)
- geometric score: bbox IoU of the re-projected posed CAD cloud vs the
  proposal box, weighted by patch visible ratio (:209-246, 310-322)
- final score: (s_sem + s_appe + s_geo * vis) / (2 + vis) (:384)

Everything operates over a fixed proposal capacity with a validity mask, so
the whole scoring chain is one jitted program (the reference filters
dynamically; here filtered proposals are masked out, and the `selected`
mask replaces index gathering).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.masks import box_iou
from ..ops.pointcloud import masked_depth_mean_translation


def semantic_scores(
    query_cls: jnp.ndarray,
    ref_cls: jnp.ndarray,
    valid: jnp.ndarray,
    aggregation: str = "avg_5",
    confidence_thresh: float = 0.2,
):
    """query_cls: (P, C); ref_cls: (O, T, C); valid: (P,) bool.

    Returns dict(selected (P,), object_idx (P,), score (P,),
    best_template (P,)) — `selected` = valid & score > thresh.
    """
    q = query_cls / jnp.maximum(
        jnp.linalg.norm(query_cls, axis=-1, keepdims=True), 1e-12)
    r = ref_cls / jnp.maximum(
        jnp.linalg.norm(ref_cls, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("pc,otc->pot", q, r)
    sim = jnp.clip(sim, 0.0, 1.0)  # reference clamps (loss.py:44)

    if aggregation == "avg_5":
        k = min(5, sim.shape[-1])
        top, _ = jax.lax.top_k(sim, k)
        per_obj = top.mean(axis=-1)
    elif aggregation == "mean":
        per_obj = sim.mean(axis=-1)
    elif aggregation == "max":
        per_obj = sim.max(axis=-1)
    elif aggregation == "median":
        per_obj = jnp.median(sim, axis=-1)
    else:
        raise NotImplementedError(aggregation)

    score = jnp.max(per_obj, axis=-1)
    object_idx = jnp.argmax(per_obj, axis=-1)
    # best template of the assigned object (detector.best_template_pose)
    best_t_per_obj = jnp.argmax(sim, axis=-1)  # (P, O)
    best_template = jnp.take_along_axis(
        best_t_per_obj, object_idx[:, None], axis=1)[:, 0]
    selected = valid & (score > confidence_thresh)
    return dict(selected=selected, object_idx=object_idx, score=score,
                best_template=best_template)


def appearance_scores(
    query_patch: jnp.ndarray,
    ref_patch: jnp.ndarray,
) -> jnp.ndarray:
    """query_patch: (P, Np, C) masked+normalized patch descriptors;
    ref_patch: (P, Nr, C) best-template descriptors (already gathered).

    score_p = mean over valid query patches of max_ref cosine
    (loss.py compute_straight :52-62)."""
    sim = jnp.einsum("pnc,pmc->pnm", query_patch, ref_patch)
    max_ref = jnp.max(sim, axis=-1)  # (P, Np)
    nonzero = jnp.sum(jnp.abs(query_patch), axis=-1) > 0
    factor = jnp.sum(nonzero, axis=-1).astype(sim.dtype) + 1e-6
    scores = jnp.sum(max_ref, axis=-1) / factor
    return jnp.clip(scores, 0.0, 1.0)


def visible_ratio(
    query_patch: jnp.ndarray,
    ref_patch: jnp.ndarray,
    thresh: float = 0.5,
) -> jnp.ndarray:
    """Fraction of ref patches confidently matched by some query patch
    (loss.py compute_visible_ratio :64-76)."""
    sim = jnp.einsum("pnc,pmc->pnm", query_patch, ref_patch)
    best = jnp.max(sim, axis=1)  # (P, Nr)
    valid_patches = jnp.sum(best != 0.0, axis=-1).astype(sim.dtype) + 1e-6
    sim_patches = jnp.sum((best * (best > thresh)) != 0.0, axis=-1)
    return sim_patches / valid_patches


def project_points_to_boxes(
    points: jnp.ndarray,
    poses_R: jnp.ndarray,
    translations: jnp.ndarray,
    K: jnp.ndarray,
    image_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Pose the CAD clouds, project to pixels, return xyxy bounds.

    points: (P, M, 3); poses_R: (P, 3, 3); translations: (P, 3); K: (3, 3).
    Matches detector.project_template_to_image (:209-232): uv clamped into
    the image, int truncation, box from min/max. Returns (P, 4).
    """
    H, W = image_hw
    posed = jnp.einsum("pij,pmj->pmi", poses_R, points) + translations[:, None, :]
    homo = jnp.einsum("ij,pmj->pmi", K, posed)
    uv = (homo / homo[..., 2:3])[..., :2].astype(jnp.int32)  # trunc like .to(int)
    u = jnp.clip(uv[..., 0], 0, W - 1)
    v = jnp.clip(uv[..., 1], 0, H - 1)
    x1 = jnp.min(u, axis=1)
    y1 = jnp.min(v, axis=1)
    x2 = jnp.max(u, axis=1)
    y2 = jnp.max(v, axis=1)
    return jnp.stack([x1, y1, x2, y2], axis=1).astype(jnp.float32)


def geometric_scores(
    proposal_boxes: jnp.ndarray,
    proposal_masks: jnp.ndarray,
    depth: jnp.ndarray,
    K: jnp.ndarray,
    depth_scale: jnp.ndarray,
    template_poses_R: jnp.ndarray,
    pointclouds: jnp.ndarray,
) -> jnp.ndarray:
    """IoU of projected posed CAD bbox vs proposal box (detector :310-322).

    proposal_boxes: (P, 4) xyxy; proposal_masks: (P, H, W);
    template_poses_R: (P, 3, 3) best-template rotations; pointclouds:
    (P, M, 3) per-proposal object clouds (meters).
    """
    translate = masked_depth_mean_translation(proposal_masks, depth, K, depth_scale)
    proj_boxes = project_points_to_boxes(
        pointclouds, template_poses_R, translate, K, depth.shape)
    iou = box_iou(proj_boxes, proposal_boxes)
    return jnp.diagonal(iou)


def final_scores(semantic, appearance, geometric, vis):
    """(s_sem + s_appe + s_geo*vis) / (2 + vis) (detector.py:384)."""
    return (semantic + appearance + geometric * vis) / (1.0 + 1.0 + vis)
