"""PEM training losses (reference utils/loss_utils.py).

Per-block bidirectional (N+1)-way correspondence cross-entropy with bg class
0 at distance threshold 0.15, plus the diagnostic metrics the reference logs
(acc / fg count / fg distance) — all pure jnp.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..ops.geometry import pairwise_distance, inverse_transform_points


def correspondence_labels(pts1, pts2, gt_R, gt_t, dis_thres: float):
    """GT labels for both directions (reference loss_utils.py:19-28).

    Returns (label1 (B, N1) in [0, N2], label2 (B, N2) in [0, N1]); 0 = bg.
    """
    gt_pts = inverse_transform_points(pts1, gt_R, gt_t)
    dmat = pairwise_distance(gt_pts, pts2)
    dis1 = jnp.min(dmat, axis=2)
    lab1 = jnp.argmin(dmat, axis=2)
    label1 = jnp.where(dis1 <= dis_thres, lab1 + 1, 0)
    dis2 = jnp.min(dmat, axis=1)
    lab2 = jnp.argmin(dmat, axis=1)
    label2 = jnp.where(dis2 <= dis_thres, lab2 + 1, 0)
    return label1, label2, gt_pts


def _ce(logits, labels):
    """Cross entropy over last axis; logits (B, N, K), labels (B, N) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -picked


def compute_correspondence_loss(
    attens: List[jnp.ndarray],
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    gt_R: jnp.ndarray,
    gt_t: jnp.ndarray,
    dis_thres: float = 0.15,
    prefix: str = "coarse",
) -> Dict[str, jnp.ndarray]:
    """Reference compute_correspondence_loss (loss_utils.py:7-52).

    attens: per-block (B, N1+1, N2+1) similarities. Returns per-sample dict:
    '{prefix}_loss{i}', '{prefix}_acc', '{prefix}_fg_num', '{prefix}_dis'.
    """
    label1, label2, gt_pts = correspondence_labels(pts1, pts2, gt_R, gt_t, dis_thres)
    out: Dict[str, jnp.ndarray] = {}
    for i, atten in enumerate(attens):
        # direction 1: rows 1..N1 classify over the N2+1 columns
        l1 = _ce(atten[:, 1:, :], label1).mean(axis=1)
        # direction 2: cols 1..N2 classify over the N1+1 rows
        l2 = _ce(jnp.swapaxes(atten, 1, 2)[:, 1:, :], label2).mean(axis=1)
        out[f"{prefix}_loss{i}"] = 0.5 * (l1 + l2)

    last = attens[-1]
    pred_label = jnp.argmax(last[:, 1:, :], axis=2)  # (B, N1)
    out[f"{prefix}_acc"] = (pred_label == label1).astype(jnp.float32).mean(axis=1)
    fg = (pred_label > 0).astype(jnp.float32)
    out[f"{prefix}_fg_num"] = fg.sum(axis=1)
    fg_idx = (fg * (pred_label - 1)).astype(jnp.int32)
    pred_pts = jnp.take_along_axis(pts2, fg_idx[..., None], axis=1)
    pred_dis = jnp.linalg.norm(pred_pts - gt_pts, axis=2)
    out[f"{prefix}_dis"] = (pred_dis * fg).sum(axis=1) / (fg.sum(axis=1) + 1e-8)
    return out


def total_loss(end_points: Dict[str, jnp.ndarray], clamp: float = 100.0):
    """Sum all '*_loss*' entries, clamp, mean over batch (loss_utils.py:56-68).

    Returns (scalar loss, dict of scalar metrics)."""
    metrics = {k: v.mean() for k, v in end_points.items()}
    loss = jnp.zeros(())
    per_sample = None
    for k, v in end_points.items():
        if "loss" in k:
            per_sample = v if per_sample is None else per_sample + v
    loss = jnp.minimum(per_sample, clamp).mean()
    metrics["loss"] = loss
    return loss, metrics
