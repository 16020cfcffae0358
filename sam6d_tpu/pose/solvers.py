"""Pose solvers: coarse RANSAC-style hypothesis sampling and fine weighted SVD.

Behavior parity with reference `Pose_Estimation_Model/utils/model_utils.py`
compute_coarse_Rt (:187-246) and compute_fine_Rt (:250-283), re-designed for
TPU: the 6000 three-point SVDs run as one batched Jacobi SVD on the VPU, the
pose-selection point-to-model distance is chunked via `lax.map` to bound HBM,
and RNG is an explicit JAX key (bitwise parity with torch RNG is impossible;
parity is statistical — pose error, not sampled indices).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.geometry import (
    pairwise_sq_distance,
    weighted_procrustes,
    inverse_transform_points,
)
from ..ops.sampling import multinomial_from_weights


def soft_assignment(atten: jnp.ndarray):
    """Two-sided softmax assignment + mutual-foreground weights.

    atten: (B, N1+1, N2+1) similarity incl. bg row/col. Returns
    (score (B, N1, N2), w1 (B, N1), w2 (B, N2), label1 (B, N1), label2 (B, N2))
    matching reference compute_coarse_Rt (:206-213) / compute_fine_Rt (:262-266).
    label1[i] = argmax_j score over full cols (0 => assigned to bg).
    """
    pred = jax.nn.softmax(atten, axis=2) * jax.nn.softmax(atten, axis=1)
    label1 = jnp.argmax(pred[:, 1:, :], axis=2)  # (B, N1) in [0, N2]
    label2 = jnp.argmax(pred[:, :, 1:], axis=1)  # (B, N2) in [0, N1]
    w1 = (label1 > 0).astype(atten.dtype)
    w2 = (label2 > 0).astype(atten.dtype)
    score = pred[:, 1:, 1:] * w1[:, :, None] * w2[:, None, :]
    return score, w1, w2, label1, label2


def _chunked_min_dist_to_model(transformed, model_pts, chunk: int):
    """transformed: (B, P, N1, 3), model_pts: (B, M, 3) ->
    min-dist (B, P, N1), computed in proposal chunks to bound memory.

    (A Python-unrolled chunk loop was measured NEUTRAL here — 11.4 vs
    11.2 ms full-solver, probe pemdeep round 5 — unlike the AMG chunk
    loops, so the scan stays.)"""
    B, P, N1, _ = transformed.shape
    chunk = min(chunk, P)
    if P % chunk:  # pad P to a chunk multiple (small configs); crop after
        pad = chunk - P % chunk
        transformed = jnp.concatenate(
            [transformed, transformed[:, :pad]], axis=1)
        return _chunked_min_dist_to_model(
            transformed, model_pts, chunk)[:, :P]

    def one_chunk(start):
        sl = jax.lax.dynamic_slice_in_dim(transformed, start, chunk, axis=1)
        d2 = pairwise_sq_distance(
            sl.reshape(B, chunk * N1, 3), model_pts
        )  # (B, chunk*N1, M)
        return jnp.sqrt(jnp.min(d2, axis=-1)).reshape(B, chunk, N1)

    starts = jnp.arange(0, P, chunk)
    outs = jax.lax.map(one_chunk, starts)  # (P//chunk, B, chunk, N1)
    return jnp.moveaxis(outs, 0, 1).reshape(B, P, N1)


@partial(jax.jit, static_argnames=("n_proposal1", "n_proposal2", "dist_chunk"))
def compute_coarse_Rt(
    key: jax.Array,
    atten: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    model_pts: jnp.ndarray | None = None,
    n_proposal1: int = 6000,
    n_proposal2: int = 300,
    dist_chunk: int = 30,
):
    """Initial pose from the coarse assignment.

    pts1: (B, N1, 3) observed (normalized), pts2: (B, N2, 3) model-frame FPS
    points, model_pts: (B, M, 3) normalized CAD points for scoring.
    Returns (R (B, 3, 3), t (B, 3)) with pts1 ~ pts2 @ R^T + t.
    """
    if model_pts is None:
        model_pts = pts2
    B, N1, _ = pts1.shape
    N2 = pts2.shape[1]

    score, w1, w2, _, _ = soft_assignment(atten)
    flat = (score.reshape(B, N1 * N2)) ** 1.5

    idx = multinomial_from_weights(key, flat, n_proposal1 * 3)  # (B, 3*P1)
    idx1 = jnp.minimum(idx // N2, N1 - 1)
    idx2 = idx % N2
    p1 = jnp.take_along_axis(pts1, idx1[..., None], axis=1)  # (B, 3*P1, 3)
    p2 = jnp.take_along_axis(pts2, idx2[..., None], axis=1)
    p1 = p1.reshape(B, n_proposal1, 3, 3)
    p2 = p2.reshape(B, n_proposal1, 3, 3)

    # batched 3-point Kabsch: model (p2) -> camera (p1)
    Rs, ts = weighted_procrustes(p2, p1)  # (B, P1, 3, 3), (B, P1, 3)

    # keep n_proposal2 by triplet residual
    resid = inverse_transform_points(p1, Rs, ts) - p2
    dis = jnp.mean(jnp.linalg.norm(resid, axis=-1), axis=-1)  # (B, P1)
    _, keep = jax.lax.top_k(-dis, n_proposal2)
    Rs = jnp.take_along_axis(Rs, keep[..., None, None], axis=1)
    ts = jnp.take_along_axis(ts, keep[..., None], axis=1)

    # select best hypothesis by inverse mean distance of assigned points to CAD
    transformed = inverse_transform_points(
        pts1[:, None, :, :], Rs, ts
    )  # (B, P2, N1, 3)
    dmin = _chunked_min_dist_to_model(transformed, model_pts, dist_chunk)
    scores = jnp.sum(w1, axis=1)[:, None] / (
        jnp.sum(dmin * w1[:, None, :], axis=2) + 1e-8
    )  # (B, P2)
    best = jnp.argmax(scores, axis=1)
    R = jnp.take_along_axis(Rs, best[:, None, None, None], axis=1)[:, 0]
    t = jnp.take_along_axis(ts, best[:, None, None], axis=1)[:, 0]
    return R, t


@jax.jit
def compute_fine_Rt(
    atten: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    model_pts: jnp.ndarray | None = None,
    dis_thres: float = 0.15,
):
    """Final pose + confidence from the dense assignment (reference :250-283).

    Soft correspondences pred_i = sum_j a_ij pts2_j / sum_j a_ij, weighted
    Kabsch with row-mass weights, score = inlier fraction x fg fraction.
    """
    if model_pts is None:
        model_pts = pts2
    score, w1, w2, label1, _ = soft_assignment(atten)

    norm_score = score / (jnp.sum(score, axis=2, keepdims=True) + 1e-6)
    pred_pts = jnp.einsum("bnm,bmc->bnc", norm_score, pts2)
    assign_mass = jnp.sum(score, axis=2)  # (B, N1)
    R, t = weighted_procrustes(pred_pts, pts1, assign_mass, weight_thresh=0.0)

    back = inverse_transform_points(pts1, R, t)  # (B, N1, 3)
    dmin = jnp.sqrt(jnp.min(pairwise_sq_distance(back, model_pts), axis=-1))
    fg = (label1 > 0).astype(atten.dtype)
    inlier = (dmin < dis_thres).astype(atten.dtype)
    pose_score = jnp.sum(inlier * fg, axis=1) / (jnp.sum(fg, axis=1) + 1e-8)
    pose_score = pose_score * jnp.mean(fg, axis=1)
    return R, t, pose_score
