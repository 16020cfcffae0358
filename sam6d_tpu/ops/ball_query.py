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


def first_k_hits(hit: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """hit: (..., N) bool. Returns (..., nsample) int32: the indices of the
    first `nsample` set bits per row in index order; empty slots get N.

    Rank-select without a sort (the previous formulation top_k'd an
    index-valued key, i.e. a full 2048-wide sort per row — ~28 ms/scale at
    PEM shapes): the inclusive cumulative hit count is monotone, so the
    (s+1)-th hit sits at `count of j with cum[j] <= s`, one fused
    broadcast-compare-reduce on the VPU.
    """
    N = hit.shape[-1]
    cum = jnp.cumsum(hit.astype(jnp.int32), axis=-1)  # inclusive ranks
    # clamp: ranks beyond nsample+1 behave identically for every slot test
    cum = jnp.minimum(cum, nsample + 1)
    slots = jnp.arange(nsample, dtype=jnp.int32)
    idx = jnp.sum((cum[..., None] <= slots).astype(jnp.int32), axis=-2)
    return idx.astype(jnp.int32)


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
    idx = first_k_hits(d2 < (radius * radius), nsample)
    valid = idx < N
    first = idx[..., 0:1]
    first = jnp.where(valid[..., 0:1], first, 0)
    return jnp.where(valid, idx, first).astype(jnp.int32)


@partial(jax.jit, static_argnames=("nsample1", "nsample2"))
def two_scale_ball_query(
    radius1: float, nsample1: int,
    radius2: float, nsample2: int,
    xyz: jnp.ndarray, new_xyz: jnp.ndarray,
):
    """Both PE scales from ONE distance matrix (the fine positional encoding
    queries (r=0.1, 32) and (r=0.2, 64) on the same clouds — reference
    fine_point_matching.py:93-94 computes two full CUDA ball queries).
    Returns (idx1 (B, M, n1), idx2 (B, M, n2))."""
    d2 = pairwise_sq_distance(new_xyz, xyz)
    N = xyz.shape[1]

    def select(hit, nsample):
        idx = first_k_hits(hit, nsample)
        valid = idx < N
        first = jnp.where(valid[..., 0:1], idx[..., 0:1], 0)
        return jnp.where(valid, idx, first).astype(jnp.int32)

    return (select(d2 < radius1 * radius1, nsample1),
            select(d2 < radius2 * radius2, nsample2))


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats: (B, N, C), idx: (B, M, S) -> (B, M, S, C).

    Replaces reference grouping_operation (group_points_gpu.cu).

    TPU path for bf16 features: the row gather runs at a fixed ~150M
    rows/s regardless of row width (measured — it is per-row bound, not
    bandwidth bound), so the gather is reformulated as a chunked one-hot
    matmul on the MXU (3.5x faster at PEM shapes: 5.7 vs 20.2 ms for
    16x2048x96 rows). Exact: each one-hot row selects a single bf16
    feature row — the fp32 MXU accumulation reproduces it bit-for-bit.
    """
    B, N, C = feats.shape
    _, M, S = idx.shape
    flat = idx.reshape(B, M * S)
    if (jax.default_backend() == "tpu" and feats.dtype == jnp.bfloat16
            and M * S >= 8192):
        return _group_points_onehot(feats, flat, M, S)
    out = jnp.take_along_axis(feats, flat[..., None], axis=1)
    return out.reshape(B, M, S, C)


def _group_points_onehot(feats, flat, M, S, chunk: int = 8192):
    B, N, C = feats.shape
    total = M * S
    pad = (-total) % chunk
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    n_chunks = (total + pad) // chunk
    iota = jnp.arange(N, dtype=flat.dtype)

    def body(c):
        sl = jax.lax.dynamic_slice_in_dim(flat, c * chunk, chunk, axis=1)
        oh = (sl[..., None] == iota).astype(feats.dtype)
        return jnp.einsum("bmn,bnc->bmc", oh, feats)

    out = jax.lax.map(body, jnp.arange(n_chunks))  # (n_chunks, B, chunk, C)
    out = out.transpose(1, 0, 2, 3).reshape(B, total + pad, C)
    return out[:, :total].reshape(B, M, S, C)


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
