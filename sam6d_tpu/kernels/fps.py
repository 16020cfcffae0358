"""Pallas farthest-point-sampling kernel.

TPU-native replacement for the reference CUDA FPS
(`Pose_Estimation_Model/model/pointnet2/_ext_src/src/sampling_gpu.cu:73-120`).
The selection loop is inherently sequential over the M picks but parallel
over the N candidates; this kernel keeps the (3, N) point buffer and the
running min-distance entirely in VMEM, so each iteration is one fused
distance-update + argmax with zero HBM traffic (the pure-XLA formulation in
`ops/sampling.py` round-trips the distance state through HBM every step).

Layout: points transposed to (3, N) with N padded to a lane multiple;
padded slots carry +inf distance-to-self so they are never selected.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(pts_ref, valid_ref, out_ref, mind_ref):
    """pts_ref: (3, N) VMEM; valid_ref: (1, N) f32 (1 valid / 0 pad);
    out_ref: (1, M) int32; mind_ref: scratch (1, N) f32."""
    N = pts_ref.shape[1]
    M = out_ref.shape[1]
    valid = valid_ref[0, :]
    neg = jnp.float32(-1.0)

    # first pick: first valid index
    idx0 = jnp.argmax(valid)
    out_ref[0, 0] = idx0.astype(jnp.int32)
    mind_ref[0, :] = jnp.full((N,), 1e10, jnp.float32)

    def body(m, last_idx):
        lx = pts_ref[0, last_idx]
        ly = pts_ref[1, last_idx]
        lz = pts_ref[2, last_idx]
        dx = pts_ref[0, :] - lx
        dy = pts_ref[1, :] - ly
        dz = pts_ref[2, :] - lz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[0, :], d)
        mind_ref[0, :] = mind
        scored = jnp.where(valid > 0, mind, neg)
        nxt = jnp.argmax(scored).astype(jnp.int32)
        out_ref[0, m] = nxt
        return nxt

    jax.lax.fori_loop(1, M, body, idx0.astype(jnp.int32))


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_pallas(
    points: jnp.ndarray,
    npoint: int,
    valid_mask: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """points: (B, N, 3) -> (B, npoint) int32 indices. Matches the semantics
    of ops.sampling.farthest_point_sample (start at first valid index)."""
    B, N, _ = points.shape
    Np = -(-N // 128) * 128
    ptsT = jnp.swapaxes(points, 1, 2).astype(jnp.float32)  # (B, 3, N)
    if Np != N:
        ptsT = jnp.pad(ptsT, ((0, 0), (0, 0), (0, Np - N)))
    if valid_mask is None:
        valid = jnp.ones((B, N), jnp.float32)
    else:
        valid = valid_mask.astype(jnp.float32)
    if Np != N:
        valid = jnp.pad(valid, ((0, 0), (0, Np - N)))
    valid = valid[:, None, :]  # (B, 1, Np)

    call = pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((1, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, Np), jnp.float32)],
        interpret=interpret,
    )
    out = jax.vmap(lambda p, v: call(p, v))(ptsT, valid)
    return out[:, 0, :]
