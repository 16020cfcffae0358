"""Pallas two-scale ball-query kernel.

Fuses the fine-PE neighbor search (reference ball_query_gpu.cu semantics:
first-k in-radius indices per query, both radii) into one pass:
distances, radius tests, rank cumsum, and slot selection all happen in VMEM
per query tile — the (B, M, N) distance matrix, the two hit masks, and the
two rank tensors never touch HBM (the XLA formulation streams ~6 GB through
HBM for PEM's 16x2048x2048 shapes).

Per grid step (one tile of Tm queries, one batch element via vmap):
  d2   = |q|^2 + |x|^2 - 2 q x^T                  (Tm, N) fp32, MXU
  cum  = inclusive cumsum of [d2 < r^2] over N     (log-shift Hillis-Steele)
  idx[s] = #{n : cum[n] <= s}                      (the (s+1)-th hit's index,
                                                    or N if none)
Outputs int32 indices (B, M, S) per scale with the reference tail rule
(empty slots replicate the first hit, zero if no hits) applied outside.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cumsum_lanes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive cumsum along the last (lane) axis via log-shift adds."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, axis=1)
        x = x + jnp.where(lane >= d, shifted, 0)
        d *= 2
    return x


def _make_kernel(r1: float, s1: int, r2: float, s2: int, n: int):
    def kernel(q_ref, xt_ref, o1_ref, o2_ref):
        # q_ref: (Tm, 3pad) queries; xt_ref: (3pad, N) transposed points
        q = q_ref[:]                      # zero-padded 3rd+ columns
        xt = xt_ref[:]
        d2 = (jnp.sum(q * q, axis=1, keepdims=True)
              + jnp.sum(xt * xt, axis=0, keepdims=True)
              - 2.0 * jax.lax.dot_general(
                  q, xt, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32))

        # guard the physical lane padding (N not a lane multiple): padded
        # columns would otherwise read as zeros = phantom points at the origin
        in_range = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) < n

        def select(radius, nsample, o_ref):
            hit = (d2 < radius * radius) & in_range
            cum = _cumsum_lanes(hit.astype(jnp.int32), n)
            cum = jnp.minimum(cum, nsample + 1)
            for s in range(nsample):
                o_ref[:, s] = jnp.sum((cum <= s).astype(jnp.int32), axis=1)

        select(r1, s1, o1_ref)
        select(r2, s2, o2_ref)
    return kernel


@partial(jax.jit, static_argnames=("r1", "s1", "r2", "s2", "block_m",
                                   "interpret"))
def two_scale_ball_query_pallas(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    r1: float, s1: int,
    r2: float, s2: int,
    block_m: int = 64,
    interpret: bool = False,
):
    """xyz: (B, N, 3) candidates, new_xyz: (B, M, 3) queries. Returns
    (idx1 (B, M, s1), idx2 (B, M, s2)) int32 with reference ball-query
    semantics (first-k in-radius, tail replicates the first hit)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    assert M % block_m == 0, (M, block_m)
    q = jnp.pad(new_xyz.astype(jnp.float32), ((0, 0), (0, 0), (0, 5)))
    xt = jnp.pad(jnp.swapaxes(xyz.astype(jnp.float32), 1, 2),
                 ((0, 0), (0, 5), (0, 0)))

    call = pl.pallas_call(
        _make_kernel(r1, s1, r2, s2, N),
        grid=(M // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, s1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, s2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, s1), jnp.int32),
            jax.ShapeDtypeStruct((M, s2), jnp.int32),
        ),
        interpret=interpret,
    )
    raw1, raw2 = jax.vmap(call)(q, xt)

    def finish(idx):
        valid = idx < N
        first = jnp.where(valid[..., 0:1], idx[..., 0:1], 0)
        return jnp.where(valid, idx, first).astype(jnp.int32)

    return finish(raw1), finish(raw2)
