"""Pallas fused attention with decomposed relative-position bias.

Fuses SAM's ViTDet global attention (reference image_encoder.py:224-240 +
add_decomposed_rel_pos :325-361): softmax(q k^T / sqrt(d) + rel_h + rel_w) v
without materializing the (N, N) score matrix in HBM (N = 4096 tokens).

Bias-as-matmul trick: the decomposed bias
  bias[n, m] = rel_h_q[n, row(m)] + rel_w_q[n, col(m)]
is absorbed into the score matmul by augmenting the contraction dimension:
  q_aug = [q * scale, rel_h_q, rel_w_q]          (N, D + H + W)
  k_aug = [k,        onehot_row, onehot_col]     (N, D + H + W)
so q_aug @ k_aug^T == q k^T * scale + bias exactly — the kernel is a plain
fused attention with zero bias-handling code, and the thin tables
  rel_h_q[n, kh] = sum_c q[n, c] * Rh[row(n), kh, c]
  rel_w_q[n, kw] = sum_c q[n, c] * Rw[col(n), kw, c]
are cheap (N x H / N x W) einsums computed outside.

Block strategy: K/V at N=4096 fit VMEM entirely, so the grid iterates over q
blocks only; each program computes its (Tq, N) scores + softmax + PV in one
shot. HBM sees q, k, v, o and the thin tables — never the N^2 scores.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(q_ref, k_ref, v_ref, o_ref):
    """q_ref: (Tq, Da); k_ref: (N, Da); v_ref: (N, Dv); o_ref: (Tq, Dv).

    Inputs stay in their storage dtype (bf16 in production) — the MXU
    accumulates in fp32 via preferred_element_type; only the (Tq, N) score
    tile is fp32. p is cast back to the value dtype for the PV matmul
    (standard flash-attention practice) to stay under the VMEM budget.
    """
    s = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (Tq, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _fused_attention(q_aug, k_aug, v, block_q: int, interpret: bool):
    """(B, heads, N, Da/Dv) fused attention; q_aug already carries scale+bias."""
    B, heads, N, Da = q_aug.shape
    Dv = v.shape[-1]
    call = pl.pallas_call(
        _fused_kernel,
        grid=(N // block_q,),
        in_specs=[
            pl.BlockSpec((block_q, Da), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Da), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dv), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, Dv), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Dv), v.dtype),
        interpret=interpret,
    )
    return jax.vmap(jax.vmap(call))(q_aug, k_aug, v)


@partial(jax.jit, static_argnames=("grid_hw", "block_q", "interpret"))
def flash_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    grid_hw,
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """q, k, v: (B, heads, N, hd) with N = H*W row-major tokens;
    rel_pos_h: (2H-1, hd), rel_pos_w: (2W-1, hd). Returns (B, heads, N, hd),
    numerically matching softmax(qk^T/sqrt(hd) + decomposed bias) v.
    """
    B, heads, N, hd = q.shape
    H, W = grid_hw
    assert N == H * W
    scale = hd ** -0.5

    idx_h = np.arange(H)[:, None] - np.arange(H)[None, :] + (H - 1)
    idx_w = np.arange(W)[:, None] - np.arange(W)[None, :] + (W - 1)
    Rh = rel_pos_h[jnp.asarray(idx_h)]  # (H, H, hd)
    Rw = rel_pos_w[jnp.asarray(idx_w)]  # (W, W, hd)
    qg = q.reshape(B, heads, H, W, hd)
    rel_h_q = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh).reshape(B, heads, N, H)
    rel_w_q = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rw).reshape(B, heads, N, W)

    # pad head dim so the augmented contraction dim is a lane multiple
    D = -(-hd // 128) * 128
    if (D + H + W) % 128 != 0:
        D += 128 - (D + H + W) % 128
    qs = q * jnp.asarray(scale, q.dtype)
    if hd != D:
        pad = [(0, 0)] * 3 + [(0, D - hd)]
        qs = jnp.pad(qs, pad)
        k = jnp.pad(k, pad)
    Dv = -(-hd // 128) * 128
    if hd != Dv:
        v = jnp.pad(v, [(0, 0)] * 3 + [(0, Dv - hd)])

    # one-hot row/col encodings of the key positions
    rows = np.repeat(np.arange(H), W)
    cols = np.tile(np.arange(W), H)
    eye_h = jnp.asarray(np.eye(H, dtype=np.float32)[rows])  # (N, H)
    eye_w = jnp.asarray(np.eye(W, dtype=np.float32)[cols])  # (N, W)
    dt = q.dtype
    q_aug = jnp.concatenate(
        [qs, rel_h_q.astype(dt), rel_w_q.astype(dt)], axis=-1)
    k_aug = jnp.concatenate(
        [k, jnp.broadcast_to(eye_h, (B, heads, N, H)).astype(dt),
         jnp.broadcast_to(eye_w, (B, heads, N, W)).astype(dt)], axis=-1)

    block_q = min(block_q, N)
    assert N % block_q == 0
    out = _fused_attention(q_aug, k_aug, v, block_q, interpret)
    return out[..., :hd]
