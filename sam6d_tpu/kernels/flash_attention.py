"""Pallas flash attention with decomposed relative-position bias.

Fuses SAM's ViTDet global attention (reference image_encoder.py:224-240 +
add_decomposed_rel_pos :325-361): softmax(q k^T / sqrt(d) + rel_h + rel_w) v
without materializing the (N, N) score matrix (N = 4096 tokens at 64x64).

The decomposed bias is exploited structurally: bias[n, m] depends only on
(n, m // W) through rel_h and (n, m % W) through rel_w, so the kernel
reconstructs any (Tq, Tk) bias tile from two thin per-query tables
  rel_h_q[n, kh] = sum_c q[n, c] * Rh[row(n), kh, c]   (N, H)
  rel_w_q[n, kw] = sum_c q[n, c] * Rw[col(n), kw, c]   (N, W)
computed outside the kernel (cheap thin einsums), instead of an (N, N) map.

Online-softmax streaming over K blocks; fp32 accumulators; head_dim padded
to the 128-lane width.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *,
                  kv_blocks: int, block_k: int, w: int, scale: float):
    """One (head, q-block) program.

    q_ref: (Tq, D) VMEM; k_ref/v_ref: (N, D); bh_ref: (Tq, H); bw_ref:
    (Tq, W); o_ref: (Tq, D). block_k must be a multiple of w.
    """
    Tq, D = q_ref.shape
    q = q_ref[:].astype(jnp.float32) * scale

    m = jnp.full((Tq, 1), _NEG, jnp.float32)
    l = jnp.zeros((Tq, 1), jnp.float32)
    acc = jnp.zeros((Tq, D), jnp.float32)
    rows_per_block = block_k // w

    def body(kb, carry):
        m, l, acc = carry
        k0 = kb * block_k
        k = k_ref[pl.ds(k0, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(k0, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Tq, block_k)
        # bias tile: rows kh = k0//w .. +rows_per_block, cols kw = 0..w tiled
        bh = bh_ref[:, pl.ds(k0 // w, rows_per_block)]  # (Tq, rpb)
        bw = bw_ref[:, :]                               # (Tq, w)
        bias = (bh[:, :, None] + bw[:, None, :]).reshape(Tq, block_k)
        s = s + bias

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, kv_blocks, body, (m, l, acc))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("grid_hw", "block_q", "block_k", "interpret"))
def flash_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    grid_hw,
    block_q: int = 256,
    block_k: int = 512,
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

    # thin per-query bias tables (NOT scaled: reference adds bias AFTER the
    # q*scale matmul, i.e. bias uses unscaled q)
    idx_h = np.arange(H)[:, None] - np.arange(H)[None, :] + (H - 1)
    idx_w = np.arange(W)[:, None] - np.arange(W)[None, :] + (W - 1)
    Rh = rel_pos_h[jnp.asarray(idx_h)]  # (H, H, hd)
    Rw = rel_pos_w[jnp.asarray(idx_w)]  # (W, W, hd)
    qg = q.reshape(B, heads, H, W, hd)
    rel_h_q = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh).reshape(B, heads, N, H)
    rel_w_q = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rw).reshape(B, heads, N, W)

    # pad head dim to the 128-lane width
    D = max(128, -(-hd // 128) * 128)
    if hd != D:
        pad = [(0, 0)] * 3 + [(0, D - hd)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    block_q = min(block_q, N)
    block_k = min(block_k, N)
    assert N % block_q == 0 and N % block_k == 0 and block_k % W == 0
    kv_blocks = N // block_k

    kernel = partial(_flash_kernel, kv_blocks=kv_blocks, block_k=block_k,
                     w=W, scale=scale)
    call = pl.pallas_call(
        kernel,
        grid=(N // block_q,),
        in_specs=[
            pl.BlockSpec((block_q, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), q.dtype),
        interpret=interpret,
    )

    out = jax.vmap(jax.vmap(call))(q, k, v, rel_h_q, rel_w_q)
    return out[..., :hd]
