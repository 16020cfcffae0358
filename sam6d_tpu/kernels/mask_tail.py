"""SAM mask-decoder upscale tail in block-pixel order, layout-clean XLA.

The AMG decode's per-prompt upscale chain (reference mask_decoder.py
`output_upscaling` + hypernetwork dot) is computed as GEMMs in block pixel
order (see `models/sam.MaskDecoder`), shaped so every tensor has MXU/VPU
friendly minor dims:

    z  (B, N, 256)  raw first-upscale GEMM output, lanes = (p, q, c64)
    -> reshape (B, 4N, 64)           [free: rows become (n, pq)]
    -> +b1, LayerNorm2d(64), GELU
    -> @ k2m (64, 128)               [lanes become (rs, c32)]
    -> +b2, GELU
    -> @ W_b (128, 4K)               [per-prompt block-diagonal hypernet:
                                      W[(rs,c),(k,rs')] = hyper[k,c] d(rs,rs')]
    -> masks (B, 4K, 4N)             [rows (k, rs), cols (n, pq)]

A Pallas fusion of this tail was tried and measured 5x SLOWER than XLA
(13.9 vs 2.8 ms per 128-prompt chunk on v5e — lane-slicing and small grid
steps dominate); the scoreboard lives in PERFORMANCE.md. XLA with clean
layouts needs no kernel here.

Mask row/col semantics: low-res pixel (4i+2p+r, 4j+2q+s) for block position
n = i*g + j — consumers (resize matrices, counts) index it by reshape only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gelu_exact(x):
    # dtype-gated like models.vit.gelu (shared fp32 tanh-poly form in bf16,
    # <= 1.79e-5 deviation; exact erf in fp32) — see that docstring
    if x.dtype == jnp.bfloat16:
        from ..models.vit import gelu
        return gelu(x)
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def _upscale2(z, b1, gamma, beta, k2m, b2, eps):
    """z: (B_or_none, 4N, C4) -> post-GELU second-upscale activations
    (..., 4N, 4*C8), computed in z.dtype."""
    dt = z.dtype
    x = z + b1.astype(dt)
    u = x.mean(axis=-1, keepdims=True)
    s = ((x - u) ** 2).mean(axis=-1, keepdims=True)
    x = (x - u) / jnp.sqrt(s + eps) * gamma.astype(dt) + beta.astype(dt)
    x = _gelu_exact(x)
    y = x @ k2m.astype(dt)                    # (..., 4N, 4*C8) = (rs, c)
    reps = k2m.shape[1] // b2.shape[0]
    return _gelu_exact(y + jnp.tile(b2, reps).astype(dt))


def mask_tail_block(z, b1, gamma, beta, k2m, b2, hyper, eps=1e-6):
    """z: (B, N, 4*C4) raw first-upscale GEMM output in (p, q, c) lane
    order; b1/gamma/beta: (C4,); k2m: (C4, 4*C8) with (r, s, c) output
    order; b2: (C8,); hyper: (B, K, C8). Returns masks (B, 4K, 4N) with
    rows (k, rs) and cols (n, pq), dtype of z."""
    B, N, _ = z.shape
    K = hyper.shape[1]
    C4 = b1.shape[0]
    C8 = b2.shape[0]
    y = _upscale2(z.reshape(B, N * 4, C4), b1, gamma, beta, k2m, b2, eps)
    eye4 = jnp.eye(4, dtype=y.dtype)
    # W[b, (rs, c), (k, rs')] = hyper[b, k, c] * delta(rs, rs')
    W = jnp.einsum("bkc,rt->brckt", hyper.astype(y.dtype),
                   eye4).reshape(B, 4 * C8, 4 * K)
    m = jnp.einsum("bmc,bck->bkm", y, W)      # (B, 4K, 4N)
    return m.astype(z.dtype)


def mask_tail_block_shared(z0, b1, gamma, beta, k2m, b2, hyper, eps=1e-6):
    """Rank-mode tail: z0 (1, N, 4*C4) shared image side, hyper (B, K, C8)
    per prompt. The upscale runs ONCE; each prompt is one contraction.
    Returns (B, 4K, 4N) like mask_tail_block."""
    B = hyper.shape[0]
    K = hyper.shape[1]
    N = z0.shape[1]
    C4 = b1.shape[0]
    C8 = b2.shape[0]
    y = _upscale2(z0[0].reshape(N * 4, C4), b1, gamma, beta, k2m, b2, eps)
    y4 = y.reshape(N * 4, 4, C8)              # (m, rs, c)
    m = jnp.einsum("mrc,bkc->bkrm", y4, hyper.astype(y.dtype))
    return m.reshape(B, K * 4, N * 4).astype(z0.dtype)
