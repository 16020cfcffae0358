"""Pallas fused SAM mask-decoder upscale tail.

The AMG decode's per-prompt upscale chain (reference mask_decoder.py
`output_upscaling` + hypernetwork dot, computed here in block layout — see
`models/sam.MaskDecoder`) is bandwidth-bound in XLA: the intermediate
(B, 4096, 16, 32) GELU tensor is ~540 MB per 128-prompt chunk and round-trips
HBM between the second upscale GEMM and the hypernetwork contraction. This
kernel runs the whole tail per VMEM tile:

    z-tile (T, 256)  [(p,q,c64) lanes, raw GEMM1 output]
      + b1 -> LayerNorm2d(64) -> exact GELU
      @ k2m (64, 128) -> + b2 -> exact GELU        (per (p,q) slice)
      contract hyper (K, 32)                        (per (r,s) slice)
    -> masks-tile (16, K, T) block layout

HBM traffic per chunk drops to one read of z (~270 MB) + one write of the
(B, 16, K, N) masks (~70 MB). The hypernet contraction is emitted as
(K, 32) @ (32, T) so the token axis stays minor everywhere (no transposes).
Outputs match the XLA reference (`mask_tail_reference`) to fp32 accuracy.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_exact(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7 — below bf16
    resolution). Mosaic TPU has no erf primitive; exp it has."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel(x):
    return x * 0.5 * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


def _make_kernel(eps: float):
    def kernel(z_ref, b1_ref, g_ref, be_ref, k2_ref, b2_ref, hyp_ref, o_ref):
        # z_ref: (1, T, 256); b1/g/be: (1, 64); k2: (64, 128); b2: (1, 32);
        # hyp_ref: (1, K, 32); o_ref: (1, 16, K, T)
        k2 = k2_ref[:].astype(jnp.float32)
        hyp = hyp_ref[0].astype(jnp.float32)        # (K, 32)
        b1 = b1_ref[0].astype(jnp.float32)
        gam = g_ref[0].astype(jnp.float32)
        bet = be_ref[0].astype(jnp.float32)
        b2 = b2_ref[0].astype(jnp.float32)
        for pq in range(4):
            zc = z_ref[0, :, pq * 64:(pq + 1) * 64].astype(jnp.float32) + b1
            mu = jnp.mean(zc, axis=-1, keepdims=True)
            var = jnp.mean((zc - mu) ** 2, axis=-1, keepdims=True)
            x1 = (zc - mu) / jnp.sqrt(var + eps) * gam + bet
            x1 = _gelu_kernel(x1)
            y = jax.lax.dot_general(
                x1, k2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (T, 128)=(r,s,c32)
            for rs in range(4):
                y_rs = _gelu_kernel(y[:, rs * 32:(rs + 1) * 32] + b2)  # (T, 32)
                m = jax.lax.dot_general(
                    hyp, y_rs, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (K, T)
                o_ref[0, pq * 4 + rs] = m.astype(o_ref.dtype)
    return kernel


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_mask_tail(
    z: jnp.ndarray,
    b1: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    k2m: jnp.ndarray,
    b2: jnp.ndarray,
    hyper: jnp.ndarray,
    eps: float = 1e-6,
    tile: int = 512,
    interpret: bool = False,
):
    """z: (B, N, 256) raw first-upscale GEMM output in (p, q, c64) lane
    order; b1/gamma/beta: (64,); k2m: (64, 128) with (r, s, c32) output
    order; b2: (32,); hyper: (B, K, 32). Returns masks (B, 16, K, N) in
    ((p, q, r, s), K, position) block order, dtype of z."""
    B, N, _ = z.shape
    K = hyper.shape[1]
    assert N % tile == 0, (N, tile)
    call = pl.pallas_call(
        _make_kernel(float(eps)),
        grid=(B, N // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 256), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 32), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, K, tile), lambda b, t: (b, 0, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 16, K, N), z.dtype),
        interpret=interpret,
    )
    return call(z, b1[None], gamma[None], beta[None], k2m, b2[None], hyper)


def mask_tail_upscale_only(z2, b1, gamma, beta, k2m, b2, eps=1e-6):
    """Shared-src upscale: z2 (N, 4*C4) raw GEMM1 output -> post-GELU
    upscaled embedding (N, 4, 4, C8) fp32 (generic channel count)."""
    N = z2.shape[0]
    C4 = b1.shape[0]
    C8 = b2.shape[0]
    zc = z2.astype(jnp.float32).reshape(N, 4, C4) + b1.astype(jnp.float32)
    mu = jnp.mean(zc, axis=-1, keepdims=True)
    var = jnp.mean((zc - mu) ** 2, axis=-1, keepdims=True)
    x1 = (zc - mu) / jnp.sqrt(var + eps) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    x1 = _gelu_exact(x1)
    y = jnp.einsum("npc,cd->npd", x1, k2m.astype(jnp.float32))
    return _gelu_exact(y.reshape(N, 4, 4, C8) + b2.astype(jnp.float32))


def mask_tail_reference(z, b1, gamma, beta, k2m, b2, hyper, eps=1e-6):
    """Pure-XLA reference of fused_mask_tail (same math, any backend,
    generic channel count). Returns (B, 16, K, N) like the kernel."""
    B, N, _ = z.shape
    K = hyper.shape[1]
    C4 = b1.shape[0]
    C8 = b2.shape[0]
    zc = z.astype(jnp.float32).reshape(B, N, 4, C4) + b1.astype(jnp.float32)
    mu = jnp.mean(zc, axis=-1, keepdims=True)
    var = jnp.mean((zc - mu) ** 2, axis=-1, keepdims=True)
    x1 = (zc - mu) / jnp.sqrt(var + eps) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    x1 = _gelu_exact(x1)
    y = jnp.einsum("bnpc,cd->bnpd", x1, k2m.astype(jnp.float32))
    y = _gelu_exact(y.reshape(B, N, 4, 4, C8) + b2.astype(jnp.float32))
    m = jnp.einsum("bnprc,bkc->bprkn", y, hyper.astype(jnp.float32))
    return m.reshape(B, 16, K, N).astype(z.dtype)
