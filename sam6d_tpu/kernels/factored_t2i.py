"""Fused token->image cross-attention over FACTORED keys (Pallas, TPU).

The AMG iou-prefix pass (SAMConfig.amg_iou_prefix_factor) runs the two-way
transformer with the per-prompt image side carried as

    keys[b] = a[b] * S + P_eff[b]^T @ U[b]

where P_eff is a tuple of SCALED BLOCKS (Pd (B, R_i, N) raw factor, s
(B, N) per-position scale or None) — the LayerNorm updates only the
scales, never the big tensors (models/sam.py TwoWayTransformer).

A token->image attention over these keys builds its (B, HT, N) scores
from several matmuls (shared term, constant/pos term, one low-rank term
per block), softmaxes, and contracts back against the factored values. In
XLA each dot materializes its (B, HT, N) output in HBM and the softmax
round-trips it again — the round-5 amgi probe attributed ~21 ms of the
53 ms iou pass to exactly this traffic (PERFORMANCE.md round 5). Per
prompt the full score matrix is only (56, 4096) fp32 ~= 0.9 MB, so this
kernel computes scores + softmax + both value contractions for one prompt
per grid step entirely in VMEM: HBM sees the factored operands and the
(B, HT, d) output, never the scores.

Numerics: scores and softmax in fp32 (the XLA path runs them in bf16 —
the kernel is strictly tighter); the value contractions consume the
value-dtype cast of the probabilities with fp32 accumulation, like the
other kernels in this package (flash_attention._small_kernel).

Reference scope: Instance_Segmentation_Model/segment_anything/modeling/
transformer.py:156-210 (Attention in TwoWayAttentionBlock) — the math is
softmax(q k^T / sqrt(hd)) v with the keys expanded per prompt; here the
expansion never happens.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _t2i_kernel(*refs, sig):
    """One grid step = one prompt b.

    refs = (qb (1, HT, d), uk (1, R, d), uv (1, R, d),
            [pd_i (1, R_i, N), (s_i (1, 1, N))?]...,
            a (1, 1, N), ks (N, d), kc (N, d), vs (N, d), o (1, HT, d)).
    `sig` = tuple of (R_i, has_scale) describing the block operands.
    qb is pre-scaled; ks/kc/vs are shared projections (constant blocks —
    resident across grid steps).
    """
    qb_ref, uk_ref, uv_ref = refs[:3]
    idx = 3
    blocks = []
    for R_i, has_s in sig:
        pd = refs[idx]
        idx += 1
        s = None
        if has_s:
            s = refs[idx]
            idx += 1
        blocks.append((pd, s))
    a_ref, ks_ref, kc_ref, vs_ref, o_ref = refs[idx:idx + 5]

    dt = o_ref.dtype
    qb = qb_ref[0]                                    # (HT, d)
    av = a_ref[0]                                     # (1, N)
    # low-rank query-side factor, cast to the storage dtype exactly like
    # the XLA einsum chain does
    t1 = jax.lax.dot_general(qb, uk_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(dt)             # (HT, R)
    s = jax.lax.dot_general(qb, ks_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * av
    s = s + jax.lax.dot_general(qb, kc_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    off = 0
    for pd_ref, s_ref in blocks:
        r = pd_ref.shape[1]
        term = jax.lax.dot_general(t1[:, off:off + r], pd_ref[0],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        s = s + (term if s_ref is None else term * s_ref[0])
        off += r
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)        # fp32 (HT, N)
    pa = (p * av).astype(dt)
    out = jax.lax.dot_general(pa, vs_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    t2_parts = []
    for pd_ref, s_ref in blocks:
        pc = (p if s_ref is None else p * s_ref[0]).astype(dt)
        t2_parts.append(jax.lax.dot_general(
            pc, pd_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    t2 = jnp.concatenate(t2_parts, axis=1).astype(dt)  # (HT, R)
    out = out + jax.lax.dot_general(t2, uv_ref[0], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(dt)


def _i2t_kernel(*refs, sig, heads):
    """One grid step = one prompt b: the image<-token attention scores +
    per-head softmax over the T tokens, written directly as the new raw
    P block (HT+1 rows, trailing row = 1).

    refs = (kbT (1, HT, d), [uq (1, R, d)]?, [pd_i, (s_i)?]...,
            [a (1, 1, N)]?, qs (N, d), qc (N, d), o (1, HT+1, N)).
    sig = (has_a, ((R_i, has_scale), ...)).
    """
    has_a, bsig = sig
    kbt_ref = refs[0]
    idx = 1
    uq_ref = None
    if bsig:
        uq_ref = refs[idx]
        idx += 1
    blocks = []
    for R_i, has_s in bsig:
        pd = refs[idx]
        idx += 1
        s = None
        if has_s:
            s = refs[idx]
            idx += 1
        blocks.append((pd, s))
    a_ref = None
    if has_a:
        a_ref = refs[idx]
        idx += 1
    qs_ref, qc_ref, o_ref = refs[idx:idx + 3]

    dt = o_ref.dtype
    kbt = kbt_ref[0]                                   # (HT, d)
    HT = kbt.shape[0]
    N = qs_ref.shape[0]
    T = HT // heads
    s = jax.lax.dot_general(kbt, qs_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (HT, N)
    if a_ref is not None:
        s = s * a_ref[0]
    s = s + jax.lax.dot_general(kbt, qc_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    off = 0
    for pd_ref, s_ref in blocks:
        r = pd_ref.shape[1]
        t_i = jax.lax.dot_general(
            uq_ref[0][off:off + r], kbt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)  # (R_i, HT)
        term = jax.lax.dot_general(t_i, pd_ref[0],
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        s = s + (term if s_ref is None else term * s_ref[0])
        off += r
    # softmax over the T tokens of each head: rows are (h, t) pairs
    s3 = s.reshape(heads, T, N)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m)
    p3 = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(HT, N)
    o_ref[0, :HT] = p3.astype(dt)
    o_ref[0, HT:] = jnp.ones((1, N), dt)


def factored_i2t_scores(kbT: jnp.ndarray, UQ, blocks, a, QS: jnp.ndarray,
                        QC: jnp.ndarray, heads: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Image<-token attention probabilities as the next raw P block.

    kbT: (B, HT, d) block-diagonal token keys ((h, t) rows); UQ: (B, R, d)
    or None; blocks: scaled-block P (may be empty); a: (B, N) or None;
    QS/QC: (N, d) shared query-side projections. Returns (B, HT+1, N) —
    softmax over each head's T tokens per image position, trailing row 1
    (the out-proj bias row pairing). Scores + softmax in fp32, in VMEM.
    """
    B, HT, d = kbT.shape
    N = QS.shape[0]
    bsig = tuple((pd.shape[1], s is not None) for pd, s in blocks)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            (lambda i: (i,) + (0,) * nd),
                            memory_space=pltpu.VMEM)

    ops = [kbT]
    specs = [bspec(kbT.shape[1:])]
    if bsig:
        ops.append(UQ)
        specs.append(bspec(UQ.shape[1:]))
    for pd, s in blocks:
        ops.append(pd)
        specs.append(bspec(pd.shape[1:]))
        if s is not None:
            ops.append(s[:, None, :])
            specs.append(bspec((1, N)))
    if a is not None:
        ops.append(a[:, None, :])
        specs.append(bspec((1, N)))
    const = pl.BlockSpec((N, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ops += [QS, QC]
    specs += [const, const]
    return pl.pallas_call(
        partial(_i2t_kernel, sig=(a is not None, bsig), heads=heads),
        grid=(B,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, HT + 1, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HT + 1, N), kbT.dtype),
        interpret=interpret,
    )(*ops)


def factored_t2i_attention(qb: jnp.ndarray, UK: jnp.ndarray, UV: jnp.ndarray,
                           blocks, a: jnp.ndarray, KS: jnp.ndarray,
                           KC: jnp.ndarray, VS: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """qb: (B, HT, d) pre-scaled; UK/UV: (B, R, d); blocks: tuple of
    (Pd (B, R_i, N), s (B, N) | None) with sum(R_i) == R, in U row order;
    a: (B, N); KS/KC/VS: (N, d). Returns the softmax-attention output
    (B, HT, d) — the caller adds the constant value part (softmax rows sum
    to one) and applies the head-diagonal extraction + out-proj."""
    B, HT, d = qb.shape
    N = KS.shape[0]
    sig = tuple((pd.shape[1], s is not None) for pd, s in blocks)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            (lambda i: (i,) + (0,) * nd),
                            memory_space=pltpu.VMEM)

    ops = [qb, UK, UV]
    specs = [bspec(qb.shape[1:]), bspec(UK.shape[1:]), bspec(UV.shape[1:])]
    for pd, s in blocks:
        ops.append(pd)
        specs.append(bspec(pd.shape[1:]))
        if s is not None:
            ops.append(s[:, None, :])
            specs.append(bspec((1, N)))
    ops.append(a[:, None, :])
    specs.append(bspec((1, N)))
    const = pl.BlockSpec((N, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ops += [KS, KC, VS]
    specs += [const, const, const]
    return pl.pallas_call(
        partial(_t2i_kernel, sig=sig),
        grid=(B,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, HT, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HT, d), qb.dtype),
        interpret=interpret,
    )(*ops)
