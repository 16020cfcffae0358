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


def _ln_stats_kernel(*refs, sig, eps):
    """One grid step = one prompt b: the factored-LN channel statistics
    (mu, 1/sigma) of x = a * S + P_eff^T @ Uc, computed with every
    (R, N) intermediate in VMEM.

    refs = ([pd_i (1, R_i, N), (s_i (1, 1, N))?]..., uc (1, R, C),
            [a (1, 1, N)]?, msqs (2, N), s_mat (N, C), o (1, 2, N)).
    sig = (has_a, ((R_i, has_scale), ...)). msqs rows = [mean(S, C),
    mean(S*S, C)]; s_mat is the shared S (constant block).
    """
    has_a, bsig = sig
    idx = 0
    blocks = []
    for R_i, has_s in bsig:
        pd = refs[idx]
        idx += 1
        s = None
        if has_s:
            s = refs[idx]
            idx += 1
        blocks.append((pd, s))
    uc_ref = refs[idx]
    idx += 1
    a_ref = None
    if has_a:
        a_ref = refs[idx]
        idx += 1
    msqs_ref, smat_ref, o_ref = refs[idx:idx + 3]

    uc = uc_ref[0]                                     # (R, C)
    C = uc.shape[-1]
    mS = msqs_ref[0:1, :]                              # (1, N)
    qS = msqs_ref[1:2, :]
    mU = jnp.mean(uc.astype(jnp.float32), axis=-1, keepdims=True)  # (R, 1)
    gram = jax.lax.dot_general(uc, uc, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ) / C                   # (R, R)
    # scaled fp32 blocks, resident for the pairwise quadratic
    tilde = []
    off = 0
    for pd_ref, s_ref in blocks:
        t = pd_ref[0].astype(jnp.float32)
        if s_ref is not None:
            t = t * s_ref[0].astype(jnp.float32)
        tilde.append((t, off))
        off += t.shape[0]
    mu_d = 0.0
    cross = 0.0
    for t, o in tilde:
        r = t.shape[0]
        mu_d = mu_d + jnp.sum(t * mU[o:o + r], axis=0, keepdims=True)
        g2 = jax.lax.dot_general(uc[o:o + r], smat_ref[:],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        cross = cross + jnp.sum(t * g2, axis=0, keepdims=True)
    cross = cross / C
    d2 = 0.0
    for t_i, o_i in tilde:
        r_i = t_i.shape[0]
        W = 0.0
        for t_j, o_j in tilde:
            r_j = t_j.shape[0]
            W = W + jax.lax.dot_general(
                gram[o_i:o_i + r_i, o_j:o_j + r_j].astype(jnp.float32),
                t_j, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        d2 = d2 + jnp.sum(t_i * W, axis=0, keepdims=True)
    if a_ref is not None:
        av = a_ref[0].astype(jnp.float32)              # (1, N)
        mu = av * mS + mu_d
        e2 = av * av * qS + 2.0 * av * cross + d2
    else:
        mu = mS + mu_d
        e2 = qS + 2.0 * cross + d2
    var = e2 - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    o_ref[0, 0:1] = mu
    o_ref[0, 1:2] = inv


def factored_ln_stats(blocks, Uc: jnp.ndarray, S: jnp.ndarray,
                      mS: jnp.ndarray, qS: jnp.ndarray, a,
                      eps: float = 1e-6, interpret: bool = False):
    """Factored-LN channel statistics, one prompt per grid step.

    blocks: scaled-block P (non-empty); Uc: (B, R, C); S: (N, C) shared;
    mS/qS: (N,) channel mean / second moment of S; a: (B, N) or None.
    Returns (mu (B, N), inv (B, N)) in fp32 — every (R, N) intermediate
    (the S-cross terms, the pairwise gram quadratic) lives only in VMEM.
    The XLA formulation materialized them in HBM: ~15 ms of the iou pass
    at production shapes (probe amgi, round 5c).
    """
    B = Uc.shape[0]
    N = S.shape[0]
    bsig = tuple((pd.shape[1], s is not None) for pd, s in blocks)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            (lambda i: (i,) + (0,) * nd),
                            memory_space=pltpu.VMEM)

    ops = []
    specs = []
    for pd, s in blocks:
        ops.append(pd)
        specs.append(bspec(pd.shape[1:]))
        if s is not None:
            ops.append(s[:, None, :])
            specs.append(bspec((1, N)))
    ops.append(Uc)
    specs.append(bspec(Uc.shape[1:]))
    if a is not None:
        ops.append(a[:, None, :])
        specs.append(bspec((1, N)))
    msqs = jnp.stack([mS, qS]).astype(jnp.float32)     # (2, N)
    ops.append(msqs)
    specs.append(pl.BlockSpec((2, N), lambda i: (0, 0),
                              memory_space=pltpu.VMEM))
    ops.append(S)
    specs.append(pl.BlockSpec(S.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        partial(_ln_stats_kernel, sig=(a is not None, bsig), eps=eps),
        grid=(B,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 2, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.float32),
        interpret=interpret,
    )(*ops)
    return out[:, 0], out[:, 1]


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
