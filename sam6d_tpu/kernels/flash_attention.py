"""Pallas fused attention kernels (TPU).

Two entry points:

- `fused_attention(q, k, v, scale)` — plain softmax attention for arbitrary
  sequence lengths (DINOv2-L at 257 tokens, MAE ViT at 197). Sequences are
  padded to tile boundaries; padded keys are masked through an extra
  "validity" contraction column (q gets a 1-column, padded keys get -1e9),
  so the kernel body stays a plain matmul-softmax-matmul with zero masking
  code.

- `flash_attention_relpos(q, k, v, rel_h, rel_w, grid_hw)` — SAM ViTDet
  attention (reference image_encoder.py:224-240 + add_decomposed_rel_pos
  :325-361): softmax(q k^T / sqrt(d) + rel_h + rel_w) v without
  materializing the (N, N) scores in HBM. Serves BOTH the 4096-token global
  blocks and the 196-token windowed blocks.

Bias-as-matmul trick: the decomposed bias
  bias[n, m] = rel_h_q[n, row(m)] + rel_w_q[n, col(m)]
is absorbed into the score matmul by augmenting the contraction dimension:
  q_aug = [q * scale, rel_h_q, rel_w_q, 1]
  k_aug = [k,        onehot_row, onehot_col, -1e9*is_pad]
so q_aug @ k_aug^T == q k^T * scale + bias exactly (+ the padding mask).
The thin tables rel_h_q[n, kh] = sum_c q[n, c] * Rh[row(n), kh, c] are cheap
(N x H / N x W) einsums computed outside the kernel.

Block strategy: K/V fit VMEM entirely at every shape this framework uses
(max 4096 x 256), so the grid iterates over q blocks only; each program
computes its (Tq, Nk) scores + softmax + PV in one shot. HBM sees q, k, v,
o and the thin tables — never the N^2 scores.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fused_kernel(q_ref, k_ref, v_ref, o_ref):
    """q_ref: (hb, Tq, Da); k_ref: (hb, Nk, Da); v_ref: (hb, Nk, Dv);
    o_ref: (hb, Tq, Dv) — `hb` heads batched per grid step so each step
    amortizes its DMA + bookkeeping over hb small attention matrices
    (one head per step at 257-token shapes left the MXU idle: ~50k grid
    steps per DINOv2 forward).

    Inputs stay in their storage dtype (bf16 in production) — the MXU
    accumulates in fp32 via preferred_element_type; only the (hb, Tq, Nk)
    score tile is fp32. p is cast back to the value dtype for the PV matmul
    (standard flash-attention practice) to stay under the VMEM budget.
    """
    s = jax.lax.dot_general(q_ref[:], k_ref[:],
                            (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (hb, Tq, Nk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    # l sums the same value-dtype cast the PV matmul consumes (fp32
    # accumulation) so numerator/denominator probabilities agree in bf16
    pc = p.astype(v_ref.dtype)
    l = jnp.sum(pc.astype(jnp.float32), axis=-1, keepdims=True)
    out = jax.lax.dot_general(pc, v_ref[:],
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


_VMEM_BUDGET = 10 * 1024 * 1024


def _head_block(heads: int, block_q: int, Nk: int, Da: int, Dv: int,
                itemsize: int = 2) -> int:
    """Largest divisor of `heads` whose working set fits the VMEM budget.

    `itemsize` is the storage dtype width — fp32 operands (e.g. the
    bf16-vs-fp32 numerics harness) double the k/v/q/out footprint, so
    sizing for bf16 unconditionally overflows VMEM and faults the chip.
    """
    per_head = (Nk * (Da + Dv) * itemsize    # k + v
                + block_q * Nk * 4           # fp32 scores
                + block_q * Nk * itemsize    # p cast back
                + block_q * (Da + Dv * 3) * itemsize)  # q + out
    hb = max(1, _VMEM_BUDGET // max(per_head, 1))
    while heads % hb:
        hb -= 1
    return hb


def _fused_attention(q_aug, k_aug, v, block_q: int, interpret: bool):
    """(B, heads, N, Da/Dv) fused attention; q_aug already carries
    scale/bias/mask columns. Shapes must be tile-aligned."""
    B, heads, Nq, Da = q_aug.shape
    Nk, Dv = v.shape[-2], v.shape[-1]
    hb = _head_block(heads, block_q, Nk, Da, Dv,
                     itemsize=jnp.dtype(v.dtype).itemsize)
    call = pl.pallas_call(
        _fused_kernel,
        grid=(heads // hb, Nq // block_q),
        in_specs=[
            pl.BlockSpec((hb, block_q, Da), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, Nk, Da), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, Nk, Dv), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, block_q, Dv), lambda h, i: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((heads, Nq, Dv), v.dtype),
        interpret=interpret,
    )
    return jax.vmap(call)(q_aug, k_aug, v)


def _pad_axis(x, axis: int, target: int):
    n = x.shape[axis]
    if n == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad)


@partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, interpret: bool = False) -> jnp.ndarray:
    """Plain fused softmax attention for arbitrary N (self- or cross-).

    q: (B, H, Nq, hd), k/v: (B, H, Nk, hd). Returns (B, H, Nq, hd) matching
    softmax(q k^T * scale) v. Sequences are padded to tile boundaries; the
    padded keys are masked via the validity column.
    """
    B, H, Nq, hd = q.shape
    Nk = k.shape[2]
    dt = q.dtype

    Nk_pad = _round_up(Nk, 128)
    need_mask = Nk_pad != Nk
    Da = _round_up(hd + (1 if need_mask else 0), 128)
    Dv = _round_up(hd, 128)

    q_aug = q * jnp.asarray(scale, dt)
    k_aug = k
    if need_mask:
        ones = jnp.ones((B, H, Nq, 1), dt)
        q_aug = jnp.concatenate([q_aug, ones], axis=-1)
        kval = jnp.zeros((B, H, Nk, 1), dt)
        k_aug = jnp.concatenate([k_aug, kval], axis=-1)
        k_aug = _pad_axis(k_aug, 2, Nk_pad)
        # padded key rows: all-zero except the validity column = -1e9
        pad_rows = jnp.zeros((B, H, Nk_pad - Nk, k_aug.shape[-1]), dt)
        pad_rows = pad_rows.at[..., -1].set(jnp.asarray(_NEG_BIG, dt))
        k_aug = jnp.concatenate([k_aug[:, :, :Nk], pad_rows], axis=2)
    q_aug = _pad_axis(q_aug, 3, Da)
    k_aug = _pad_axis(k_aug, 3, Da)
    v_p = _pad_axis(_pad_axis(v, 2, Nk_pad), 3, Dv)

    if Nq <= 1024:
        block_q = _round_up(Nq, 16)
        Nq_pad = block_q
    else:
        block_q = 512
        Nq_pad = _round_up(Nq, block_q)
    q_aug = _pad_axis(q_aug, 2, Nq_pad)

    out = _fused_attention(q_aug, k_aug, v_p, block_q, interpret)
    return out[:, :, :Nq, :hd]


def _small_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """One grid step = `hb` whole heads: scores + softmax + PV entirely in
    VMEM/registers. Operands arrive UNPADDED (hd = 64 stays 64; N = 257
    stays 257) — the blocks tile the logical arrays exactly, so Mosaic's
    internal tile padding never reaches the math and HBM never sees a
    padded copy."""
    s = jax.lax.dot_general(q_ref[:], k_ref[:],
                            (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    # numerator and denominator must see the SAME probabilities: the PV
    # matmul consumes the value-dtype cast of p, so l sums that cast (fp32
    # accumulation), not the pre-cast fp32 p — otherwise bf16 runs bias
    # out/l slightly low (ADVICE round 4)
    pc = p.astype(v_ref.dtype)
    l = jnp.sum(pc.astype(jnp.float32), axis=-1, keepdims=True)
    out = jax.lax.dot_general(pc, v_ref[:],
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (out / l).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention_small(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: float, interpret: bool = False
                          ) -> jnp.ndarray:
    """Fused attention for short sequences (ViT trunks: DINOv2-L 257
    tokens, MAE 197). q/k/v: (B, H, N, hd). One grid step per head block,
    full N per step, NO HBM-side padding: `fused_attention`'s padded
    q_aug/k_aug copies (hd 64 -> 128, N 257 -> 384) cost more than the
    saved score round-trips at these shapes (277 vs 217 ms for the
    128-crop describe — PERFORMANCE.md round 2); this kernel reads the
    operands verbatim (33.7 MB/block instead of ~150-200 MB)."""
    B, H, N, hd = q.shape
    dt = q.dtype
    qf = q.reshape(B * H, N, hd)
    kf = k.reshape(B * H, N, hd)
    vf = v.reshape(B * H, N, hd)
    BH = B * H
    # per-step VMEM: hb * (4*N*hd*itemsize + N*N*(4+itemsize)) bytes
    # (q/k/v/out operands + fp32 scores + value-dtype p copy). Cap the
    # working set at the budget so larger N (e.g. 512) scales hb down
    # instead of overflowing VMEM (ADVICE round 4).
    item = jnp.dtype(dt).itemsize
    per_head = 4 * N * hd * item + N * N * (4 + item)
    hb = max(1, min(8, _VMEM_BUDGET // max(per_head, 1)))
    while BH % hb:
        hb -= 1
    out = pl.pallas_call(
        partial(_small_kernel, scale=scale),
        grid=(BH // hb,),
        in_specs=[
            pl.BlockSpec((hb, N, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, N, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, N, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, N, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, N, hd), dt),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, hd)


def _qkv_kernel(qkv_ref, o_ref, *, heads, scale):
    """qkv_ref: (bb, N, 3C); o_ref: (bb, N, C). One grid step = `bb` whole
    trunk samples; heads are sliced out of the channel dim IN VMEM (a
    lane-offset register relayout), so the head axis never exists in HBM.

    Motivation: head-major kernels (`fused_attention_small`) force the
    caller into (B, N, H, hd) -> (B, H, N, hd) transposes on q/k/v and back
    on the output — ~16 ms of pure HBM relayout per 128-crop DINOv2
    describe, which is why the head-major kernel measured a LOSS vs the
    einsum chain (round 4). This kernel reads the fused qkv projection
    verbatim and writes the (B, N, C) output the out-proj consumes.
    """
    C = o_ref.shape[-1]
    hd = C // heads
    for h in range(heads):
        qh = qkv_ref[:, :, h * hd:(h + 1) * hd]
        kh = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd]
        vh = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        # same-cast numerator/denominator (see _small_kernel)
        pc = p.astype(qkv_ref.dtype)
        l = jnp.sum(pc.astype(jnp.float32), axis=-1, keepdims=True)
        out = jax.lax.dot_general(pc, vh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[:, :, h * hd:(h + 1) * hd] = (
            out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def fused_attention_qkv(qkv: jnp.ndarray, heads: int, scale: float,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused multi-head attention straight off the fused qkv projection.

    qkv: (B, N, 3C) laid out [q | k | v] on the channel axis, each C wide
    with heads contiguous (hd = C // heads) — exactly the Dense(3C) output
    of a timm-style trunk (reference vision_transformer.py Attention).
    Returns (B, N, C), the input to the output projection. HBM traffic is
    the qkv read + output write; scores, softmax, and the head axis itself
    live only in VMEM.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    item = jnp.dtype(qkv.dtype).itemsize
    # per-sample working set: qkv in + out + fp32 scores + p cast (scores
    # lane-pad N to 128s; keep the estimate on the padded shape)
    Np = _round_up(N, 128)
    per_b = (N * C3 * item + N * C * item
             + _round_up(N, 8) * Np * (4 + item) + 4 * N * C)
    bb = max(1, min(B, _VMEM_BUDGET // max(per_b, 1)))
    while B % bb:
        bb -= 1
    out = pl.pallas_call(
        partial(_qkv_kernel, heads=heads, scale=scale),
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((bb, N, C3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        interpret=interpret,
    )(qkv)
    return out


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
    Handles both the SAM global layout (N=4096) and windowed (N=196).
    """
    B, heads, N, hd = q.shape
    H, W = grid_hw
    assert N == H * W
    dt = q.dtype
    scale = hd ** -0.5

    idx_h = np.arange(H)[:, None] - np.arange(H)[None, :] + (H - 1)
    idx_w = np.arange(W)[:, None] - np.arange(W)[None, :] + (W - 1)
    Rh = rel_pos_h[jnp.asarray(idx_h)]  # (H, H, hd)
    Rw = rel_pos_w[jnp.asarray(idx_w)]  # (W, W, hd)

    # one-hot row/col encodings of the key positions
    rows = np.repeat(np.arange(H), W)
    cols = np.tile(np.arange(W), H)
    eye_h = jnp.asarray(np.eye(H, dtype=np.float32)[rows])  # (N, H)
    eye_w = jnp.asarray(np.eye(W, dtype=np.float32)[cols])  # (N, W)

    Nk_pad = _round_up(N, 128)
    need_mask = Nk_pad != N
    daug = hd + H + W + (1 if need_mask else 0)
    Da = _round_up(daug, 128)

    if N <= 512:
        # windowed shapes: build q_aug with ONE lane-clean batched GEMM.
        # q_aug[p] = q[p] @ T[p], T[p] = [scale*I | Rh[i_p].T | Rw[j_p].T]
        # (hd, Da) — the two thin (minor-dim H=14) rel-pos einsums plus the
        # concat/pad this replaces ran at ~3% MXU utilization and cost
        # ~12 ms/frame across 28 windowed blocks (PERFORMANCE.md round 3).
        eyeq = jnp.eye(hd, dtype=dt) * jnp.asarray(scale, dt)
        T = jnp.concatenate([
            jnp.broadcast_to(eyeq, (N, hd, hd)),
            jnp.transpose(Rh, (0, 2, 1))[jnp.asarray(rows)].astype(dt),
            jnp.transpose(Rw, (0, 2, 1))[jnp.asarray(cols)].astype(dt),
        ], axis=-1)                                  # (N, hd, hd+H+W)
        T = _pad_axis(T, 2, Da)
        if need_mask:
            T = T.at[:, :, daug - 1].set(0)  # mask column filled below
        q_aug = jnp.einsum("bhpc,pcd->bhpd", q, T)
        if need_mask:
            one = jnp.zeros((Da,), dt).at[daug - 1].set(1)
            q_aug = q_aug + one
    else:
        qg = q.reshape(B, heads, H, W, hd)
        rel_h_q = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh).reshape(
            B, heads, N, H)
        rel_w_q = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rw).reshape(
            B, heads, N, W)
        parts_q = [q * jnp.asarray(scale, dt), rel_h_q.astype(dt),
                   rel_w_q.astype(dt)]
        if need_mask:
            parts_q.append(jnp.ones((B, heads, N, 1), dt))
        q_aug = _pad_axis(jnp.concatenate(parts_q, axis=-1), 3, Da)

    parts_k = [k, jnp.broadcast_to(eye_h, (B, heads, N, H)).astype(dt),
               jnp.broadcast_to(eye_w, (B, heads, N, W)).astype(dt)]
    if need_mask:
        parts_k.append(jnp.zeros((B, heads, N, 1), dt))
    k_aug = _pad_axis(jnp.concatenate(parts_k, axis=-1), 3, Da)
    if need_mask:
        pad_rows = jnp.zeros((B, heads, Nk_pad - N, Da), dt)
        pad_rows = pad_rows.at[..., hd + H + W].set(jnp.asarray(_NEG_BIG, dt))
        k_aug = jnp.concatenate([k_aug, pad_rows], axis=2)

    Dv = _round_up(hd, 128)
    v_p = _pad_axis(_pad_axis(v, 2, Nk_pad), 3, Dv)

    if N <= 1024:
        bq = _round_up(N, 16)
        Nq_pad = bq
    else:
        bq = min(block_q, N)
        Nq_pad = _round_up(N, bq)
    q_aug = _pad_axis(q_aug, 2, Nq_pad)

    out = _fused_attention(q_aug, k_aug, v_p, bq, interpret)
    return out[:, :, :N, :hd]
