"""Geometric transformer stack for point matching (flax.linen).

Behavior parity with reference `Pose_Estimation_Model/model/transformer.py`:
- GeometricStructureEmbedding (:286-349): pairwise-distance + k-wedge-angle
  sinusoids, projected and max-reduced.
- RPE self-attention (:352-406): score = (q·k + q·p)/sqrt(dh).
- vanilla cross-attention (:93-148), post-LN residual + 2x-expand ReLU FFN
  (AttentionOutput :182-197).
- focused linear attention (:518-564) kept in its O(N) two-einsum form —
  two MXU matmuls instead of an N^2 attention matrix.
- SparseToDenseTransformer (:613-673): sparse geometric attention on FPS
  tokens, propagated to dense tokens by linear attention.

TPU notes: the RPE bias einsum `bhnc,bhnmc->bhnm` over the materialized
(B,N,N,C) embedding is the reference formulation; N=197 keeps it tiny. All
shapes static; bg-token concat is a fixed +1.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.embedding import pairwise_planar_diffs, sinusoid_phase_tables
from ..ops.geometry import pairwise_sq_distance

# Cody-Waite split of pi in fp32 + degree-9 odd minimax sine coefficients
# (Cephes): max |fast_sin - sin| = 6.1e-7 over [-16, 16] (validated in
# test_bf16_budget), and the reduction stays exact far beyond the geo
# argument range (|x| <= ~15: dist/sigma_d and angle*180/(sigma_a*pi)).
_PI_HI = 3.1415927410125732
_PI_LO = -8.742277657347586e-08
_SIN_C = (9.99999999919560e-1, -1.66666665687056e-1, 8.33332995332082e-3,
          -1.98408130042292e-4, 2.70405218871699e-6)


def _fast_sin(x):
    """sin(x) as range reduction + odd minimax polynomial.

    XLA's high-fidelity sin lowering is the single biggest cost in the
    geo embedding on TPU: the 4 (B, N, N, 256) sinusoid tensors are ~88%
    of its 15.8 ms at PEM shapes (probe geoi round 5: no_sin 1.8 vs full
    15.8). The 6.1e-7 approximation error is ~4 orders of magnitude below
    the bf16 rounding of the embedding itself; fp32 paths (reference
    parity, training at fp32) keep jnp.sin."""
    k = jnp.round(x * (1.0 / np.pi))
    r = (x - k * _PI_HI) - k * _PI_LO
    r2 = r * r
    c1, c3, c5, c7, c9 = _SIN_C
    p = r * (c1 + r2 * (c3 + r2 * (c5 + r2 * (c7 + r2 * c9))))
    return p * (1.0 - 2.0 * jnp.mod(k, 2.0))


def _sin_embed(x, dtype):
    return _fast_sin(x) if dtype == jnp.bfloat16 else jnp.sin(x)


class GeometricStructureEmbedding(nn.Module):
    hidden_dim: int = 256
    sigma_d: float = 0.2
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points):
        """points: (B, N, 3) -> (B, N, N, hidden_dim).

        Matches reference transformer.py:286-349 (indices -> sinusoidal
        embedding -> proj_d / proj_a -> angle-k reduction) but computed in
        TPU-native form: all pairwise geometry as per-component (B, N, N)
        planes (never a minor-dim-3 tensor), the interleaved sin/cos
        embedding as ONE fused sin over phase tables, and the k-angle
        reduction applied to the PROJECTED embeddings one k at a time
        (max_k(xW + b) = max_k(xW) + b), so the (B, N, N, k, C) stack is
        never materialized.
        """
        B, N, _ = points.shape
        ax, ay, az = pairwise_planar_diffs(points)
        d2 = ax * ax + ay * ay + az * az
        dist = jnp.sqrt(d2)

        proj_d = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_d")
        proj_a = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_a")

        div_d, phase = sinusoid_phase_tables(self.hidden_dim, 1.0 / self.sigma_d)
        out = proj_d(_sin_embed(dist[..., None] * div_d + phase,
                                self.dtype).astype(self.dtype))

        # k nearest neighbors excluding self (reference knn with k+1, drop 0).
        # The DISCRETE selection uses the reference's matmul-form pairwise
        # distance so near-tie orderings match it bit-for-bit; everything
        # continuous uses the exact planar differences above.
        k = self.angle_k
        d2_sel = pairwise_sq_distance(points, points)
        _, knn_idx = jax.lax.top_k(-d2_sel, k + 1)  # (B, N, k+1)
        knn_idx = knn_idx[..., 1:]
        flat = knn_idx.reshape(B, N * k)
        px, py, pz = points[..., 0], points[..., 1], points[..., 2]
        kx = jnp.take_along_axis(px, flat, axis=1).reshape(B, N, k)
        ky = jnp.take_along_axis(py, flat, axis=1).reshape(B, N, k)
        kz = jnp.take_along_axis(pz, flat, axis=1).reshape(B, N, k)
        rx = kx - px[..., None]  # (B, N, k) reference vectors
        ry = ky - py[..., None]
        rz = kz - pz[..., None]

        factor_a = 180.0 / (self.sigma_a * np.pi)
        div_a, _ = sinusoid_phase_tables(self.hidden_dim, factor_a)
        a_out = None
        for kk in range(k):
            rxe = rx[..., kk:kk + 1]  # (B, N, 1) broadcast over m
            rye = ry[..., kk:kk + 1]
            rze = rz[..., kk:kk + 1]
            cx = rye * az - rze * ay
            cy = rze * ax - rxe * az
            cz = rxe * ay - rye * ax
            sin_v = jnp.sqrt(cx * cx + cy * cy + cz * cz)
            # + 0.0 forces -0.0 -> +0.0 on the diagonal (all three products
            # are signed zeros there); arctan2(0, -0.0) would yield pi where
            # the reference's sum-reduction (+0 accumulator) yields 0
            cos_v = rxe * ax + rye * ay + rze * az + 0.0
            ang = jnp.arctan2(sin_v, cos_v)  # (B, N, N)
            p = proj_a(_sin_embed(ang[..., None] * div_a + phase,
                                  self.dtype).astype(self.dtype))
            if a_out is None:
                a_out = p
            elif self.reduction_a == "max":
                a_out = jnp.maximum(a_out, p)
            else:
                a_out = a_out + p
        if self.reduction_a != "max" and k > 1:
            a_out = a_out / k
        return out + a_out


class AttentionOutput(nn.Module):
    """Post-LN FFN: expand 2x, ReLU, squeeze, residual, LayerNorm."""
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.d_model * 2, dtype=self.dtype, name="expand")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="squeeze")(h)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x + h)


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        H = self.num_heads
        dh = self.d_model // H
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in)
        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, H, dh)
        k = k.reshape(B, M, H, dh)
        v = v.reshape(B, M, H, dh)
        scores = jnp.einsum("bnhc,bmhc->bhnm", q, k) / jnp.sqrt(dh).astype(q.dtype)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(B, N, self.d_model)
        return out


class _LinearParams(nn.Module):
    """Holds Dense-shaped params (kernel/bias) without applying them — used
    where the projection is algebraically folded into another operand but
    the checkpoint tree must keep the nn.Dense layout."""
    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.out_features))
        b = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return k, b


class RPEMultiHeadAttention(nn.Module):
    """Self-attention with additive relative positional score q·proj_p(embed).

    TPU reformulation of reference transformer.py:352-406: instead of
    projecting the (B, N, M, C) embedding per block (an 80+ GFLOP GEMM plus
    two HBM round-trips of the projected tensor, repeated for every one of
    the 12 RPE calls per forward), the projection is folded into the query:
        q·(embed W_p + b_p) = (q W_p^T)·embed + q·b_p
    so the pairwise tensor is only ever READ once per call. Params identical
    (proj_p kernel/bias), results identical up to fp associativity.
    """
    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, embed_qk):
        H = self.num_heads
        dh = self.d_model // H
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in)
        C_e = embed_qk.shape[-1]
        Wp, bp = _LinearParams(C_e, self.d_model, name="proj_p")()
        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, H, dh)
        k = k.reshape(B, M, H, dh)
        v = v.reshape(B, M, H, dh)
        scores_e = jnp.einsum("bnhc,bmhc->bhnm", q, k)
        # fold proj_p into the query side
        Wp_r = Wp.reshape(C_e, H, dh).astype(q.dtype)
        qW = jnp.einsum("bnhc,ehc->bnhe", q, Wp_r)          # (B, N, H, C_e)
        qb = jnp.einsum("bnhc,hc->bnh", q,
                        bp.reshape(H, dh).astype(q.dtype))  # (B, N, H)
        scores_p = jnp.einsum("bnme,bnhe->bhnm", embed_qk.astype(q.dtype), qW)
        scores_p = scores_p + qb.transpose(0, 2, 1)[..., None]
        scores = (scores_e + scores_p) / jnp.sqrt(dh).astype(q.dtype)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(B, N, self.d_model)
        return out


class AttentionLayer(nn.Module):
    """attention -> linear -> residual -> LayerNorm (post-LN)."""
    d_model: int
    num_heads: int
    rpe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, embed=None):
        if self.rpe:
            h = RPEMultiHeadAttention(self.d_model, self.num_heads,
                                      dtype=self.dtype, name="attention")(
                x, memory, memory, embed)
        else:
            h = MultiHeadAttention(self.d_model, self.num_heads,
                                   dtype=self.dtype, name="attention")(
                x, memory, memory)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(h)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(h + x)


class TransformerLayer(nn.Module):
    d_model: int
    num_heads: int
    rpe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, embed=None):
        h = AttentionLayer(self.d_model, self.num_heads, rpe=self.rpe,
                           dtype=self.dtype, name="attention")(x, memory, embed)
        return AttentionOutput(self.d_model, dtype=self.dtype, name="output")(h)


class GeometricTransformer(nn.Module):
    """['self', 'cross'] block pair: RPE self-attention on each cloud, then
    vanilla cross-attention between clouds (reference :469-513)."""
    d_model: int
    num_heads: int
    blocks: Tuple[str, ...] = ("self", "cross")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f0, e0, f1, e1):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = TransformerLayer(self.d_model, self.num_heads, rpe=True,
                                         dtype=self.dtype, name=f"layers_{i}")
                f0 = layer(f0, f0, e0)
                f1 = layer(f1, f1, e1)
            else:
                layer = TransformerLayer(self.d_model, self.num_heads, rpe=False,
                                         dtype=self.dtype, name=f"layers_{i}")
                # sequential (parallel=False, the reference default): cloud 1
                # attends to the ALREADY-UPDATED cloud 0 (transformer.py:505-507)
                f0 = layer(f0, f1)
                f1 = layer(f1, f0)
        return f0, f1


class FocusedLinearAttention(nn.Module):
    """Focused linear attention (Flatten-Transformer), O(N) two-einsum form
    (reference :518-564): ReLU kernel, learnable softplus scale, focusing
    power, norm restoration."""
    d_model: int
    num_heads: int
    focusing_factor: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in)
        scale_param = self.param("scale", nn.initializers.zeros, (1, 1, self.d_model))
        scale = jax.nn.softplus(scale_param).astype(q.dtype)

        q = nn.relu(q) + 1e-6
        k = nn.relu(k) + 1e-6
        q = q / scale
        k = k / scale
        q_norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        k_norm = jnp.linalg.norm(k, axis=-1, keepdims=True)
        q = q ** self.focusing_factor
        k = k ** self.focusing_factor
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * q_norm
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * k_norm

        H = self.num_heads
        dh = self.d_model // H
        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, H, dh)
        k = k.reshape(B, M, H, dh)
        v = v.reshape(B, M, H, dh)
        # z_i = 1 / (q_i · sum_j k_j); out_i = q_i (K^T V) z_i — two matmuls.
        ksum = jnp.sum(k, axis=1)  # (B, H, dh)
        z = 1.0 / (jnp.einsum("bnhc,bhc->bnh", q, ksum) + 1e-6)
        kv = jnp.einsum("bmhc,bmhd->bhcd", k, v)
        out = jnp.einsum("bnhc,bhcd->bnhd", q, kv) * z[..., None]
        return out.reshape(B, N, self.d_model)


class LinearTransformerLayer(nn.Module):
    """linear attention -> linear -> post-LN residual -> FFN (reference
    :567-608)."""
    d_model: int
    num_heads: int
    focusing_factor: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory):
        h = FocusedLinearAttention(self.d_model, self.num_heads,
                                   self.focusing_factor, dtype=self.dtype,
                                   name="attention")(x, memory, memory)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h + x)
        return AttentionOutput(self.d_model, dtype=self.dtype, name="output")(h)


class SparseToDenseTransformer(nn.Module):
    """Gather FPS tokens (+bg), run geometric attention on the sparse set,
    then propagate sparse -> dense via linear attention (reference :613-673,
    with with_bg_token=True, replace_bg_token=True)."""
    d_model: int
    num_heads: int = 4
    focusing_factor: int = 3
    dtype: jnp.dtype = jnp.float32

    def _sample(self, dense, fps_idx):
        bg = dense[:, 0:1, :]
        # NOTE reference quirk (transformer.py:651-658): fps_idx was computed
        # on the bg-LESS 2048-point cloud, but _sample_feats gathers from the
        # bg-PREPENDED 2049-token tensor with those same indices — an
        # off-by-one the released weights were trained with. Replicated
        # exactly: gather from the full tensor at fps_idx.
        body = jnp.take_along_axis(dense, fps_idx[..., None].astype(jnp.int32), axis=1)
        return jnp.concatenate([bg, body], axis=1)

    @nn.compact
    def __call__(self, dense0, e0, fps_idx0, dense1, e1, fps_idx1):
        f0 = self._sample(dense0, fps_idx0)
        f1 = self._sample(dense1, fps_idx1)
        f0, f1 = GeometricTransformer(self.d_model, self.num_heads,
                                      dtype=self.dtype, name="sparse_layer")(
            f0, e0, f1, e1)
        dense_layer = LinearTransformerLayer(self.d_model, self.num_heads,
                                             self.focusing_factor,
                                             dtype=self.dtype, name="dense_layer")
        d0 = dense_layer(dense0[:, 1:, :], f0[:, 1:, :])
        d0 = jnp.concatenate([f0[:, 0:1, :], d0], axis=1)
        d1 = dense_layer(dense1[:, 1:, :], f1[:, 1:, :])
        d1 = jnp.concatenate([f1[:, 0:1, :], d1], axis=1)
        return d0, d1
