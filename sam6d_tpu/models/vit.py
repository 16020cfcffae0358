"""MAE/timm-style ViT backbone in flax.linen, channels-last.

Behavior parity with the reference PEM feature extractor
(`Pose_Estimation_Model/model/feature_extraction.py:17-117`): a timm
VisionTransformer (patch 16, pre-LN blocks, qkv-bias) whose forward returns
the final-norm-projected outputs of 4 pyramid blocks, plus the linear
pixel-shuffle upscaling head (768*4 -> 16*256 -> 56x56 -> bilinear 224x224).

TPU notes: tokens stay (B, 197, C); attention is one fused einsum chain that
XLA maps onto the MXU (197-token sequences don't need flash attention);
the upscale head is a single matmul + reshape (no deconvs).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# odd minimax polynomial g(x) ~= atanh(erf(x/sqrt(2))) fitted on [-8, 8] so
# that 0.5*x*(1 + tanh(g(x))) matches exact GELU to <= 1.79e-5 absolutely —
# 26x tighter than the standard tanh-GELU constants (4.7e-4). The input is
# clamped to [-6.75, 6.75] (where g peaks), which extends the bound to all
# of R: beyond the clamp tanh(g) is within 5e-9 of +-1, so the form returns
# x (resp. 0) exactly as GELU's tails do.
_GELU_P1 = 0.7976052307243347
_GELU_P3 = 3.68622565e-2
_GELU_P5 = -3.02642355e-4
_GELU_P7 = -4.21100625e-6


def gelu(x):
    """Exact erf GELU in fp32; fp32 tanh-poly form in bf16.

    The XLA erf lowering dominates ViT non-GEMM time on TPU: +58 ms per
    128-crop DINOv2-L describe (probe dinoi2: erf 207.9 vs 151.2 ms for
    this form — which costs the same as jax's standard tanh GELU while
    approximating 26x tighter; PERFORMANCE.md round 5). The evaluation is
    fp32 end-to-end, so the only bf16-path deviation from exact GELU is the
    <= 1.79e-5 fit error — two orders of magnitude below the rounding the
    bf16 cast itself injects
    (test_bf16_budget.py::test_gelu_tanh_error_below_bf16_cast_noise).
    The fp32 path — every reference-oracle parity test, the converters,
    training — keeps the exact erf form (reference timm/DINOv2 nn.GELU,
    vision_transformer.py)."""
    if x.dtype == jnp.bfloat16:
        t = jnp.clip(x.astype(jnp.float32), -6.75, 6.75)
        t2 = t * t
        g = t * (_GELU_P1 + t2 * (_GELU_P3 + t2 * (_GELU_P5 + t2 * _GELU_P7)))
        return (0.5 * x.astype(jnp.float32) * (1.0 + jnp.tanh(g))).astype(x.dtype)
    return nn.gelu(x, approximate=False)


class MlpBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Pre-LN ViT attention. With `use_flash` (TPU inference pipelines) the
    softmax(qk^T)v chain runs as one Pallas kernel — the (B, H, N, N) scores
    never round-trip HBM; numerics match the einsum path (fp32 accumulation
    both ways)."""
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        # channel-slice q/k/v out of the fused projection instead of a
        # (B, N, 3, H, hd) reshape + middle-axis slices: the 5-D reshape
        # interleaves heads across the minor dim and XLA materializes the
        # relayout — measured -7 ms per 128-crop describe (probe dinoi2:
        # direct_qkv 144.1 vs 151.0 ms)
        if self.use_flash and N <= 1024:
            # token-layout kernel: consumes the fused qkv projection
            # verbatim and emits (B, N, C) — no (B, H, N, hd) transposes,
            # no HBM scores. The head-major small kernel's four transposes
            # cost ~16 ms of pure HBM relayout per 128-crop describe (why
            # flash measured a LOSS vs the einsum chain in round 4).
            from ..kernels.flash_attention import fused_attention_qkv
            out = fused_attention_qkv(qkv, self.num_heads,
                                      scale=float(head_dim) ** -0.5)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        q = qkv[..., :self.dim].reshape(B, N, self.num_heads, head_dim)
        k = qkv[..., self.dim:2 * self.dim].reshape(
            B, N, self.num_heads, head_dim)
        v = qkv[..., 2 * self.dim:].reshape(B, N, self.num_heads, head_dim)
        if self.use_flash:
            from ..kernels.flash_attention import fused_attention
            out = fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), scale=float(head_dim) ** -0.5)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        else:
            # a [cls | 256-patch] key split (lane-clean scores vs the
            # 257->384 pad) measured a LOSS: 153.7 vs 143.0 ms/describe,
            # and even the padding-free N=256 bound is only 133.3 — this
            # chain sits ~10 ms above its layout-perfect bound (probe
            # dinoj, round 5), so no split variant is carried
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(head_dim).astype(x.dtype)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as space-to-depth + one GEMM.

    Same params as nn.Conv(features, (p, p), stride p) — kernel
    (p, p, Cin, features), bias (features,) — so converted reference weights
    are untouched. Avoids the TPU conv path, which pads the 3 input channels
    to the full lane width (a large FLOP/time blowup at patch-embed shapes).
    Returns the (B, H/p, W/p, features) grid."""
    features: int
    patch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (p, p, C, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        g_h, g_w = H // p, W // p
        x = x.reshape(B, g_h, p, g_w, p, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, g_h * g_w, p * p * C)  # (dy, dx, c) row-major
        y = x.astype(self.dtype) @ k.reshape(p * p * C, self.features).astype(self.dtype)
        y = y + b.astype(y.dtype)
        return y.reshape(B, g_h, g_w, self.features)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          use_flash=self.use_flash, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + MlpBlock(int(self.dim * self.mlp_ratio), self.dim,
                         dtype=self.dtype, name="mlp")(y)
        return x


class _ScanBlock(nn.Module):
    """Block wrapped with the (carry, x) -> (carry, y) scan signature."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, carry, _):
        y = Block(self.dim, self.num_heads, self.mlp_ratio,
                  dtype=self.dtype, use_flash=self.use_flash,
                  name="block")(carry)
        return y, y


class ViT(nn.Module):
    """timm-style ViT returning pyramid features.

    Output: list of `len(pyramid_indices)` tensors (B, 1+N, C), each passed
    through the final norm — matching reference ViT.forward
    (feature_extraction.py:21-35) with idx_nblock = [d-1-3n, d-1-2n, d-1-n, d-1].

    TPU note: the depth loop is an `nn.scan` over a stacked Block — one
    block compiles once regardless of depth (remote-compile latency through
    the accelerator tunnel scales with program size). Converters stack the
    per-block torch weights along axis 0 (weights/convert_pem.stack_blocks).
    """
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False
    unroll: bool = False  # flatten the block scan at lowering

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    def pyramid_indices(self) -> Sequence[int]:
        d, n = self.depth, self.depth // 4
        return sorted([d - 1, d - n - 1, d - 2 * n - 1, d - 3 * n - 1])

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) -> list of 4 (B, 1+N, C) normed features."""
        B = x.shape[0]
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(x)
        x = x.reshape(B, -1, self.embed_dim)  # (B, N, C)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.grid * self.grid, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + pos.astype(x.dtype)

        # remat: recompute each block in the backward pass instead of
        # storing all `depth` activation sets (prevent_cse=False is safe
        # under scan and lets XLA fuse normally inside the block)
        block_cls = (nn.remat(_ScanBlock, prevent_cse=False)
                     if self.remat else _ScanBlock)
        ScannedBlock = nn.scan(
            block_cls, variable_axes={"params": 0},
            split_rngs={"params": True}, length=self.depth, out_axes=0,
            unroll=self.depth if self.unroll else 1)
        _, inter = ScannedBlock(self.embed_dim, self.num_heads,
                                self.mlp_ratio, dtype=self.dtype,
                                use_flash=self.use_flash,
                                name="blocks")(x, None)

        final_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        return [final_norm(inter[i]) for i in self.pyramid_indices()]


class ViTPixelDecoder(nn.Module):
    """Linear pixel-shuffle upscaling head (reference ViT_AE 'linear' branch,
    feature_extraction.py:66-67,109-112): concat 4 pyramid levels ->
    Linear(4C -> 16*out_dim) -> 4x4 shuffle to 56x56 [-> bilinear to HxW]."""
    embed_dim: int = 768
    out_dim: int = 256
    use_pyramid_feat: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid, out_hw=None):
        """pyramid: list of (B, N, C) patch tokens (no cls). Returns the
        low-res (B, 4g, 4g, out_dim) map, bilinearly upsampled to `out_hw`
        if given (prefer sample_pixel_feats — upsampling the full map just
        to gather a few thousand pixels wastes GBs of HBM traffic)."""
        if self.use_pyramid_feat:
            x = jnp.concatenate(pyramid, axis=2)
        else:
            x = pyramid[-1]
        B, N, _ = x.shape
        g = int(round(N ** 0.5))
        x = nn.Dense(16 * self.out_dim, dtype=self.dtype, name="output_upscaling")(x)
        x = x.reshape(B, g, g, 4, 4, self.out_dim)
        # (B, h14, w14, a4, b4, C) -> (B, h14, a4, w14, b4, C) -> (B, 4g, 4g, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 4 * g, 4 * g, self.out_dim)
        if out_hw is not None:
            H, W = out_hw
            x = jax.image.resize(x, (B, H, W, self.out_dim), method="bilinear")
        return x


def sample_pixel_feats(fmap_low: jnp.ndarray, choose: jnp.ndarray,
                       out_hw) -> jnp.ndarray:
    """Bilinearly sample the low-res map at chosen full-res pixels — the
    fusion of `resize(fmap, (H, W)) [gather choose]` without materializing
    the (B, H, W, C) map. Exactly matches jax.image.resize 'bilinear'
    (half-pixel centers, edge clamp).

    fmap_low: (B, g, g, C); choose: (B, M) flat row-major indices into
    (H, W); out_hw: (H, W). Returns (B, M, C)."""
    B, g, _, C = fmap_low.shape
    H, W = out_hw
    row = (choose // W).astype(jnp.float32)
    col = (choose % W).astype(jnp.float32)
    sy = g / H
    sx = g / W
    fy = (row + 0.5) * sy - 0.5
    fx = (col + 0.5) * sx - 0.5
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = fy - y0
    wx = fx - x0
    y0c = jnp.clip(y0.astype(jnp.int32), 0, g - 1)
    y1c = jnp.clip(y0.astype(jnp.int32) + 1, 0, g - 1)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, g - 1)
    x1c = jnp.clip(x0.astype(jnp.int32) + 1, 0, g - 1)
    flat = fmap_low.reshape(B, g * g, C)

    def take(y, x):
        return jnp.take_along_axis(flat, (y * g + x)[..., None], axis=1)

    wy = wy[..., None].astype(flat.dtype)
    wx = wx[..., None].astype(flat.dtype)
    top = take(y0c, x0c) * (1 - wx) + take(y0c, x1c) * wx
    bot = take(y1c, x0c) * (1 - wx) + take(y1c, x1c) * wx
    return top * (1 - wy) + bot * wy


class ViTEncoder(nn.Module):
    """Full per-pixel feature extractor: ViT pyramid + linear decoder.

    Returns ((B, H, W, out_dim) feature map, (B, C) cls tokens) — the
    functional equivalent of reference ViT_AE.forward (:98-117).
    """
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_dim: int = 256
    use_pyramid_feat: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False
    unroll: bool = False

    @nn.compact
    def __call__(self, x, full_res: bool = True):
        H, W = x.shape[1], x.shape[2]
        outs = ViT(self.img_size, self.patch_size, self.embed_dim, self.depth,
                   self.num_heads, self.mlp_ratio, dtype=self.dtype,
                   remat=self.remat, use_flash=self.use_flash,
                   unroll=self.unroll, name="vit")(x)
        cls_tokens = outs[-1][:, 0, :]
        patch = [o[:, 1:, :] for o in outs]
        fmap = ViTPixelDecoder(self.embed_dim, self.out_dim,
                               self.use_pyramid_feat, dtype=self.dtype,
                               name="decoder")(
            patch, (H, W) if full_res else None)
        return fmap, cls_tokens


def gather_pixel_feats(fmap: jnp.ndarray, choose: jnp.ndarray) -> jnp.ndarray:
    """fmap: (B, H, W, C); choose: (B, M) flat row-major pixel indices ->
    (B, M, C). Reference get_chosen_pixel_feats (model_utils.py:69-81)."""
    B, H, W, C = fmap.shape
    flat = fmap.reshape(B, H * W, C)
    return jnp.take_along_axis(flat, choose[..., None].astype(jnp.int32), axis=1)
