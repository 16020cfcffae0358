"""DINOv2 ViT descriptor model (flax.linen), cls + masked patch tokens.

Parity with reference `Instance_Segmentation_Model/model/vision_transformer.py`
(DinoVisionTransformer: LayerScale init 1.0, pre-LN blocks, eps 1e-6) and
`model/dinov2.py` CustomDINOv2 (:92-258): cls descriptors for the semantic
score, masked+L2-normalized patch descriptors for the appearance score.

TPU design: all proposals are processed as one batched forward (the
reference's chunk-of-16 loop is a GPU memory workaround); the 224-input
position embedding is interpolated once at weight-conversion time, so the
module holds a fixed (1, 257, C) pos_embed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vit import Attention, MlpBlock, PatchEmbed


class DinoBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # ln_folded: norm1/norm2 run stats-only — their gamma/beta have been
    # folded into the qkv/fc1 weights by fold_ln_affine (exact re-
    # association; saves the per-token affine elementwise passes)
    ln_folded: bool = False

    @nn.compact
    def __call__(self, x):
        aff = not self.ln_folded
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, use_scale=aff,
                         use_bias=aff, name="norm1")(x)
        x = x + ls1.astype(x.dtype) * Attention(
            self.dim, self.num_heads, dtype=self.dtype,
            use_flash=self.use_flash, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, use_scale=aff,
                         use_bias=aff, name="norm2")(x)
        x = x + ls2.astype(x.dtype) * MlpBlock(
            int(self.dim * self.mlp_ratio), self.dim,
            dtype=self.dtype, name="mlp")(h)
        return x


class _ScanDinoBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    ln_folded: bool = False

    @nn.compact
    def __call__(self, carry, _):
        y = DinoBlock(self.dim, self.num_heads, self.mlp_ratio,
                      dtype=self.dtype, use_flash=self.use_flash,
                      ln_folded=self.ln_folded, name="block")(carry)
        return y, None


class DINOv2(nn.Module):
    """Returns (cls_token (B, C), patch_tokens (B, N, C)), both final-normed
    (x_norm_clstoken / x_norm_patchtokens of the reference forward)."""
    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    ln_folded: bool = False  # see DinoBlock.ln_folded / fold_ln_affine
    unroll: bool = False  # flatten the block scan at lowering (see below)

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        g = self.img_size // self.patch_size
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(x)
        x = x.reshape(B, g * g, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + g * g, self.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + pos.astype(x.dtype)
        # scan over stacked blocks: one-block compile regardless of depth.
        # `unroll` flattens the scan at lowering (identical param tree):
        # scan bodies coexisting with other ops in a fused program run
        # ~2-3x slower on TPU (see PERFORMANCE.md round 3, probe amgy) —
        # unrolling trades compile time for that back.
        Scanned = nn.scan(_ScanDinoBlock, variable_axes={"params": 0},
                          split_rngs={"params": True}, length=self.depth,
                          unroll=self.depth if self.unroll else 1)
        x, _ = Scanned(self.embed_dim, self.num_heads, self.mlp_ratio,
                       dtype=self.dtype, use_flash=self.use_flash,
                       ln_folded=self.ln_folded, name="blocks")(x, None)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0], x[:, 1:]


def fold_ln_affine(variables):
    """Fold every block's norm1/norm2 affine into the qkv / fc1 weights.

    LN_affine(x) @ W + b  ==  LN_stats(x) @ (gamma[:, None] * W)
                              + (b + beta @ W)
    exactly (re-association only). Use with DINOv2(ln_folded=True): the
    per-token gamma-multiply + beta-add elementwise passes disappear into
    the neighboring GEMM weights. Weight math in fp32; idempotent-safe
    (returns the tree unchanged if norm1 is already folded away).

    Input: the UNFOLDED variables as produced by the converters
    (reference layout, weights/convert_dinov2.py). Works on the scanned
    tree (leading depth axis on every block param).
    """
    params = variables.get("params", variables)
    blk = params.get("blocks", {}).get("block")
    if blk is None or "norm1" not in blk:
        return variables
    blk = dict(blk)
    for norm, mod_name, leaf in (("norm1", "attn", "qkv"),
                                 ("norm2", "mlp", "fc1")):
        g = blk[norm]["scale"].astype(jnp.float32)      # (depth, C)
        b = blk[norm]["bias"].astype(jnp.float32)
        mod = dict(blk[mod_name])
        tgt = dict(mod[leaf])
        W = tgt["kernel"].astype(jnp.float32)           # (depth, C, F)
        dt = tgt["kernel"].dtype
        tgt["kernel"] = (W * g[:, :, None]).astype(dt)
        tgt["bias"] = (tgt["bias"].astype(jnp.float32)
                       + jnp.einsum("dc,dcf->df", b, W)).astype(dt)
        mod[leaf] = tgt
        blk[mod_name] = mod
        del blk[norm]
    new_params = dict(params)
    new_blocks = dict(new_params["blocks"])
    new_blocks["block"] = blk
    new_params["blocks"] = new_blocks
    if "params" in variables:
        out = dict(variables)
        out["params"] = new_params
        return out
    return new_params


def masked_patch_descriptors(patch_tokens: jnp.ndarray,
                             proposal_masks: jnp.ndarray,
                             patch_size: int = 14,
                             thresh: float = 0.5) -> jnp.ndarray:
    """Zero out patches whose mask coverage <= thresh, then L2-normalize
    (reference compute_masked_patch_feature, model/dinov2.py:214-224:
    AvgPool(patch)(mask) > 0.5 -> mask patches -> F.normalize).

    patch_tokens: (B, N, C); proposal_masks: (B, S, S) in {0, 1}.
    """
    B, S, _ = proposal_masks.shape
    g = S // patch_size
    m = proposal_masks.reshape(B, g, patch_size, g, patch_size)
    cover = m.mean(axis=(2, 4)).reshape(B, g * g)
    valid = (cover > thresh).astype(patch_tokens.dtype)
    feats = patch_tokens * valid[..., None]
    norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats / jnp.maximum(norm, 1e-12)
