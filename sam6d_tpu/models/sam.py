"""SAM (Segment Anything) in flax.linen: ViTDet encoder, prompt encoder,
two-way mask decoder.

Parity targets: reference `Instance_Segmentation_Model/segment_anything/modeling/`
image_encoder.py (ViT w/ windowed + global decomposed-rel-pos attention, neck),
prompt_encoder.py (random-Fourier point PE), transformer.py (TwoWayTransformer),
mask_decoder.py (hypernetwork mask head + IoU head), build_sam.py (vit_h/l/b).

TPU design notes:
- channels-last (B, H, W, C) throughout; window partition is a reshape
  (64x64 -> pad 70 -> 25 windows of 14x14), all static shapes.
- the decomposed rel-pos bias is materialized per (q_h, q_w, k_h, k_w) tile
  exactly as the reference does; the global-attention blocks (4096 tokens)
  are the flash-attention fusion target for the perf pass.
- all prompts of the AMG grid are decoded in fixed-size chunks inside one
  jitted program (the reference's 64-point Python loop is a GPU workaround).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .vit import gelu


class MLPBlock(nn.Module):
    mlp_dim: int
    out_dim: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = gelu(x) if self.act == "gelu" else nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="lin2")(x)


class LayerNorm2d(nn.Module):
    """Channel layernorm over (..., C) with eps 1e-6 (reference common.py)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        u = x.mean(axis=-1, keepdims=True)
        s = ((x - u) ** 2).mean(axis=-1, keepdims=True)
        return (x - u) / jnp.sqrt(s + 1e-6) * w + b


def _rel_pos_bias(q: jnp.ndarray, rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
                  hw: Tuple[int, int]):
    """Decomposed rel-pos (reference add_decomposed_rel_pos :325-361) for
    q_size == k_size == hw. q: (B*, heads, H*W, hd). Returns bias
    (B*, heads, H, W, H, W) summed terms, flattened by the caller."""
    H, W = hw
    # for equal q/k sizes: Rh[i, j] = rel_pos_h[i - j + H - 1]
    idx_h = jnp.arange(H)[:, None] - jnp.arange(H)[None, :] + (H - 1)
    idx_w = jnp.arange(W)[:, None] - jnp.arange(W)[None, :] + (W - 1)
    Rh = rel_pos_h[idx_h]  # (H, H, hd)
    Rw = rel_pos_w[idx_w]  # (W, W, hd)
    B = q.shape[0]
    heads = q.shape[1]
    hd = q.shape[-1]
    r_q = q.reshape(B, heads, H, W, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)  # (B, heads, H, W, H)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)  # (B, heads, H, W, W)
    return rel_h[..., :, None] + rel_w[..., None, :]  # (B, heads, H, W, H, W)


class SAMAttention(nn.Module):
    """ViTDet attention with decomposed relative position bias."""
    dim: int
    num_heads: int
    input_size: Tuple[int, int]
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> same."""
        B, H, W, C = x.shape
        heads = self.num_heads
        hd = C // heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, heads, HW, hd)
        attn = jnp.einsum("bhnc,bhmc->bhnm", q * (hd ** -0.5), k)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, hd))
            bias = _rel_pos_bias(q, rel_h, rel_w, (H, W))
            attn = attn + bias.reshape(B, heads, H * W, H * W)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def window_partition(x: jnp.ndarray, ws: int):
    """(B, H, W, C) -> (B * nW, ws, ws, C), zero-padded (reference :243-264)."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def window_unpartition(wins: jnp.ndarray, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    C = wins.shape[-1]
    B = wins.shape[0] // ((Hp // ws) * (Wp // ws))
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W]


class SAMBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int  # 0 = global
    grid: int         # full grid size (img // patch)
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, ws)
            size = (ws, ws)
        else:
            size = (self.grid, self.grid)
        x = SAMAttention(self.dim, self.num_heads, size, dtype=self.dtype,
                         name="attn")(x)
        if ws > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + MLPBlock(int(self.dim * self.mlp_ratio), self.dim,
                         dtype=self.dtype, name="mlp")(y)
        return x


class _ScanSAMBlock(nn.Module):
    """SAM block with a runtime windowed/global switch, scan-compatible.

    All params are created unconditionally (rel-pos tables padded to the
    GLOBAL size; windowed attention slices its [:2*ws-1] prefix), then
    `lax.cond` picks the branch per scanned step — two branch compiles
    total instead of one per depth.
    """
    dim: int
    num_heads: int
    window_size: int
    grid: int
    mlp_ratio: float = 4.0
    use_flash: bool = False
    carry_windows: bool = False  # carry x in window layout across blocks
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_global):
        hd = self.dim // self.num_heads
        L = 2 * self.grid - 1
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="attn_qkv")
        proj = nn.Dense(self.dim, dtype=self.dtype, name="attn_proj")
        rel_h = self.param("rel_pos_h", nn.initializers.zeros, (L, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros, (L, hd))
        norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        mlp = MLPBlock(int(self.dim * self.mlp_ratio), self.dim,
                       dtype=self.dtype, name="mlp")
        # materialize lazily-initialized params OUTSIDE the cond branches
        # (creation inside lax.cond leaks tracers during init); the dummy
        # results are unused and DCE'd by XLA
        _dummy = jnp.zeros((1, 1, self.dim), self.dtype)
        _ = proj(qkv(_dummy)[..., :self.dim])
        _ = mlp(_dummy)

        def attend(h, rh, rw, hw):
            B_, H_, W_, C = h.shape
            heads = self.num_heads
            q3 = qkv(h).reshape(B_, H_ * W_, 3, heads, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = q3[0], q3[1], q3[2]
            attn = jnp.einsum("bhnc,bhmc->bhnm", q * (hd ** -0.5), k)
            bias = _rel_pos_bias(q, rh, rw, hw)
            attn = attn + bias.reshape(B_, heads, H_ * W_, H_ * W_)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
            return proj(out.transpose(0, 2, 1, 3).reshape(B_, H_, W_, C))

        def global_branch(h):
            if self.use_flash:
                from ..kernels.flash_attention import flash_attention_relpos
                B_, H_, W_, C = h.shape
                heads = self.num_heads
                q3 = qkv(h).reshape(B_, H_ * W_, 3, heads, hd)
                q3 = q3.transpose(2, 0, 3, 1, 4)  # (3, B, heads, N, hd)
                out = flash_attention_relpos(
                    q3[0], q3[1], q3[2], rel_h, rel_w, (H_, W_))
                out = out.transpose(0, 2, 1, 3).reshape(B_, H_, W_, C)
                return proj(out)
            return attend(h, rel_h, rel_w, (self.grid, self.grid))

        def window_branch(h):
            ws = self.window_size
            H, W = h.shape[1], h.shape[2]
            hw_, pad_hw = window_partition(h, ws)
            if self.use_flash:
                from ..kernels.flash_attention import flash_attention_relpos
                B_ = hw_.shape[0]
                heads = self.num_heads
                q3 = qkv(hw_).reshape(B_, ws * ws, 3, heads, hd)
                q3 = q3.transpose(2, 0, 3, 1, 4)  # (3, B*nW, heads, N, hd)
                o = flash_attention_relpos(
                    q3[0], q3[1], q3[2],
                    rel_h[:2 * ws - 1], rel_w[:2 * ws - 1], (ws, ws))
                o = o.transpose(0, 2, 1, 3).reshape(B_, ws, ws, self.dim)
                out = proj(o)
            else:
                out = attend(hw_, rel_h[:2 * ws - 1], rel_w[:2 * ws - 1],
                             (ws, ws))
            return window_unpartition(out, ws, pad_hw, (H, W))

        if self.carry_windows:
            # x arrives ALREADY window-partitioned (B*nW, ws, ws, C) and
            # stays that way across every block: the 28 per-block
            # partition/unpartition pad+6D-transpose pairs collapse to one
            # pair per GLOBAL block. Exactness: the reference re-pads with
            # zeros after norm1 every windowed block
            # (image_encoder.py:243-289), so the pad tokens must enter each
            # windowed attention as exact zeros — the static pad mask
            # below re-zeroes them (qkv(0) = bias, identical); per-token
            # LN/MLP never mix tokens, and the global transition discards
            # pads at unpartition. Measured v5e: probe segi.
            ws = self.window_size
            g = self.grid
            nside = -(-g // ws)
            Hp = nside * ws
            row_ok = (np.arange(nside)[:, None] * ws
                      + np.arange(ws)[None, :]) < g       # (nside, ws)
            m = (row_ok[:, None, :, None] & row_ok[None, :, None, :])
            pad_mask = jnp.asarray(
                m.reshape(nside * nside, ws, ws, 1).astype(np.float32))
            nW = nside * nside
            B = x.shape[0] // nW
            if B > 1:
                pad_mask = jnp.tile(pad_mask, (B, 1, 1, 1))

            def window_branch_carried(h):
                if self.use_flash:
                    from ..kernels.flash_attention import \
                        flash_attention_relpos
                    B_ = h.shape[0]
                    heads = self.num_heads
                    q3 = qkv(h).reshape(B_, ws * ws, 3, heads, hd)
                    q3 = q3.transpose(2, 0, 3, 1, 4)
                    o = flash_attention_relpos(
                        q3[0], q3[1], q3[2],
                        rel_h[:2 * ws - 1], rel_w[:2 * ws - 1], (ws, ws))
                    o = o.transpose(0, 2, 1, 3).reshape(B_, ws, ws, self.dim)
                    return proj(o)
                return attend(h, rel_h[:2 * ws - 1], rel_w[:2 * ws - 1],
                              (ws, ws))

            def global_branch_carried(h):
                hg = window_unpartition(h, ws, (Hp, Hp), (g, g))
                out = global_branch(hg)
                out_w, _ = window_partition(out, ws)
                return out_w

            shortcut = x
            h = norm1(x) * pad_mask.astype(x.dtype)
            h = jax.lax.cond(is_global, global_branch_carried,
                             window_branch_carried, h)
            x = shortcut + h
            x = x + mlp(norm2(x))
            return x

        shortcut = x
        h = norm1(x)
        h = jax.lax.cond(is_global, global_branch, window_branch, h)
        x = shortcut + h
        x = x + mlp(norm2(x))
        return x


class _ScanSAMStep(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    grid: int
    use_flash: bool = False
    carry_windows: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, is_global):
        y = _ScanSAMBlock(self.dim, self.num_heads, self.window_size,
                          self.grid, use_flash=self.use_flash,
                          carry_windows=self.carry_windows,
                          dtype=self.dtype, name="block")(carry, is_global)
        return y, None


class SAMImageEncoder(nn.Module):
    """ViTDet image encoder (reference image_encoder.py:17-116), with the
    depth loop as an nn.scan over stacked blocks (single-block compile)."""
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    out_chans: int = 256
    use_flash: bool = False  # Pallas flash attention for the global blocks
    unroll: bool = False     # flatten the block scan at lowering
    carry_windows: bool = False  # keep x window-partitioned across blocks
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) preprocessed -> (B, H/16, W/16, out_chans)."""
        from .vit import PatchEmbed
        grid = self.img_size // self.patch_size
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, grid, grid, self.embed_dim))
        x = x + pos.astype(x.dtype)
        is_global = jnp.asarray(
            [i in self.global_attn_indexes for i in range(self.depth)])
        carry_w = self.carry_windows and self.window_size > 0
        if carry_w:
            x, pad_hw = window_partition(x, self.window_size)
        # `unroll` flattens the scan at lowering (identical param tree) —
        # scan bodies in fused programs run ~2-3x slower on TPU (see
        # PERFORMANCE.md round 3); unrolled, the constant is_global also
        # lets XLA fold each step's windowed/global lax.cond to one branch
        Scanned = nn.scan(_ScanSAMStep, variable_axes={"params": 0},
                          split_rngs={"params": True}, length=self.depth,
                          unroll=self.depth if self.unroll else 1)
        x, _ = Scanned(self.embed_dim, self.num_heads, self.window_size,
                       grid, use_flash=self.use_flash,
                       carry_windows=carry_w, dtype=self.dtype,
                       name="blocks")(x, is_global)
        if carry_w:
            x = window_unpartition(x, self.window_size, pad_hw, (grid, grid))
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = LayerNorm2d(self.out_chans, dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = LayerNorm2d(self.out_chans, dtype=self.dtype, name="neck_ln2")(x)
        return x


# --------------------------------------------------------------- prompts

class PromptEncoder(nn.Module):
    """Prompt encoder (reference prompt_encoder.py:16-170): point, box and
    mask prompts. The AMG pipeline exercises only points; boxes (corner PE +
    corner type embeddings, `_embed_boxes` :96-103) and mask inputs (the
    `mask_downscaling` conv stack :51-59) complete the SamPredictor
    surface."""
    embed_dim: int = 256
    input_image_size: Tuple[int, int] = (1024, 1024)
    image_embedding_size: Tuple[int, int] = (64, 64)
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2))
        # 0: negative point, 1: positive point, 2/3: box corners
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        # mask_downscaling: Conv(2,s2) LN2d GELU Conv(2,s2) LN2d GELU Conv(1)
        c4 = self.mask_in_chans // 4
        self.mask_conv1 = nn.Conv(c4, (2, 2), strides=(2, 2), padding="VALID",
                                  dtype=self.dtype, name="mask_conv1")
        self.mask_ln1 = LayerNorm2d(c4, dtype=self.dtype, name="mask_ln1")
        self.mask_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                                  padding="VALID", dtype=self.dtype,
                                  name="mask_conv2")
        self.mask_ln2 = LayerNorm2d(self.mask_in_chans, dtype=self.dtype,
                                    name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="mask_conv3")

    def _pe(self, coords01):
        """Random-Fourier PE of [0,1]-normalized coords (..., 2) -> (..., C)."""
        c = 2.0 * coords01 - 1.0
        c = c @ self.pe_gaussian.astype(coords01.dtype)
        c = 2.0 * np.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def embed_points(self, points, labels, pad: bool = True):
        """points: (B, N, 2) pixel coords in the model input frame; labels:
        (B, N) in {-1 pad, 0 neg, 1 pos}. Appends the padding point unless
        `pad=False` (reference pads only when no box accompanies the points,
        prompt_encoder.py:149). Returns (B, N[+1], C)."""
        B = points.shape[0]
        if pad:
            pad_pt = jnp.zeros((B, 1, 2), points.dtype)
            pad_lb = -jnp.ones((B, 1), labels.dtype)
            points = jnp.concatenate([points, pad_pt], axis=1)
            labels = jnp.concatenate([labels, pad_lb], axis=1)
        points = points + 0.5
        coords01 = points / jnp.array(
            [self.input_image_size[1], self.input_image_size[0]], points.dtype)
        pe = self._pe(coords01)
        emb = jnp.where((labels == -1)[..., None],
                        self.not_a_point_embed[0],
                        pe)
        emb = emb + jnp.where((labels == 0)[..., None], self.point_embeddings[0], 0.0)
        emb = emb + jnp.where((labels == 1)[..., None], self.point_embeddings[1], 0.0)
        return emb

    def embed_boxes(self, boxes):
        """boxes: (B, 4) xyxy pixel coords in the model input frame ->
        (B, 2, C) corner embeddings (reference _embed_boxes :96-103)."""
        coords = (boxes.astype(jnp.float32) + 0.5).reshape(-1, 2, 2)
        coords01 = coords / jnp.array(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32)
        pe = self._pe(coords01)
        corners = jnp.stack([self.point_embeddings[2],
                             self.point_embeddings[3]])  # (2, C)
        return pe + corners

    def embed_masks(self, masks):
        """masks: (B, 4*h, 4*w, 1) low-res mask logits (channels-last; the
        reference mask_input_size is 4x the embedding grid) -> dense
        embedding (B, h, w, C) via the mask_downscaling stack (:51-59)."""
        h = gelu(self.mask_ln1(self.mask_conv1(masks)))
        h = gelu(self.mask_ln2(self.mask_conv2(h)))
        return self.mask_conv3(h)

    def dense_pe(self):
        """(H, W, C) grid positional encoding (get_dense_pe)."""
        h, w = self.image_embedding_size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2)
        return self._pe(grid)

    def no_mask_dense(self):
        h, w = self.image_embedding_size
        return jnp.broadcast_to(self.no_mask_embed[0], (h, w, self.embed_dim))

    def __call__(self, points=None, labels=None, boxes=None, masks=None):
        """Full reference forward (:128-170): sparse embeddings from
        points and/or boxes (points padded only when no boxes), dense from
        the mask input or the no-mask embedding. Presence of each prompt
        type is a trace-time (static) choice."""
        parts = []
        if points is not None:
            parts.append(self.embed_points(points, labels,
                                           pad=boxes is None))
        if boxes is not None:
            parts.append(self.embed_boxes(boxes))
        assert parts, "at least one of points/boxes required"
        sparse = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = self.no_mask_dense()
        return sparse, dense


# ---------------------------------------------------------- mask decoder

class _DenseParams2(nn.Module):
    """Dense-shaped params (kernel (in, out) + bias) consumed by hand-written
    matmul formulations; the variable tree is identical to nn.Dense so the
    reference-checkpoint converters are untouched."""
    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class DownsampleAttention(nn.Module):
    """Attention with channel downsample (reference transformer.Attention).

    TPU formulation notes (all exact — only fp reduction order differs):
    - skinny shapes (few tokens on one side) embed the heads BLOCK-
      DIAGONALLY into one (H*Nq, H*hd) operand so the per-head (12, 16) @
      (16, 4096) matmuls become one MXU-shaped GEMM. Off-diagonal products
      are exact zeros.
    - when k/v (or q) arrive with batch 1 against a batch-B other side
      (the AMG decode: all prompts share the image tensor until the first
      image<-token update), the shared side is projected ONCE and the
      einsums broadcast — this removes the dominant per-prompt image
      projections in layer 1 of the two-way transformer.
    - in the image<-token direction the output projection is reassociated:
      out = P @ (V_block @ W_out) instead of (P @ V_block) @ W_out, which
      contracts to the 7-token rank first (2.8x fewer FLOPs)."""
    embed_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.embed_dim // self.downsample_rate
        self.inner_dim = d
        self.q_proj = _DenseParams2(self.embed_dim, d, name="q_proj")
        self.k_proj = _DenseParams2(self.embed_dim, d, name="k_proj")
        self.v_proj = _DenseParams2(self.embed_dim, d, name="v_proj")
        self.out_proj = _DenseParams2(d, self.embed_dim, name="out_proj")

    def _apply(self, mod, x):
        k, b = mod()
        return x.astype(self.dtype) @ k.astype(self.dtype) + b.astype(self.dtype)

    def _apply_sum(self, mod, x, extra):
        """proj(x + extra) with the add DISTRIBUTED through the projection:
        x @ W + (extra @ W + b). When extra is batch-1 (the positional
        encoding, shared across prompts) its projection is computed once and
        the (B, N, C) sum `x + extra` is never materialized — the adds were
        ~25% of the AMG decode chunk's HBM traffic. Exact (linearity)."""
        if extra is None:
            return self._apply(mod, x)
        k, b = mod()
        kd = k.astype(self.dtype)
        return (x.astype(self.dtype) @ kd
                + (extra.astype(self.dtype) @ kd + b.astype(self.dtype)))

    def _small_q(self, q, k, v):
        """q: (B, N, d) tiny N; k/v: (Bk in {1, B}, M, d) large M."""
        B, N, _ = q.shape
        M = k.shape[1]
        H = self.num_heads
        hd = self.inner_dim // H
        eye = jnp.eye(H, dtype=q.dtype)
        qb = jnp.einsum("bnhc,hg->bhngc", q.reshape(B, N, H, hd),
                        eye).reshape(B, H * N, H * hd)
        if k.shape[0] == 1 and B > 1:
            s = jnp.einsum("bqc,mc->bqm", qb, k[0])
        else:
            s = jnp.einsum("bqc,bmc->bqm", qb, k)
        p = jax.nn.softmax(s.reshape(B, H, N, M), axis=-1).reshape(B, H * N, M)
        if v.shape[0] == 1 and B > 1:
            res = jnp.einsum("bqm,mc->bqc", p, v[0])
        else:
            res = jnp.einsum("bqm,bmc->bqc", p, v)
        out = jnp.einsum("bhngc,hg->bnhc", res.reshape(B, H, N, H, hd), eye)
        return out.reshape(B, N, H * hd)

    def _small_k_out(self, q, k, v):
        """q: (Bq in {1, B}, N, d) large N; k/v: (B, M, d) tiny M. Returns
        the attention output WITH out_proj applied (reassociated)."""
        B, M, _ = k.shape
        N = q.shape[1]
        H = self.num_heads
        hd = self.inner_dim // H
        eye = jnp.eye(H, dtype=q.dtype)
        kb = jnp.einsum("bnhc,hg->bgchn", k.reshape(B, M, H, hd),
                        eye).reshape(B, H * hd, H * M)
        if q.shape[0] == 1 and B > 1:
            s = jnp.einsum("nc,bck->bnk", q[0], kb)
        else:
            s = jnp.einsum("bnc,bck->bnk", q, kb)
        p = jax.nn.softmax(s.reshape(B, N, H, M), axis=-1).reshape(B, N, H * M)
        vb = jnp.einsum("bnhc,hg->bhngc", v.reshape(B, M, H, hd),
                        eye).reshape(B, H * M, H * hd)
        ko, bo = self.out_proj()
        vbo = vb @ ko.astype(vb.dtype)  # (B, H*M, embed_dim): rank-first
        return jnp.einsum("bnk,bkc->bnc", p, vbo) + bo.astype(vb.dtype)

    def __call__(self, q, k, v, q_extra=None, k_extra=None):
        """q: (B, N, C); k/v: (Bk, M, C) with Bk in {1, B} (Bk=1 = shared
        across the batch, projected once). q_extra/k_extra: optional
        batch-1 additive terms (positional encodings) distributed through
        the projections instead of materializing q+q_extra / k+k_extra."""
        H = self.num_heads
        hd = self.inner_dim // H
        qp = self._apply_sum(self.q_proj, q, q_extra) \
            / jnp.sqrt(hd).astype(self.dtype)
        if k is v:
            # one fused GEMM streams the (B, N, C) image tensor through
            # HBM once for both projections (exact: concatenated weights)
            wk, bk = self.k_proj()
            wv, bv = self.v_proj()
            d = self.inner_dim
            W = jnp.concatenate([wk.astype(self.dtype),
                                 wv.astype(self.dtype)], axis=1)
            kv = k.astype(self.dtype) @ W
            kp = kv[..., :d] + bk.astype(self.dtype)
            if k_extra is not None:
                kp = kp + k_extra.astype(self.dtype) @ wk.astype(self.dtype)
            vp = kv[..., d:] + bv.astype(self.dtype)
        else:
            kp = self._apply_sum(self.k_proj, k, k_extra)
            vp = self._apply(self.v_proj, v)
        B = max(qp.shape[0], kp.shape[0])
        N = qp.shape[1]
        M = kp.shape[1]
        if N <= 32 and M >= 256:
            o = self._small_q(qp, kp, vp)
        elif M <= 32 and N >= 256:
            return self._small_k_out(qp, kp, vp)
        else:
            if kp.shape[0] == 1 and B > 1:
                kp = jnp.broadcast_to(kp, (B, M, kp.shape[-1]))
                vp = jnp.broadcast_to(vp, (B, M, vp.shape[-1]))
            if qp.shape[0] == 1 and B > 1:
                qp = jnp.broadcast_to(qp, (B, N, qp.shape[-1]))
            a = jnp.einsum("bnhc,bmhc->bhnm", qp.reshape(B, N, H, hd),
                           kp.reshape(B, M, H, hd))
            a = jax.nn.softmax(a, axis=-1)
            o = jnp.einsum("bhnm,bmhc->bnhc", a, vp.reshape(B, M, H, hd))
            o = o.reshape(B, N, self.inner_dim)
        return self._apply(self.out_proj, o)


class TwoWayAttentionBlock(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = DownsampleAttention(self.embed_dim, self.num_heads,
                                             1, dtype=self.dtype,
                                             name="self_attn")
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        self.cross_attn_token_to_image = DownsampleAttention(
            self.embed_dim, self.num_heads, 2, dtype=self.dtype,
            name="cross_attn_token_to_image")
        self.norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        self.mlp = MLPBlock(self.mlp_dim, self.embed_dim, act="relu",
                            dtype=self.dtype, name="mlp")
        self.norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        self.norm4 = _LNParams(self.embed_dim, name="norm4")
        self.cross_attn_image_to_token = DownsampleAttention(
            self.embed_dim, self.num_heads, 2, dtype=self.dtype,
            name="cross_attn_image_to_token")

    def __call__(self, queries, keys, query_pe, key_pe, update_keys=True):
        """keys/key_pe may have batch 1 (shared across prompts) while
        queries has batch B. With update_keys=False the image<-token update
        is dropped (keys pass through norm4 with a zero delta) — the AMG
        pre-rank approximation; with update_keys=True results are exact
        regardless of whether keys arrived shared or batched."""
        if self.skip_first_layer_pe:
            # first layer replaces queries outright (reference transformer.py:155-156)
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)

        q = queries + query_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(
                q, keys, keys, k_extra=key_pe))
        queries = self.norm3(queries + self.mlp(queries))

        if not update_keys:
            return queries, _apply_ln(self.norm4(), keys)
        q = queries + query_pe
        attn = self.cross_attn_image_to_token(keys, q, queries,
                                              q_extra=key_pe)
        keys = _apply_ln(self.norm4(), keys + attn)  # (1,N,C)+(B,N,C) bcast
        return queries, keys


def _heads_block_q(q, H, hd):
    """(B, T, H*hd) -> block-diagonal (B, H*T, H*hd) (see DownsampleAttention)."""
    B, T, _ = q.shape
    eye = jnp.eye(H, dtype=q.dtype)
    return jnp.einsum("bnhc,hg->bhngc", q.reshape(B, T, H, hd),
                      eye).reshape(B, H * T, H * hd)


def _heads_diag_out(res, H, hd):
    """(B, H*T, H*hd) -> (B, T, H*hd) diagonal blocks."""
    B, HT, _ = res.shape
    T = HT // H
    eye = jnp.eye(H, dtype=res.dtype)
    out = jnp.einsum("bhngc,hg->bnhc", res.reshape(B, H, T, H, hd), eye)
    return out.reshape(B, T, H * hd)


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32
    # run the P-carrying factored t2i attentions as one Pallas kernel per
    # prompt (kernels/factored_t2i.py): scores + softmax + value
    # contractions in VMEM instead of ~5 (B, HT, N) HBM round-trips
    factored_kernel: bool = False

    def setup(self):
        self.layers = [TwoWayAttentionBlock(
            self.embed_dim, self.num_heads, self.mlp_dim,
            skip_first_layer_pe=(i == 0), dtype=self.dtype,
            name=f"layers_{i}") for i in range(self.depth)]
        self.final_attn_token_to_image = DownsampleAttention(
            self.embed_dim, self.num_heads, 2, dtype=self.dtype,
            name="final_attn_token_to_image")
        self.norm_final_attn = nn.LayerNorm(dtype=self.dtype,
                                            name="norm_final_attn")

    # ---------------- factored image side (exact, never materialized) ----
    #
    # For the AMG decode every prompt shares the image tensor until the
    # first image<-token update, and each update is rank-(H*T+1). The
    # image side is therefore carried as
    #     keys[b] = a[b] ⊙ S  +  P[b] @ U[b]
    # with S (N, C) shared, a (B, N) per-position scalars (from the
    # LayerNorms), and P (B, N, R) / U (B, R, C) low-rank factors. Every
    # projection, attention contraction, and LayerNorm statistic is exact
    # in this representation; the (B, N, C) tensor appears only once, in
    # the caller's upscale GEMM. This removes ~4 GB of HBM materialization
    # per 128-prompt chunk (the decode is bandwidth-bound, not FLOP-bound).

    def _proj_factored(self, dp, S, U, pos, scale=1.0):
        """Projection of the factored keys (+ optional shared pos).
        Returns (KS (N, d) [scaled by a at use], UK (B, R, d) or None,
        KC (N or 1, d) constant part), all multiplied by `scale`."""
        W, b = dp()
        W = W.astype(self.dtype) * jnp.asarray(scale, self.dtype)
        KS = S @ W
        UK = None if U is None else U @ W
        KC = b.astype(self.dtype)[None, :] * jnp.asarray(scale, self.dtype)
        if pos is not None:
            KC = pos[0].astype(self.dtype) @ W + KC
        return KS, UK, KC

    @staticmethod
    def _blocks_concat(blocks):
        """Materialize P_eff (B, R, N) from the scaled-block factors —
        only the XLA fallback path and the kf upscale GEMM ever do this."""
        parts = [pd if s is None else pd * s[:, None, :]
                 for pd, s in blocks]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=1)

    def _ln_factored(self, gamma, beta, S, a, blocks, Uc, eps=1e-6):
        """LayerNorm over the channel axis of x = a ⊙ S + P_eff^T @ Uc,
        returning the updated factored state (S', a', blocks', U'). Exact
        (flax fast-variance formula): mean and E[x^2] are linear/quadratic
        in the factors, and the per-position 1/sigma scaling commutes with
        channel-wise operations.

        P_eff is carried as SCALED BLOCKS — a tuple of (Pd (B, R_i, N),
        s (B, N) or None) whose concatenation along R, each block
        multiplied per-position by its scale, is the effective P. The LN
        therefore never touches the big (B, R, N) tensors: it multiplies
        the (B, N) scales by 1/sigma and appends one tiny rank-2 block
        ([-mu/sigma, 1] rows). Round-5 history: the concat-P formulation
        cost ~12 ms/iou-pass in concat/scale materializations alone
        (probe amgi, PERFORMANCE.md); N=4096 rides the lane axis. With
        factored_kernel the statistics come from a Pallas kernel that
        keeps every (R, N) intermediate in VMEM (factored_ln_stats)."""
        C = S.shape[-1]
        dt = S.dtype
        B, _, N = blocks[0][0].shape
        mS = jnp.mean(S, axis=-1)                      # (N,)
        qS = jnp.mean(S * S, axis=-1)                  # (N,)
        if self.factored_kernel:
            from ..kernels.factored_t2i import factored_ln_stats
            mu, inv = factored_ln_stats(blocks, Uc, S, mS, qS, a, eps=eps)
            inv = inv.astype(dt)
        else:
            mU = jnp.mean(Uc, axis=-1)                 # (B, R)
            offs = [0]
            for pd, _ in blocks:
                offs.append(offs[-1] + pd.shape[1])

            def scl(x, s):
                return x if s is None else x * s

            mu_d = 0.0
            cross = 0.0
            for i, (pd, s) in enumerate(blocks):
                o0, o1 = offs[i], offs[i + 1]
                mu_d = mu_d + scl(
                    jnp.einsum("brn,br->bn", pd, mU[:, o0:o1]), s)
                G2 = jnp.einsum("nc,brc->brn", S, Uc[:, o0:o1])
                cross = cross + scl(jnp.sum(pd * G2, axis=1), s)
            mu = (mS[None] if a is None else a * mS[None]) + mu_d
            cross = cross / C
            gram = jnp.einsum("brc,bsc->brs", Uc, Uc) / C
            d2 = 0.0
            for i, (pd_i, s_i) in enumerate(blocks):
                W = 0.0
                for j, (pd_j, s_j) in enumerate(blocks):
                    g_ij = gram[:, offs[i]:offs[i + 1],
                                offs[j]:offs[j + 1]]
                    W = W + scl(jnp.einsum("brt,btn->brn", g_ij, pd_j),
                                None if s_j is None else s_j[:, None, :])
                d2 = d2 + scl(jnp.sum(pd_i * W, axis=1), s_i)
            aa = 1.0 if a is None else a * a
            a1 = 1.0 if a is None else a
            e2 = aa * qS[None] + 2.0 * a1 * cross + d2
            var = e2 - mu * mu
            inv = jax.lax.rsqrt(var + eps).astype(dt)
        S2 = S * gamma
        a2 = inv if a is None else a * inv
        blocks2 = tuple((pd, inv if s is None else s * inv)
                        for pd, s in blocks)
        rows = jnp.concatenate(
            [(-mu * inv.astype(mu.dtype))[:, None, :].astype(dt),
             jnp.ones((B, 1, N), dt)], axis=1)
        blocks2 = blocks2 + ((rows, None),)
        U2 = jnp.concatenate(
            [Uc * gamma, jnp.broadcast_to(gamma, (B, 1, C)),
             jnp.broadcast_to(beta, (B, 1, C))], axis=1)
        return S2, a2, blocks2, U2

    def _t2i_factored(self, att, q_tokens, S, a, blocks, U, pos):
        """Token->image cross-attention with factored keys; returns the
        attention output on the token side (B, T, C). Exact. `blocks` is
        the scaled-block P (see _ln_factored) — empty tuple before the
        first image<-token update."""
        H = self.num_heads
        d = att.inner_dim
        hd = d // H
        qp = att._apply(att.q_proj, q_tokens) / jnp.sqrt(hd).astype(self.dtype)
        qb = _heads_block_q(qp, H, hd)                 # (B, HT, d)
        B, HT, _ = qb.shape
        T = HT // H
        N = S.shape[0]
        KS, UK, KC = self._proj_factored(att.k_proj, S, U, pos)
        if (self.factored_kernel and blocks and a is not None
                and KC.shape[0] == N):
            from ..kernels.factored_t2i import factored_t2i_attention
            VS, UV, VC = self._proj_factored(att.v_proj, S, U, None)
            res = factored_t2i_attention(qb, UK, UV, blocks, a, KS, KC, VS)
            res = res + VC  # softmax rows sum to 1: bias adds once
            out = _heads_diag_out(res, H, hd)
            return att._apply(att.out_proj, out)
        P = self._blocks_concat(blocks) if blocks else None
        s = jnp.einsum("btd,nd->btn", qb, KS)
        if a is not None:
            s = s * a[:, None, :]
        s = s + (qb @ KC.T if KC.shape[0] == N
                 else jnp.einsum("btd,od->bto", qb, KC))
        if P is not None:
            s = s + jnp.einsum("btr,brn->btn",
                               jnp.einsum("btd,brd->btr", qb, UK), P)
        p = jax.nn.softmax(s.reshape(B, H, T, N), axis=-1
                           ).reshape(B, HT, N)
        VS, UV, VC = self._proj_factored(att.v_proj, S, U, None)
        pa = p if a is None else p * a[:, None, :]
        res = jnp.einsum("btn,nd->btd", pa, VS)
        if P is not None:
            res = res + jnp.einsum("btr,brd->btd",
                                   jnp.einsum("btn,brn->btr", p, P), UV)
        res = res + VC  # softmax rows sum to 1 per head: bias adds once
        out = _heads_diag_out(res, H, hd)
        return att._apply(att.out_proj, out)

    def _i2t_update_factors(self, att, queries, point_embedding,
                            S, a, blocks, U, pos):
        """Image<-token cross-attention, returned as scaled blocks
        extended by one raw dense block (Pd (B, HT+1, N), scale None) and
        the matching Uc rows ((v_b W_o) plus a trailing b_o row), so that
        delta = Pd^T @ Ud. Exact (out-proj reassociated; rank H*T + 1)."""
        H = self.num_heads
        d = att.inner_dim
        hd = d // H
        dt = self.dtype
        N = S.shape[0]
        B = queries.shape[0]
        scale = float(hd) ** -0.5
        QS, UQ, QC = self._proj_factored(att.q_proj, S, U, pos, scale=scale)
        k_t = att._apply(att.k_proj, queries + point_embedding)  # (B, T, d)
        T = k_t.shape[1]
        eye = jnp.eye(H, dtype=dt)
        if self.factored_kernel and QC.shape[0] == N:
            # fused kernel: scores + per-head softmax in VMEM, the
            # (B, HT+1, N) probability block written once
            from ..kernels.factored_t2i import factored_i2t_scores
            kbT = jnp.einsum("bnhc,hg->bhngc", k_t.reshape(B, T, H, hd),
                             eye).reshape(B, H * T, d)
            Pd = factored_i2t_scores(kbT, UQ if blocks else None, blocks,
                                     a, QS, QC, H)
        else:
            kb = jnp.einsum("bnhc,hg->bgchn", k_t.reshape(B, T, H, hd),
                            eye).reshape(B, d, H * T)
            # scores in (B, HT, N): image positions on the lane axis (see
            # _ln_factored layout note)
            s = jnp.einsum("nd,bdk->bkn", QS, kb)
            if a is not None:
                s = s * a[:, None, :]
            s = s + (jnp.einsum("nd,bdk->bkn", QC, kb)
                     if QC.shape[0] == N
                     else jnp.einsum("od,bdk->bko", QC, kb))
            if blocks:
                UQkb = jnp.einsum("brd,bdk->brk", UQ, kb)
                off = 0
                for pd, sc in blocks:
                    r = pd.shape[1]
                    term = jnp.einsum("brn,brk->bkn", pd,
                                      UQkb[:, off:off + r])
                    s = s + (term if sc is None else term * sc[:, None, :])
                    off += r
            # softmax over the T tokens of each head: rows = (h, t) pairs
            p3 = jax.nn.softmax(s.reshape(B, H, T, N), axis=2
                                ).reshape(B, H * T, N)
            Pd = jnp.concatenate([p3, jnp.ones((B, 1, N), dt)], axis=1)
        v_t = att._apply(att.v_proj, queries)
        vb = jnp.einsum("bnhc,hg->bhngc", v_t.reshape(B, T, H, hd),
                        eye).reshape(B, H * T, d)
        Wo, bo = att.out_proj()
        vbo = vb @ Wo.astype(dt)                        # (B, HT, C)
        Ud = jnp.concatenate(
            [vbo, jnp.broadcast_to(bo.astype(dt), (B, 1, self.embed_dim))],
            axis=1)
        blocks2 = blocks + ((Pd, None),)
        U2 = Ud if U is None else jnp.concatenate([U, Ud], axis=1)
        return blocks2, U2

    def factored(self, image_embedding, image_pe, point_embedding):
        """Exact two-way pass with the image side kept factored
        (a ⊙ S + P_eff^T @ U, P_eff as scaled blocks — see _ln_factored).
        image_embedding/image_pe: (1, N, C); point_embedding: (B, T, C).
        Returns (queries (B, T, C), (S (N, C), a (B, N),
        blocks (tuple of (Pd (B, R_i, N), scale (B, N) | None)),
        U (B, R, C))).
        """
        dt = self.dtype
        queries = point_embedding
        S = image_embedding[0].astype(dt)
        pos = image_pe
        a = None
        blocks = ()
        U = None
        for lyr in self.layers:
            if lyr.skip_first_layer_pe:
                queries = lyr.self_attn(queries, queries, queries)
            else:
                q = queries + point_embedding
                queries = queries + lyr.self_attn(q, q, queries)
            queries = lyr.norm1(queries)
            attn = self._t2i_factored(lyr.cross_attn_token_to_image,
                                      queries + point_embedding,
                                      S, a, blocks, U, pos)
            queries = lyr.norm2(queries + attn)
            queries = lyr.norm3(queries + lyr.mlp(queries))
            blocks, U = self._i2t_update_factors(
                lyr.cross_attn_image_to_token, queries, point_embedding,
                S, a, blocks, U, pos)
            gamma, beta = lyr.norm4()
            S, a, blocks, U = self._ln_factored(gamma.astype(dt),
                                                beta.astype(dt), S, a,
                                                blocks, U)
        attn = self._t2i_factored(self.final_attn_token_to_image,
                                  queries + point_embedding, S, a, blocks,
                                  U, pos)
        queries = self.norm_final_attn(queries + attn)
        return queries, (S, a, blocks, U)

    def __call__(self, image_embedding, image_pe, point_embedding,
                 update_keys=True):
        """image_embedding/image_pe: (B or 1, N_img, C); point_embedding:
        (B, N, C). Batch-1 image sides stay shared until the first
        image<-token update materializes them (exact); with
        update_keys=False they stay shared throughout (rank mode)."""
        queries = point_embedding
        keys = image_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, image_pe,
                                  update_keys=update_keys)
        q = queries + point_embedding
        attn = self.final_attn_token_to_image(q, keys, keys,
                                              k_extra=image_pe)
        queries = self.norm_final_attn(queries + attn)
        return queries, keys


class HyperMLP(nn.Module):
    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class _ConvTParams(nn.Module):
    """Holds ConvTranspose-shaped params (kernel (2,2,Cin,Cout) + bias)
    without applying them — consumed as a plain GEMM in block layout while
    the checkpoint tree keeps flax's ConvTranspose layout (spatially
    flipped kernel), so converted reference weights are untouched."""
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, self.in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return k, b


class _LN2dParams(nn.Module):
    """LayerNorm2d-shaped params (weight/bias over dim) without applying
    them — the fused mask-tail kernel consumes them raw; tree layout is
    identical to LayerNorm2d for the checkpoint converter."""
    dim: int

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return w, b


class _LNParams(nn.Module):
    """nn.LayerNorm-shaped params (scale/bias) without applying them —
    the factored-keys pass needs them raw; tree layout matches
    nn.LayerNorm for the checkpoint converter."""
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


def _apply_ln(params, x, eps=1e-6):
    """Manual LayerNorm matching flax nn.LayerNorm (fast variance,
    rsqrt) so the standard and factored paths share norm4's params."""
    scale, bias = params
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    return (x - mu) * inv * scale.astype(x.dtype) + bias.astype(x.dtype)


def block_masks_to_rowmajor(mb: jnp.ndarray) -> jnp.ndarray:
    """(B, 4K, 4N) block-order masks (rows (k, rs), cols (n, pq)) ->
    (B, K, 4g, 4g) row-major, where N = g*g and the low-res pixel of block
    position (i, j) subcell (p, q, r, s) is (4i+2p+r, 4j+2q+s)."""
    B, K4, N4 = mb.shape
    K = K4 // 4
    g = int(round((N4 // 4) ** 0.5))
    m = mb.reshape(B, K, 2, 2, g, g, 2, 2)      # b, k, r, s, i, j, p, q
    m = m.transpose(0, 1, 4, 6, 2, 5, 7, 3)     # b, k, i, p, r, j, q, s
    return m.reshape(B, K, 4 * g, 4 * g)


class MaskDecoder(nn.Module):
    """Two-way transformer + hypernetwork mask head (reference mask_decoder.py).

    `block_layout=True` (TPU inference) computes the upscale chain as plain
    GEMMs in block layout — bit-equal results, measured faster than the
    ConvTranspose lowering in the AMG decode loop."""
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    twoway_num_heads: int = 8
    twoway_mlp_dim: int = 2048
    block_layout: bool = False
    # block_masks=True returns masks in (B, 4K, 4*H*W) block order — rows
    # (k, rs), cols (n, pq); low-res pixel (4i+2p+r, 4j+2q+s) — every
    # tensor in the upscale tail then has MXU/VPU-friendly minor dims and
    # the AMG pipeline consumes the layout natively (its resize matrices
    # reshape for free). block_masks=False keeps the (B, K, 4H, 4W)
    # row-major contract.
    block_masks: bool = False
    shared_l1: bool = True  # keep the image side batch-1 through layer 1
    # factored_keys=True (requires block_masks) carries the per-prompt
    # image side as a ⊙ S + P @ U through the whole transformer (exact);
    # the (B, N, C) tensor appears only in the single upscale GEMM.
    factored_keys: bool = False
    # fuse the P-carrying factored t2i attentions into a Pallas kernel
    # (TwoWayTransformer.factored_kernel); TPU-only
    factored_kernel: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 rank_only=False, sel_channel=None, iou_only=False):
        """image_embeddings: (H, W, C) one image; image_pe: (H, W, C);
        sparse_prompt: (B, Np, C) per-prompt tokens; dense_prompt: (H, W, C).
        Returns (masks (B, 4, 4H, 4W) logits, iou_pred (B, 4)).

        sel_channel: optional (B,) int32 mask-token index per prompt; when
        given, only that channel's mask is produced ((B, 1, ...) /
        (B, 4, 4N) in block order). The selection happens on the tiny
        (B, K, C//8) hypernetwork vectors — exact, and it removes 3/4 of
        the mask-tail contraction + write plus the downstream (B, 12, 4N)
        row gather (the AMG re-decode knows its channel up front).

        The image side enters the two-way transformer with batch 1 (all
        prompts share image + dense no-mask embedding) and is only
        materialized per-prompt by the first image<-token update — exact,
        and removes the dominant per-prompt projections of layer 1.

        rank_only=True drops the image<-token updates entirely: the image
        side stays shared, so the upscale chain runs ONCE and each prompt's
        masks are a single hypernetwork contraction. Approximate (tokens
        never feed back into image features) — used only to PRE-RANK the
        AMG prompt grid before exact scoring of the top slice."""
        C = self.transformer_dim
        H, W = image_embeddings.shape[:2]
        B = sparse_prompt.shape[0]
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, C))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, C))
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens, (B, *out_tokens.shape)), sparse_prompt],
            axis=1)

        src = (image_embeddings + dense_prompt).reshape(1, H * W, C)
        pos = image_pe.reshape(1, H * W, C)
        if not (self.shared_l1 or rank_only):
            src = jnp.broadcast_to(src, (B, H * W, C))
            pos = jnp.broadcast_to(pos, (B, H * W, C))

        tw = TwoWayTransformer(
            depth=2, embed_dim=self.transformer_dim,
            num_heads=self.twoway_num_heads, mlp_dim=self.twoway_mlp_dim,
            dtype=self.dtype, factored_kernel=self.factored_kernel,
            name="transformer")
        kf = None
        if iou_only:
            # exact token-side pass with the image side kept factored —
            # no (B, N, C) tensor and no upscale tail ever exist. Used by
            # the AMG's iou-prefix pass (scores all candidates, masks only
            # for the selected prefix).
            hs, _ = tw.factored(src, pos, tokens)
            iou_token_out = hs[:, 0]
            return None, HyperMLP(256, self.num_mask_tokens, dtype=self.dtype,
                                  name="iou_prediction_head")(iou_token_out)
        if self.factored_keys and self.block_masks and not rank_only:
            hs, kf = tw.factored(src, pos, tokens)
            src = None
        else:
            hs, src = tw(src, pos, tokens, update_keys=not rank_only)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens]

        hyper = jnp.stack(
            [HyperMLP(C, C // 8, dtype=self.dtype, name=f"hyper_mlps_{i}")(
                mask_tokens_out[:, i]) for i in range(self.num_mask_tokens)],
            axis=1)  # (B, 4, C//8)
        if sel_channel is not None:
            # one-hot contraction over the 4 tokens: exact (0/1 weights,
            # single nonzero term), layout-robust on TPU
            oh = jax.nn.one_hot(sel_channel, self.num_mask_tokens,
                                dtype=hyper.dtype)
            hyper = jnp.einsum("bkc,bk->bc", hyper, oh)[:, None, :]
        Bs = B if src is None else src.shape[0]  # 1 in rank mode
        if self.block_layout:
            # The 2x ConvTranspose(2,2) chain as two plain GEMMs whose
            # activations stay in block layout (i, j, dy, dx, c) end to end
            # — XLA's gradient-conv lowering of ConvTranspose ran at ~40
            # TF/s and dominated the 1024-prompt AMG decode.
            k1, b1 = _ConvTParams(C, C // 4, name="upscale_conv1")()
            k2, b2 = _ConvTParams(C // 4, C // 8, name="upscale_conv2")()
            lw, lb = _LN2dParams(C // 4, name="upscale_ln")()
            k1m = k1[::-1, ::-1].transpose(2, 0, 1, 3).reshape(C, 4 * (C // 4))
            k2m = k2[::-1, ::-1].transpose(2, 0, 1, 3).reshape(
                C // 4, 4 * (C // 8))
            if kf is not None:
                # factored keys: the only (B, N, C) materialization
                Sf, af, blocks_f, Uf = kf
                k1d = k1m.astype(Sf.dtype)
                Ufk = Uf @ k1d
                zd = 0.0
                off = 0
                for pd, sc in blocks_f:
                    r = pd.shape[1]
                    part = jnp.einsum("brn,brc->bnc", pd,
                                      Ufk[:, off:off + r])
                    zd = zd + (part if sc is None
                               else part * sc[..., None])
                    off += r
                z = af[..., None] * (Sf @ k1d)[None] + zd
            else:
                z = src @ k1m.astype(src.dtype)  # (Bs, H*W, 4*(C//4)) raw
            if self.block_masks:
                from ..kernels.mask_tail import (mask_tail_block,
                                                 mask_tail_block_shared)
                if Bs == 1 and B > 1:
                    # rank mode: upscale once, contract per prompt
                    masks = mask_tail_block_shared(z, b1, lw, lb, k2m, b2,
                                                   hyper)
                else:
                    masks = mask_tail_block(z, b1, lw, lb, k2m, b2, hyper)
            else:
                x = z.reshape(Bs, H, W, 2, 2, C // 4) + b1.astype(z.dtype)
                u = x.mean(axis=-1, keepdims=True)
                s = ((x - u) ** 2).mean(axis=-1, keepdims=True)
                x = ((x - u) / jnp.sqrt(s + 1e-6) * lw.astype(x.dtype)
                     + lb.astype(x.dtype))
                x = gelu(x)
                x = x.reshape(-1, C // 4) @ k2m.astype(x.dtype)
                x = x.reshape(Bs, H, W, 2, 2, 2, 2, C // 8) + b2.astype(x.dtype)
                x = gelu(x)  # (b, i, j, p, q, r, s, c)
                # pure contraction (clean batched GEMM), then one 4-channel
                # transpose to the separable block-pixel order
                if Bs == 1 and B > 1:
                    m = jnp.einsum("bkc,ijpqrsc->bkijpqrs", hyper, x[0])
                else:
                    m = jnp.einsum("bkc,bijpqrsc->bkijpqrs", hyper, x)
                m = m.transpose(0, 1, 2, 4, 6, 3, 5, 7)  # (b,k, i,p,r, j,q,s)
                masks = m.reshape(B, hyper.shape[1], 4 * H, 4 * W)
        else:
            x = src.reshape(Bs, H, W, C)
            x = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name="upscale_conv1")(x)
            x = LayerNorm2d(C // 4, dtype=self.dtype, name="upscale_ln")(x)
            x = gelu(x)
            x = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name="upscale_conv2")(x)
            x = gelu(x)  # (Bs, 4H, 4W, C//8)
            if Bs == 1 and B > 1:
                masks = jnp.einsum("bkc,hwc->bkhw", hyper, x[0])
            else:
                masks = jnp.einsum("bkc,bhwc->bkhw", hyper, x)
        iou_pred = HyperMLP(256, self.num_mask_tokens, dtype=self.dtype,
                            name="iou_prediction_head")(iou_token_out)
        return masks, iou_pred
