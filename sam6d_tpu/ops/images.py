"""Device-side batched image ops for the ISM proposal path.

The reference's CropResizePad loops over proposals in Python with two
`F.interpolate(..., scale_factor=...)` calls in NEAREST mode
(`Instance_Segmentation_Model/utils/bbox_utils.py:98-126`). Here the whole
batch is one fused gather: per output pixel, the two cascaded nearest
mappings (+ center padding) compose into a single source-index computation,
so N proposals resolve in one kernel with no host round-trips.

Bit-exactness: torch materializes the scale as float32 (`scale.item()`), and
`floor(size * scale)` / `floor(dst / scale)` are evaluated against that
value in double precision. JAX here runs in float32, so the floors are
computed EXACTLY via Veltkamp split products (candidate testing), matching
torch's results without float64.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _split_mul(m: jnp.ndarray, p: jnp.ndarray):
    """Exact product m*p = a + b for integer-valued f32 m (|m| < 2^12) and
    f32 p: Veltkamp split of p into 12-bit halves."""
    c = p * 4097.0
    p_hi = c - (c - p)
    p_lo = p - p_hi
    return m * p_hi, m * p_lo


def _floor_mul_f32(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """floor(m * p) computed exactly (m integer-valued f32, p f32 > 0)."""
    a, b = _split_mul(m, p)
    est = jnp.floor(a + b)

    def le(c):  # c <= m*p  <=>  (c - a) <= b   (c - a exact by Sterbenz)
        return (c - a) <= b

    return jnp.where(le(est + 1.0), est + 1.0,
                     jnp.where(le(est), est, est - 1.0))


def _floor_div_f32(d: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """floor(d / p) exactly: largest integer m with m*p <= d (d, p f32 >= 0)."""
    est = jnp.floor(d / p)

    def le(m):  # m*p <= d  <=>  (a - d) <= -b
        a, b = _split_mul(m, p)
        return (a - d) <= -b

    return jnp.where(le(est + 1.0), est + 1.0,
                     jnp.where(le(est), est, est - 1.0))


@partial(jax.jit, static_argnames=("target",))
def crop_resize_pad_nearest(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    target: int = 224,
) -> jnp.ndarray:
    """Crop each box, nearest-resize so the longest side = target, center-pad
    to (target, target). Replicates reference CropResizePad exactly
    (bbox_utils.py:98-126) including torch's float32 scale semantics.

    image: (H, W, C) float; boxes: (N, 4) int/float xyxy.
    Returns (N, target, target, C).
    """
    H, W, C = image.shape
    boxes = boxes.astype(jnp.int32)
    x1, y1 = boxes[:, 0], boxes[:, 1]
    h = (boxes[:, 3] - y1).astype(jnp.float32)
    w = (boxes[:, 2] - x1).astype(jnp.float32)
    tgt = jnp.float32(target)
    scale = tgt / jnp.maximum(h, w)  # f32, bitwise = torch's scale.item()
    h1 = _floor_mul_f32(h, scale).astype(jnp.int32)  # stage-1 output size
    w1 = _floor_mul_f32(w, scale).astype(jnp.int32)
    square = boxes[:, 3] - y1 == boxes[:, 2] - x1
    pad_top = jnp.where(square, 0, jnp.maximum((target - h1) // 2, 0))
    pad_left = jnp.where(square, 0, jnp.maximum((target - w1) // 2, 0))
    # stage-2 input size: h1 in the square branch (resize h1 -> target),
    # target in the padded branch (identity resize)
    size2_h = jnp.where(square, h1, target)
    size2_w = jnp.where(square, w1, target)

    out_idx = jnp.arange(target, dtype=jnp.int32)

    def one(yy1, xx1, hh, ww, h1_, w1_, sc, s2h, s2w, pt, pl):
        # stage 2 (nearest, exact by margin): idx = floor(dst * size2 / target)
        y_st2 = (out_idx * s2h) // target
        x_st2 = (out_idx * s2w) // target
        y_unpad = y_st2 - pt
        x_unpad = x_st2 - pl
        y_in = (y_unpad >= 0) & (y_unpad < h1_)
        x_in = (x_unpad >= 0) & (x_unpad < w1_)
        # stage 1 (nearest vs f32 scale): src = floor(dst / scale)
        y_src = _floor_div_f32(y_unpad.astype(jnp.float32), sc).astype(jnp.int32)
        x_src = _floor_div_f32(x_unpad.astype(jnp.float32), sc).astype(jnp.int32)
        y_src = jnp.clip(y_src, 0, jnp.maximum(hh.astype(jnp.int32) - 1, 0)) + yy1
        x_src = jnp.clip(x_src, 0, jnp.maximum(ww.astype(jnp.int32) - 1, 0)) + xx1
        patch = image[jnp.clip(y_src, 0, H - 1)][:, jnp.clip(x_src, 0, W - 1)]
        mask = (y_in[:, None] & x_in[None, :]).astype(image.dtype)
        return patch * mask[..., None]

    return jax.vmap(one)(y1, x1, h, w, h1, w1, scale, size2_h, size2_w,
                         pad_top, pad_left)


@partial(jax.jit, static_argnames=("target",))
def masked_crop_resize_pad_nearest(
    image: jnp.ndarray,
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    target: int = 224,
):
    """Fused (image * mask) crop for all proposals from the SHARED frame.

    Equivalent to crop_resize_pad_nearest(image * mask_p, box_p) plus
    crop_resize_pad_nearest(mask_p, box_p) per proposal, but gathers from
    the one (H, W, C) frame and the (N, H, W) masks directly — the
    (N, H, W, C) masked-image stack (hundreds of MB of HBM at proposal
    capacity) is never materialized.

    image: (H, W, C); masks: (N, H, W); boxes: (N, 4).
    Returns (crops (N, target, target, C), mask_crops (N, target, target)).
    """
    H, W, C = image.shape
    boxes = boxes.astype(jnp.int32)
    x1, y1 = boxes[:, 0], boxes[:, 1]
    h = (boxes[:, 3] - y1).astype(jnp.float32)
    w = (boxes[:, 2] - x1).astype(jnp.float32)
    tgt = jnp.float32(target)
    scale = tgt / jnp.maximum(h, w)
    h1 = _floor_mul_f32(h, scale).astype(jnp.int32)
    w1 = _floor_mul_f32(w, scale).astype(jnp.int32)
    square = boxes[:, 3] - y1 == boxes[:, 2] - x1
    pad_top = jnp.where(square, 0, jnp.maximum((target - h1) // 2, 0))
    pad_left = jnp.where(square, 0, jnp.maximum((target - w1) // 2, 0))
    size2_h = jnp.where(square, h1, target)
    size2_w = jnp.where(square, w1, target)

    out_idx = jnp.arange(target, dtype=jnp.int32)

    def one(mask_p, yy1, xx1, hh, ww, h1_, w1_, sc, s2h, s2w, pt, pl):
        y_st2 = (out_idx * s2h) // target
        x_st2 = (out_idx * s2w) // target
        y_unpad = y_st2 - pt
        x_unpad = x_st2 - pl
        y_in = (y_unpad >= 0) & (y_unpad < h1_)
        x_in = (x_unpad >= 0) & (x_unpad < w1_)
        y_src = _floor_div_f32(y_unpad.astype(jnp.float32), sc).astype(jnp.int32)
        x_src = _floor_div_f32(x_unpad.astype(jnp.float32), sc).astype(jnp.int32)
        y_src = jnp.clip(y_src, 0, jnp.maximum(hh.astype(jnp.int32) - 1, 0)) + yy1
        x_src = jnp.clip(x_src, 0, jnp.maximum(ww.astype(jnp.int32) - 1, 0)) + xx1
        ys = jnp.clip(y_src, 0, H - 1)
        xs = jnp.clip(x_src, 0, W - 1)
        inside = (y_in[:, None] & x_in[None, :]).astype(image.dtype)
        # masks may arrive as device bool (the AMG output) — cast the
        # gathered patch, not the (N, H, W) stack
        mask_patch = mask_p[ys][:, xs].astype(image.dtype) * inside
        rgb_patch = image[ys][:, xs] * mask_patch[..., None]
        return rgb_patch, mask_patch

    return jax.vmap(one, in_axes=(0,) + (0,) * 11)(
        masks, y1, x1, h, w, h1, w1, scale, size2_h, size2_w,
        pad_top, pad_left)


def normalize_imagenet(rgb: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] (..., 3) -> ImageNet-normalized."""
    mean = jnp.array([0.485, 0.456, 0.406], rgb.dtype)
    std = jnp.array([0.229, 0.224, 0.225], rgb.dtype)
    return (rgb - mean) / std
