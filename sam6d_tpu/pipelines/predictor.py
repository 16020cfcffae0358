"""Prompted SAM predictor: cache one image embedding, decode many prompts.

API-equivalent of reference `segment_anything/predictor.py` SamPredictor
(:17-269): set_image once (encoder forward), then predict with point/box
prompts at will. Used for interactive/prompted segmentation; the AMG
pipeline (`sam_amg.py`) is the batch path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .sam_amg import (SAMSegmentor, SAM_PIXEL_MEAN, SAM_PIXEL_STD,
                      get_preprocess_shape, bilinear_matrix)


class SAMPredictor:
    def __init__(self, segmentor: SAMSegmentor):
        self.seg = segmentor
        self._embedding = None
        self._geom = None
        self._decode = jax.jit(self._decode_impl,
                               static_argnames=("h_in", "w_in", "h0", "w0"))

    def set_image(self, image: np.ndarray) -> None:
        """Compute + cache the image embedding (reference set_image)."""
        cfg = self.seg.cfg
        H0, W0 = image.shape[:2]
        h_in, w_in = get_preprocess_shape(H0, W0, cfg.img_size)
        resized = np.array(
            Image.fromarray(image).resize((w_in, h_in), Image.BILINEAR),
            np.float32)
        x = (resized - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
        canvas = np.zeros((cfg.img_size, cfg.img_size, 3), np.float32)
        canvas[:h_in, :w_in] = x
        self._embedding = self.seg._encode(self.seg.vars, jnp.asarray(canvas[None]))[0]
        self._geom = (H0, W0, h_in, w_in)

    def _decode_impl(self, v, embedding, pts, labels, boxes, mask_input,
                     Ry, Rx, h_in, w_in, h0, w0):
        dense_pe = self.seg.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        sparse, dense = self.seg.prompt_encoder.apply(
            v["prompt_encoder"], pts, labels, boxes, mask_input)
        if mask_input is not None:
            dense = dense[0]  # one prompt set -> shared (H, W, C) dense
        masks, iou = self.seg.mask_decoder.apply(
            v["mask_decoder"], embedding, dense_pe, sparse, dense)
        # decoder emits block layout (B, 4K, 4*g*g); the reference contract
        # for low_res_logits is row-major (B, K, 4g, 4g)
        g = self.seg.cfg.img_size // self.seg.cfg.patch_size
        B, K4, _ = masks.shape
        low_res = masks.reshape(B, K4 // 4, 2, 2, g, g, 2, 2)
        low_res = low_res.transpose(0, 1, 4, 6, 2, 5, 7, 3).reshape(
            B, K4 // 4, 4 * g, 4 * g)
        hi = self.seg._resize_logits_block(masks, Ry, Rx)
        return hi, iou, low_res

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False):
        """Reference SamPredictor.predict (predictor.py:92-167).

        point_coords: (N, 2) xy in ORIGINAL image coords; point_labels (N,)
        in {0, 1}; box: (4,) xyxy in original coords; mask_input:
        (1, 256, 256) low-res logits from a previous call. Returns
        (masks (3|1, H0, W0), iou_predictions, low_res_logits) — the
        low-res logits feed the next call's mask_input, as in the
        reference."""
        assert self._embedding is not None, "call set_image first"
        assert point_coords is not None or box is not None, \
            "at least one of point_coords/box required"
        H0, W0, h_in, w_in = self._geom
        cfg = self.seg.cfg
        scale = np.array([w_in / W0, h_in / H0], np.float32)
        pts = labels = boxes = mask_j = None
        if point_coords is not None:
            pts = jnp.asarray(point_coords[None].astype(np.float32) * scale)
            labels = jnp.asarray(point_labels[None].astype(np.int32))
        if box is not None:
            b = np.asarray(box, np.float32).reshape(4)
            boxes = jnp.asarray((b * np.concatenate([scale, scale]))[None])
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32).reshape(
                mask_input.shape[-2], mask_input.shape[-1])
            mask_j = jnp.asarray(m[None, :, :, None])  # (1, 4h, 4w, 1) CL
        low = cfg.img_size // 4
        Ry = jnp.asarray(bilinear_matrix(H0, h_in)
                         @ bilinear_matrix(cfg.img_size, low)[:h_in])
        Rx = jnp.asarray(bilinear_matrix(W0, w_in)
                         @ bilinear_matrix(cfg.img_size, low)[:w_in])
        masks, iou, low_res = self._decode(
            self.seg.vars, self._embedding, pts, labels, boxes, mask_j,
            Ry, Rx, h_in=h_in, w_in=w_in, h0=H0, w0=W0)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        m = np.asarray(masks[0, sl])
        if not return_logits:
            m = m > 0.0
        return m, np.asarray(iou[0, sl]), np.asarray(low_res[0, sl])
