"""FastSAM segmentor pipeline: letterbox -> YOLOv8-seg -> NMS -> masks.

Contract-compatible with SAMSegmentor.generate_masks (and the reference
FastSAM wrapper `model/fast_sam.py:74-128`): fixed-capacity proposals with
validity flags. The predict path (network + decode + NMS + mask assembly)
is one jitted program.

Reference operating point (configs/model/segmentor_model/fast_sam.yaml +
CustomYOLO overrides): iou 0.9, conf 0.25 (the wrapper's final override,
model/fast_sam.py:39), max_det 200, imgsz = segmentor width 640.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fastsam import FastSAMNet
from ..ops.masks import box_iou, nms_masked
from ..data.preprocess import bilinear_resize
from .sam_amg import bilinear_matrix


@dataclass(frozen=True)
class FastSAMConfig:
    imgsz: int = 640
    conf_thresh: float = 0.25
    iou_thresh: float = 0.9
    max_det: int = 200
    mask_thresh: float = 0.5


class FastSAMSegmentor:
    def __init__(self, cfg: FastSAMConfig = FastSAMConfig(),
                 variables=None, seed: int = 0, dtype=jnp.float32,
                 widths=(80, 160, 320, 640, 640), depths=(3, 6, 6, 3)):
        self.cfg = cfg
        self.net = FastSAMNet(widths=widths, depths=depths, dtype=dtype)
        if variables is None:
            variables = self.net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, cfg.imgsz, cfg.imgsz, 3)))
        self.vars = variables
        # variables are an explicit jit arg (no weight constants)
        self._predict = jax.jit(self._predict_impl,
                                static_argnames=("h_in", "w_in"))

    def _predict_impl(self, v, img, h_in, w_in):
        """img: (1, imgsz, imgsz, 3). Returns masked fixed-capacity
        (boxes (D, 4), scores (D,), valid (D,), masks (D, imgsz/4, imgsz/4))
        in letterboxed-image coordinates."""
        cfg = self.cfg
        preds, protos = self.net.apply(v, img)
        p = preds[0]                      # (A, 4 + 1 + nm)
        boxes = p[:, :4]
        scores = p[:, 4]
        coefs = p[:, 5:]
        D = cfg.max_det
        top_scores, top_idx = jax.lax.top_k(scores, D)
        boxes = boxes[top_idx]
        coefs = coefs[top_idx]
        valid = top_scores > cfg.conf_thresh
        iou = box_iou(boxes, boxes)
        same = jnp.ones((D, D), bool)
        keep = nms_masked(iou, top_scores, valid, same, cfg.iou_thresh)

        # mask assembly (ultralytics process_mask): sigmoid(coef @ proto),
        # crop to box (at proto res), threshold after upsample
        pr = protos[0]                    # (Hp, Wp, nm)
        Hp, Wp, _ = pr.shape
        m = jax.nn.sigmoid(jnp.einsum("dc,hwc->dhw", coefs, pr))
        scale = Hp / (img.shape[1] / 1.0)  # proto stride 4 -> boxes / 4
        bx = boxes * (Hp / img.shape[1])
        ys = jnp.arange(Hp, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(Wp, dtype=jnp.float32)[None, None, :]
        inside = ((xs >= bx[:, 0, None, None]) & (xs < bx[:, 2, None, None])
                  & (ys >= bx[:, 1, None, None]) & (ys < bx[:, 3, None, None]))
        m = m * inside
        return boxes, top_scores, keep, m

    def generate_masks(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """image: (H0, W0, 3) uint8. Same contract as SAMSegmentor."""
        cfg = self.cfg
        H0, W0 = image.shape[:2]
        # letterbox: resize long side to imgsz, pad bottom/right to imgsz
        scale = cfg.imgsz / max(H0, W0)
        h_in = int(round(H0 * scale))
        w_in = int(round(W0 * scale))
        resized = bilinear_resize(image, h_in, w_in).astype(np.float32) / 255.0
        canvas = np.full((cfg.imgsz, cfg.imgsz, 3), 114 / 255.0, np.float32)
        canvas[:h_in, :w_in] = resized

        boxes, scores, valid, masks = self._predict(
            self.vars, jnp.asarray(canvas[None]), h_in=h_in, w_in=w_in)

        # masks: proto res -> crop valid region -> original size (bilinear)
        Hp = cfg.imgsz // 4
        hp = max(int(round(h_in / 4)), 1)
        wp = max(int(round(w_in / 4)), 1)
        My = jnp.asarray(bilinear_matrix(H0, hp))
        Mx = jnp.asarray(bilinear_matrix(W0, wp))
        m = masks[:, :hp, :wp]
        m_full = jnp.einsum("ah,dhw->daw", My, m)
        m_full = jnp.einsum("bw,daw->dab", Mx, m_full)
        masks_out = (np.asarray(m_full) > cfg.mask_thresh).astype(np.float32)

        boxes_out = np.asarray(boxes) / scale
        boxes_out[:, [0, 2]] = boxes_out[:, [0, 2]].clip(0, W0 - 1)
        boxes_out[:, [1, 3]] = boxes_out[:, [1, 3]].clip(0, H0 - 1)
        return dict(masks=masks_out, boxes=boxes_out.astype(np.float32),
                    valid=np.asarray(valid), iou_preds=np.asarray(scores))
