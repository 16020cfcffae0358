"""FastSAM (YOLOv8-seg) segmentor backend in flax.linen.

The reference wraps ultralytics YOLOv8 ("FastSAM-x.pt" = YOLOv8x-seg trained
for everything-segmentation) via `model/fast_sam.py:18-128` with conf/iou/
max_det overrides. Here the network is implemented natively:

- CSP backbone (Conv-BN-SiLU, C2f, SPPF), PAN-FPN neck, Segment head
  (anchor-free DFL box branch + class branch + 32-dim mask coefficients,
  prototype masks from P3)
- decode + class-agnostic NMS as fixed-capacity masked ops
- channels-last, static shapes; the whole predict path is one jitted program

Converter: `sam6d_tpu/weights/convert_fastsam.py` maps the ultralytics
checkpoint module list (model.model.{idx}) onto this tree.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _mk(v, divisor=8):
    return int(np.ceil(v / divisor) * divisor)


class ConvBnSiLU(nn.Module):
    out_ch: int
    k: int = 1
    s: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.k // 2
        x = nn.Conv(self.out_ch, (self.k, self.k), strides=(self.s, self.s),
                    padding=pad, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnSiLU(self.out_ch, 3, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnSiLU(self.out_ch, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            return x + y
        return y


class C2f(nn.Module):
    out_ch: int
    n: int = 1
    shortcut: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.out_ch // 2
        y = ConvBnSiLU(2 * c_, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c_], y[..., c_:]]
        for i in range(self.n):
            parts.append(Bottleneck(c_, self.shortcut, dtype=self.dtype,
                                    name=f"m_{i}")(parts[-1], train))
        return ConvBnSiLU(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train)


class SPPF(nn.Module):
    out_ch: int
    k: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        outs = [y]
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (self.k, self.k), strides=(1, 1),
                                    padding=((self.k // 2,) * 2,) * 2))
        return ConvBnSiLU(self.out_ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(outs, axis=-1), train)


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")


class Proto(nn.Module):
    """Mask prototype head (ultralytics Proto): Conv, 2x ConvTranspose,
    Conv, Conv -> (H/4, W/4, nm)."""
    mid: int = 256
    nm: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnSiLU(self.mid, 3, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(self.mid, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upsample")(x)
        x = ConvBnSiLU(self.mid, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnSiLU(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)


class DetectBranch(nn.Module):
    """3-conv branch of the Segment/Detect head."""
    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnSiLU(self.mid, 3, dtype=self.dtype, name="c0")(x, train)
        x = ConvBnSiLU(self.mid, 3, dtype=self.dtype, name="c1")(x, train)
        return nn.Conv(self.out, (1, 1), dtype=self.dtype, name="c2")(x)


class FastSAMNet(nn.Module):
    """YOLOv8-seg with x-scale defaults (depth 1.0, width 1.25, max 512)."""
    nc: int = 1           # FastSAM: single "object" class
    nm: int = 32          # mask coefficients
    reg_max: int = 16     # DFL bins
    widths: Tuple[int, ...] = (80, 160, 320, 640, 640)  # x-scale channels
    depths: Tuple[int, ...] = (3, 6, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) in [0, 1]. Returns (preds (B, A, 4+nc+nm) decoded
        per-anchor [xyxy, cls-prob, coefs], protos (B, H/4, W/4, nm))."""
        w = self.widths
        d = self.depths
        dt = self.dtype
        # backbone (module indices follow the ultralytics yaml)
        x0 = ConvBnSiLU(w[0], 3, 2, dtype=dt, name="m0")(x, train)
        x1 = ConvBnSiLU(w[1], 3, 2, dtype=dt, name="m1")(x0, train)
        x2 = C2f(w[1], d[0], True, dtype=dt, name="m2")(x1, train)
        x3 = ConvBnSiLU(w[2], 3, 2, dtype=dt, name="m3")(x2, train)
        x4 = C2f(w[2], d[1], True, dtype=dt, name="m4")(x3, train)   # P3
        x5 = ConvBnSiLU(w[3], 3, 2, dtype=dt, name="m5")(x4, train)
        x6 = C2f(w[3], d[2], True, dtype=dt, name="m6")(x5, train)   # P4
        x7 = ConvBnSiLU(w[4], 3, 2, dtype=dt, name="m7")(x6, train)
        x8 = C2f(w[4], d[3], True, dtype=dt, name="m8")(x7, train)
        x9 = SPPF(w[4], dtype=dt, name="m9")(x8, train)              # P5

        # PAN neck
        u1 = jnp.concatenate([_upsample2(x9), x6], axis=-1)
        p4 = C2f(w[3], d[3], False, dtype=dt, name="m12")(u1, train)
        u2 = jnp.concatenate([_upsample2(p4), x4], axis=-1)
        p3 = C2f(w[2], d[3], False, dtype=dt, name="m15")(u2, train)
        dn1 = ConvBnSiLU(w[2], 3, 2, dtype=dt, name="m16")(p3, train)
        p4b = C2f(w[3], d[3], False, dtype=dt, name="m18")(
            jnp.concatenate([dn1, p4], axis=-1), train)
        dn2 = ConvBnSiLU(w[3], 3, 2, dtype=dt, name="m19")(p4b, train)
        p5 = C2f(w[4], d[3], False, dtype=dt, name="m21")(
            jnp.concatenate([dn2, x9], axis=-1), train)

        # Segment head over (p3, p4b, p5)
        feats = [p3, p4b, p5]
        strides = [8, 16, 32]
        ch = [f.shape[-1] for f in feats]
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(self.nc, 100))
        c4 = max(ch[0] // 4, self.nm)

        protos = Proto(_mk(256 * 1.25), self.nm, dtype=dt, name="proto")(p3, train)

        outs = []
        for i, (f, s) in enumerate(zip(feats, strides)):
            box = DetectBranch(c2, 4 * self.reg_max, dtype=dt,
                               name=f"cv2_{i}")(f, train)
            cls = DetectBranch(c3, self.nc, dtype=dt, name=f"cv3_{i}")(f, train)
            coef = DetectBranch(c4, self.nm, dtype=dt, name=f"cv4_{i}")(f, train)
            B, H, W, _ = box.shape
            # DFL decode: softmax expectation over reg_max bins per side
            b = box.reshape(B, H * W, 4, self.reg_max)
            dist = jnp.sum(jax.nn.softmax(b, axis=-1)
                           * jnp.arange(self.reg_max, dtype=b.dtype), axis=-1)
            gy, gx = jnp.meshgrid(jnp.arange(H, dtype=b.dtype),
                                  jnp.arange(W, dtype=b.dtype), indexing="ij")
            cxa = (gx.reshape(-1) + 0.5)
            cya = (gy.reshape(-1) + 0.5)
            x1 = (cxa - dist[..., 0]) * s
            y1 = (cya - dist[..., 1]) * s
            x2 = (cxa + dist[..., 2]) * s
            y2 = (cya + dist[..., 3]) * s
            prob = jax.nn.sigmoid(cls.reshape(B, H * W, self.nc))
            coefs = coef.reshape(B, H * W, self.nm)
            outs.append(jnp.concatenate(
                [jnp.stack([x1, y1, x2, y2], axis=-1), prob, coefs], axis=-1))
        return jnp.concatenate(outs, axis=1), protos
