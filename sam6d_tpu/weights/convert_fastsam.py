"""FastSAM-x.pt (ultralytics YOLOv8x-seg) -> flax converter.

Ultralytics module indices (model.model.{i}) map onto FastSAMNet's m{i}
names; C2f/SPPF/Proto submodule names follow the ultralytics layout
(cv1/cv2/m.{j}/...). Conv2d -> HWIO transpose; BN stats into 'batch_stats'.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_bn(sd, prefix):
    w = np.asarray(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0)
    params = {"conv": {"kernel": w},
              "bn": {"scale": np.asarray(sd[f"{prefix}.bn.weight"]),
                     "bias": np.asarray(sd[f"{prefix}.bn.bias"])}}
    stats = {"bn": {"mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
                    "var": np.asarray(sd[f"{prefix}.bn.running_var"])}}
    return params, stats


def _plain_conv(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _bottleneck(sd, prefix):
    p1, s1 = _conv_bn(sd, f"{prefix}.cv1")
    p2, s2 = _conv_bn(sd, f"{prefix}.cv2")
    return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}


def _c2f(sd, prefix, n):
    params, stats = {}, {}
    for name in ["cv1", "cv2"]:
        params[name], stats[name] = _conv_bn(sd, f"{prefix}.{name}")
    for j in range(n):
        params[f"m_{j}"], stats[f"m_{j}"] = _bottleneck(sd, f"{prefix}.m.{j}")
    return params, stats


def _sppf(sd, prefix):
    params, stats = {}, {}
    for name in ["cv1", "cv2"]:
        params[name], stats[name] = _conv_bn(sd, f"{prefix}.{name}")
    return params, stats


def _branch(sd, prefix):
    """DetectBranch: {0,1} Conv-BN-SiLU + {2} plain Conv2d."""
    p0, s0 = _conv_bn(sd, f"{prefix}.0")
    p1, s1 = _conv_bn(sd, f"{prefix}.1")
    params = {"c0": p0, "c1": p1, "c2": _plain_conv(sd, f"{prefix}.2")}
    stats = {"c0": s0, "c1": s1}
    return params, stats


def _proto(sd, prefix):
    params, stats = {}, {}
    for name in ["cv1", "cv2", "cv3"]:
        params[name], stats[name] = _conv_bn(sd, f"{prefix}.{name}")
    up = np.asarray(sd[f"{prefix}.upsample.weight"])  # (in, out, 2, 2)
    params["upsample"] = {
        "kernel": up.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
        "bias": np.asarray(sd[f"{prefix}.upsample.bias"]),
    }
    return params, stats


def convert_fastsam_state_dict(sd: Dict[str, np.ndarray],
                               depths: Tuple[int, ...] = (3, 6, 6, 3)):
    """Full checkpoint -> {'params', 'batch_stats'} for FastSAMNet."""
    sd = {k.replace("model.model.", "model."): np.asarray(v)
          for k, v in sd.items()}
    d = depths
    params, stats = {}, {}

    def add(name, pair):
        params[name], stats[name] = pair

    conv_idx = {0: None, 1: None, 3: None, 5: None, 7: None, 16: None, 19: None}
    for i in conv_idx:
        add(f"m{i}", _conv_bn(sd, f"model.{i}"))
    c2f_spec = {2: d[0], 4: d[1], 6: d[2], 8: d[3],
                12: d[3], 15: d[3], 18: d[3], 21: d[3]}
    for i, n in c2f_spec.items():
        add(f"m{i}", _c2f(sd, f"model.{i}", n))
    add("m9", _sppf(sd, "model.9"))
    add("proto", _proto(sd, "model.22.proto"))
    for i in range(3):
        add(f"cv2_{i}", _branch(sd, f"model.22.cv2.{i}"))
        add(f"cv3_{i}", _branch(sd, f"model.22.cv3.{i}"))
        add(f"cv4_{i}", _branch(sd, f"model.22.cv4.{i}"))
    return {"params": params, "batch_stats": stats}
