"""DINOv2 checkpoint -> flax converter.

Reference model: `Instance_Segmentation_Model/model/vision_transformer.py`
(DinoVisionTransformer; qkv fused, LayerScale ls1/ls2, eps 1e-6). The
518-input position embedding (37x37 grid) is interpolated to the target grid
ONCE here, replicating the reference's interpolate_pos_encoding quirk
(vision_transformer.py:179-211: bicubic with scale_factor=(g + 0.1)/M,
antialias=False), so the runtime module needs no dynamic interpolation.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .convert_pem import _linear, _layernorm, _conv_patch


def _interpolate_pos_embed(pos: np.ndarray, target_grid: int,
                           offset: float = 0.1) -> np.ndarray:
    """pos: (1, 1 + M*M, C) -> (1, 1 + g*g, C), DINOv2 convention."""
    cls = pos[:, :1]
    body = pos[:, 1:]
    M = int(round(np.sqrt(body.shape[1])))
    C = pos.shape[-1]
    if M == target_grid:
        return pos
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(body.reshape(1, M, M, C).transpose(0, 3, 1, 2)).float()
    out = F.interpolate(
        t, scale_factor=(target_grid + offset) / M, mode="bicubic",
        antialias=False, recompute_scale_factor=False)
    assert out.shape[-1] == target_grid, out.shape
    out = out.permute(0, 2, 3, 1).reshape(1, target_grid * target_grid, C).numpy()
    return np.concatenate([cls, out], axis=1)


def convert_dinov2_state_dict(sd: Dict[str, np.ndarray], *, depth: int = 24,
                              target_grid: int = 16) -> Dict:
    """dinov2_vitl14_pretrain.pth layout -> {'params': ...} for
    sam6d_tpu.models.dinov2.DINOv2 (224-input; target_grid = 224 // 14)."""
    from .convert_pem import stack_blocks

    sd = {k: np.asarray(v) for k, v in sd.items()}
    blocks = []
    for i in range(depth):
        b = f"blocks.{i}"
        blocks.append({
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
            },
            "ls1_gamma": sd[f"{b}.ls1.gamma"],
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
            "ls2_gamma": sd[f"{b}.ls2.gamma"],
        })
    params = {
        "cls_token": sd["cls_token"],
        "pos_embed": _interpolate_pos_embed(sd["pos_embed"], target_grid),
        "patch_embed": _conv_patch(sd, "patch_embed.proj"),
        "norm": _layernorm(sd, "norm"),
        "blocks": {"block": stack_blocks(blocks)},
    }
    return {"params": params}
