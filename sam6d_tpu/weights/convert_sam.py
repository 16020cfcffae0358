"""SAM checkpoint (sam_vit_h/l/b_*.pth) -> flax converter.

Module layout from reference `segment_anything/modeling/*` and
`build_sam.py:55-107`. Conventions as in convert_pem; ConvTranspose kernels
map (in, out, kH, kW) -> (kH, kW, in, out) (validated against torch in
tests/test_sam_parity.py).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .convert_pem import _linear, _layernorm, _conv_patch


def _conv(sd, name):  # Conv2d, possibly without bias
    w = np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"])
    return out


def _convT(sd, name):
    """ConvTranspose2d (in, out, kH, kW) -> flax (kH, kW, in, out) with the
    spatial axes flipped (flax's conv_transpose does not mirror the kernel,
    torch's gradient-of-conv formulation does)."""
    w = np.asarray(sd[name + ".weight"]).transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    out = {"kernel": w}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"])
    return out


def _ln2d(sd, name):
    return {"weight": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def convert_sam_encoder(sd: Dict[str, np.ndarray], depth: int,
                        grid: int = 64):
    """Per-block weights stacked for the scanned encoder; windowed rel-pos
    tables zero-padded to the global length (the windowed branch slices its
    prefix back out)."""
    from .convert_pem import stack_blocks

    p = "image_encoder"
    L = 2 * grid - 1
    blocks = []
    for i in range(depth):
        b = f"{p}.blocks.{i}"
        rh = np.asarray(sd[f"{b}.attn.rel_pos_h"])
        rw = np.asarray(sd[f"{b}.attn.rel_pos_w"])
        if rh.shape[0] < L:
            rh = np.concatenate([rh, np.zeros((L - rh.shape[0], rh.shape[1]),
                                              rh.dtype)])
            rw = np.concatenate([rw, np.zeros((L - rw.shape[0], rw.shape[1]),
                                              rw.dtype)])
        blocks.append({
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "attn_qkv": _linear(sd, f"{b}.attn.qkv"),
            "attn_proj": _linear(sd, f"{b}.attn.proj"),
            "rel_pos_h": rh,
            "rel_pos_w": rw,
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "mlp": {
                "lin1": _linear(sd, f"{b}.mlp.lin1"),
                "lin2": _linear(sd, f"{b}.mlp.lin2"),
            },
        })
    return {
        "patch_embed": _conv_patch(sd, f"{p}.patch_embed.proj"),
        "pos_embed": np.asarray(sd[f"{p}.pos_embed"]),
        "neck_conv1": _conv(sd, f"{p}.neck.0"),
        "neck_ln1": _ln2d(sd, f"{p}.neck.1"),
        "neck_conv2": _conv(sd, f"{p}.neck.2"),
        "neck_ln2": _ln2d(sd, f"{p}.neck.3"),
        "blocks": {"block": stack_blocks(blocks)},
    }


def convert_sam_prompt_encoder(sd: Dict[str, np.ndarray]):
    p = "prompt_encoder"

    def conv(idx):
        # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
        return {
            "kernel": np.asarray(sd[f"{p}.mask_downscaling.{idx}.weight"])
            .transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{p}.mask_downscaling.{idx}.bias"]),
        }

    def ln(idx):
        return {"weight": np.asarray(sd[f"{p}.mask_downscaling.{idx}.weight"]),
                "bias": np.asarray(sd[f"{p}.mask_downscaling.{idx}.bias"])}

    return {
        "pe_gaussian": np.asarray(sd[f"{p}.pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": np.concatenate(
            [np.asarray(sd[f"{p}.point_embeddings.{i}.weight"]) for i in range(4)],
            axis=0),
        "not_a_point_embed": np.asarray(sd[f"{p}.not_a_point_embed.weight"]),
        "no_mask_embed": np.asarray(sd[f"{p}.no_mask_embed.weight"]),
        # mask_downscaling Sequential indices: 0 conv, 1 LN2d, 3 conv,
        # 4 LN2d, 6 conv (reference prompt_encoder.py:51-59)
        "mask_conv1": conv(0), "mask_ln1": ln(1),
        "mask_conv2": conv(3), "mask_ln2": ln(4),
        "mask_conv3": conv(6),
    }


def _downsample_attention(sd, prefix):
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def convert_sam_mask_decoder(sd: Dict[str, np.ndarray], num_mask_tokens: int = 4):
    p = "mask_decoder"
    tr = f"{p}.transformer"
    transformer = {
        "final_attn_token_to_image": _downsample_attention(sd, f"{tr}.final_attn_token_to_image"),
        "norm_final_attn": _layernorm(sd, f"{tr}.norm_final_attn"),
    }
    for i in range(2):
        L = f"{tr}.layers.{i}"
        transformer[f"layers_{i}"] = {
            "self_attn": _downsample_attention(sd, f"{L}.self_attn"),
            "norm1": _layernorm(sd, f"{L}.norm1"),
            "cross_attn_token_to_image": _downsample_attention(sd, f"{L}.cross_attn_token_to_image"),
            "norm2": _layernorm(sd, f"{L}.norm2"),
            "mlp": {"lin1": _linear(sd, f"{L}.mlp.lin1"),
                    "lin2": _linear(sd, f"{L}.mlp.lin2")},
            "norm3": _layernorm(sd, f"{L}.norm3"),
            "cross_attn_image_to_token": _downsample_attention(sd, f"{L}.cross_attn_image_to_token"),
            "norm4": _layernorm(sd, f"{L}.norm4"),
        }
    params = {
        "iou_token": np.asarray(sd[f"{p}.iou_token.weight"]),
        "mask_tokens": np.asarray(sd[f"{p}.mask_tokens.weight"]),
        "transformer": transformer,
        "upscale_conv1": _convT(sd, f"{p}.output_upscaling.0"),
        "upscale_ln": _ln2d(sd, f"{p}.output_upscaling.1"),
        "upscale_conv2": _convT(sd, f"{p}.output_upscaling.3"),
    }
    for i in range(num_mask_tokens):
        m = f"{p}.output_hypernetworks_mlps.{i}"
        params[f"hyper_mlps_{i}"] = {
            f"layers_{j}": _linear(sd, f"{m}.layers.{j}") for j in range(3)}
    params["iou_prediction_head"] = {
        f"layers_{j}": _linear(sd, f"{p}.iou_prediction_head.layers.{j}")
        for j in range(3)}
    return params


def convert_sam_state_dict(sd: Dict[str, np.ndarray], *, depth: int = 32,
                           grid: int = 64):
    """Full SAM checkpoint -> dict of three param trees."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return {
        "image_encoder": {"params": convert_sam_encoder(sd, depth, grid)},
        "prompt_encoder": {"params": convert_sam_prompt_encoder(sd)},
        "mask_decoder": {"params": convert_sam_mask_decoder(sd)},
    }
