"""torch state_dict -> flax variables converter for the PEM network.

Maps the reference checkpoint layout (`sam-6d-pem-base.pth`, module names from
`Pose_Estimation_Model/model/*.py` + `model/pointnet2/pytorch_utils.py`) onto
`sam6d_tpu.models.pem.PEMNet`'s parameter tree. Conventions:
- torch Linear weight (out, in)  -> flax Dense kernel (in, out)
- torch Conv2d weight (O, I, kH, kW) -> flax Conv kernel (kH, kW, I, O);
  1x1 convs of the PE SharedMLPs become Dense kernels (I, O)
- torch LayerNorm/BatchNorm weight -> 'scale'; BN running stats ->
  the 'batch_stats' collection.

Works from a dict of numpy arrays so checkpoints can be loaded with
`torch.load(..., map_location='cpu')` and converted without a live torch
dependency elsewhere in the stack.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(sd, name):
    w = np.asarray(sd[name])
    return w


def _linear(sd, prefix):
    return {"kernel": _t(sd, prefix + ".weight").T,
            "bias": _t(sd, prefix + ".bias")}


def _layernorm(sd, prefix):
    return {"scale": _t(sd, prefix + ".weight"),
            "bias": _t(sd, prefix + ".bias")}


def _conv_patch(sd, prefix):
    w = _t(sd, prefix + ".weight")  # (O, I, kH, kW)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _t(sd, prefix + ".bias")}


def stack_blocks(blocks):
    """List of per-block param trees -> one tree with a leading depth axis
    (the layout produced by nn.scan's variable_axes={'params': 0})."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)


def convert_vit(sd: Dict[str, np.ndarray], prefix: str, depth: int):
    """timm-style ViT params under `prefix` -> flax ViT tree (scanned
    blocks: per-block weights stacked on axis 0)."""
    blocks = []
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        blocks.append({
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
            },
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        })
    return {
        "cls_token": _t(sd, f"{prefix}.cls_token"),
        "pos_embed": _t(sd, f"{prefix}.pos_embed"),
        "patch_embed": _conv_patch(sd, f"{prefix}.patch_embed.proj"),
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "blocks": {"block": stack_blocks(blocks)},
    }


def _attention_layer(sd, prefix, rpe: bool):
    """reference (RPE)AttentionLayer + AttentionOutput pair under
    `{prefix}.attention` / `{prefix}.output` -> my TransformerLayer tree."""
    mha = {
        "proj_q": _linear(sd, f"{prefix}.attention.attention.proj_q"),
        "proj_k": _linear(sd, f"{prefix}.attention.attention.proj_k"),
        "proj_v": _linear(sd, f"{prefix}.attention.attention.proj_v"),
    }
    if rpe:
        mha["proj_p"] = _linear(sd, f"{prefix}.attention.attention.proj_p")
    return {
        "attention": {
            "attention": mha,
            "linear": _linear(sd, f"{prefix}.attention.linear"),
            "norm": _layernorm(sd, f"{prefix}.attention.norm"),
        },
        "output": {
            "expand": _linear(sd, f"{prefix}.output.expand"),
            "squeeze": _linear(sd, f"{prefix}.output.squeeze"),
            "norm": _layernorm(sd, f"{prefix}.output.norm"),
        },
    }


def _geometric_transformer(sd, prefix):
    """['self', 'cross'] block pair."""
    return {
        "layers_0": _attention_layer(sd, f"{prefix}.layers.0", rpe=True),
        "layers_1": _attention_layer(sd, f"{prefix}.layers.1", rpe=False),
    }


def _shared_mlp(sd, prefix, n_layers):
    """SharedMLP: layer{i}.conv (1x1 Conv2d no-bias) + layer{i}.normlayer.bn."""
    params = {}
    stats = {}
    for i in range(n_layers):
        w = _t(sd, f"{prefix}.layer{i}.conv.weight")  # (O, I, 1, 1)
        params[f"conv_{i}"] = {"kernel": w[:, :, 0, 0].T}
        params[f"bn_{i}"] = {
            "scale": _t(sd, f"{prefix}.layer{i}.normlayer.bn.weight"),
            "bias": _t(sd, f"{prefix}.layer{i}.normlayer.bn.bias"),
        }
        stats[f"bn_{i}"] = {
            "mean": _t(sd, f"{prefix}.layer{i}.normlayer.bn.running_mean"),
            "var": _t(sd, f"{prefix}.layer{i}.normlayer.bn.running_var"),
        }
    return params, stats


def _positional_encoding(sd, prefix):
    p1, s1 = _shared_mlp(sd, f"{prefix}.mlp1", 3)
    p2, s2 = _shared_mlp(sd, f"{prefix}.mlp2", 3)
    w3 = _t(sd, f"{prefix}.mlp3.conv.weight")  # Conv1d (O, I, 1)
    params = {
        "mlp1": p1, "mlp2": p2,
        "mlp3": {"kernel": w3[:, :, 0].T, "bias": _t(sd, f"{prefix}.mlp3.conv.bias")},
    }
    stats = {"mlp1": s1, "mlp2": s2}
    return params, stats


def _linear_transformer_layer(sd, prefix):
    """reference LinearTransformerLayer(attention=LinearAttentionLayer, output)
    -> my flattened LinearTransformerLayer tree."""
    return {
        "attention": {
            "proj_q": _linear(sd, f"{prefix}.attention.attention.proj_q"),
            "proj_k": _linear(sd, f"{prefix}.attention.attention.proj_k"),
            "proj_v": _linear(sd, f"{prefix}.attention.attention.proj_v"),
            "scale": _t(sd, f"{prefix}.attention.attention.scale"),
        },
        "linear": _linear(sd, f"{prefix}.attention.linear"),
        "norm": _layernorm(sd, f"{prefix}.attention.norm"),
        "output": {
            "expand": _linear(sd, f"{prefix}.output.expand"),
            "squeeze": _linear(sd, f"{prefix}.output.squeeze"),
            "norm": _layernorm(sd, f"{prefix}.output.norm"),
        },
    }


def convert_pem_state_dict(sd: Dict[str, np.ndarray], *, vit_depth: int = 12,
                           coarse_nblock: int = 3, fine_nblock: int = 3):
    """Full sam-6d-pem checkpoint -> {'params': ..., 'batch_stats': ...}."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    fx = "feature_extraction.rgb_net"
    params = {
        "feature_extraction": {
            "vit": convert_vit(sd, f"{fx}.vit", vit_depth),
            "decoder": {
                "output_upscaling": _linear(sd, f"{fx}.output_upscaling"),
            },
        },
        "geo_embedding": {
            "proj_d": _linear(sd, "geo_embedding.proj_d"),
            "proj_a": _linear(sd, "geo_embedding.proj_a"),
        },
    }
    cm = {
        "in_proj": _linear(sd, "coarse_point_matching.in_proj"),
        "out_proj": _linear(sd, "coarse_point_matching.out_proj"),
        "bg_token": _t(sd, "coarse_point_matching.bg_token"),
        "transformers": {"block": stack_blocks([
            _geometric_transformer(sd, f"coarse_point_matching.transformers.{i}")
            for i in range(coarse_nblock)])},
    }
    params["coarse_point_matching"] = cm

    pe_params, pe_stats = _positional_encoding(sd, "fine_point_matching.PE")
    params["fine_pe"] = pe_params
    fm = {
        "in_proj": _linear(sd, "fine_point_matching.in_proj"),
        "out_proj": _linear(sd, "fine_point_matching.out_proj"),
        "bg_token": _t(sd, "fine_point_matching.bg_token"),
        "transformers": {"block": stack_blocks([
            {"sparse_layer": _geometric_transformer(
                sd, f"fine_point_matching.transformers.{i}.sparse_layer"),
             "dense_layer": _linear_transformer_layer(
                sd, f"fine_point_matching.transformers.{i}.dense_layer")}
            for i in range(fine_nblock)])},
    }
    params["fine_point_matching"] = fm

    batch_stats = {"fine_pe": pe_stats}
    return {"params": params, "batch_stats": batch_stats}


def convert_mae_vit(sd: Dict[str, np.ndarray], depth: int = 12):
    """MAE pretrain checkpoint ('model' dict, plain vit names) -> flax ViT
    tree for training init (reference feature_extraction.py:78-95)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    wrapped = {f"x.{k}": v for k, v in sd.items()}
    return convert_vit(wrapped, "x", depth)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy (handles gorilla's {'model': sd})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out
