"""Deployment export: serialize jitted programs to portable StableHLO.

TPU-native analogue of a torch -> ONNX deployment flow: the exported
artifact is a self-contained StableHLO module (weights baked in as
constants) that any later JAX runtime can deserialize and run on the
declared platforms without the model code or checkpoint files. Backed by
`jax.export` (versioned serialization with forward-compatibility
guarantees), which plays the role ONNX plays for the reference stack.

Typical use:

    data = export_pem_infer(cfg, variables, batch_size=16, path="pem.bin")
    ...
    runner = load_exported("pem.bin")
    out = runner(inputs, key)          # dict with pred_R / pred_t / score
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_fn(fn: Callable, example_args: Sequence[Any],
              platforms: Sequence[str] = ("tpu",)) -> bytes:
    """Trace + lower `fn` on `example_args` for each platform and serialize.

    `fn` must be jittable; captured arrays (e.g. model weights closed over)
    are baked into the artifact as constants, making it self-contained.
    """
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        *example_args)
    return exported.serialize()


def save_exported(data: bytes, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path_or_bytes) -> Callable:
    """Deserialize an exported artifact into a callable.

    Accepts a file path or raw bytes. The callable validates input shapes/
    dtypes against the export-time avals and runs via XLA on the current
    default platform (must be one of the export's declared platforms).
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exported = jax_export.deserialize(data)

    def runner(*args):
        return exported.call(*args)

    runner.in_avals = exported.in_avals
    runner.out_avals = exported.out_avals
    runner.platforms = exported.platforms
    return runner


def pem_example_inputs(cfg, batch_size: int, with_pe_o: bool = True
                       ) -> Dict[str, jnp.ndarray]:
    """Zero-filled inputs with the deployment shapes of PEMNet.infer
    (see PEMPipeline.run_frame for the production producer of each field)."""
    B, S, NF = batch_size, cfg.img_size, cfg.fine_npoint
    inputs = dict(
        rgb=jnp.zeros((B, S, S, 3), jnp.float32),
        rgb_choose=jnp.zeros((B, NF), jnp.int32),
        pts=jnp.zeros((B, NF, 3), jnp.float32),
        model=jnp.zeros((B, cfg.n_sample_model_point, 3), jnp.float32),
        dense_po=jnp.zeros((B, NF, 3), jnp.float32),
        dense_fo=jnp.zeros((B, NF, cfg.vit.out_dim), jnp.float32),
    )
    if with_pe_o:
        inputs["pe_o"] = jnp.zeros((B, NF, cfg.fine.hidden_dim), jnp.float32)
    return inputs


def export_pem_infer(cfg, variables, batch_size: int = 16,
                     path: str | None = None,
                     platforms: Sequence[str] = ("tpu",),
                     with_pe_o: bool = True, dtype=jnp.float32) -> bytes:
    """Export the full PEM inference program (flagship deployment artifact).

    The artifact takes (inputs, key) — `inputs` shaped like
    `pem_example_inputs(cfg, batch_size, with_pe_o)` — and returns the infer
    dict (init/pred R, t in the input unit, pred_pose_score). Weights from
    `variables` are baked in.
    """
    from ..models.pem import PEMNet

    net = PEMNet(cfg, dtype=dtype)

    def fn(inputs, key):
        return net.apply(variables, inputs, key)

    example = (pem_example_inputs(cfg, batch_size, with_pe_o),
               jax.random.PRNGKey(0))
    data = export_fn(fn, example, platforms=platforms)
    if path is not None:
        save_exported(data, path)
    return data


def export_sam_decode(cfg, variables, num_prompts: int = 1,
                      path: str | None = None,
                      platforms: Sequence[str] = ("tpu",),
                      dtype=jnp.float32) -> bytes:
    """Export the SAM prompt-encoder + mask-decoder program — the scope of
    the reference's ONNX deployment model (segment_anything/utils/onnx.py:17
    SamOnnxModel: image embedding in, point/box prompts + mask input in,
    masks + iou out).

    The artifact takes (embedding (g, g, 256), points (P, N, 2) input-frame
    pixel coords, labels (P, N), mask_input (P, 4g, 4g, 1), has_mask ())
    and returns (masks (P, K, 4g, 4g) row-major low-res logits, iou (P, K)).
    Box prompts enter as two labeled corner points (labels 2/3), exactly the
    reference onnx model's packing. `has_mask` multiplies the mask-input
    dense embedding against the no-mask embedding (the reference's
    has_mask_input scalar), so one artifact serves both cases.
    """
    from ..models.sam import PromptEncoder, MaskDecoder

    grid = cfg.img_size // cfg.patch_size
    C = cfg.prompt_embed_dim
    pe = PromptEncoder(embed_dim=C,
                       input_image_size=(cfg.img_size, cfg.img_size),
                       image_embedding_size=(grid, grid), dtype=dtype)
    dec = MaskDecoder(transformer_dim=C, block_layout=True, block_masks=True,
                      dtype=dtype)

    def fn(embedding, points, labels, mask_input, has_mask):
        dense_pe = pe.apply(variables["prompt_encoder"], method="dense_pe")
        # reference onnx packing: corner labels 2/3 ride the point path, so
        # embed sparse prompts with the point machinery (the padding point
        # is appended automatically, matching the AMG/predictor point path)
        sparse = pe.apply(variables["prompt_encoder"], points, labels,
                          method="embed_points")
        d_mask = pe.apply(variables["prompt_encoder"], mask_input,
                          method="embed_masks")
        d_none = pe.apply(variables["prompt_encoder"], method="no_mask_dense")
        dense = has_mask * d_mask[0] + (1.0 - has_mask) * d_none
        masks, iou = dec.apply(variables["mask_decoder"], embedding,
                               dense_pe, sparse, dense)
        P, K4, _ = masks.shape
        m = masks.reshape(P, K4 // 4, 2, 2, grid, grid, 2, 2)
        m = m.transpose(0, 1, 4, 6, 2, 5, 7, 3).reshape(
            P, K4 // 4, 4 * grid, 4 * grid)
        return m, iou

    example = (jnp.zeros((grid, grid, C), jnp.float32),
               jnp.zeros((num_prompts, 1, 2), jnp.float32),
               jnp.zeros((num_prompts, 1), jnp.int32),
               jnp.zeros((num_prompts, 4 * grid, 4 * grid, 1), jnp.float32),
               jnp.zeros((), jnp.float32))
    data = export_fn(fn, example, platforms=platforms)
    if path is not None:
        save_exported(data, path)
    return data


def export_dinov2_describe(cfg, variables, batch: int = 16,
                           path: str | None = None,
                           platforms: Sequence[str] = ("tpu",),
                           dtype=jnp.float32) -> bytes:
    """Export the DINOv2 descriptor program: normalized 224-crops in,
    (cls (B, C), patch (B, N, C)) descriptors out — the serving artifact
    for template onboarding / proposal description."""
    from ..models.dinov2 import DINOv2

    net = DINOv2(img_size=cfg.img_size, patch_size=cfg.patch_size,
                 embed_dim=cfg.embed_dim, depth=cfg.depth,
                 num_heads=cfg.num_heads, dtype=dtype)

    def fn(crops):
        return net.apply(variables, crops)

    example = (jnp.zeros((batch, cfg.img_size, cfg.img_size, 3), jnp.float32),)
    data = export_fn(fn, example, platforms=platforms)
    if path is not None:
        save_exported(data, path)
    return data
