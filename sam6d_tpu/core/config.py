"""Unified configuration tree for the whole pipeline.

The reference splits configuration across three systems (Hydra/OmegaConf for
ISM, gorilla yaml for PEM, argparse for the renderer — reference
`Instance_Segmentation_Model/configs/*`, `Pose_Estimation_Model/config/base.yaml`,
`Render/render_custom_templates.py:9-15`). Here a single frozen-dataclass tree
covers every stage; values default to the reference operating points.

Frozen dataclasses hash by value, so configs can be static args to `jax.jit`.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Tuple


def _replace(obj, **kw):
    return dataclasses.replace(obj, **kw)


# ---------------------------------------------------------------------------
# PEM (Pose Estimation Model) — reference config/base.yaml:16-54
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ViTConfig:
    """MAE-style ViT backbone (reference feature_extraction.py:50-57)."""
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    img_size: int = 224
    out_dim: int = 256            # per-pixel feature dim after upscaling
    use_pyramid_feat: bool = True  # concat features of 4 blocks
    up_type: str = "linear"        # 'linear' 16x pixel-shuffle + bilinear
    remat: bool = False            # gradient-checkpoint each scanned block
    use_flash: bool = False        # Pallas fused attention (inference only)
    unroll: bool = False           # flatten the block scan at lowering
    #   (training-memory lever: recompute block activations in the backward
    #   pass instead of storing all `depth` of them; no effect on inference)


@dataclass(frozen=True)
class GeoEmbeddingConfig:
    """GeoTransformer structure embedding (reference transformer.py:286-349)."""
    sigma_d: float = 0.2
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"
    hidden_dim: int = 256


@dataclass(frozen=True)
class PointMatchingConfig:
    """Shared knobs of coarse/fine matching heads (base.yaml:32-54)."""
    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    temp: float = 0.1
    sim_type: str = "cosine"
    normalize_feat: bool = True
    loss_dis_thres: float = 0.15
    num_heads: int = 4
    # coarse only
    nproposal1: int = 6000
    nproposal2: int = 300
    # fine only
    pe_radius1: float = 0.1
    pe_radius2: float = 0.2
    pe_nsample1: int = 32
    pe_nsample2: int = 64
    focusing_factor: int = 3
    unroll: bool = False           # flatten the block scan at lowering


@dataclass(frozen=True)
class PEMConfig:
    coarse_npoint: int = 196
    fine_npoint: int = 2048
    vit: ViTConfig = field(default_factory=ViTConfig)
    geo_embedding: GeoEmbeddingConfig = field(default_factory=GeoEmbeddingConfig)
    coarse: PointMatchingConfig = field(default_factory=PointMatchingConfig)
    fine: PointMatchingConfig = field(default_factory=PointMatchingConfig)
    # test-time data knobs (base.yaml:80-92)
    img_size: int = 224
    n_sample_observed_point: int = 2048
    n_sample_model_point: int = 1024
    n_sample_template_point: int = 5000
    n_template_view: int = 42
    seg_filter_score: float = 0.25
    minimum_n_point: int = 8
    rgb_mask_flag: bool = True
    dis_thres: float = 0.15       # fine pose-score inlier threshold


# ---------------------------------------------------------------------------
# ISM (Instance Segmentation Model) — reference configs/model/ISM_sam.yaml
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SAMConfig:
    """SAM ViT image encoder + AMG (reference build_sam.py:55-107,
    configs/model/segmentor_model/sam.yaml)."""
    model_type: str = "vit_h"
    encoder_embed_dim: int = 1280
    encoder_depth: int = 32
    encoder_num_heads: int = 16
    encoder_global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    img_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    prompt_embed_dim: int = 256
    # automatic mask generation
    points_per_side: int = 32
    points_per_batch: int = 128     # decode chunk (reference GPU used 64)
    pred_iou_thresh: float = 0.88
    stability_score_thresh: float = 0.85
    stability_score_offset: float = 1.0
    box_nms_thresh: float = 0.7
    # host-side small-region cleanup (reference automatic_mask_generator.py
    # :323-372); 0 disables — the reference operating point
    # (min_mask_region_area: 0) never runs it, but it ships it
    min_mask_region_area: int = 0
    # crop cascade (reference automatic_mask_generator.py:196-264): layer i
    # adds (2^i)^2 overlapping crops, each run through the full AMG with a
    # per-layer point grid, merged by cross-crop NMS preferring smaller
    # crops. 0 (the reference operating point) = single full-image crop.
    crop_n_layers: int = 0
    crop_overlap_ratio: float = 512 / 1500
    crop_n_points_downscale_factor: int = 1
    crop_nms_thresh: float = 0.7
    segmentor_width_size: int = 640  # pre-resize width (model/sam.py:107-119)
    max_proposals: int = 512         # fixed capacity of surviving proposals
    # AMG pre-rank capacity: a cheap frozen-image decode pass ranks all
    # grid prompts, then only the top amg_prerank prompts get the exact
    # (image<-token coupled) decode + scoring. 0 (default) disables — the
    # full grid decodes exactly. Measured on v5e, the full-grid program
    # runs at the same wall time as the preranked one (XLA schedules the
    # long-trip-count decode loop at ~47 us/prompt while mid-size loops
    # hit a ~2x scheduling pathology), so the approximation buys nothing
    # at the 32x32 operating point; the knob remains for larger grids.
    amg_prerank: int = 0
    # keep encoder activations window-partitioned ACROSS blocks: the
    # per-block pad+6D-transpose (un)partition pairs collapse to one pair
    # per global block; pad tokens are re-zeroed post-norm1 by a static
    # mask, reproducing the reference's per-block zero re-pad exactly
    # (models/sam.py _ScanSAMBlock carry_windows; probe segi)
    encoder_carry_windows: bool = False
    amg_rank_chunk: int = 1024       # prompts per chunk in the rank pass
    # EXACT iou-prefix pass: score every grid prompt's predicted IoU with
    # the factored two-way transformer (token outputs exact, no (B, N, C)
    # image tensor, no mask tail — probe amgs: 52.7 ms for all 1024
    # points), then run the full decode + stability/boxes only on the top
    # ceil(max_proposals * factor / points_per_batch) chunks of points by
    # max-channel IoU. Same truncation argument as amg_nms_topk: greedy
    # NMS keep decisions depend only on higher-IoU candidates, so outputs
    # are identical to the full decode whenever the NMS-relevant prefix
    # lies within the selected points (factor 1.0 = one point per output
    # slot = 3x the capacity in candidates). Candidates that pass the IoU
    # threshold but fail stability consume prefix slots; the candidate
    # margin absorbs that. 0 = off (full-grid exact decode). Measured
    # v5e at capacity 128: seg 221.7 -> 140.8 ms (factor 1.0 = 128
    # points) / 162.7 (factor 2.0 = 256 points), probe seg.fused_prefix*.
    # The margin assumption is stress-tested: zero kept-mask divergence vs
    # the full decode across an adversarial battery (NMS-cascade, active
    # stability filter, constant texture-free images) at this exact 3x
    # margin ratio — tests/test_amg_truncation_stress.py + the
    # SAMSegmentor.truncation_divergence counter (round 5); on frames
    # where the assumption DID break, that counter measures it.
    amg_iou_prefix_factor: float = 1.0
    # NMS truncation: greedy NMS processes candidates in score order and a
    # candidate's keep decision depends only on HIGHER-scored candidates,
    # so running it on the top-T score prefix reproduces the full run's
    # decisions for that prefix exactly; only candidates ranked > T can no
    # longer be selected (irrelevant at max_proposals << T). Caps the
    # sequential NMS loop and the (T, T) IoU matrix. 0 = no truncation.
    amg_nms_topk: int = 3072
    # (round-4 measurements deleted two staged knobs: NMS unroll-rounds —
    # amgz.unroll12_while 214.7 vs while 214.6 ms, no effect, the while
    # fixed point stays; encoder scan unrolling — seg.fused_unroll 227.9
    # vs fused_scan 228.0 ms, no effect, the 32-block nn.scan stays)


@dataclass(frozen=True)
class DINOv2Config:
    """Frozen descriptor model (reference model/dinov2.py:14-19,44-87)."""
    model_name: str = "dinov2_vitl14"
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    img_size: int = 224
    # describe chunk: 16 measured best on v5e at BOTH the full-capacity
    # (202.9 vs 217.1 ms at 128) and typical (78.4 vs 111.4 ms at 48
    # valid) operating points — the adaptive trip count quantizes to
    # ceil(n_valid/chunk) chunks, so smaller chunks waste fewer crops
    # (the reference also uses 16, for GPU memory reasons)
    chunk_size: int = 16
    # unroll the adaptive describe chunk loop: Python-unrolled chunks each
    # gated by lax.cond instead of one lax.while_loop — same outputs.
    # Measured on v5e (round 4): 204.2 (unrolled) vs 218.6 ms (while) at
    # capacity 128, flat at 48 valid — the while_loop with a DINOv2-forward
    # body pays the scan-coexistence tax in the fused scoring program
    adaptive_unroll: bool = True
    descriptor_width_size: int = 640
    validity_thresh: float = 0.5    # patch validity via avgpool(mask) > 0.5


@dataclass(frozen=True)
class ISMMatchingConfig:
    """Scoring config (reference configs/model/ISM_sam.yaml matching section)."""
    aggregation_function: str = "avg_5"
    confidence_thresh: float = 0.2
    visible_thred: float = 0.5
    pointcloud_sample_num: int = 2048


@dataclass(frozen=True)
class ISMPostProcessConfig:
    """post_processing_config (ISM_sam.yaml): size filters + NMS."""
    min_box_size: float = 0.05      # relative to image width
    min_mask_size: float = 3e-4     # relative to image area
    nms_thresh: float = 0.25


@dataclass(frozen=True)
class ISMConfig:
    segmentor: str = "sam"          # 'sam' | 'fastsam'
    sam: SAMConfig = field(default_factory=SAMConfig)
    dinov2: DINOv2Config = field(default_factory=DINOv2Config)
    matching: ISMMatchingConfig = field(default_factory=ISMMatchingConfig)
    post: ISMPostProcessConfig = field(default_factory=ISMPostProcessConfig)
    template_level: int = 0         # 42 views
    max_detections: int = 64        # fixed capacity after scoring/NMS


# ---------------------------------------------------------------------------
# Training (reference config/base.yaml:3-13, 58-77, 102-105)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    betas: Tuple[float, float] = (0.5, 0.999)
    eps: float = 1e-6
    weight_decay: float = 0.0
    max_iters: int = 600_000
    warmup_iters: int = 1000
    warmup_factor: float = 1e-3
    batch_size: int = 28
    epochs: int = 15
    loss_clamp: float = 100.0
    seed: int = 1
    log_every: int = 50
    checkpoint_every: int = 10_000


@dataclass(frozen=True)
class RenderConfig:
    """Offline template rendering (reference Render/render_custom_templates.py)."""
    n_views: int = 42
    template_level: int = 0
    image_size: int = 512  # Blender default render resolution
    normalize_to_unit_sphere: bool = True


@dataclass(frozen=True)
class Config:
    """Root config."""
    ism: ISMConfig = field(default_factory=ISMConfig)
    pem: PEMConfig = field(default_factory=PEMConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    dtype: str = "float32"          # compute dtype for model forward passes

    replace = _replace


def default_config() -> Config:
    return Config()
