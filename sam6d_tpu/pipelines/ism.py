"""ISM pipeline: segment-anything proposals + DINOv2 template matching.

Functional equivalent of reference `Instance_Segmentation_Model/model/detector.py`
(Instance_Segmentation_Model.test_step :324-423) and the custom-image path
(`run_inference_custom.py:95-215`), re-architected for TPU: the descriptor
forward and all three scores run as one jitted program over the fixed
proposal capacity; filtering is a validity mask, not index shuffling.
"""
from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.config import ISMConfig
from ..models.dinov2 import DINOv2, masked_patch_descriptors
from ..models import ism_scoring
from ..ops.images import (crop_resize_pad_nearest,
                          masked_crop_resize_pad_nearest, normalize_imagenet)
from ..ops.masks import box_iou, nms_masked, rle_encode_coco
from ..render.poses import template_obj_poses
from .sam_amg import SAMSegmentor


class ISMPipeline:
    def __init__(self, cfg: ISMConfig, dinov2_variables=None,
                 segmentor: Optional[SAMSegmentor] = None, seed: int = 0,
                 dtype=jnp.float32):
        self.cfg = cfg
        d = cfg.dinov2
        # token-layout fused attention (kernels/flash_attention.py
        # fused_attention_qkv): reads the qkv projection verbatim, heads
        # sliced in VMEM — measured 123.8 vs 130.6 ms/128-crop describe
        # against the einsum chain (probe dinok, round 5). The earlier
        # head-major kernels LOST here (277 vs 217 round 2; -15 ms round
        # 4) because of their (B,H,N,hd) HBM transposes.
        use_flash = (jax.default_backend() == "tpu"
                     and dtype == jnp.bfloat16)
        # ln_folded: block LN affines live inside the qkv/fc1 weights
        # (fold_ln_affine below) — exact re-association, drops the
        # per-token gamma/beta elementwise passes
        self.dinov2 = DINOv2(img_size=d.img_size, patch_size=d.patch_size,
                             embed_dim=d.embed_dim, depth=d.depth,
                             num_heads=d.num_heads, use_flash=use_flash,
                             ln_folded=use_flash, dtype=dtype)
        if dinov2_variables is None:
            dinov2_variables = self.dinov2.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, d.img_size, d.img_size, 3)))
        elif dinov2_variables == "eval_shape":
            shapes = jax.eval_shape(
                lambda: self.dinov2.init(
                    jax.random.PRNGKey(seed),
                    jnp.zeros((1, d.img_size, d.img_size, 3))))
            dinov2_variables = jax.tree.map(
                lambda sh: jnp.full(sh.shape, 0.01, sh.dtype), shapes)
        if self.dinov2.ln_folded:
            from ..models.dinov2 import fold_ln_affine
            dinov2_variables = fold_ln_affine(dinov2_variables)
        if dtype == jnp.bfloat16:
            from ..core.params import cast_float_params
            dinov2_variables = cast_float_params(dinov2_variables, dtype)
        self.dinov2_vars = dinov2_variables
        self.segmentor = segmentor
        self.ref_data: Dict[str, jnp.ndarray] = {}
        # variables are explicit args of every jit (closures would embed
        # the DINOv2-L weights as compile-time constants)
        self._describe = jax.jit(self._describe_impl)
        self._describe_templates = jax.jit(self._describe_templates_impl)
        self._score_frame = jax.jit(
            self._score_frame_impl,
            static_argnames=("apply_nms", "apply_size_filters"))

    # ------------------------------------------------------------- internals

    def _dino_forward_chunked(self, v, images, n_needed=None):
        """(N, S, S, 3) -> (cls (N, C), patch (N, P, C)); N % chunk == 0.

        `n_needed` (device scalar): only the first ceil(n_needed/chunk)
        chunks are described (a lax.while_loop with a data-dependent trip
        count — zero host syncs); the rest stay zero. The AMG emits valid
        proposals as a score-sorted PREFIX of the capacity buffer, so at
        realistic loads (tens of detections vs capacity 128) this cuts the
        dominant DINOv2-L cost proportionally, exactly like the reference
        whose describe cost scales with its dynamic detection count.
        Untouched slots produce zero descriptors, which the downstream
        scoring already masks via `valid`."""
        chunk = self.cfg.dinov2.chunk_size
        N = images.shape[0]
        if N <= chunk:
            return self.dinov2.apply(v, images)
        pad = (-N) % chunk
        if pad:
            images = jnp.concatenate(
                [images, jnp.broadcast_to(images[:1], (pad, *images.shape[1:]))])
        xs = images.reshape(-1, chunk, *images.shape[1:])
        n_chunks = xs.shape[0]
        if n_needed is None:
            cls, patch = jax.lax.map(
                lambda x: self.dinov2.apply(v, x), xs)
        elif self.cfg.dinov2.adaptive_unroll:
            # Python-unrolled chunks, each gated by lax.cond: identical
            # outputs to the while_loop below, but no loop construct with
            # a model-forward body in the fused program
            shapes = jax.eval_shape(lambda x: self.dinov2.apply(v, x), xs[0])
            cls_l, patch_l = [], []
            for c in range(n_chunks):
                cc, pc = jax.lax.cond(
                    n_needed.astype(jnp.int32) > c * chunk,
                    lambda x: self.dinov2.apply(v, x),
                    lambda x: (jnp.zeros(shapes[0].shape, shapes[0].dtype),
                               jnp.zeros(shapes[1].shape, shapes[1].dtype)),
                    xs[c])
                cls_l.append(cc)
                patch_l.append(pc)
            cls = jnp.stack(cls_l)
            patch = jnp.stack(patch_l)
        else:
            trips = jnp.minimum(
                (n_needed.astype(jnp.int32) + chunk - 1) // chunk, n_chunks)
            shapes = jax.eval_shape(lambda x: self.dinov2.apply(v, x), xs[0])
            cls0 = jnp.zeros((n_chunks, *shapes[0].shape), shapes[0].dtype)
            patch0 = jnp.zeros((n_chunks, *shapes[1].shape), shapes[1].dtype)

            def body(state):
                i, cls_b, patch_b = state
                c, p = self.dinov2.apply(v, jax.lax.dynamic_index_in_dim(
                    xs, i, axis=0, keepdims=False))
                return (i + 1,
                        jax.lax.dynamic_update_index_in_dim(cls_b, c, i, 0),
                        jax.lax.dynamic_update_index_in_dim(patch_b, p, i, 0))

            _, cls, patch = jax.lax.while_loop(
                lambda s: s[0] < trips, body, (jnp.int32(0), cls0, patch0))
        cls = cls.reshape(-1, cls.shape[-1])[:N]
        patch = patch.reshape(-1, *patch.shape[2:])[:N]
        return cls, patch

    def _describe_impl(self, v, rgb01, masks, boxes, n_needed=None):
        """Query proposals -> (cls descriptors, masked patch descriptors).

        rgb01: (H, W, 3) float in [0,1]; masks: (K, H, W) float; boxes (K, 4).
        Matches CustomDINOv2.forward (model/dinov2.py:227-258): imagenet
        normalize, mask, crop-resize-pad 224, patch validity via avgpool.
        `n_needed`: optional device scalar bounding how many leading
        proposals actually need descriptors (see _dino_forward_chunked).
        """
        d = self.cfg.dinov2
        rgb = normalize_imagenet(rgb01)
        # fused masked-crop gather: the (K, H, W, 3) masked-image stack is
        # never materialized (it is ~470 MB at capacity 128)
        crops, mask_crops = masked_crop_resize_pad_nearest(
            rgb, masks, boxes, d.img_size)
        cls, patch = self._dino_forward_chunked(v, crops, n_needed)
        patch = masked_patch_descriptors(patch, mask_crops, d.patch_size,
                                         d.validity_thresh)
        return cls, patch

    def _describe_templates_impl(self, v, images, masks):
        """Template stacks (T, S, S, 3) already cropped/padded + their mask
        crops -> (cls (T, C), patch (T, P, C))."""
        cls, patch = self._dino_forward_chunked(v, images)
        patch = masked_patch_descriptors(patch, masks, self.cfg.dinov2.patch_size,
                                         self.cfg.dinov2.validity_thresh)
        return cls, patch

    # ------------------------------------------------------------ onboarding

    def onboard_templates_from_dir(self, template_dir: str, num_templates: int = 42,
                                   poses: Optional[np.ndarray] = None):
        """Demo-style onboarding (run_inference_custom.py:126-160): per view
        rgb*mask / 255 (NOTE: the reference demo path skips ImageNet
        normalization for templates — replicated), CropResizePad 224.
        `poses`: (T, 4, 4) object poses of the views; defaults to the
        canonical level-0 icosphere poses of this framework's renderer.
        """
        rgbs, masks, boxes = [], [], []
        for i in range(num_templates):
            rgb = np.array(Image.open(
                os.path.join(template_dir, f"rgb_{i}.png")).convert("RGB"),
                np.float32) / 255.0
            m = np.array(Image.open(
                os.path.join(template_dir, f"mask_{i}.png")).convert("L"),
                np.float32) / 255.0
            ys, xs = np.where(m > 0)
            boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
            rgbs.append(rgb * m[:, :, None])
            masks.append(m)
        rgbs = jnp.asarray(np.stack(rgbs))
        masks = jnp.asarray(np.stack(masks))
        boxes = jnp.asarray(np.array(boxes, np.float32))
        S = self.cfg.dinov2.img_size
        crops = jax.vmap(lambda img, b: crop_resize_pad_nearest(img, b[None], S)[0])(
            rgbs, boxes)
        mask_crops = jax.vmap(
            lambda m, b: crop_resize_pad_nearest(m[..., None], b[None], S)[0, ..., 0])(
            masks, boxes)
        cls, patch = self._describe_templates(self.dinov2_vars, crops, mask_crops)
        if poses is None:
            poses = template_obj_poses(0)
        self.ref_data = {
            "descriptors": cls[None],        # (1 object, T, C)
            "appe_descriptors": patch[None],  # (1, T, P, C)
            "poses_R": jnp.asarray(poses[:, :3, :3].astype(np.float32)),
        }
        return self.ref_data

    def set_reference_data(self, descriptors, appe_descriptors, poses_R,
                           pointclouds=None):
        """BOP-style onboarding with precomputed descriptors
        (detector.set_reference_objects)."""
        self.ref_data = dict(descriptors=descriptors,
                             appe_descriptors=appe_descriptors,
                             poses_R=poses_R)
        if pointclouds is not None:
            self.ref_data["pointcloud"] = pointclouds

    def _describe_template_stack(self, rgbs, masks, boxes, normalize: bool):
        """Masked template views -> (cls, patch) descriptors. `normalize`
        applies the ImageNet transform to the CROPS (the reference BOP
        providers normalize after CropResizePad — bop.py:43-46,80 — so the
        zero background becomes -mean/std exactly as torch does; the custom
        demo path skips it)."""
        S = self.cfg.dinov2.img_size
        crops = jax.vmap(lambda im, b: crop_resize_pad_nearest(im, b[None], S)[0])(
            rgbs, boxes)
        mask_crops = jax.vmap(
            lambda m, b: crop_resize_pad_nearest(m[..., None], b[None], S)[0, ..., 0])(
            masks, boxes)
        if normalize:
            crops = normalize_imagenet(crops)
        return self._describe_templates(self.dinov2_vars, crops, mask_crops)

    def _finish_onboarding(self, all_cls, all_patch, poses, cache_path):
        from ..core.checkpoint import save_template_cache

        if poses is None:
            poses = template_obj_poses(0)
        self.set_reference_data(
            jnp.stack(all_cls), jnp.stack(all_patch),
            jnp.asarray(poses[:, :3, :3].astype(np.float32)))
        if cache_path:
            save_template_cache(
                cache_path,
                descriptors=self.ref_data["descriptors"],
                appe_descriptors=self.ref_data["appe_descriptors"],
                poses_R=self.ref_data["poses_R"])
        return self.ref_data

    def _load_onboarding_cache(self, cache_path, reset_descriptors):
        from ..core.checkpoint import load_template_cache

        if cache_path and not reset_descriptors:
            cached = load_template_cache(cache_path)
            if cached is not None:
                self.set_reference_data(
                    jnp.asarray(cached["descriptors"]),
                    jnp.asarray(cached["appe_descriptors"]),
                    jnp.asarray(cached["poses_R"]))
                return self.ref_data
        return None

    def onboard_bop_objects(self, objects, cache_path: Optional[str] = None,
                            n_template_view: int = 42,
                            reset_descriptors: bool = False,
                            poses: Optional[np.ndarray] = None,
                            normalize: bool = True):
        """Onboard all objects of a BOP dataset from their rendered template
        dirs, with an npz cache (reference detector.set_reference_objects
        :65-134 caches descriptors.pth/descriptors_appe.pth beside the
        templates; `reset_descriptors` invalidates)."""
        cached = self._load_onboarding_cache(cache_path, reset_descriptors)
        if cached is not None:
            return cached

        all_cls, all_patch = [], []
        for obj in objects:
            rgbs, masks, boxes = [], [], []
            for v in range(n_template_view):
                rgb, mask, _ = obj.load_template(v)
                ys, xs = np.where(mask)
                boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
                rgbs.append(rgb.astype(np.float32) / 255.0 * mask[..., None])
                masks.append(mask.astype(np.float32))
            cls, patch = self._describe_template_stack(
                jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(masks)),
                jnp.asarray(np.array(boxes, np.float32)), normalize)
            all_cls.append(cls)
            all_patch.append(patch)
        return self._finish_onboarding(all_cls, all_patch, poses, cache_path)

    def onboard_bop_objects_pbr(self, dataset_dir: str, obj_ids,
                                cache_path: Optional[str] = None,
                                reset_descriptors: bool = False,
                                level: int = 0,
                                poses: Optional[np.ndarray] = None):
        """PBR onboarding: mine real train_pbr crops nearest to the template
        viewpoints instead of rendered templates — the reference's DEFAULT
        BOP operating point (configs/model/ISM_sam.yaml:28 `rendering_type:
        pbr` -> provider/bop_pbr.py:28-248). Per object: visib_fract > 0.8
        candidates, geodesic-nearest per level-0 viewpoint, masked RGB,
        tight mask bbox, CropResizePad, ImageNet normalize."""
        from ..data.bop_pbr import PBRTemplateMiner

        cached = self._load_onboarding_cache(cache_path, reset_descriptors)
        if cached is not None:
            return cached

        miner = PBRTemplateMiner(dataset_dir, level=level)
        mined = miner.mine(list(obj_ids))
        all_cls, all_patch = [], []
        for obj_id in obj_ids:
            records = mined[obj_id]
            rgbs, masks, boxes = [], [], []
            for rec in records:
                masked, mask = miner.load_template_crop(rec)
                ys, xs = np.where(mask)
                boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
                rgbs.append(masked.astype(np.float32) / 255.0)
                masks.append(mask.astype(np.float32))
            cls, patch = self._describe_template_stack(
                jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(masks)),
                jnp.asarray(np.array(boxes, np.float32)), normalize=True)
            all_cls.append(cls)
            all_patch.append(patch)
        return self._finish_onboarding(all_cls, all_patch, poses, cache_path)

    # -------------------------------------------------------------- matching

    def _score_frame_impl(self, v, rgb01, masks, boxes, valid, depth, K,
                          depth_scale, ref_desc, ref_appe_all, poses_R_all,
                          pointclouds, apply_nms: bool,
                          apply_size_filters: bool = True):
        """Fused per-frame matching: size filters, descriptors, all three
        scores, fusion, optional per-object NMS — one device program."""
        cfg = self.cfg
        if rgb01.dtype == jnp.uint8:
            # serving path uploads the raw uint8 frame (0.9 MB vs 3.7 MB
            # fp32) and converts on device — same fp32 arithmetic
            rgb01 = rgb01.astype(jnp.float32) / 255.0
        H, W = rgb01.shape[:2]
        img_area = H * W
        if apply_size_filters:
            # size filters (detector remove_very_small_detections,
            # utils.py:96-105) — applied in BOP mode; the reference custom
            # demo path skips them (run_inference_custom.py)
            box_areas = ((boxes[:, 2] - boxes[:, 0])
                         * (boxes[:, 3] - boxes[:, 1])) / img_area
            mask_areas = jnp.sum(masks.astype(jnp.float32),
                                 axis=(1, 2)) / img_area
            valid = valid & (box_areas > cfg.post.min_box_size ** 2)
            valid = valid & (mask_areas > cfg.post.min_mask_size)

        # describe only as many leading slots as contain valid proposals
        # (the AMG emits them as a score-sorted prefix): index of the last
        # valid slot + 1, 0 when none
        K_cap = valid.shape[0]
        rev_any = jnp.any(valid)
        last = K_cap - 1 - jnp.argmax(valid[::-1])
        n_needed = jnp.where(rev_any, last + 1, 0)
        cls_desc, patch_desc = self._describe_impl(
            v, rgb01, masks, boxes.astype(jnp.int32), n_needed)

        sem = ism_scoring.semantic_scores(
            cls_desc, ref_desc, valid,
            cfg.matching.aggregation_function, cfg.matching.confidence_thresh)
        selected = sem["selected"]
        obj_idx = sem["object_idx"]
        best_template = sem["best_template"]

        ref_appe = ref_appe_all[obj_idx, best_template]
        appe = ism_scoring.appearance_scores(patch_desc, ref_appe)
        vis = ism_scoring.visible_ratio(patch_desc, ref_appe,
                                        cfg.matching.visible_thred)

        # poses_R_all: (T,3,3) shared across objects, or (O,T,3,3) when
        # objects were onboarded with differing template pose sets
        if poses_R_all.ndim == 4:
            poses_R = poses_R_all[obj_idx, best_template]
        else:
            poses_R = poses_R_all[best_template]
        pcs = pointclouds[obj_idx]
        geo = ism_scoring.geometric_scores(
            boxes, masks, depth, K, depth_scale, poses_R, pcs)

        final = ism_scoring.final_scores(sem["score"], appe, geo, vis)

        if apply_nms:
            iou_mat = box_iou(boxes, boxes)
            same = obj_idx[:, None] == obj_idx[None, :]
            keep = nms_masked(iou_mat, final, selected, same,
                              cfg.post.nms_thresh)
            selected = selected & keep

        return dict(scores=final, object_ids=obj_idx, valid=selected,
                    semantic_score=sem["score"], appe_score=appe,
                    geometric_score=geo, visible_ratio=vis,
                    best_template=best_template)

    def match_frame_device(
        self,
        rgb: np.ndarray,
        depth: np.ndarray,
        K: np.ndarray,
        depth_scale: float,
        pointclouds: jnp.ndarray,
        detections: Optional[Dict] = None,
        apply_nms_per_object: bool = False,
        apply_size_filters: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Device-resident per-frame matching: segmentor (2 dispatches) +
        one fused scoring dispatch. Returns device arrays."""
        if detections is None:
            dev = self.segmentor.generate_masks_device(rgb)
            H0, W0 = dev["orig_size"]
            hs, ws = dev["seg_size"]
            # keep masks in their device bool storage (39 MB at capacity
            # 128) — an eager fp32 cast materializes 157 MB and costs an
            # extra dispatch; consumers cast lazily inside fused ops
            masks = dev["masks"]
            boxes = dev["boxes"]
            if (H0, W0) != (hs, ws):
                masks = masks.astype(jnp.float32)
                from .sam_amg import bilinear_matrix
                My = jnp.asarray(bilinear_matrix(H0, hs))
                Mx = jnp.asarray(bilinear_matrix(W0, ws))
                masks = self.segmentor._resize_logits(masks, My, Mx)
                boxes = boxes * (W0 / ws)
                boxes = jnp.concatenate([
                    jnp.clip(boxes[:, 0:1], 0, W0 - 1),
                    jnp.clip(boxes[:, 1:2], 0, H0 - 1),
                    jnp.clip(boxes[:, 2:3], 0, W0 - 1),
                    jnp.clip(boxes[:, 3:4], 0, H0 - 1)], axis=1)
            valid = dev["valid"]
        else:
            masks = jnp.asarray(detections["masks"], jnp.float32)
            boxes = jnp.asarray(detections["boxes"], jnp.float32)
            valid = jnp.asarray(detections["valid"])

        rgb01 = jnp.asarray(rgb if rgb.dtype == np.uint8
                            else rgb.astype(np.float32) / 255.0)
        out = self._score_frame(
            self.dinov2_vars, rgb01, masks, boxes, valid,
            jnp.asarray(depth.astype(np.float32)),
            jnp.asarray(K.astype(np.float32)),
            jnp.asarray(np.float32(depth_scale)),
            self.ref_data["descriptors"], self.ref_data["appe_descriptors"],
            self.ref_data["poses_R"], pointclouds,
            apply_nms=apply_nms_per_object,
            apply_size_filters=apply_size_filters)
        out["masks"] = masks
        out["boxes"] = boxes
        # one packed (K, 12) row per proposal so the host tail pulls a
        # SINGLE small array: each device->host sync costs ~25 ms through
        # the tunnel and the unpacked dict has 8 of them (bench e2e
        # host-tail breakdown, round 5). Column order documented in
        # streaming.complete_frame (the consumer).
        out["packed"] = jnp.concatenate([
            out["scores"].astype(jnp.float32)[:, None],
            out["object_ids"].astype(jnp.float32)[:, None],
            out["valid"].astype(jnp.float32)[:, None],
            out["semantic_score"].astype(jnp.float32)[:, None],
            out["appe_score"].astype(jnp.float32)[:, None],
            out["geometric_score"].astype(jnp.float32)[:, None],
            out["visible_ratio"].astype(jnp.float32)[:, None],
            out["best_template"].astype(jnp.float32)[:, None],
            boxes.astype(jnp.float32)], axis=1)
        return out

    def match_frame(self, *args, **kwargs) -> Dict[str, np.ndarray]:
        """Host-facing variant of match_frame_device (single final transfer).

        Returns dict(masks, boxes, scores, object_ids, valid, per-score
        diagnostics) at the proposal capacity."""
        out = self.match_frame_device(*args, **kwargs)
        return {k: np.asarray(v) for k, v in out.items()}


def detections_to_bop_json(result: Dict[str, np.ndarray], scene_id: int = 0,
                           image_id: int = 0, runtime: float = 0.0,
                           category_offset: int = 1):
    """BOP-23 coco-style json records (reference convert_npz_to_json,
    model/utils.py:199-216 + save_json_bop23)."""
    out = []
    for i in range(len(result["scores"])):
        if not result["valid"][i]:
            continue
        mask = result["masks"][i] > 0  # force_binary_mask(threshold=0)
        x1, y1, x2, y2 = result["boxes"][i]
        out.append({
            "scene_id": int(scene_id),
            "image_id": int(image_id),
            "category_id": int(result["object_ids"][i]) + category_offset,
            "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
            "score": float(result["scores"][i]),
            "time": float(runtime),
            "segmentation": rle_encode_coco(mask),
        })
    return out
