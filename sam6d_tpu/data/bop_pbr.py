"""PBR onboarding: mine real train_pbr crops as templates.

Parity target: reference `Instance_Segmentation_Model/provider/bop_pbr.py`
(BOPTemplatePBR :28-248): for each object, scan the train_pbr split's
ground truth, keep instances with visib_fract > 0.8, subsample candidates,
and for each of the 42 level-0 template viewpoints pick the crop whose GT
VIEWING DIRECTION is nearest to that viewpoint's; the masked RGB crop then
serves as the template image for descriptor onboarding.

Nearest-template metric (reference `utils/poses/pose_utils.py:285-296`
search_nearest_query): Euclidean distance between the OpenGL-converted
poses' third rows `opencv2opengl(P)[2, :3]` — i.e. the camera viewing axis
expressed in object coordinates. The OpenCV->OpenGL conversion negates that
row for BOTH query and template, so distances equal those between the raw
third rotation rows; in-plane rotation about the viewing axis is ignored
(two crops seeing the object from the same direction but rolled differently
are equally "near"). This differs from full-rotation geodesic distance,
which would penalize in-plane rotation.

One deliberate divergence: the reference subsamples candidates with
`np.random.choice(idx, 5000)` (WITH replacement, unseeded, even when fewer
than 5000 candidates exist — provider/bop_pbr.py:180); this miner samples
without replacement, only when the pool exceeds `max_candidates`, and with
a fixed seed, so mining is deterministic and never duplicates crops.
"""
from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from .preprocess import get_bbox_square
from ..render.poses import template_obj_poses


def rotation_geodesic(Ra: np.ndarray, Rb: np.ndarray) -> np.ndarray:
    """Batched geodesic distance between (N,3,3) and (M,3,3) -> (N,M)."""
    tr = np.einsum("nij,mij->nm", Ra, Rb)
    cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.arccos(cos)


def viewing_direction_distance(Ra: np.ndarray, Rb: np.ndarray) -> np.ndarray:
    """Euclidean distance between the viewing directions (third rotation
    rows) of (N,3,3) and (M,3,3) -> (N,M). Matches the reference
    search_nearest_query metric (pose_utils.py:285-296): both sides pass
    through opencv2opengl, which negates the third row identically, so raw
    rows give the same distances. In-plane rotation is ignored."""
    va = Ra[:, 2, :]
    vb = Rb[:, 2, :]
    d2 = (np.sum(va * va, -1)[:, None] + np.sum(vb * vb, -1)[None, :]
          - 2.0 * va @ vb.T)
    return np.sqrt(np.maximum(d2, 0.0))


@dataclass
class PBRTemplateMiner:
    """Scans a train_pbr split and assembles per-object template sets."""
    dataset_dir: str
    level: int = 0
    min_visib_fract: float = 0.8
    max_candidates: int = 5000
    seed: int = 2021

    def _scan_scene(self, scene_dir: str, per_obj: Dict[int, List]):
        gt = json.load(open(os.path.join(scene_dir, "scene_gt.json")))
        gt_info_path = os.path.join(scene_dir, "scene_gt_info.json")
        gt_info = json.load(open(gt_info_path)) if os.path.exists(gt_info_path) else {}
        for im_id, instances in gt.items():
            infos = gt_info.get(im_id, [{}] * len(instances))
            for inst_idx, (inst, info) in enumerate(zip(instances, infos)):
                if info.get("visib_fract", 1.0) <= self.min_visib_fract:
                    continue
                per_obj.setdefault(int(inst["obj_id"]), []).append(dict(
                    scene_dir=scene_dir, im_id=int(im_id), inst_idx=inst_idx,
                    R=np.array(inst["cam_R_m2c"], np.float32).reshape(3, 3)))

    def mine(self, obj_ids: Optional[List[int]] = None
             ) -> Dict[int, List[Dict]]:
        """For each object: one candidate record per template viewpoint
        (nearest GT viewing direction, in-plane ignored — the reference
        search_nearest_query selection)."""
        rng = np.random.RandomState(self.seed)
        per_obj: Dict[int, List] = {}
        for scene_dir in sorted(glob.glob(
                os.path.join(self.dataset_dir, "train_pbr", "*"))):
            if os.path.isdir(scene_dir):
                self._scan_scene(scene_dir, per_obj)

        template_R = template_obj_poses(self.level)[:, :3, :3]
        out: Dict[int, List[Dict]] = {}
        for obj_id, cands in per_obj.items():
            if obj_ids is not None and obj_id not in obj_ids:
                continue
            if len(cands) > self.max_candidates:
                idx = rng.choice(len(cands), self.max_candidates, replace=False)
                cands = [cands[i] for i in idx]
            Rs = np.stack([c["R"] for c in cands])
            d = viewing_direction_distance(template_R.astype(np.float32), Rs)
            nearest = d.argmin(axis=1)
            out[obj_id] = [cands[i] for i in nearest]
        return out

    def load_template_crop(self, record: Dict, image_size: int = 224
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """(masked rgb uint8 crop, mask) for one mined record (reference
        composites the visib mask onto the rgb before CropResizePad)."""
        sd = record["scene_dir"]
        im_id = record["im_id"]
        rgb = None
        for ext in ["jpg", "png"]:
            p = os.path.join(sd, "rgb", f"{im_id:06d}.{ext}")
            if os.path.exists(p):
                rgb = np.array(Image.open(p).convert("RGB"))
                break
        mask_p = os.path.join(sd, "mask_visib",
                              f"{im_id:06d}_{record['inst_idx']:06d}.png")
        mask = np.array(Image.open(mask_p)) > 0
        masked = rgb * mask[..., None].astype(np.uint8)
        return masked, mask
