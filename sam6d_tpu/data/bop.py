"""BOP dataset readers (test-time).

Parity targets: reference `Instance_Segmentation_Model/provider/base_bop.py`
(:31-178 scene discovery + metadata), `provider/bop.py` (BaseBOPTest query
frames), `Pose_Estimation_Model/provider/bop_test_dataset.py` (:24-208
per-instance assembly from ISM detections) and `utils/bop_object_utils.py`
(:16-117 CAD + template bundles).

Pure-python/numpy; the device work happens in the pipelines.
"""
from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from .mesh import Mesh, load_ply
from .preprocess import prepare_instance, prepare_template
from ..ops.masks import rle_decode_coco

# BOP test split names (reference run_inference.py / test_bop.py)
BOP_DATASETS = ["lmo", "tless", "tudl", "icbin", "itodd", "hb", "ycbv"]


def load_scene_camera(path: str) -> Dict[int, Dict]:
    data = json.load(open(path))
    return {int(k): v for k, v in data.items()}


def frame_paths(scene_dir: str, im_id: int) -> Dict[str, str]:
    """rgb/depth file paths with the reference's fallbacks (jpg/png rgb,
    png/tif depth, itodd gray)."""
    out = {}
    for sub, exts in [("rgb", ["png", "jpg"]), ("gray", ["tif"]),
                      ("depth", ["png", "tif"])]:
        for e in exts:
            p = os.path.join(scene_dir, sub, f"{im_id:06d}.{e}")
            if os.path.exists(p):
                key = "rgb" if sub in ("rgb", "gray") else "depth"
                out.setdefault(key, p)
    return out


@dataclass
class BOPTestScene:
    """One scene directory: scene_camera + frame enumeration."""
    scene_dir: str

    def __post_init__(self):
        self.scene_id = int(os.path.basename(self.scene_dir))
        self.cameras = load_scene_camera(
            os.path.join(self.scene_dir, "scene_camera.json"))

    def frame_ids(self) -> List[int]:
        return sorted(self.cameras.keys())

    def load_frame(self, im_id: int):
        cam = self.cameras[im_id]
        paths = frame_paths(self.scene_dir, im_id)
        rgb = np.array(Image.open(paths["rgb"]).convert("RGB"))
        depth = np.array(Image.open(paths["depth"])).astype(np.float32)
        K = np.array(cam["cam_K"], np.float32).reshape(3, 3)
        return dict(rgb=rgb, depth=depth, K=K,
                    depth_scale=float(cam.get("depth_scale", 1.0)),
                    scene_id=self.scene_id, im_id=im_id)


def discover_test_scenes(dataset_dir: str, split: str = "test") -> List[BOPTestScene]:
    """All scene dirs of `{dataset_dir}/{split}*` (reference base_bop.py
    load_list_scene)."""
    dirs = sorted(glob.glob(os.path.join(dataset_dir, f"{split}*", "*")))
    return [BOPTestScene(d) for d in dirs if os.path.isdir(d)]


# ----------------------------------------------------------------- objects

@dataclass
class BOPObject:
    """CAD + sampled points + diameter + templates for one object
    (reference bop_object_utils.Obj)."""
    obj_id: int
    mesh: Mesh
    diameter: float
    symmetric: bool
    template_dir: Optional[str] = None
    model_points: Optional[np.ndarray] = None

    def sample_points(self, n: int, seed: int = 0) -> np.ndarray:
        """Surface samples in meters (reference divides mm by 1000)."""
        if self.model_points is None or len(self.model_points) != n:
            self.model_points = self.mesh.sample(
                n, np.random.RandomState(seed)).astype(np.float32) / 1000.0
        return self.model_points

    def load_template(self, view: int):
        """(rgb uint8, mask bool, xyz float32 meters) for one view
        (reference Obj._get_template: xyz / 1000)."""
        d = self.template_dir
        rgb = np.array(Image.open(os.path.join(d, f"rgb_{view}.png")).convert("RGB"))
        mask = np.array(Image.open(os.path.join(d, f"mask_{view}.png")))
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = mask == 255
        xyz = np.load(os.path.join(d, f"xyz_{view}.npy")).astype(np.float32) / 1000.0
        return rgb, mask, xyz


def load_bop_objects(models_dir: str, template_root: Optional[str] = None,
                     dataset_name: str = "") -> List[BOPObject]:
    """All objects of a BOP models dir with models_info.json metadata."""
    info = json.load(open(os.path.join(models_dir, "models_info.json")))
    objs = []
    for key in sorted(info.keys(), key=int):
        meta = info[key]
        obj_id = int(key)
        mesh = load_ply(os.path.join(models_dir, f"obj_{obj_id:06d}.ply"))
        sym = ("symmetries_continuous" in meta) or ("symmetries_discrete" in meta)
        tdir = None
        if template_root is not None:
            tdir = os.path.join(template_root, dataset_name, f"obj_{obj_id:06d}")
        objs.append(BOPObject(obj_id, mesh, float(meta["diameter"]), sym, tdir))
    return objs


# -------------------------------------------------------- PEM test assembly

@dataclass
class PEMTestFrameLoader:
    """Groups ISM detections per frame and assembles PEM instance batches
    (reference bop_test_dataset.BOPTestset :24-162)."""
    objects: List[BOPObject]
    img_size: int = 224
    n_sample_observed: int = 2048
    n_sample_template: int = 5000
    n_template_view: int = 42
    seg_filter_score: float = 0.25
    minimum_n_point: int = 8
    rgb_mask_flag: bool = True
    obj_id_to_idx: Dict[int, int] = field(init=False)

    def __post_init__(self):
        self.obj_id_to_idx = {o.obj_id: i for i, o in enumerate(self.objects)}

    def group_detections(self, detections: List[Dict]) -> Dict[Tuple[int, int], List[Dict]]:
        """scene/image key -> filtered detections (score > seg_filter)."""
        out: Dict[Tuple[int, int], List[Dict]] = {}
        for det in detections:
            if det["score"] < self.seg_filter_score:
                continue
            key = (int(det["scene_id"]), int(det["image_id"]))
            out.setdefault(key, []).append(det)
        return out

    def assemble_instances(self, frame: Dict, dets: List[Dict],
                           whole_pts: np.ndarray, rng=None):
        """Per-instance crops/clouds for one frame. Returns (instances,
        kept detections); instance dicts carry obj_idx for template lookup."""
        rng = rng or np.random.RandomState(0)
        insts, kept = [], []
        for det in dets:
            obj_idx = self.obj_id_to_idx.get(int(det["category_id"]))
            if obj_idx is None:
                continue
            obj = self.objects[obj_idx]
            mask = rle_decode_coco(det["segmentation"])
            mask = np.logical_and(mask > 0, frame["depth"] > 0)
            if mask.sum() <= self.minimum_n_point:
                continue
            radius = float(np.linalg.norm(
                obj.sample_points(1024), axis=1).max())
            inst = prepare_instance(
                frame["rgb"], whole_pts, mask, radius, self.img_size,
                self.n_sample_observed, rng, rgb_mask_flag=self.rgb_mask_flag)
            if inst is None:
                continue
            inst["obj_idx"] = obj_idx
            insts.append(inst)
            kept.append(det)
        return insts, kept

    def template_views(self, obj: BOPObject, rng=None):
        """All template views of one object, preprocessed (reference
        _get_template :164-187)."""
        rng = rng or np.random.RandomState(2)
        total = len(glob.glob(os.path.join(obj.template_dir, "rgb_*.png")))
        views = []
        for v in range(self.n_template_view):
            i = int(total / self.n_template_view * v)
            rgb, mask, xyz = obj.load_template(i)
            views.append(prepare_template(rgb, mask, xyz, self.img_size,
                                          self.n_sample_template, rng,
                                          rgb_mask_flag=self.rgb_mask_flag))
        return dict(
            rgb=np.stack([v["rgb"] for v in views]),
            choose=np.stack([v["choose"] for v in views]),
            pts=np.stack([v["pts"] for v in views]),
        )
