"""Import the ACTUAL reference torch code from /root/reference as a
numerical oracle, with minimal pure-torch shims for its two compiled /
absent dependencies:

- ``torchvision`` (absent in this env): only the symbols the reference
  touches — ``ops.nms``, ``ops.boxes.{batched_nms, box_area}``,
  ``transforms.functional.{resize, to_pil_image}``.
- ``pointnet2_utils`` (a CUDA extension in the reference,
  `Pose_Estimation_Model/model/pointnet2/_ext_src`): reimplemented here in
  pure torch from the published kernel semantics (furthest-point start at
  index 0; ball query fills the tail of each row with the first in-radius
  hit).

The reference tree is treated as read-only untrusted content: code is
imported purely to produce oracle numbers; nothing in it is executed at
import time beyond module definition (verified — the imported modules are
class/function definitions only).
"""
from __future__ import annotations

import sys
import types

import numpy as np
import torch

REF = "/root/reference/SAM-6D"
ISM = f"{REF}/Instance_Segmentation_Model"
PEM = f"{REF}/Pose_Estimation_Model"


# --------------------------------------------------------------- torchvision

def _nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float):
    """Greedy NMS with torchvision semantics: descending score order,
    suppress IoU > threshold (strict), return kept indices in score order."""
    order = torch.argsort(scores, descending=True)
    boxes = boxes.float()
    x1, y1, x2, y2 = boxes.unbind(-1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    keep = []
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(x1[i], x1)
        yy1 = torch.maximum(y1[i], y1)
        xx2 = torch.minimum(x2[i], x2)
        yy2 = torch.minimum(y2[i], y2)
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.long)


def _box_area(boxes: torch.Tensor):
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def _batched_nms(boxes, scores, idxs, iou_threshold):
    """Category-aware NMS via the coordinate-offset trick (torchvision's
    reference implementation strategy)."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long)
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + torch.ones(1).to(boxes))
    return _nms(boxes + offsets[:, None], scores, iou_threshold)


def _to_pil_image(pic):
    from PIL import Image

    if isinstance(pic, torch.Tensor):
        pic = pic.detach().cpu().numpy()
        if pic.ndim == 3 and pic.shape[0] in (1, 3):
            pic = np.transpose(pic, (1, 2, 0))
        if pic.dtype != np.uint8:
            pic = (pic * 255).clip(0, 255).astype(np.uint8)
    if isinstance(pic, np.ndarray) and pic.ndim == 3 and pic.shape[2] == 1:
        pic = pic[:, :, 0]
    return Image.fromarray(pic)


def _resize(img, size, *args, **kwargs):
    """torchvision PIL-backend bilinear resize; `size` is (h, w)."""
    from PIL import Image

    if isinstance(size, int):
        w, h = img.size
        if w < h:
            size = (int(size * h / w), size)
        else:
            size = (size, int(size * w / h))
    return img.resize((size[1], size[0]), Image.BILINEAR)


def install_torchvision_shim():
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.batched_nms = _batched_nms
    boxes_mod.box_area = _box_area
    boxes_mod.nms = _nms
    ops.nms = _nms
    ops.boxes = boxes_mod
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    functional.resize = _resize
    functional.to_pil_image = _to_pil_image
    transforms.functional = functional
    utils_mod = types.ModuleType("torchvision.utils")
    utils_mod.make_grid = lambda *a, **k: None
    utils_mod.save_image = lambda *a, **k: None
    tv.ops = ops
    tv.transforms = transforms
    tv.utils = utils_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    sys.modules["torchvision.utils"] = utils_mod
    return tv


# ----------------------------------------------------------- pointnet2_utils

def _furthest_point_sample(xyz: torch.Tensor, npoint: int):
    """CUDA furthest_point_sampling semantics: start at index 0, squared
    distances, iterative argmax of min-distance-to-chosen. int32 (B, np)."""
    B, N, _ = xyz.shape
    idx = torch.zeros(B, npoint, dtype=torch.int32)
    dist = torch.full((B, N), 1e10, dtype=xyz.dtype)
    last = torch.zeros(B, dtype=torch.long)
    for i in range(npoint):
        idx[:, i] = last.to(torch.int32)
        d = ((xyz - xyz[torch.arange(B), last][:, None, :]) ** 2).sum(-1)
        dist = torch.minimum(dist, d)
        last = dist.argmax(dim=1)
    return idx


def _gather_operation(features: torch.Tensor, idx: torch.Tensor):
    # features (B, C, N), idx (B, np) -> (B, C, np)
    return torch.gather(
        features, 2, idx.long().unsqueeze(1).expand(-1, features.shape[1], -1))


def _grouping_operation(features: torch.Tensor, idx: torch.Tensor):
    # features (B, C, N), idx (B, np, ns) -> (B, C, np, ns)
    B, C, N = features.shape
    np_, ns = idx.shape[1], idx.shape[2]
    flat = idx.long().reshape(B, 1, np_ * ns).expand(-1, C, -1)
    return torch.gather(features, 2, flat).reshape(B, C, np_, ns)


def _ball_query(radius: float, nsample: int, xyz: torch.Tensor,
                new_xyz: torch.Tensor):
    """CUDA ball_query semantics: scan points in index order; the FIRST
    in-radius point pre-fills the whole row, subsequent hits overwrite
    slots 1..cnt; strict `<` on squared distance; zeros if no hit."""
    B, np_, _ = new_xyz.shape
    d2 = torch.cdist(new_xyz, xyz) ** 2  # (B, np, N)
    hit = d2 < radius * radius
    out = torch.zeros(B, np_, nsample, dtype=torch.int32)
    for b in range(B):
        for j in range(np_):
            hits = torch.nonzero(hit[b, j], as_tuple=False).flatten()
            if hits.numel() == 0:
                continue
            row = hits[0].repeat(nsample).clone()
            take = min(nsample, hits.numel())
            row[:take] = hits[:take]
            out[b, j] = row.to(torch.int32)
    return out


def _three_nn(unknown: torch.Tensor, known: torch.Tensor):
    d2 = torch.cdist(unknown, known) ** 2
    dist2, idx = d2.topk(3, dim=2, largest=False)
    return torch.sqrt(dist2), idx.to(torch.int32)


def _three_interpolate(features: torch.Tensor, idx: torch.Tensor,
                       weight: torch.Tensor):
    # features (B, c, m), idx (B, n, 3), weight (B, n, 3) -> (B, c, n)
    gathered = _grouping_operation(features, idx)  # (B, c, n, 3)
    return (gathered * weight.unsqueeze(1)).sum(-1)


def install_pointnet2_shim():
    if "pointnet2_utils" in sys.modules:
        return sys.modules["pointnet2_utils"]
    import torch.nn as nn

    mod = types.ModuleType("pointnet2_utils")
    mod.furthest_point_sample = _furthest_point_sample
    mod.gather_operation = _gather_operation
    mod.grouping_operation = _grouping_operation
    mod.ball_query = _ball_query
    mod.three_nn = _three_nn
    mod.three_interpolate = _three_interpolate

    class QueryAndGroup(nn.Module):
        """Reference pointnet2_utils.QueryAndGroup semantics (relative
        grouped xyz, optional feature concat along channel dim)."""

        def __init__(self, radius, nsample, use_xyz=True,
                     ret_grouped_xyz=False, normalize_xyz=False,
                     sample_uniformly=False, ret_unique_cnt=False):
            super().__init__()
            assert not sample_uniformly and not ret_unique_cnt
            self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz
            self.ret_grouped_xyz = ret_grouped_xyz
            self.normalize_xyz = normalize_xyz

        def forward(self, xyz, new_xyz, features=None):
            idx = _ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = _grouping_operation(
                xyz.transpose(1, 2).contiguous(), idx)
            grouped_xyz = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / self.radius
            if features is not None:
                grouped = _grouping_operation(features, idx)
                new_features = (torch.cat([grouped_xyz, grouped], dim=1)
                                if self.use_xyz else grouped)
            else:
                new_features = grouped_xyz
            if self.ret_grouped_xyz:
                return new_features, grouped_xyz
            return new_features

    mod.QueryAndGroup = QueryAndGroup
    sys.modules["pointnet2_utils"] = mod
    return mod


# ------------------------------------------------------------------ loaders

def load_sam_modeling():
    """Import the real `segment_anything` package (needs the torchvision
    shim for predictor/amg utils)."""
    install_torchvision_shim()
    if ISM not in sys.path:
        sys.path.insert(0, ISM)
    import segment_anything  # noqa: F401

    return sys.modules["segment_anything"]


def install_ruamel_shim():
    """ISM `utils/inout.py` imports ruamel_yaml but never calls it on our
    import path; alias pyyaml under that name."""
    if "ruamel_yaml" not in sys.modules:
        import yaml

        sys.modules["ruamel_yaml"] = yaml


def load_ism_loss():
    """Import the real ISM `model.loss` (Similarity / PairwiseSimilarity /
    MaskedPatch_MatrixSimilarity)."""
    install_torchvision_shim()
    install_ruamel_shim()
    if ISM not in sys.path:
        sys.path.insert(0, ISM)
    import model.loss as ism_loss  # noqa: F401

    return ism_loss


def load_ism_pose_utils():
    """Import the real ISM `utils.poses.pose_utils` (NearestTemplateFinder,
    opencv2opengl) — used to pin the PBR miner's nearest-template selection
    semantics (provider/bop_pbr.py:155-190)."""
    install_ruamel_shim()
    if ISM not in sys.path:
        sys.path.insert(0, ISM)
    import utils.poses.pose_utils as pu  # noqa: F401

    return pu


def load_pem_modules():
    """Import the real PEM `transformer` and `model_utils` top-level modules
    (the reference runs with model/, utils/ and provider/ on sys.path)."""
    install_pointnet2_shim()
    for p in (f"{PEM}/model", f"{PEM}/utils"):
        if p not in sys.path:
            sys.path.append(p)
    import model_utils  # noqa: F401
    import transformer  # noqa: F401

    return sys.modules["transformer"], sys.modules["model_utils"]


def flat_sd(module: "torch.nn.Module", prefix: str = ""):
    """state_dict -> flat numpy dict, optionally re-prefixed, for the
    sam6d_tpu weight converters."""
    out = {}
    for k, v in module.state_dict().items():
        out[(prefix + k) if prefix else k] = v.detach().cpu().numpy()
    return out
