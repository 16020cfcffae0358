"""Checkpoint downloaders (reference download_sam.py / download_fastsam.py /
download_dinov2.py / download_sam6d-pem.py). urllib-based; converts to the
flax format on request."""
from __future__ import annotations

import os
import urllib.request

CHECKPOINT_URLS = {
    "sam_vit_h": "https://dl.fbaipublicfiles.com/segment_anything/sam_vit_h_4b8939.pth",
    "sam_vit_l": "https://dl.fbaipublicfiles.com/segment_anything/sam_vit_l_0b3195.pth",
    "sam_vit_b": "https://dl.fbaipublicfiles.com/segment_anything/sam_vit_b_01ec64.pth",
    "dinov2_vitl14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitl14/dinov2_vitl14_pretrain.pth",
    "mae_vit_base": "https://dl.fbaipublicfiles.com/mae/pretrain/mae_pretrain_vit_base.pth",
    # FastSAM-x and sam-6d-pem are hosted on Google Drive by the authors;
    # use the reference's gdown ids if direct URLs are unavailable.
}


def download(name: str, checkpoint_dir: str = "checkpoints") -> str:
    url = CHECKPOINT_URLS[name]
    os.makedirs(checkpoint_dir, exist_ok=True)
    dst = os.path.join(checkpoint_dir, os.path.basename(url))
    if not os.path.exists(dst):
        urllib.request.urlretrieve(url, dst)  # noqa: S310
    return dst


def load_converted(name: str, checkpoint_dir: str = "checkpoints"):
    """Download (if needed) + convert to flax variables."""
    from .convert_pem import load_torch_checkpoint
    path = download(name, checkpoint_dir)
    sd = load_torch_checkpoint(path)
    if name.startswith("sam_"):
        from .convert_sam import convert_sam_state_dict
        depth = {"sam_vit_h": 32, "sam_vit_l": 24, "sam_vit_b": 12}[name]
        return convert_sam_state_dict(sd, depth=depth)
    if name.startswith("dinov2"):
        from .convert_dinov2 import convert_dinov2_state_dict
        return convert_dinov2_state_dict(sd)
    if name.startswith("mae"):
        from .convert_pem import convert_mae_vit
        return convert_mae_vit(sd)
    raise KeyError(name)
