"""The three-stage demo pipeline (reference SAM-6D/demo.sh) in one process.

render templates -> ISM (proposals + matching) -> PEM (pose) with all stages
sharing one runtime — the reference chains three OS processes through files
(SURVEY §3.1); here the file outputs (detection_ism.json / detection_pem.json
/ vis images) are kept as the public contract but the compute path stays on
device end-to-end.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.config import Config
from ..data.mesh import load_ply
from ..render.templates import render_templates
from ..pipelines.sam_amg import SAMSegmentor
from ..pipelines.ism import ISMPipeline, detections_to_bop_json
from ..pipelines.pem import PEMPipeline
from ..eval.vis import draw_pose_bbox, draw_detections_masks, side_by_side


def run_demo(
    cfg: Config,
    cad_path: str,
    rgb_path: str,
    depth_path: str,
    cam_path: str,
    output_dir: str,
    ism_variables: Optional[Dict] = None,
    sam_variables: Optional[Dict] = None,
    pem_variables: Optional[Dict] = None,
    det_score_thresh: float = 0.2,
    skip_render: bool = False,
    stability_score_thresh: Optional[float] = None,
) -> Dict:
    """Full demo; writes the reference demo.sh output contract under
    `output_dir` and returns the PEM results."""
    os.makedirs(os.path.join(output_dir, "sam6d_results"), exist_ok=True)
    cam = json.load(open(cam_path))
    K = np.array(cam["cam_K"], np.float32).reshape(3, 3)
    depth_scale = float(cam.get("depth_scale", 1.0))
    rgb = np.array(Image.open(rgb_path).convert("RGB"))
    depth = np.array(Image.open(depth_path)).astype(np.float32)
    mesh = load_ply(cad_path)

    # stage 1: offline templates
    tdir = os.path.join(output_dir, "templates")
    if not skip_render or not os.path.isdir(tdir):
        render_templates(mesh, output_dir, level=cfg.ism.template_level,
                         image_size=cfg.render.image_size)

    # stage 2: ISM
    if cfg.ism.segmentor == "fastsam":
        from .fastsam import FastSAMSegmentor, FastSAMConfig
        segmentor = FastSAMSegmentor(FastSAMConfig(), variables=sam_variables)
    else:
        sam_cfg = cfg.ism.sam
        if stability_score_thresh is not None:
            import dataclasses
            sam_cfg = dataclasses.replace(
                sam_cfg, stability_score_thresh=stability_score_thresh)
        segmentor = SAMSegmentor(sam_cfg, variables=sam_variables)
    ism = ISMPipeline(cfg.ism, dinov2_variables=ism_variables,
                      segmentor=segmentor)
    ism.onboard_templates_from_dir(tdir)

    model_points_ism = mesh.sample(
        cfg.ism.matching.pointcloud_sample_num, np.random.RandomState(0)
    ).astype(np.float32) / 1000.0

    t0 = time.time()
    # reference custom demo: no size filters, no per-object NMS
    result = ism.match_frame(rgb, depth, K, depth_scale,
                             jnp.asarray(model_points_ism[None]),
                             apply_size_filters=False)
    ism_runtime = time.time() - t0
    records = detections_to_bop_json(result, runtime=ism_runtime)
    seg_path = os.path.join(output_dir, "sam6d_results", "detection_ism.json")
    with open(seg_path, "w") as f:
        json.dump(records, f)
    vis = draw_detections_masks(rgb, result["masks"], result["valid"])
    Image.fromarray(side_by_side(rgb, vis)).save(
        os.path.join(output_dir, "sam6d_results", "vis_ism.png"))

    # stage 3: PEM
    pem = PEMPipeline(cfg.pem, params=pem_variables)
    model_points = mesh.sample(cfg.pem.n_sample_model_point,
                               np.random.RandomState(0)).astype(np.float32) / 1000.0
    tem = pem.load_template_views(tdir)
    templates = pem.onboard_templates(tem)
    results, _ = pem.run_frame(rgb, depth, K, depth_scale, records,
                               model_points, templates, det_score_thresh)
    out_path = os.path.join(output_dir, "sam6d_results", "detection_pem.json")
    with open(out_path, "w") as f:
        json.dump(results, f)

    if results:
        best = max(results, key=lambda r: r["score"])
        vis_pem = draw_pose_bbox(rgb, np.array(best["R"]), np.array(best["t"]),
                                 model_points * 1000.0, K)
        Image.fromarray(side_by_side(rgb, vis_pem)).save(
            os.path.join(output_dir, "sam6d_results", "vis_pem.png"))
    return dict(ism=records, pem=results, ism_result=result)
