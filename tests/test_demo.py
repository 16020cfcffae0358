"""Full three-stage demo on the committed example frame with tiny models.

Covers the complete public contract of demo.sh: template rendering ->
detection_ism.json -> detection_pem.json + vis images."""
import dataclasses
import json
import os

import numpy as np
import pytest

from sam6d_tpu.core.config import Config, RenderConfig
from sam6d_tpu.pipelines.demo import run_demo
from tests.test_ism_pipeline import tiny_ism_cfg
from tests.test_pem_pipeline import tiny_pem_cfg

EXAMPLE = "/root/reference/SAM-6D/Data/Example"


@pytest.mark.slow
def test_run_demo_end_to_end(tmp_path):
    ism = tiny_ism_cfg()
    # keep everything through the filters so random weights still produce
    # detections for the plumbing check
    ism = dataclasses.replace(
        ism, post=dataclasses.replace(ism.post, min_box_size=0.0,
                                      min_mask_size=0.0))
    cfg = Config(ism=ism, pem=tiny_pem_cfg(),
                 render=RenderConfig(image_size=96))
    results = run_demo(
        cfg,
        cad_path=os.path.join(EXAMPLE, "obj_000005.ply"),
        rgb_path=os.path.join(EXAMPLE, "rgb.png"),
        depth_path=os.path.join(EXAMPLE, "depth.png"),
        cam_path=os.path.join(EXAMPLE, "camera.json"),
        output_dir=str(tmp_path),
        det_score_thresh=-1.0,
    )
    res_dir = tmp_path / "sam6d_results"
    assert (res_dir / "detection_ism.json").exists()
    assert (res_dir / "vis_ism.png").exists()
    assert (res_dir / "detection_pem.json").exists()
    assert (tmp_path / "templates" / "rgb_41.png").exists()

    ism_recs = json.load(open(res_dir / "detection_ism.json"))
    assert len(ism_recs) >= 1
    for r in ism_recs:
        assert {"scene_id", "image_id", "category_id", "bbox", "score",
                "segmentation"} <= set(r)

    if results["pem"]:
        assert (res_dir / "vis_pem.png").exists()
        r = results["pem"][0]
        R = np.array(r["R"])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-2)
