"""BOP eval drivers over the synthesized mini dataset with tiny models."""
import json
import os

import numpy as np
import pytest

from sam6d_tpu.pipelines.bop_eval import run_ism_bop_eval, run_pem_bop_eval
from sam6d_tpu.pipelines.ism import ISMPipeline
from sam6d_tpu.pipelines.pem import PEMPipeline
from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
from sam6d_tpu.data.bop import load_bop_objects
from sam6d_tpu.ops.masks import rle_encode_coco
from sam6d_tpu.eval.bop_writer import format_pose_row
from tests.test_data_providers import make_mini_bop
from tests.test_ism_pipeline import tiny_ism_cfg, tiny_sam_cfg
from tests.test_pem_pipeline import tiny_pem_cfg


def test_format_pose_row():
    row = format_pose_row(1, 2, 3, 0.5, np.eye(3), np.array([1.0, 2, 3]), 0.1)
    parts = row.split(",")
    assert parts[:4] == ["1", "2", "3", "0.5"]
    assert len(parts[4].split()) == 9 and len(parts[5].split()) == 3


@pytest.mark.slow
def test_bop_eval_end_to_end(tmp_path):
    make_mini_bop(tmp_path)
    objs = load_bop_objects(str(tmp_path / "models"))

    # render mini templates for the object with our rasterizer
    from sam6d_tpu.render.templates import render_templates
    tem_root = tmp_path / "templates" / "" / "obj_000001"
    from sam6d_tpu.data.mesh import load_ply
    mesh = objs[0].mesh
    render_templates(mesh, str(tmp_path / "tobj"), level=0, image_size=64)
    objs[0].template_dir = str(tmp_path / "tobj" / "templates")

    ism_cfg = tiny_ism_cfg()
    seg = SAMSegmentor(tiny_sam_cfg())
    ism = ISMPipeline(ism_cfg, segmentor=seg)
    ism.onboard_templates_from_dir(objs[0].template_dir)

    out_json = str(tmp_path / "ism_result.json")
    records = run_ism_bop_eval(ism, str(tmp_path), objs, out_json,
                               max_frames=1)
    assert os.path.exists(out_json)

    # synthesize detections if the random-weight ISM found none
    if not records:
        m = np.zeros((48, 64), np.uint8)
        m[10:40, 20:50] = 1
        records = [dict(scene_id=0, image_id=0, category_id=1, score=0.9,
                        bbox=[20, 10, 30, 30], time=0.1,
                        segmentation=rle_encode_coco(m))]

    pem_cfg = tiny_pem_cfg()
    import dataclasses
    pem_cfg = dataclasses.replace(pem_cfg, n_template_view=2,
                                  n_sample_template_point=100,
                                  n_sample_observed_point=pem_cfg.fine_npoint)
    pem = PEMPipeline(pem_cfg)
    out_csv = str(tmp_path / "pem_result.csv")
    rows = run_pem_bop_eval(pem, str(tmp_path), objs, records, out_csv,
                            chunk_size=4, max_frames=1)
    assert os.path.exists(out_csv)
    text = open(out_csv).read()
    assert text.startswith("scene_id,im_id,obj_id,score,R,t,time")
    if rows:
        assert len(rows[0].split(",")) == 7


def test_npz_roundtrip(tmp_path, rng):
    from sam6d_tpu.eval.bop_writer import save_detections_npz, convert_npz_to_json
    K = 4
    result = dict(
        valid=np.array([True, True, False, True]),
        boxes=rng.rand(K, 4).astype(np.float32) * 50,
        object_ids=np.array([0, 1, 0, 2]),
        scores=rng.rand(K).astype(np.float32),
        masks=(rng.rand(K, 24, 32) > 0.5).astype(np.float32),
    )
    result["boxes"][:, 2:] += 60
    p = str(tmp_path / "frame.npz")
    save_detections_npz(p, result, scene_id=3, frame_id=7, runtime=0.5)
    recs = convert_npz_to_json(p)
    assert len(recs) == 3
    assert recs[0]["scene_id"] == 3 and recs[0]["image_id"] == 7
    from sam6d_tpu.ops.masks import rle_decode_coco
    np.testing.assert_array_equal(
        rle_decode_coco(recs[0]["segmentation"]), result["masks"][0] > 0)


@pytest.mark.slow
def test_onboard_bop_objects_with_cache(tmp_path, rng):
    import jax.numpy as jnp
    from sam6d_tpu.pipelines.ism import ISMPipeline
    from sam6d_tpu.data.bop import BOPObject
    from sam6d_tpu.data.mesh import Mesh
    from PIL import Image
    from tests.test_ism_pipeline import tiny_ism_cfg

    tdir = tmp_path / "tem"
    tdir.mkdir()
    for i in range(3):
        rgb = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        m = np.zeros((48, 48), np.uint8)
        m[10:40, 10:40] = 255
        Image.fromarray(rgb).save(tdir / f"rgb_{i}.png")
        Image.fromarray(m).save(tdir / f"mask_{i}.png")
        np.save(tdir / f"xyz_{i}.npy", rng.rand(48, 48, 3).astype(np.float32))
    obj = BOPObject(1, Mesh(np.zeros((3, 3), np.float32),
                            np.zeros((1, 3), np.int32)), 30.0, False,
                    template_dir=str(tdir))
    pipe = ISMPipeline(tiny_ism_cfg())
    cache = str(tmp_path / "desc.npz")
    ref = pipe.onboard_bop_objects([obj], cache_path=cache, n_template_view=3)
    assert ref["descriptors"].shape[0] == 1
    assert os.path.exists(cache)
    # cache hit path
    pipe2 = ISMPipeline(tiny_ism_cfg())
    ref2 = pipe2.onboard_bop_objects([obj], cache_path=cache, n_template_view=3)
    np.testing.assert_allclose(np.asarray(ref2["descriptors"]),
                               np.asarray(ref["descriptors"]), atol=1e-6)


@pytest.mark.slow
def test_shard_merge_equals_single_run(tmp_path):
    """Two shards + merge == single-process run (the reference's PL-DDP
    rank-file merge contract, detector.py:425-462)."""
    from sam6d_tpu.pipelines.bop_eval import (merge_ism_shards, shard_path)

    make_mini_bop(tmp_path, n_frames=4)
    objs = load_bop_objects(str(tmp_path / "models"))
    from sam6d_tpu.render.templates import render_templates
    render_templates(objs[0].mesh, str(tmp_path / "tobj"), level=0,
                     image_size=64, views=[0, 1])
    objs[0].template_dir = str(tmp_path / "tobj" / "templates")

    ism_cfg = tiny_ism_cfg()
    seg = SAMSegmentor(tiny_sam_cfg(), seed=3)
    ism = ISMPipeline(ism_cfg, segmentor=seg, seed=3)
    ism.onboard_templates_from_dir(objs[0].template_dir, num_templates=2)

    single = str(tmp_path / "single.json")
    want = run_ism_bop_eval(ism, str(tmp_path), objs, single)

    sharded = str(tmp_path / "sharded.json")
    for r in range(2):
        run_ism_bop_eval(ism, str(tmp_path), objs, sharded,
                         shard=r, num_shards=2)
        assert os.path.exists(shard_path(sharded, r, 2))
    merged = merge_ism_shards(sharded, 2)

    def key(rec):
        return (rec["scene_id"], rec["image_id"], rec["category_id"],
                tuple(rec["bbox"]), round(rec["score"], 5))
    assert sorted(map(key, merged)) == sorted(map(key, want))


def test_golden_harness_pure_functions(tmp_path, rng):
    """Record/compare roundtrip + vis-footprint extraction (the verify-weights
    CLI's core, runnable without real checkpoints)."""
    from sam6d_tpu.eval.golden import (record_golden, compare_to_golden,
                                       extract_vis_footprint, footprint_checks,
                                       find_checkpoints)
    from PIL import Image

    masks = (rng.rand(3, 16, 16) > 0.6).astype(np.float32)
    ism = dict(masks=masks, valid=np.array([True, True, False]),
               scores=np.array([0.9, 0.5, 0.0], np.float32),
               object_ids=np.array([0, 0, 0]))
    pem = [dict(R=np.eye(3).ravel().tolist(), t=[1.0, 2.0, 500.0], score=0.8)]
    g = str(tmp_path / "golden.npz")
    record_golden(g, ism, pem)
    rep = compare_to_golden(g, ism, pem)
    assert rep["ok"], rep
    # perturbed pose fails the rotation tolerance
    import scipy.spatial.transform as st
    Rbad = st.Rotation.from_euler("z", 10, degrees=True).as_matrix()
    pem_bad = [dict(R=Rbad.ravel().tolist(), t=[1.0, 2.0, 500.0], score=0.8)]
    rep2 = compare_to_golden(g, ism, pem_bad)
    assert not rep2["ok"] and not rep2["checks"]["rot_deg_max"]["ok"]

    # vis footprint: overlay = rgb with a painted square
    rgb = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    vis = rgb.copy()
    vis[4:12, 4:12] = [255, 0, 0]
    Image.fromarray(rgb).save(tmp_path / "rgb.png")
    Image.fromarray(vis).save(tmp_path / "vis.png")
    fp = extract_vis_footprint(str(tmp_path / "vis.png"), str(tmp_path / "rgb.png"))
    assert fp[4:12, 4:12].mean() > 0.9 and fp.mean() < 0.5
    det = np.zeros((1, 16, 16), np.float32)
    det[0, 4:12, 4:12] = 1
    fc = footprint_checks(det, np.array([True]), fp)
    assert fc["best_containment"] > 0.9

    assert find_checkpoints(str(tmp_path))["sam"] is None
    open(tmp_path / "sam_vit_h_4b8939.pth", "w").write("x")
    assert find_checkpoints(str(tmp_path))["sam"] is not None
