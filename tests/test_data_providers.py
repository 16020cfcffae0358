"""BOP + MegaPose provider tests over synthesized mini datasets."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from sam6d_tpu.data.bop import (
    BOPTestScene, discover_test_scenes, load_bop_objects, PEMTestFrameLoader)
from sam6d_tpu.data.megapose import (
    MegaPoseDataset, color_augment, dilate_mask, random_rotation)
from sam6d_tpu.ops.masks import rle_encode_coco


def make_mini_bop(root, n_scenes=1, n_frames=2):
    for s in range(n_scenes):
        sd = root / "test" / f"{s:06d}"
        (sd / "rgb").mkdir(parents=True)
        (sd / "depth").mkdir()
        cams = {}
        for f in range(n_frames):
            rgb = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
            # near-planar depth: the object-radius outlier cut must keep points
            depth = (600 + np.random.rand(48, 64) * 5).astype(np.uint16)
            Image.fromarray(rgb).save(sd / "rgb" / f"{f:06d}.png")
            Image.fromarray(depth).save(sd / "depth" / f"{f:06d}.png")
            cams[str(f)] = {"cam_K": [60.0, 0, 32, 0, 60.0, 24, 0, 0, 1],
                            "depth_scale": 1.0}
        json.dump(cams, open(sd / "scene_camera.json", "w"))
    # models
    md = root / "models"
    md.mkdir()
    verts = np.array([[0, 0, 0], [20, 0, 0], [0, 20, 0], [0, 0, 20]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    with open(md / "obj_000001.ply", "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n")
        fh.write(b"element vertex 4\nproperty float x\nproperty float y\nproperty float z\n")
        fh.write(b"element face 4\nproperty list uchar int vertex_indices\nend_header\n")
        fh.write(verts.astype("<f4").tobytes())
        for face in faces:
            fh.write(np.uint8(3).tobytes() + face.astype("<i4").tobytes())
    json.dump({"1": {"diameter": 34.6}}, open(md / "models_info.json", "w"))


def test_bop_scene_reader(tmp_path):
    make_mini_bop(tmp_path)
    scenes = discover_test_scenes(str(tmp_path))
    assert len(scenes) == 1
    sc = scenes[0]
    assert sc.frame_ids() == [0, 1]
    fr = sc.load_frame(0)
    assert fr["rgb"].shape == (48, 64, 3)
    assert fr["depth"].shape == (48, 64)
    assert fr["K"][0, 0] == 60.0


def test_bop_objects_and_pem_loader(tmp_path):
    make_mini_bop(tmp_path)
    objs = load_bop_objects(str(tmp_path / "models"))
    assert len(objs) == 1 and objs[0].obj_id == 1
    pts = objs[0].sample_points(64)
    assert pts.shape == (64, 3) and np.abs(pts).max() < 0.05  # meters

    loader = PEMTestFrameLoader(objs, img_size=32, n_sample_observed=64,
                                minimum_n_point=8)
    sc = discover_test_scenes(str(tmp_path))[0]
    frame = sc.load_frame(0)
    m = np.zeros((48, 64), np.uint8)
    m[10:40, 20:50] = 1
    dets = [dict(scene_id=0, image_id=0, category_id=1, score=0.9,
                 segmentation=rle_encode_coco(m)),
            dict(scene_id=0, image_id=0, category_id=1, score=0.1,
                 segmentation=rle_encode_coco(m))]  # below seg filter
    grouped = loader.group_detections(dets)
    assert len(grouped[(0, 0)]) == 1
    from sam6d_tpu.ops.pointcloud import depth_to_pointcloud
    import jax.numpy as jnp
    whole = np.asarray(depth_to_pointcloud(
        jnp.asarray(frame["depth"] / 1000.0), jnp.asarray(frame["K"])))
    insts, kept = loader.assemble_instances(frame, grouped[(0, 0)], whole)
    assert len(insts) == 1
    assert insts[0]["pts"].shape == (64, 3)
    assert insts[0]["obj_idx"] == 0


def test_color_augment_and_dilate(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    out = color_augment(img, np.random.RandomState(0))
    assert out.shape == img.shape and out.dtype == np.uint8
    m = np.zeros((10, 10), bool)
    m[5, 5] = True
    d = dilate_mask(m, 2)
    assert d.sum() == 13  # manhattan ball radius 2


def test_random_rotation_orthonormal():
    R = random_rotation(np.random.RandomState(3))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.det(R) - 1) < 1e-6


def make_mini_megapose(root):
    web = root / "MegaPose-GSO" / "train_pbr_web"
    shard = web / "shard-000000"
    shard.mkdir(parents=True)
    json.dump({"k0": 0}, open(web / "key_to_shard.json", "w"))
    json.dump([{"obj_id": 0, "gso_id": "objA"}],
              open(web / "gso_models.json", "w"))
    # templates
    tdir = root / "MegaPose-GSO" / "templates" / "objA"
    tdir.mkdir(parents=True)
    for i in range(2):
        rgb = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
        m = np.zeros((64, 64), np.uint8)
        m[16:48, 16:48] = 255
        Image.fromarray(rgb).save(tdir / f"rgb_{i}.png")
        Image.fromarray(m).save(tdir / f"mask_{i}.png")
        np.save(tdir / f"xyz_{i}.npy",
                (np.random.rand(64, 64, 3).astype(np.float32) - 0.5) * 2)
    # one sample
    head = shard / "k0"
    rgb = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(str(head) + ".rgb.jpg")
    depth = (np.random.rand(48, 64) * 500 + 500).astype(np.uint16)
    Image.fromarray(depth).save(str(head) + ".depth.png")
    json.dump({"cam_K": [60.0, 0, 32, 0, 60.0, 24, 0, 0, 1],
               "depth_scale": 1.0}, open(str(head) + ".camera.json", "w"))
    json.dump([{"obj_id": 0, "cam_R_m2c": list(np.eye(3).reshape(-1)),
                "cam_t_m2c": [0, 0, 600.0]}], open(str(head) + ".gt.json", "w"))
    json.dump([{"px_count_valid": 1000, "visib_fract": 0.9}],
              open(str(head) + ".gt_info.json", "w"))
    # full-ish mask as uncompressed counts (list of dicts per instance)
    m = np.zeros((48, 64), np.uint8)
    m[10:40, 20:50] = 1
    from sam6d_tpu.ops.masks import mask_to_rle_counts
    json.dump([mask_to_rle_counts(m)], open(str(head) + ".mask_visib.json", "w"))


def test_megapose_dataset(tmp_path):
    make_mini_megapose(tmp_path)
    ds = MegaPoseDataset(str(tmp_path), img_size=32, n_sample_observed=64,
                         n_sample_template=100)
    assert len(ds) == 1
    s = ds.read_sample(ds.keys[0], np.random.RandomState(0))
    assert s is not None
    assert s["pts"].shape == (64, 3)
    assert s["rgb"].shape == (32, 32, 3)
    assert s["tem1_pts"].shape == (100, 3)
    # template pts carry the 0.1 scale (xyz in [-1,1] * 0.1, then rotated)
    assert np.abs(s["tem1_pts"]).max() <= 0.1 * np.sqrt(3) + 1e-5
    batch = ds.sample_batch(2, np.random.RandomState(1))
    assert batch["pts"].shape == (2, 64, 3)


def _make_mini_train_pbr(tmp_path, rng):
    from sam6d_tpu.render.poses import template_obj_poses
    sd = tmp_path / "train_pbr" / "000000"
    (sd / "rgb").mkdir(parents=True)
    (sd / "mask_visib").mkdir()
    poses = template_obj_poses(0)[:, :3, :3]
    gt, gt_info = {}, {}
    for i in range(6):
        rgb = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(sd / "rgb" / f"{i:06d}.jpg")
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 8:24] = 255
        Image.fromarray(m).save(sd / "mask_visib" / f"{i:06d}_000000.png")
        gt[str(i)] = [{"obj_id": 1,
                       "cam_R_m2c": list(poses[i * 7].reshape(-1).astype(float)),
                       "cam_t_m2c": [0, 0, 500]}]
        gt_info[str(i)] = [{"visib_fract": 0.95}]
    json.dump(gt, open(sd / "scene_gt.json", "w"))
    json.dump(gt_info, open(sd / "scene_gt_info.json", "w"))
    return poses


def test_pbr_template_miner(tmp_path, rng):
    from sam6d_tpu.data.bop_pbr import PBRTemplateMiner, rotation_geodesic
    poses = _make_mini_train_pbr(tmp_path, rng)

    miner = PBRTemplateMiner(str(tmp_path))
    mined = miner.mine()
    assert 1 in mined and len(mined[1]) == 42
    # the exact-match viewpoints must select their own candidates
    for i in range(6):
        rec = mined[1][i * 7]
        assert rec["im_id"] == i
    rgb, mask = miner.load_template_crop(mined[1][0])
    assert rgb.shape == (32, 32, 3) and mask.sum() > 0
    # geodesic distance sanity
    d = rotation_geodesic(poses[:2], poses[:2])
    assert d[0, 0] < 1e-4 and d[0, 1] > 0.1


def test_pbr_onboarding_flows_into_ism_pipeline(tmp_path, rng):
    """Full PBR onboarding path: mined train_pbr fixture -> descriptors in
    ISMPipeline.ref_data with an npz cache roundtrip (the reference's
    default BOP operating point, ISM_sam.yaml:28)."""
    import jax.numpy as jnp
    from sam6d_tpu.core.config import ISMConfig, DINOv2Config
    from sam6d_tpu.pipelines.ism import ISMPipeline

    _make_mini_train_pbr(tmp_path, rng)
    cfg = ISMConfig(dinov2=DINOv2Config(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        chunk_size=42))
    pipe = ISMPipeline(cfg)
    cache = str(tmp_path / "desc_pbr.npz")
    ref = pipe.onboard_bop_objects_pbr(str(tmp_path), [1], cache_path=cache)
    assert ref["descriptors"].shape == (1, 42, 32)
    assert ref["appe_descriptors"].shape == (1, 42, 4, 32)
    assert ref["poses_R"].shape == (42, 3, 3)
    first = np.asarray(ref["descriptors"]).copy()
    # cache roundtrip
    pipe2 = ISMPipeline(cfg)
    pipe2.dinov2_vars = jnp.asarray(0.0)  # would crash if recomputed
    ref2 = pipe2.onboard_bop_objects_pbr(str(tmp_path), [1], cache_path=cache)
    np.testing.assert_allclose(np.asarray(ref2["descriptors"]), first,
                               atol=1e-6)
