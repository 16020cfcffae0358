"""CLI argument surface (cli/main.py, mirroring the reference demo.sh flags)
and result visualization (eval/vis.py, reference draw_utils.py:5-97)."""
import numpy as np
import pytest

from sam6d_tpu.cli.main import build_parser
from sam6d_tpu.eval.vis import (bbox_3d_corners, draw_detections_masks,
                                draw_pose_bbox, side_by_side)


# ---------------------------------------------------------------- CLI parser

def test_parser_demo_defaults():
    args = build_parser().parse_args([
        "demo", "--output_dir", "/tmp/o", "--cad_path", "m.ply",
        "--rgb_path", "r.png", "--depth_path", "d.png", "--cam_path", "c.json"])
    assert args.cmd == "demo"
    assert args.segmentor_model == "sam"
    assert args.stability_score_thresh == 0.97
    assert args.det_score_thresh == 0.2
    assert not args.skip_render


def test_parser_demo_fastsam_and_overrides():
    args = build_parser().parse_args([
        "demo", "--output_dir", "o", "--cad_path", "m.ply",
        "--rgb_path", "r", "--depth_path", "d", "--cam_path", "c",
        "--segmentor_model", "fastsam", "--skip_render",
        "--det_score_thresh", "0.5"])
    assert args.segmentor_model == "fastsam"
    assert args.skip_render
    assert args.det_score_thresh == 0.5


def test_parser_pem_requires_seg_path():
    with pytest.raises(SystemExit):
        build_parser().parse_args([
            "pem", "--output_dir", "o", "--cad_path", "m.ply",
            "--rgb_path", "r", "--depth_path", "d", "--cam_path", "c"])


def test_parser_missing_required_exits():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["render", "--output_dir", "o"])
    with pytest.raises(SystemExit):
        build_parser().parse_args([])


def test_parser_bop_eval_and_train():
    args = build_parser().parse_args([
        "bop-eval", "--dataset_dir", "/d", "--dataset_name", "ycbv",
        "--stage", "ism", "--max_frames", "3"])
    assert args.stage == "ism" and args.max_frames == 3
    assert args.models_dir == "models"
    with pytest.raises(SystemExit):  # invalid stage choice
        build_parser().parse_args([
            "bop-eval", "--dataset_dir", "/d", "--dataset_name", "ycbv",
            "--stage", "bogus"])
    args = build_parser().parse_args(["train", "--data_dir", "/d"])
    assert args.iters == 600_000 and args.ckpt_dir == "checkpoints/pem"


# ----------------------------------------------------------------------- vis

def test_bbox_3d_corners_unit_cube():
    pts = np.array([[0.0, 0, 0], [1, 2, 3], [0.5, 1, 1.5]])
    c = bbox_3d_corners(pts)
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.min(0), [0, 0, 0])
    np.testing.assert_allclose(c.max(0), [1, 2, 3])
    # all 8 corners distinct
    assert len({tuple(r) for r in c.round(6).tolist()}) == 8


def test_draw_pose_bbox_projects_near_principal_point():
    H, W = 120, 160
    img = np.zeros((H, W, 3), np.uint8)
    K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]])
    # 40 mm cube centered at the optical axis, 1 m away -> projected
    # half-extent = 200 * 20 / 1000 = 4 px around the principal point
    model = np.array([[-20.0, -20, -20], [20, 20, 20]])
    out = draw_pose_bbox(img, np.eye(3), np.array([0.0, 0, 1000.0]), model, K,
                         color=(255, 0, 0))
    assert out.shape == img.shape
    ys, xs = np.where(out[:, :, 0] > 0)
    assert len(ys) > 0
    assert abs(xs.mean() - W / 2) < 8 and abs(ys.mean() - H / 2) < 8
    # nothing drawn far from the box
    assert xs.min() > W / 2 - 12 and xs.max() < W / 2 + 12


def test_draw_detections_masks_only_touches_valid_masks():
    img = np.full((20, 20, 3), 10, np.uint8)
    masks = np.zeros((2, 20, 20), np.float32)
    masks[0, :5, :5] = 1.0
    masks[1, 10:, 10:] = 1.0
    valid = np.array([True, False])
    out = draw_detections_masks(img, masks, valid)
    assert (out[:5, :5] != 10).any()           # valid mask overlaid
    assert (out[10:, 10:] == 10).all()         # invalid mask untouched
    assert (out[6:9, 6:9] == 10).all()         # background untouched


def test_side_by_side_shapes():
    a = np.zeros((10, 4, 3), np.uint8)
    b = np.ones((6, 7, 3), np.uint8)
    c = side_by_side(a, b)
    assert c.shape == (10, 11, 3)
    assert (c[:6, 4:] == 1).all()
    assert (c[6:, 4:] == 0).all()


def test_parser_stream():
    args = build_parser().parse_args([
        "stream", "--cad_paths", "a.ply", "b.ply",
        "--frames_dir", "/tmp/frames", "--cam_path", "cam.json",
        "--max_frames", "3"])
    assert args.cmd == "stream"
    assert args.cad_paths == ["a.ply", "b.ply"]
    assert args.max_frames == 3 and args.det_score_thresh == 0.2
