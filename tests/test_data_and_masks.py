"""Tests for mesh IO, preprocessing, and mask/RLE utilities."""
import numpy as np
import jax.numpy as jnp
import pytest

from sam6d_tpu.data.mesh import load_ply, Mesh
from sam6d_tpu.data.preprocess import (
    bilinear_resize,
    get_bbox_square,
    get_resize_rgb_choose,
    normalize_rgb,
    prepare_instance,
    prepare_template,
)
from sam6d_tpu.ops.masks import (
    mask_to_rle_counts,
    rle_counts_to_mask,
    rle_encode_coco,
    rle_decode_coco,
    masks_to_boxes,
    box_iou,
    mask_iou_matrix,
    nms_masked,
)

EXAMPLE_PLY = "/root/reference/SAM-6D/Data/Example/obj_000005.ply"


pytestmark = pytest.mark.core  # sub-5-min correctness core


def test_load_example_ply():
    mesh = load_ply(EXAMPLE_PLY)
    assert mesh.vertices.shape == (22831, 3)
    assert mesh.faces.shape == (45666, 3)
    pts = mesh.sample(2048)
    assert pts.shape == (2048, 3)
    # sampled points lie within the vertex bounding box
    lo, hi = mesh.vertices.min(0) - 1e-3, mesh.vertices.max(0) + 1e-3
    assert (pts >= lo).all() and (pts <= hi).all()


def test_binary_ply_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3]], np.int32)
    p = tmp_path / "t.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\nproperty float x\nproperty float y\nproperty float z\n")
        f.write(b"element face 2\nproperty list uchar int vertex_indices\nend_header\n")
        f.write(verts.astype("<f4").tobytes())
        for face in faces:
            f.write(np.uint8(3).tobytes() + face.astype("<i4").tobytes())
    mesh = load_ply(str(p))
    np.testing.assert_array_equal(mesh.vertices, verts)
    np.testing.assert_array_equal(mesh.faces, faces)


def test_bilinear_resize_matches_cv2_semantics(rng):
    # identity when same size; constant image stays constant
    img = (rng.rand(17, 23, 3) * 255).astype(np.uint8)
    np.testing.assert_array_equal(bilinear_resize(img, 17, 23), img)
    const = np.full((10, 10), 7.0, np.float32)
    out = bilinear_resize(const, 224, 224)
    np.testing.assert_allclose(out, 7.0, atol=1e-5)
    # 2x upscale of a ramp stays a ramp (half-pixel centers -> edge clamp)
    ramp = np.arange(8, dtype=np.float32)[None, :].repeat(8, 0)
    up = bilinear_resize(ramp, 8, 16)
    assert abs(up[0, 8] - 3.75) < 1e-5  # cv2 INTER_LINEAR value


def test_get_bbox_square_centered():
    m = np.zeros((100, 120), bool)
    m[40:60, 50:90] = True  # 20 x 40 -> square side 40
    r1, r2, c1, c2 = get_bbox_square(m)
    assert (r2 - r1) == (c2 - c1) == 40
    assert r1 <= 40 and r2 >= 60 and c1 <= 50 and c2 >= 90


def test_get_bbox_square_clipped_at_border():
    m = np.zeros((50, 50), bool)
    m[0:40, 0:10] = True
    r1, r2, c1, c2 = get_bbox_square(m)
    assert 0 <= r1 and r2 <= 50 and 0 <= c1 and c2 <= 50
    assert (r2 - r1) == (c2 - c1)


def test_resize_rgb_choose_remap():
    # crop 10x10 -> resized 20: pixel (r, c) maps to (2r, 2c)
    choose = np.array([0, 11, 99])  # (0,0), (1,1), (9,9)
    out = get_resize_rgb_choose(choose, (0, 10, 0, 10), 20)
    np.testing.assert_array_equal(out, [0, 42, 18 * 20 + 18])


def test_prepare_instance_shapes(rng):
    H, W = 60, 80
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    pts = rng.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W), bool)
    mask[20:40, 30:50] = True
    out = prepare_instance(img, pts, mask, radius=10.0, img_size=32,
                           n_sample=64, rng=rng)
    assert out is not None
    assert out["rgb"].shape == (32, 32, 3)
    assert out["pts"].shape == (64, 3)
    assert out["rgb_choose"].shape == (64,)
    assert out["rgb_choose"].max() < 32 * 32


def test_prepare_instance_rejects_tiny_masks(rng):
    img = np.zeros((20, 20, 3), np.uint8)
    pts = np.zeros((20, 20, 3), np.float32)
    mask = np.zeros((20, 20), bool)
    mask[5, 5:8] = True  # 3 pixels <= 32
    assert prepare_instance(img, pts, mask, 1.0, 16, 16, rng) is None


def test_prepare_template(rng):
    H = 64
    rgb = (rng.rand(H, H, 3) * 255).astype(np.uint8)
    mask = np.zeros((H, H), bool)
    mask[10:50, 15:55] = True
    xyz = rng.rand(H, H, 3).astype(np.float32) - 0.5
    out = prepare_template(rgb, mask, xyz, img_size=32, n_sample=100, rng=rng)
    assert out["rgb"].shape == (32, 32, 3)
    assert out["pts"].shape == (100, 3)
    assert out["choose"].shape == (100,)


def test_rle_roundtrip(rng):
    for _ in range(5):
        m = rng.rand(37, 53) > 0.6
        np.testing.assert_array_equal(rle_counts_to_mask(mask_to_rle_counts(m)), m)
        np.testing.assert_array_equal(rle_decode_coco(rle_encode_coco(m)), m)


def test_rle_coco_against_pycocotools_format():
    # hand-checked tiny example: 3x3, single pixel at (1,1) fortran order
    m = np.zeros((3, 3), bool)
    m[1, 1] = True
    rle = mask_to_rle_counts(m)
    assert rle["counts"] == [4, 1, 4]
    np.testing.assert_array_equal(rle_decode_coco(rle_encode_coco(m)), m)


def test_masks_to_boxes():
    m = np.zeros((2, 10, 12), np.float32)
    m[0, 2:5, 3:7] = 1
    boxes = np.asarray(masks_to_boxes(jnp.array(m)))
    np.testing.assert_array_equal(boxes[0], [3, 2, 7, 5])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])


def test_box_iou():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-5)


def test_nms_masked_greedy():
    # 4 dets: 0 and 1 overlap (same group), 2 overlaps 0 but other group,
    # 3 is invalid
    iou = jnp.array([
        [1.0, 0.8, 0.8, 0.0],
        [0.8, 1.0, 0.0, 0.0],
        [0.8, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    scores = jnp.array([0.9, 0.8, 0.7, 0.99])
    valid = jnp.array([True, True, True, False])
    group = jnp.array([0, 0, 1, 0])
    same = group[:, None] == group[None, :]
    keep = np.asarray(nms_masked(iou, scores, valid, same, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_nms_masked_matches_sequential_greedy(rng):
    """The parallel fixed-point NMS must equal sequential greedy NMS on
    randomized dense-overlap problems (incl. groups, invalids, ties)."""
    for trial in range(8):
        N = 96
        iou = rng.rand(N, N).astype(np.float32)
        iou = (iou + iou.T) / 2
        np.fill_diagonal(iou, 1.0)
        # quantized scores force ties; argsort(-s) order defines greedy
        scores = np.round(rng.rand(N).astype(np.float32), 1)
        valid = rng.rand(N) > 0.25
        group = rng.randint(0, 3, N)
        same = group[:, None] == group[None, :]
        thresh = 0.6

        order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
        keep_ref = np.zeros(N, bool)
        for cand in order:
            overlap = (iou[cand] > thresh) & same[cand] & keep_ref
            keep_ref[cand] = valid[cand] and not overlap.any()

        got = np.asarray(nms_masked(
            jnp.asarray(iou), jnp.asarray(scores), jnp.asarray(valid),
            jnp.asarray(same), thresh))
        np.testing.assert_array_equal(got, keep_ref, err_msg=f"trial {trial}")
        # unrolled-rounds variant: identical fixed point regardless of how
        # many rounds run before the while_loop fallback
        got_u = np.asarray(nms_masked(
            jnp.asarray(iou), jnp.asarray(scores), jnp.asarray(valid),
            jnp.asarray(same), thresh, unroll_rounds=5))
        np.testing.assert_array_equal(got_u, keep_ref,
                                      err_msg=f"trial {trial} unrolled")


def test_native_rle_matches_python(rng):
    from sam6d_tpu.native import rle_encode_counts, rle_decode_counts, build
    assert build() is not None, "C toolchain expected in this environment"
    for _ in range(5):
        m = rng.rand(37, 53) > 0.6
        native = rle_encode_counts(m)
        python = mask_to_rle_counts(m)
        assert native["counts"] == python["counts"]
        np.testing.assert_array_equal(rle_decode_counts(native), m)


def test_native_rle_speed(rng):
    import time
    from sam6d_tpu.native import rle_encode_counts
    m = rng.rand(480, 640) > 0.5  # worst case: many runs
    t0 = time.perf_counter()
    for _ in range(10):
        rle_encode_counts(m)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        mask_to_rle_counts(m)
    python_t = time.perf_counter() - t0
    # informative bound only — native must not be slower
    assert native_t < python_t * 2


def test_remove_small_regions_holes_and_islands():
    from sam6d_tpu.ops.masks import remove_small_regions

    m = np.zeros((20, 20), bool)
    m[2:18, 2:18] = True
    m[8:10, 8:10] = False      # 4-px hole
    m[0, 19] = True            # 1-px island (disconnected)
    out, changed = remove_small_regions(m, 6, "holes")
    assert changed and out[8:10, 8:10].all()  # hole filled
    out2, changed2 = remove_small_regions(out, 6, "islands")
    assert changed2 and not out2[0, 19]       # island dropped
    assert out2[2:18, 2:18].all()
    # no-ops when everything is big enough
    _, ch = remove_small_regions(out2, 1, "islands")
    assert not ch


def test_postprocess_small_regions_keeps_unchanged_on_dup():
    from sam6d_tpu.ops.masks import postprocess_small_regions

    H = W = 24
    clean = np.zeros((H, W), np.float32)
    clean[4:20, 4:20] = 1
    dirty = clean.copy()
    dirty[10, 10] = 0           # small hole -> will be filled -> duplicate
    masks = np.stack([dirty, clean, np.zeros((H, W), np.float32)])
    valid = np.array([True, True, False])
    out_m, out_b, keep = postprocess_small_regions(masks, valid, 4, 0.7)
    # the hole got filled, producing a duplicate of the clean mask; NMS
    # keeps the UNCHANGED one (score 1 beats 0)
    assert keep[1] and not keep[0] and not keep[2]
    assert out_m[0, 10, 10] == 1  # edited in place before NMS
    assert (out_b[1] == np.array([4, 4, 20, 20])).all()
