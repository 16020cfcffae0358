"""Rasterizer + template rendering tests."""
import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from sam6d_tpu.render.rasterizer import rasterize
from sam6d_tpu.render.templates import render_templates
from sam6d_tpu.data.mesh import Mesh, load_ply

EXAMPLE_PLY = "/root/reference/SAM-6D/Data/Example/obj_000005.ply"


def test_rasterize_single_triangle():
    # triangle facing the camera at z=2
    verts = jnp.array([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    attrs = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    K = jnp.array([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
    img, mask, depth = rasterize(verts, faces, attrs, K, 32, 32)
    m = np.asarray(mask)
    assert m.sum() > 20  # triangle covers a region
    # center pixel inside; attrs sum to ~1 (barycentric)
    assert m[16, 16]
    np.testing.assert_allclose(np.asarray(img)[16, 16].sum(), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth)[m], 2.0, atol=1e-3)


def test_rasterize_occlusion():
    # two triangles; nearer one wins
    verts = jnp.array([
        [-1, -1, 4.0], [1, -1, 4.0], [0, 1, 4.0],    # far
        [-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0],    # near
    ])
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    attrs = jnp.array([[1.0], [1.0], [1.0], [2.0], [2.0], [2.0]])
    K = jnp.array([[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]])
    img, mask, depth = rasterize(verts, faces, attrs, K, 32, 32)
    m = np.asarray(mask)
    assert np.asarray(depth)[16, 16] == pytest.approx(2.0, abs=1e-3)
    assert np.asarray(img)[16, 16, 0] == pytest.approx(2.0, abs=1e-3)


@pytest.mark.slow
def _write_tiny_bop(tmp_path, diameter=80.0):
    """One-object BOP models dir with an octahedron PLY (mm units)."""
    import json
    r = diameter / 2.0
    verts = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
                      [0, 0, r], [0, 0, -r]], np.float32)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    md = tmp_path / "models"
    md.mkdir(parents=True)
    with open(md / "obj_000001.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
    json.dump({"1": {"diameter": diameter}}, open(md / "models_info.json", "w"))
    return tmp_path


@pytest.mark.slow
def test_render_bop_templates_consumed_by_bop_object(tmp_path):
    """render-bop driver output round-trips through BOPObject.load_template
    (reference Render/render_bop_templates.py:28-47 contract)."""
    from sam6d_tpu.render.templates import render_bop_templates
    from sam6d_tpu.data.bop import load_bop_objects

    ds = _write_tiny_bop(tmp_path / "tinyds")
    out_root = tmp_path / "templates"
    dirs = render_bop_templates(str(ds), str(out_root), "tinyds",
                                image_size=96)
    assert len(dirs) == 1
    objs = load_bop_objects(str(ds / "models"), template_root=str(out_root),
                            dataset_name="tinyds")
    rgb, mask, xyz = objs[0].load_template(0)
    assert rgb.shape == (96, 96, 3) and mask.any()
    # xyz is local mm / 1000 -> meters, bounded by the radius (40 mm)
    norms = np.linalg.norm(xyz[mask], axis=-1)
    assert 0 < norms.max() <= 0.040 * 1.05
    # all 42 level-0 views rendered
    import os
    assert len([f for f in os.listdir(dirs[0]) if f.startswith("rgb_")]) == 42


@pytest.mark.slow
def test_render_training_templates_two_views_and_rot90(tmp_path):
    """GSO/ShapeNet 2-view training templates: xyz in the NOCS local/r
    convention; the ShapeNet variant applies the rot90 frame fix
    (reference render_shapenet_templates.py:105-112)."""
    from sam6d_tpu.render.templates import (render_training_templates,
                                            SHAPENET_ROT90, _corner_radius)

    mesh = load_ply(EXAMPLE_PLY)
    d_gso = render_training_templates(mesh, str(tmp_path / "gso"),
                                      shapenet=False, image_size=96)
    d_sn = render_training_templates(mesh, str(tmp_path / "sn"),
                                     shapenet=True, image_size=96)
    import os
    for d in (d_gso, d_sn):
        assert {f"rgb_{i}.png" for i in range(2)} <= set(os.listdir(d))
    m = np.array(Image.open(os.path.join(d_gso, "mask_1.png"))) == 255
    xyz_g = np.load(os.path.join(d_gso, "xyz_1.npy")).astype(np.float32)
    xyz_s = np.load(os.path.join(d_sn, "xyz_1.npy")).astype(np.float32)
    # NOCS convention: local / corner-radius, bounded by ~1
    assert 0 < np.linalg.norm(xyz_g[m], axis=-1).max() <= 1.05
    # shapenet = rot90 @ gso (fp16 storage tolerance)
    np.testing.assert_allclose(xyz_s[m], xyz_g[m] @ SHAPENET_ROT90.T,
                               atol=2e-3)
    assert _corner_radius(mesh.vertices) > 0


def test_render_templates_demo_object(tmp_path):
    mesh = load_ply(EXAMPLE_PLY)
    out = render_templates(mesh, str(tmp_path), level=0, image_size=128,
                           views=[0, 21])
    import os
    from PIL import Image
    files = os.listdir(out)
    assert len([f for f in files if f.startswith("rgb_")]) == 2
    m0 = np.array(Image.open(os.path.join(out, "mask_0.png")))
    assert m0.max() == 255
    cover = (m0 > 0).mean()
    assert 0.05 < cover < 0.9  # object visible, not filling the frame
    xyz = np.load(os.path.join(out, "xyz_0.npy")).astype(np.float32)
    # xyz inside the mask is in local mm coords, bounded by the CAD radius
    r = np.linalg.norm(mesh.vertices, axis=1).max()
    norms = np.linalg.norm(xyz[m0 > 0], axis=-1)
    assert norms.max() <= r * 1.05
    assert norms.min() > 0  # real surface coords, not zeros
    # rendered object is roughly centered
    ys, xs = np.where(m0 > 0)
    assert abs(ys.mean() - 64) < 20 and abs(xs.mean() - 64) < 20
