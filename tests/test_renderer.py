"""Rasterizer + template rendering tests."""
import numpy as np
import jax.numpy as jnp
import pytest

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
