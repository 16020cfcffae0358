"""Texture-mapped / vertex-color mesh loading and rendering.

Reference behavior: BlenderProc keeps the CAD's own materials — texture maps
and vertex colors — unless explicitly overridden (only tless is forced to
gray, `Render/render_bop_templates.py:33-47`). These tests pin the loader
(PLY per-vertex UVs, PLY per-face texcoord lists, OBJ/MTL map_Kd, vertex
colors) and the renderer's per-fragment texture sampling.
"""
import os

import numpy as np
import pytest
from PIL import Image

from sam6d_tpu.data.mesh import Mesh, load_ply, load_obj, load_mesh
from sam6d_tpu.render.templates import render_templates, _sample_texture
from sam6d_tpu.render.poses import look_at


pytestmark = pytest.mark.core  # sub-5-min correctness core


def _write_texture(path, left=(255, 0, 0), right=(0, 255, 0), size=16):
    """Texture split into a left half and a right half."""
    tex = np.zeros((size, size, 3), np.uint8)
    tex[:, : size // 2] = left
    tex[:, size // 2:] = right
    Image.fromarray(tex).save(path)


def _square(r=20.0):
    """Flat square in the xy plane at z=0 (mm units)."""
    verts = np.array([[-r, -r, 0], [r, -r, 0], [r, r, 0], [-r, r, 0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    # u spans 0..1 left->right, v spans 0..1 bottom->top
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return verts, faces, uv


def _write_textured_ply(tmp_path, per_face=False):
    verts, faces, uv = _square()
    ply = tmp_path / "tex_mesh.ply"
    tex = tmp_path / "tex_map.png"
    _write_texture(str(tex))
    with open(ply, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write("comment TextureFile tex_map.png\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if not per_face:
            f.write("property float texture_u\nproperty float texture_v\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\n")
        if per_face:
            f.write("property list uchar float texcoord\n")
        f.write("end_header\n")
        for v, t in zip(verts, uv):
            if per_face:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
            else:
                f.write(f"{v[0]} {v[1]} {v[2]} {t[0]} {t[1]}\n")
        for fc in faces:
            if per_face:
                uvs = " ".join(f"{uv[i][0]} {uv[i][1]}" for i in fc)
                f.write(f"3 {fc[0]} {fc[1]} {fc[2]} 6 {uvs}\n")
            else:
                f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
    return str(ply)


def test_load_ply_per_vertex_uv_and_texture(tmp_path):
    mesh = load_ply(_write_textured_ply(tmp_path, per_face=False))
    assert mesh.uv is not None and mesh.uv.shape == (4, 2)
    assert mesh.texture is not None and mesh.texture.shape[2] == 3
    np.testing.assert_allclose(mesh.uv[2], [1, 1])


def test_load_ply_per_face_texcoord_unwelds(tmp_path):
    mesh = load_ply(_write_textured_ply(tmp_path, per_face=True))
    assert mesh.uv is not None and mesh.texture is not None
    # unwelded: every (vertex, uv) pair unique; this square has 4 corner UVs
    assert len(mesh.vertices) == 4 and len(mesh.faces) == 2
    # geometry preserved: corner at (r, r) carries uv (1, 1)
    i = np.argmax(mesh.vertices[:, 0] + mesh.vertices[:, 1])
    np.testing.assert_allclose(mesh.uv[i], [1, 1])


def test_load_ply_vertex_colors(tmp_path):
    verts, faces, _ = _square()
    ply = tmp_path / "vc.ply"
    with open(ply, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\nproperty list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]} 255 0 0\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
    mesh = load_ply(str(ply))
    assert mesh.colors is not None
    np.testing.assert_allclose(mesh.colors, [[1, 0, 0]] * 4)
    assert mesh.uv is None and mesh.texture is None


def test_load_obj_mtl_map_kd(tmp_path):
    _write_texture(str(tmp_path / "kd.png"))
    with open(tmp_path / "mesh.mtl", "w") as f:
        f.write("newmtl m0\nKd 1 1 1\nmap_Kd kd.png\n")
    verts, faces, uv = _square()
    with open(tmp_path / "mesh.obj", "w") as f:
        f.write("mtllib mesh.mtl\nusemtl m0\n")
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in uv:
            f.write(f"vt {t[0]} {t[1]}\n")
        f.write("f 1/1 2/2 3/3 4/4\n")  # quad -> fan triangulation
    mesh = load_obj(str(tmp_path / "mesh.obj"))
    assert mesh.texture is not None and mesh.uv is not None
    assert len(mesh.faces) == 2 and len(mesh.vertices) == 4
    assert load_mesh(str(tmp_path / "mesh.obj")).uv is not None


def test_sample_texture_bilinear_and_wrap():
    tex = np.zeros((4, 4, 3), np.float32)
    tex[:, 2:] = 1.0  # right half white
    # u=0 -> left (0), u=1 -> right (1); v flip doesn't matter (columns)
    out = _sample_texture(tex, np.array([0.0, 1.0]), np.array([0.5, 0.5]))
    np.testing.assert_allclose(out[:, 0], [0.0, 1.0])
    # wrap: u=1.25 ~ u=0.25
    out = _sample_texture(tex, np.array([1.25]), np.array([0.5]))
    np.testing.assert_allclose(out[0], _sample_texture(
        tex, np.array([0.25]), np.array([0.5]))[0])


def _render_one(mesh, tmp_path, sub="r"):
    # camera near +z looking at the origin (slightly off-axis: look_at's
    # up-vector convention degenerates exactly on the z axis)
    pose = look_at(np.array([5.0, 5.0, 100.0]), np.zeros(3))
    out = render_templates(mesh, str(tmp_path / sub), cam_poses=pose[None],
                           image_size=64, subdir="")
    rgb = np.asarray(Image.open(os.path.join(out, "rgb_0.png")), np.float32)
    m = np.asarray(Image.open(os.path.join(out, "mask_0.png"))) == 255
    return rgb, m


def test_render_textured_square_matches_texels(tmp_path):
    """Left half of the square (u < 0.5) renders red, right half green —
    per-fragment texture sampling, not vertex-color flat shading."""
    mesh = load_ply(_write_textured_ply(tmp_path, per_face=False))
    rgb, m = _render_one(mesh, tmp_path)
    assert m.sum() > 200
    ys, xs = np.where(m)
    cx = xs.mean()
    left = m & (np.arange(rgb.shape[1])[None, :] < cx - 4)
    right = m & (np.arange(rgb.shape[1])[None, :] > cx + 4)
    lcol = rgb[left].mean(0)
    rcol = rgb[right].mean(0)
    # headlight faces the square -> shade ~= 1.0: near-pure texel colors
    # (sides may swap with camera handedness; require a clean red/green split)
    reds = {tuple(np.round(c / 100)) for c in (lcol, rcol)}
    assert lcol.max() > 180 and rcol.max() > 180
    assert np.argmax(lcol) != np.argmax(rcol)
    assert {np.argmax(lcol), np.argmax(rcol)} == {0, 1}  # one red, one green
    assert reds  # non-degenerate


def test_render_vertex_colors_used(tmp_path):
    verts, faces, _ = _square()
    mesh = Mesh(verts, faces, colors=np.tile(
        np.array([[0.0, 0.0, 1.0]], np.float32), (4, 1)))
    rgb, m = _render_one(mesh, tmp_path, "vc")
    assert m.any()
    col = rgb[m].mean(0)
    assert np.argmax(col) == 2 and col[2] > 180  # blue, shade ~= 1


def test_render_bop_forces_gray_only_for_tless(tmp_path):
    """tless gets the forced 0.4 gray material; other datasets keep the
    CAD's texture (reference render_bop_templates.py:43-47)."""
    import json
    from sam6d_tpu.render.templates import render_bop_templates

    for name, folder in (("tless", "models_cad"), ("ycbv", "models")):
        md = tmp_path / name / folder
        md.mkdir(parents=True)
        src = _write_textured_ply(tmp_path, per_face=False)
        data = open(src).read()
        with open(md / "obj_000001.ply", "w") as f:
            f.write(data)
        _write_texture(str(md / "tex_map.png"))
        json.dump({"1": {"diameter": 56.6}},
                  open(md / "models_info.json", "w"))
        out = render_bop_templates(str(tmp_path / name),
                                   str(tmp_path / "out"), name,
                                   image_size=64)
        # the square is flat: pick the view that sees it best
        best, best_m = None, -1
        for i in range(42):
            mi = np.asarray(Image.open(
                os.path.join(out[0], f"mask_{i}.png"))) == 255
            if mi.sum() > best_m:
                best, best_m = i, mi.sum()
        rgb = np.asarray(Image.open(os.path.join(out[0], f"rgb_{best}.png")),
                         np.float32)
        m = np.asarray(Image.open(
            os.path.join(out[0], f"mask_{best}.png"))) == 255
        assert m.sum() > 100
        col = rgb[m]
        if name == "tless":
            # gray: channels equal
            assert np.abs(col[:, 0] - col[:, 1]).max() < 3
            assert np.abs(col[:, 1] - col[:, 2]).max() < 3
        else:
            # textured: red and green regions present, channels differ
            assert (col[:, 0] > col[:, 1] + 50).any()
            assert (col[:, 1] > col[:, 0] + 50).any()
