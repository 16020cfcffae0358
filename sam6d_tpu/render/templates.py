"""Offline template generation: CAD -> 42-view rgb/mask/xyz assets.

Equivalent of reference `Render/render_custom_templates.py` without Blender:
icosphere level-0 camera poses (this framework's canonical order), a JAX
rasterizer, Lambertian headlight shading. Output contract matches the
reference consumers: rgb_i.png, mask_i.png (255 = object), xyz_i.npy
(per-pixel LOCAL object coordinates — the reference's NOCS channel carries
local mesh coordinates; consumers divide by 1000 for mm CADs, see
`Pose_Estimation_Model/run_inference_custom.py:123`).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image

from ..data.mesh import Mesh, load_ply
from .poses import template_cam_poses
from .rasterizer import rasterize, split_large_triangles, TILE

# Blender default camera: 512x512, 50mm lens on a 36mm sensor
RENDER_SIZE = 512
RENDER_FOCAL = RENDER_SIZE * 50.0 / 36.0


def _vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(n, 1e-12)


def render_templates(
    mesh: Mesh,
    output_dir: str,
    level: int = 0,
    vertex_colors: Optional[np.ndarray] = None,
    base_color: float = 0.4,
    image_size: int = RENDER_SIZE,
    views=None,
) -> str:
    """Render level-`level` views into `{output_dir}/templates`; `views`
    optionally restricts to a subset of view indices (files keep their
    canonical view index in the name)."""
    import jax.numpy as jnp

    save_dir = os.path.join(output_dir, "templates")
    os.makedirs(save_dir, exist_ok=True)

    verts = mesh.vertices.astype(np.float64)
    radius = float(np.linalg.norm(verts, axis=1).max())
    cam_poses = template_cam_poses(level, radius=4.0 * radius)  # reference
    # distance: blender cam at 2 units with object scaled by 1/(2r) -> 4r

    K = np.array([[RENDER_FOCAL * image_size / RENDER_SIZE, 0, image_size / 2],
                  [0, RENDER_FOCAL * image_size / RENDER_SIZE, image_size / 2],
                  [0, 0, 1]], np.float32)

    if vertex_colors is None:
        vertex_colors = np.full((len(verts), 3), base_color, np.float32)
    normals = _vertex_normals(verts, mesh.faces)

    view_ids = range(len(cam_poses)) if views is None else views
    for i in view_ids:
        pose = cam_poses[i]
        # world->camera: x_cam = R^T (x - t); camera looks along +z (forward
        # column of the look-at pose)
        R = pose[:3, :3]
        t = pose[:3, 3]
        Rwc = R.T
        v_cam = (verts - t) @ Rwc.T

        def proj(v):
            vc = (v - t) @ Rwc.T
            z = np.maximum(vc[:, 2], 1e-9)
            return np.stack([vc[:, 0] / z * K[0, 0] + K[0, 2],
                             vc[:, 1] / z * K[1, 1] + K[1, 2]], axis=1)

        sverts, sfaces = split_large_triangles(verts, mesh.faces, proj)
        if len(sverts) != len(verts):
            scolors = np.concatenate([
                vertex_colors,
                np.full((len(sverts) - len(verts), 3), vertex_colors.mean(0))])
            snormals = _vertex_normals(sverts, sfaces)
        else:
            scolors, snormals = vertex_colors, normals
        sv_cam = (sverts - t) @ Rwc.T

        # headlight Lambertian + ambient
        view_dir = (t - sverts)
        view_dir /= np.maximum(np.linalg.norm(view_dir, axis=1, keepdims=True), 1e-12)
        diff = np.abs((snormals * view_dir).sum(1))[:, None]
        shaded = np.clip(scolors * (0.35 + 0.65 * diff), 0, 1)

        attrs = np.concatenate([shaded, sverts], axis=1).astype(np.float32)
        attr_img, mask, _ = rasterize(
            jnp.asarray(sv_cam, jnp.float32), jnp.asarray(sfaces, jnp.int32),
            jnp.asarray(attrs), jnp.asarray(K), image_size, image_size)
        attr_img = np.asarray(attr_img)
        mask = np.asarray(mask)

        rgb = (np.clip(attr_img[..., :3], 0, 1) * 255).astype(np.uint8)
        xyz = attr_img[..., 3:6].astype(np.float16)
        Image.fromarray(rgb).save(os.path.join(save_dir, f"rgb_{i}.png"))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(save_dir, f"mask_{i}.png"))
        np.save(os.path.join(save_dir, f"xyz_{i}.npy"), xyz)
    return save_dir


def render_custom_templates(cad_path: str, output_dir: str, level: int = 0):
    """CLI-equivalent of the reference script (mm-unit CAD)."""
    mesh = load_ply(cad_path)
    return render_templates(mesh, output_dir, level=level)
