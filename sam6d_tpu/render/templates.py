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
from .rasterizer import (rasterize, split_large_triangles,
                         interpolate_split_attrs, TILE)

# Blender default camera: 512x512, 50mm lens on a 36mm sensor
RENDER_SIZE = 512
RENDER_FOCAL = RENDER_SIZE * 50.0 / 36.0


def _sample_texture(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Bilinear texture sampling at (u, v) in the OBJ/BOP convention
    (v origin at the image bottom); out-of-range coordinates wrap."""
    H, W = tex.shape[:2]
    u = np.where((u < 0) | (u > 1), u - np.floor(u), u)
    v = np.where((v < 0) | (v > 1), v - np.floor(v), v)
    x = u * (W - 1)
    y = (1.0 - v) * (H - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    return ((tex[y0, x0] * (1 - wx) + tex[y0, x1] * wx) * (1 - wy)
            + (tex[y1, x0] * (1 - wx) + tex[y1, x1] * wx) * wy)


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
    cam_distance: Optional[float] = None,
    cam_poses: Optional[np.ndarray] = None,
    xyz_scale: float = 1.0,
    xyz_rot: Optional[np.ndarray] = None,
    subdir: str = "templates",
) -> str:
    """Render views into `{output_dir}/{subdir}`; `views` optionally
    restricts to a subset of view indices (files keep their canonical view
    index in the name). `cam_distance` overrides the camera radius (the BOP
    driver uses 2*diameter — reference render_bop_templates.py:28-30 scales
    by 1/diameter with the camera at 2 Blender units); `cam_poses` replaces
    the icosphere set entirely (training-template drivers); saved xyz is
    `xyz_rot @ (local * xyz_scale)` (ShapeNet rot90 / NOCS conventions)."""
    import jax.numpy as jnp

    save_dir = os.path.join(output_dir, subdir) if subdir else output_dir
    os.makedirs(save_dir, exist_ok=True)

    verts = mesh.vertices.astype(np.float64)
    radius = float(np.linalg.norm(verts, axis=1).max())
    if cam_poses is None:
        # reference custom distance: blender cam at 2 units with the object
        # scaled by 1/(2r) -> 4r
        dist = cam_distance if cam_distance is not None else 4.0 * radius
        cam_poses = template_cam_poses(level, radius=dist)

    K = np.array([[RENDER_FOCAL * image_size / RENDER_SIZE, 0, image_size / 2],
                  [0, RENDER_FOCAL * image_size / RENDER_SIZE, image_size / 2],
                  [0, 0, 1]], np.float32)

    # appearance source priority: explicit override > texture map > vertex
    # colors > flat base_color — matching BlenderProc keeping CAD materials
    # unless overridden (reference Render/render_bop_templates.py:33-47)
    textured = (vertex_colors is None and mesh.texture is not None
                and mesh.uv is not None)
    if vertex_colors is None and not textured:
        vertex_colors = (mesh.colors.astype(np.float32)
                         if mesh.colors is not None else
                         np.full((len(verts), 3), base_color, np.float32))
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

        sverts, sfaces, parents = split_large_triangles(verts, mesh.faces, proj)
        if len(sverts) != len(verts):
            snormals = _vertex_normals(sverts, sfaces)
            scolors = (None if textured
                       else interpolate_split_attrs(vertex_colors, parents))
            suv = (interpolate_split_attrs(mesh.uv.astype(np.float32), parents)
                   if textured else None)
        else:
            scolors, snormals = vertex_colors, normals
            suv = mesh.uv if textured else None
        sv_cam = (sverts - t) @ Rwc.T

        # headlight Lambertian + ambient
        view_dir = (t - sverts)
        view_dir /= np.maximum(np.linalg.norm(view_dir, axis=1, keepdims=True), 1e-12)
        diff = np.abs((snormals * view_dir).sum(1))[:, None]
        shade = 0.35 + 0.65 * diff  # (V, 1)

        if textured:
            # interpolate (shade, u, v); the texture is sampled per-pixel
            # after rasterization (perspective-correct UVs from the raster)
            head = np.concatenate([shade, suv], axis=1)
        else:
            head = np.clip(scolors * shade, 0, 1)
        attrs = np.concatenate([head, sverts], axis=1).astype(np.float32)
        attr_img, mask, _ = rasterize(
            jnp.asarray(sv_cam, jnp.float32), jnp.asarray(sfaces, jnp.int32),
            jnp.asarray(attrs), jnp.asarray(K), image_size, image_size)
        attr_img = np.asarray(attr_img)
        mask = np.asarray(mask)

        if textured:
            texel = _sample_texture(mesh.texture, attr_img[..., 1],
                                    attr_img[..., 2])
            shaded_px = np.clip(texel * attr_img[..., 0:1], 0, 1)
            shaded_px = np.where(mask[..., None], shaded_px, 0.0)
            rgb = (shaded_px * 255).astype(np.uint8)
        else:
            rgb = (np.clip(attr_img[..., :3], 0, 1) * 255).astype(np.uint8)
        xyz = attr_img[..., 3:6].astype(np.float32) * xyz_scale
        if xyz_rot is not None:
            xyz = xyz @ np.asarray(xyz_rot, np.float32).T
        Image.fromarray(rgb).save(os.path.join(save_dir, f"rgb_{i}.png"))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(save_dir, f"mask_{i}.png"))
        np.save(os.path.join(save_dir, f"xyz_{i}.npy"), xyz.astype(np.float16))
    return save_dir


def render_custom_templates(cad_path: str, output_dir: str, level: int = 0):
    """CLI-equivalent of the reference script (mm-unit CAD)."""
    mesh = load_ply(cad_path)
    return render_templates(mesh, output_dir, level=level)


def render_bop_templates(dataset_dir: str, output_root: str,
                         dataset_name: str, level: int = 0,
                         obj_ids=None, image_size: int = RENDER_SIZE):
    """Per-object template sets for one BOP dataset (reference
    Render/render_bop_templates.py:28-47): camera distance from the
    1/diameter normalization (the reference scales the CAD by 1/diameter
    with the camera at 2 Blender units -> 2*diameter in mesh units), gray
    0.4 material for tless (:43-47). Saves LOCAL mm coordinates in
    xyz_i.npy — the contract both this framework's BOPObject.load_template
    and the reference's own PEM consumer (bop_object_utils.py:57) expect
    (/1000 -> meters).

    Output layout: {output_root}/{dataset_name}/obj_{id:06d}/{rgb,mask,xyz}_i.
    """
    models_dir = "models_cad" if dataset_name == "tless" else "models"
    model_path = os.path.join(dataset_dir, models_dir)
    import json
    info = json.load(open(os.path.join(model_path, "models_info.json")))
    out_dirs = []
    for key in sorted(info.keys(), key=int):
        obj_id = int(key)
        if obj_ids is not None and obj_id not in obj_ids:
            continue
        mesh = load_ply(os.path.join(model_path, f"obj_{obj_id:06d}.ply"))
        diameter = float(info[key]["diameter"])
        out_dir = os.path.join(output_root, dataset_name, f"obj_{obj_id:06d}")
        # tless: force the gray 0.4 material the reference creates
        # (render_bop_templates.py:43-47); other datasets keep the CAD's own
        # appearance (texture map or vertex colors)
        gray = (np.full((len(mesh.vertices), 3), 0.4, np.float32)
                if dataset_name == "tless" else None)
        render_templates(
            mesh, out_dir, level=level, base_color=0.4, vertex_colors=gray,
            image_size=image_size, cam_distance=2.0 * diameter, subdir="")
        out_dirs.append(out_dir)
    return out_dirs


# ShapeNet NOCS frame fix (reference render_shapenet_templates.py:105-112)
SHAPENET_ROT90 = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)


def _corner_radius(verts: np.ndarray) -> float:
    """Reference get_norm_info convention (render_custom_templates.py:23-34):
    the larger norm of the axis-wise min/max corner vectors."""
    return float(max(np.linalg.norm(verts.max(0)), np.linalg.norm(verts.min(0))))


def render_training_templates(mesh: Mesh, save_dir: str,
                              shapenet: bool = False,
                              image_size: int = RENDER_SIZE):
    """Two-view training templates (reference render_gso_templates.py:61-68 /
    render_shapenet_templates.py): cameras at +-(1,1,1) in normalized units
    (i.e. +-(1,1,1)*2r in mesh units, r from the corner-radius convention)
    looking at the origin; xyz saved in the reference's NOCS convention
    local/r (range <= 1; the MegaPose training reader multiplies by 0.1 —
    training_dataset.py:294 / data/megapose.py template_scale), with the
    rot90 NOCS frame fix for ShapeNetCore."""
    r = _corner_radius(mesh.vertices)
    locs = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]) * 2.0 * r
    from .poses import look_at
    cam_poses = np.stack([look_at(loc, np.zeros(3)) for loc in locs])
    return render_templates(
        mesh, save_dir, cam_poses=cam_poses, image_size=image_size,
        xyz_scale=1.0 / max(r, 1e-12),
        xyz_rot=SHAPENET_ROT90 if shapenet else None, subdir="")


def render_gso_templates(data_dir: str, obj_indices=None,
                         image_size: int = RENDER_SIZE):
    """All GSO training templates into the layout MegaPoseDataset._template
    reads: {data_dir}/MegaPose-GSO/templates/{gso_id}/ (reference
    render_gso_templates.py)."""
    import json
    root = os.path.join(data_dir, "MegaPose-GSO")
    info = json.load(open(os.path.join(
        root, "google_scanned_objects", "models_info.json")))
    out = []
    for idx, rec in enumerate(info):
        if obj_indices is not None and idx not in obj_indices:
            continue
        mesh_path = os.path.join(root, "google_scanned_objects", "models_normalized",
                                 rec["gso_id"], "meshes", "model.ply")
        if not os.path.exists(mesh_path):
            continue
        save_dir = os.path.join(root, "templates", rec["gso_id"])
        mesh = load_ply(mesh_path)
        render_training_templates(mesh, save_dir, shapenet=False,
                                  image_size=image_size)
        out.append(save_dir)
    return out


def render_shapenet_templates(data_dir: str, obj_indices=None,
                              image_size: int = RENDER_SIZE):
    """All ShapeNetCore training templates into
    {data_dir}/MegaPose-ShapeNetCore/templates/{synset}/{source}/ with the
    rot90 NOCS fix (reference render_shapenet_templates.py:105-112)."""
    import json
    root = os.path.join(data_dir, "MegaPose-ShapeNetCore")
    info = json.load(open(os.path.join(root, "shapenetcorev2",
                                       "models_info.json")))
    out = []
    for idx, rec in enumerate(info):
        if obj_indices is not None and idx not in obj_indices:
            continue
        mesh_path = os.path.join(
            root, "shapenetcorev2", "models_orig", rec["shapenet_synset_id"],
            rec["shapenet_source_id"], "models", "model_normalized.ply")
        if not os.path.exists(mesh_path):
            continue
        save_dir = os.path.join(root, "templates", rec["shapenet_synset_id"],
                                rec["shapenet_source_id"])
        mesh = load_ply(mesh_path)
        render_training_templates(mesh, save_dir, shapenet=True,
                                  image_size=image_size)
        out.append(save_dir)
    return out
