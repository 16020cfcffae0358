"""JAX triangle rasterizer for offline template rendering.

TPU-native replacement for the reference's BlenderProc stage
(`Render/render_custom_templates.py`): renders RGB (Lambertian headlight +
ambient on vertex/base colors), a coverage mask, and per-pixel local object
coordinates (the NOCS/xyz channel consumed by `_get_template`,
`Pose_Estimation_Model/run_inference_custom.py:117-146`).

Approach: one fused device program — project all triangles, test each
against a fixed 32x32 pixel tile anchored at its bbox (triangles larger than
a tile are pre-split on the host), z-resolve with scatter-min over the
linear pixel index, then scatter attributes of the winning fragments.
Not a path tracer: lighting is approximate by design (offline asset stage);
the data contract (rgb_i.png / mask_i.png / xyz_i.npy) matches the reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TILE = 32
_BIG = jnp.float32(1e30)


def split_large_triangles(verts: np.ndarray, faces: np.ndarray,
                          proj_fn, max_px: float = TILE - 2.0,
                          max_iter: int = 6) -> np.ndarray:
    """Host-side: subdivide faces whose projected bbox exceeds max_px (any
    view among proj list). proj_fn: verts -> (V, 2) screen coords."""
    faces = faces.copy()
    for _ in range(max_iter):
        xy = proj_fn(verts)
        tri = xy[faces]  # (F, 3, 2)
        ext = tri.max(1) - tri.min(1)
        big = (ext.max(-1) > max_px)
        if not big.any():
            break
        keep = faces[~big]
        split = faces[big]
        # midpoint split on the longest edge
        v = verts
        new_faces = []
        new_verts = [v]
        next_id = len(v)
        for (a, b, c) in split:
            pts = xy[[a, b, c]]
            e = [np.linalg.norm(pts[0] - pts[1]), np.linalg.norm(pts[1] - pts[2]),
                 np.linalg.norm(pts[2] - pts[0])]
            k = int(np.argmax(e))
            pair = [(a, b, c), (b, c, a), (c, a, b)][k]
            m = (v[pair[0]] + v[pair[1]]) / 2.0
            new_verts.append(m[None])
            new_faces.append((pair[0], next_id, pair[2]))
            new_faces.append((next_id, pair[1], pair[2]))
            next_id += 1
        verts = np.concatenate(new_verts, axis=0)
        faces = np.concatenate([keep, np.asarray(new_faces, faces.dtype)], axis=0)
    return verts, faces


@partial(jax.jit, static_argnames=("height", "width"))
def rasterize(
    verts_cam: jnp.ndarray,
    faces: jnp.ndarray,
    attrs: jnp.ndarray,
    K: jnp.ndarray,
    height: int,
    width: int,
):
    """Rasterize with a z-buffer.

    verts_cam: (V, 3) camera-space vertices (z > 0 in front);
    faces: (F, 3) int32; attrs: (V, A) per-vertex attributes to interpolate;
    K: (3, 3) intrinsics. Returns (attr_img (H, W, A), mask (H, W) bool,
    depth (H, W))."""
    F = faces.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = verts_cam[:, 2]
    x = verts_cam[:, 0] / z * fx + cx
    y = verts_cam[:, 1] / z * fy + cy
    xy = jnp.stack([x, y], axis=-1)  # (V, 2)

    tri = xy[faces]          # (F, 3, 2)
    tri_z = z[faces]         # (F, 3)
    tri_attr = attrs[faces]  # (F, 3, A)

    # tile anchor per triangle
    lo = jnp.floor(tri.min(axis=1)).astype(jnp.int32)  # (F, 2)
    lo = jnp.clip(lo, 0, jnp.array([width - 1, height - 1]))

    dx = jnp.arange(TILE)
    px = lo[:, 0:1] + dx[None, :]  # (F, T)
    py = lo[:, 1:2] + dx[None, :]

    # edge functions at pixel centers (+0.5)
    ax, ay = tri[:, 0, 0], tri[:, 0, 1]
    bx, by = tri[:, 1, 0], tri[:, 1, 1]
    cx_, cy_ = tri[:, 2, 0], tri[:, 2, 1]
    pxf = px.astype(jnp.float32) + 0.5  # (F, T)
    pyf = py.astype(jnp.float32) + 0.5

    def edge(x0, y0, x1, y1):
        # e(p) = (x1-x0)(py-y0) - (y1-y0)(px-x0), broadcast (F, Ty, Tx)
        return ((x1 - x0)[:, None, None] * (pyf[:, :, None] - y0[:, None, None])
                - (y1 - y0)[:, None, None] * (pxf[:, None, :] - x0[:, None, None]))

    e0 = edge(bx, by, cx_, cy_)   # opposite vertex a
    e1 = edge(cx_, cy_, ax, ay)   # opposite b
    e2 = edge(ax, ay, bx, by)     # opposite c
    area = (e0 + e1 + e2)
    # accept either winding
    pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
    neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    inside = (pos | neg) & (jnp.abs(area) > 1e-12)

    denom = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    w0 = e0 / denom
    w1 = e1 / denom
    w2 = e2 / denom

    # perspective-correct interpolation via 1/z
    inv_z = 1.0 / tri_z  # (F, 3)
    zi = (w0 * inv_z[:, 0, None, None] + w1 * inv_z[:, 1, None, None]
          + w2 * inv_z[:, 2, None, None])
    depth = 1.0 / jnp.maximum(zi, 1e-12)

    in_img = ((px[:, None, :] >= 0) & (px[:, None, :] < width)
              & (py[:, :, None] >= 0) & (py[:, :, None] < height))
    valid = inside & in_img & (depth > 1e-6)

    pix = (py[:, :, None] * width + px[:, None, :])  # (F, Ty, Tx)
    pix_flat = jnp.where(valid, pix, height * width).reshape(-1)
    depth_flat = jnp.where(valid, depth, _BIG).reshape(-1)

    zbuf = jnp.full((height * width + 1,), _BIG)
    zbuf = zbuf.at[pix_flat].min(depth_flat)

    # winners: fragments whose depth equals the z-buffer value
    win = valid.reshape(-1) & (depth_flat <= zbuf[pix_flat] * (1 + 1e-6))

    # interpolate attributes (perspective-correct)
    A = attrs.shape[-1]
    wa = (w0 * inv_z[:, 0, None, None])[..., None]
    wb = (w1 * inv_z[:, 1, None, None])[..., None]
    wc = (w2 * inv_z[:, 2, None, None])[..., None]
    interp = (wa * tri_attr[:, None, None, 0] + wb * tri_attr[:, None, None, 1]
              + wc * tri_attr[:, None, None, 2])
    interp = interp * depth[..., None]
    interp_flat = interp.reshape(-1, A)

    out = jnp.zeros((height * width + 1, A))
    out = out.at[jnp.where(win, pix_flat, height * width)].set(
        jnp.where(win[:, None], interp_flat, 0.0))
    attr_img = out[:height * width].reshape(height, width, A)
    mask = (zbuf[:height * width] < _BIG).reshape(height, width)
    depth_img = jnp.where(mask, zbuf[:height * width].reshape(height, width), 0.0)
    return attr_img, mask, depth_img
