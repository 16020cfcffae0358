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
                          max_iter: int = 6):
    """Host-side: subdivide faces whose projected bbox exceeds max_px (any
    view among proj list). proj_fn: verts -> (V, 2) screen coords.

    Returns (verts, faces, parents): parents (V', 2) int32 maps every vertex
    to the two vertices it bisects (original vertices map to themselves), so
    callers can midpoint-interpolate any per-vertex attribute (colors, UVs)
    by chaining parents through the split generations."""
    faces = faces.copy()
    parents = np.stack([np.arange(len(verts))] * 2, axis=1).astype(np.int64)
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
        new_parents = [parents]
        next_id = len(v)
        for (a, b, c) in split:
            pts = xy[[a, b, c]]
            e = [np.linalg.norm(pts[0] - pts[1]), np.linalg.norm(pts[1] - pts[2]),
                 np.linalg.norm(pts[2] - pts[0])]
            k = int(np.argmax(e))
            pair = [(a, b, c), (b, c, a), (c, a, b)][k]
            m = (v[pair[0]] + v[pair[1]]) / 2.0
            new_verts.append(m[None])
            new_parents.append(np.asarray([[pair[0], pair[1]]], np.int64))
            new_faces.append((pair[0], next_id, pair[2]))
            new_faces.append((next_id, pair[1], pair[2]))
            next_id += 1
        verts = np.concatenate(new_verts, axis=0)
        parents = np.concatenate(new_parents, axis=0)
        faces = np.concatenate([keep, np.asarray(new_faces, faces.dtype)], axis=0)
    return verts, faces, parents


def interpolate_split_attrs(attr: np.ndarray, parents: np.ndarray) -> np.ndarray:
    """Extend a per-vertex attribute (V0, A) to split vertices (V', A) by
    averaging each new vertex's two parents (parents from
    split_large_triangles; parent rows always precede their children)."""
    out = np.empty((len(parents),) + attr.shape[1:], attr.dtype)
    out[:len(attr)] = attr
    for i in range(len(attr), len(parents)):
        a, b = parents[i]
        out[i] = 0.5 * (out[a] + out[b])
    return out


FACE_CHUNK = 4096


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
    depth (H, W)).

    Triangles are processed in fixed chunks via lax.scan (two passes:
    z-resolve, then winner attribute writes) — per-chunk candidate tensors
    stay bounded, and small trailing dims are flattened into the lane axis
    so the TPU's (8, 128) tiled layout doesn't pad them 20x.
    """
    F = faces.shape[0]
    Fp = -(-F // FACE_CHUNK) * FACE_CHUNK
    if Fp != F:
        faces = jnp.concatenate(
            [faces, jnp.zeros((Fp - F, 3), faces.dtype)])
    valid_face = jnp.arange(Fp) < F

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = verts_cam[:, 2]
    x = verts_cam[:, 0] / z * fx + cx
    y = verts_cam[:, 1] / z * fy + cy
    xy = jnp.stack([x, y], axis=-1)  # (V, 2)
    A = attrs.shape[-1]
    HW = height * width

    def fragments(chunk_faces, chunk_valid):
        """Per-chunk fragment data: (pix (C*T*T,), depth (C*T*T,),
        interp (A, C*T*T), valid (C*T*T,))."""
        tri = xy[chunk_faces]          # (C, 3, 2)
        tri_z = z[chunk_faces]         # (C, 3)
        tri_attr = attrs[chunk_faces]  # (C, 3, A)

        lo = jnp.floor(tri.min(axis=1)).astype(jnp.int32)
        lo = jnp.clip(lo, 0, jnp.array([width - 1, height - 1]))
        dx = jnp.arange(TILE)
        px = lo[:, 0:1] + dx[None, :]  # (C, T)
        py = lo[:, 1:2] + dx[None, :]

        ax, ay = tri[:, 0, 0], tri[:, 0, 1]
        bx, by = tri[:, 1, 0], tri[:, 1, 1]
        cx_, cy_ = tri[:, 2, 0], tri[:, 2, 1]
        pxf = px.astype(jnp.float32) + 0.5
        pyf = py.astype(jnp.float32) + 0.5

        def edge(x0, y0, x1, y1):
            return ((x1 - x0)[:, None, None] * (pyf[:, :, None] - y0[:, None, None])
                    - (y1 - y0)[:, None, None] * (pxf[:, None, :] - x0[:, None, None]))

        e0 = edge(bx, by, cx_, cy_)
        e1 = edge(cx_, cy_, ax, ay)
        e2 = edge(ax, ay, bx, by)
        area = e0 + e1 + e2
        pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        inside = (pos | neg) & (jnp.abs(area) > 1e-12)

        denom = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        w0 = e0 / denom
        w1 = e1 / denom
        w2 = e2 / denom

        inv_z = 1.0 / tri_z
        zi = (w0 * inv_z[:, 0, None, None] + w1 * inv_z[:, 1, None, None]
              + w2 * inv_z[:, 2, None, None])
        depth = 1.0 / jnp.maximum(zi, 1e-12)

        in_img = ((px[:, None, :] >= 0) & (px[:, None, :] < width)
                  & (py[:, :, None] >= 0) & (py[:, :, None] < height))
        valid = inside & in_img & (depth > 1e-6) & chunk_valid[:, None, None]

        pix = py[:, :, None] * width + px[:, None, :]
        pix_flat = jnp.where(valid, pix, HW).reshape(-1)
        depth_flat = jnp.where(valid, depth, _BIG).reshape(-1)

        # attributes stacked attr-major: (A, C*T*T) keeps the big axis on
        # lanes (the (C*T*T, A) layout would pad A -> 128 on TPU)
        wa = w0 * inv_z[:, 0, None, None]
        wb = w1 * inv_z[:, 1, None, None]
        wc = w2 * inv_z[:, 2, None, None]
        interp = (wa[None] * tri_attr.T[:, 0, :, None, None]
                  + wb[None] * tri_attr.T[:, 1, :, None, None]
                  + wc[None] * tri_attr.T[:, 2, :, None, None])
        interp = interp * depth[None]
        return (pix_flat, depth_flat, interp.reshape(A, -1),
                valid.reshape(-1))

    chunked_faces = faces.reshape(-1, FACE_CHUNK, 3)
    chunked_valid = valid_face.reshape(-1, FACE_CHUNK)

    # pass 1: z-resolve
    def z_step(zbuf, args):
        cf, cv = args
        pix, depth, _, _ = fragments(cf, cv)
        return zbuf.at[pix].min(depth), None

    zbuf = jnp.full((HW + 1,), _BIG)
    zbuf, _ = jax.lax.scan(z_step, zbuf, (chunked_faces, chunked_valid))

    # pass 2: winner attribute writes
    def attr_step(out, args):
        cf, cv = args
        pix, depth, interp, valid = fragments(cf, cv)
        win = valid & (depth <= zbuf[pix] * (1 + 1e-6))
        # losers are redirected to the dump column HW
        idx = jnp.where(win, pix, HW)
        out = out.at[:, idx].set(interp)
        return out, None

    out = jnp.zeros((A, HW + 1))
    out, _ = jax.lax.scan(attr_step, out, (chunked_faces, chunked_valid))

    attr_img = out[:, :HW].T.reshape(height, width, A)
    mask = (zbuf[:HW] < _BIG).reshape(height, width)
    depth_img = jnp.where(mask, zbuf[:HW].reshape(height, width), 0.0)
    return attr_img, mask, depth_img
