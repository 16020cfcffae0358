"""Minimal mesh IO + uniform surface sampling (replaces trimesh usage).

The reference calls `trimesh.load_mesh(path).sample(n)` for CAD point clouds
(`Pose_Estimation_Model/run_inference_custom.py:183-184`,
`Instance_Segmentation_Model/model/detector.py:183-184`). This module reads
ascii/binary-little-endian PLY and samples faces area-weighted with uniform
barycentric coordinates — the same scheme trimesh uses.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


@dataclass
class Mesh:
    vertices: np.ndarray  # (V, 3) float32
    faces: np.ndarray     # (F, 3) int32

    @property
    def face_areas(self) -> np.ndarray:
        v = self.vertices
        a = v[self.faces[:, 1]] - v[self.faces[:, 0]]
        b = v[self.faces[:, 2]] - v[self.faces[:, 0]]
        return 0.5 * np.linalg.norm(np.cross(a, b), axis=1)

    def sample(self, n: int, rng: np.random.RandomState | None = None) -> np.ndarray:
        """Area-weighted uniform surface sampling -> (n, 3) float32."""
        rng = rng or np.random.RandomState(0)
        areas = self.face_areas
        p = areas / areas.sum()
        fidx = rng.choice(len(p), size=n, p=p)
        tri = self.vertices[self.faces[fidx]]  # (n, 3, 3)
        # uniform barycentric: fold the unit square onto the triangle
        r1 = rng.rand(n, 1)
        r2 = rng.rand(n, 1)
        flip = (r1 + r2) > 1.0
        r1 = np.where(flip, 1.0 - r1, r1)
        r2 = np.where(flip, 1.0 - r2, r2)
        pts = tri[:, 0] + r1 * (tri[:, 1] - tri[:, 0]) + r2 * (tri[:, 2] - tri[:, 0])
        return pts.astype(np.float32)

    def diameter(self) -> float:
        """Max pairwise extent approximation via bounding-sphere of vertices."""
        v = self.vertices
        c = v.mean(0)
        return float(2.0 * np.linalg.norm(v - c, axis=1).max())


def load_ply(path: str) -> Mesh:
    """Load ascii or binary_little_endian PLY (vertex xyz + triangular faces)."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header\n")
    if header_end < 0:
        raise ValueError(f"not a PLY file: {path}")
    header = data[:header_end].decode("ascii", errors="replace").splitlines()
    body = data[header_end + len(b"end_header\n"):]

    fmt = None
    elements = []  # list of (name, count, [(prop_name, dtype) | ('list', idx_t, cnt_t, name)])
    cur = None
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            cur = (parts[1], int(parts[2]), [])
            elements.append(cur)
        elif parts[0] == "property" and cur is not None:
            if parts[1] == "list":
                cur[2].append(("list", parts[2], parts[3], parts[4]))
            else:
                cur[2].append((parts[2], parts[1]))  # (name, type)

    if fmt == "ascii":
        return _parse_ascii(body, elements)
    elif fmt == "binary_little_endian":
        return _parse_binary(body, elements, "<")
    elif fmt == "binary_big_endian":
        return _parse_binary(body, elements, ">")
    raise ValueError(f"unsupported PLY format {fmt}")


def _parse_ascii(body: bytes, elements) -> Mesh:
    lines = body.decode("ascii", errors="replace").split("\n")
    li = 0
    vertices = None
    faces = None
    for name, count, props in elements:
        if name == "vertex":
            names = [p[0] if p[0] != "list" else p[3] for p in props]
            xi, yi, zi = names.index("x"), names.index("y"), names.index("z")
            arr = np.empty((count, 3), np.float32)
            for i in range(count):
                vals = lines[li + i].split()
                arr[i] = (float(vals[xi]), float(vals[yi]), float(vals[zi]))
            vertices = arr
            li += count
        elif name == "face":
            out = []
            for i in range(count):
                vals = lines[li + i].split()
                k = int(vals[0])
                idx = [int(v) for v in vals[1:1 + k]]
                for j in range(1, k - 1):  # fan triangulation
                    out.append((idx[0], idx[j], idx[j + 1]))
            faces = np.asarray(out, np.int32)
            li += count
        else:
            li += count
    return Mesh(vertices, faces if faces is not None else np.zeros((0, 3), np.int32))


def _parse_binary(body: bytes, elements, endian: str) -> Mesh:
    off = 0
    vertices = None
    faces = None
    for name, count, props in elements:
        if name == "vertex" and all(p[0] != "list" for p in props):
            dtype = np.dtype([(p[0], endian + _PLY_DTYPES[p[1]]) for p in props])
            arr = np.frombuffer(body, dtype=dtype, count=count, offset=off)
            off += dtype.itemsize * count
            vertices = np.stack(
                [arr["x"], arr["y"], arr["z"]], axis=1).astype(np.float32)
        elif name == "face":
            # assume a single list property (vertex_indices), commonly uchar+int
            lp = [p for p in props if p[0] == "list"][0]
            cnt_t = np.dtype(endian + _PLY_DTYPES[lp[1]])
            idx_t = np.dtype(endian + _PLY_DTYPES[lp[2]])
            out = []
            for _ in range(count):
                k = int(np.frombuffer(body, cnt_t, 1, off)[0])
                off += cnt_t.itemsize
                idx = np.frombuffer(body, idx_t, k, off)
                off += idx_t.itemsize * k
                for j in range(1, k - 1):
                    out.append((idx[0], idx[j], idx[j + 1]))
            faces = np.asarray(out, np.int32)
        else:
            # skip fixed-size element
            size = sum(np.dtype(_PLY_DTYPES[p[1]]).itemsize for p in props
                       if p[0] != "list")
            off += size * count
    return Mesh(vertices, faces if faces is not None else np.zeros((0, 3), np.int32))
