"""Wavefront OBJ loader.

Same grammar coverage as the reference's FParsec loader
(`Models/ObjModelLoader.fs:306-341`): v / vt / vn; faces with `a`, `a/b`,
`a//c`, `a/b/c` references including negative (relative) indices
(`ObjModelLoader.fs:63-70`); groups `g` / objects `o`; `usemtl`; `mtllib`
(materials loaded first, like `ObjModelLoader.fs:317-330`); `s`, `usemap`
and comments are accepted and ignored. Quads become two triangles — the
reference routes 4-vertex faces to its `Rect` shape (two triangles,
`ObjModelLoader.fs:76-92`); faces with >4 vertices are fan-triangulated
(a strict superset of the reference, which errors on them).

Output is host-side NumPy in `scene.spec.Mesh` form, grouped by `g` name so
XML `obj_ref="model.group"` binding works (`Scene/Scene.fs:137-177`).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from mafrixraytracing_tpu.io.mtl import load_mtl
from mafrixraytracing_tpu.scene.spec import Mesh


@dataclass
class ObjGroup:
    name: str
    faces: list = field(default_factory=list)        # [(vi, ti, ni) x 3] per tri
    materials: list = field(default_factory=list)    # per-tri material name or None


@dataclass
class ObjModel:
    """Parsed OBJ file — analog of the reference's `ObjState`
    (`ObjModelLoader.fs:18-53`)."""

    vertices: np.ndarray
    uvs: np.ndarray
    normals: np.ndarray
    groups: dict            # name -> ObjGroup
    materials: dict         # name -> MaterialSpec (from mtllib)
    material_order: list    # registration order of MTL materials

    def group_mesh(self, name: str) -> Mesh:
        """Indexed Mesh for one group (used by XML shape binding)."""
        return self._mesh_for(self.groups[name])

    def mesh(self) -> Mesh:
        """Whole-file mesh (all groups merged)."""
        merged = ObjGroup(name="__all__")
        for g in self.groups.values():
            merged.faces.extend(g.faces)
            merged.materials.extend(g.materials)
        return self._mesh_for(merged)

    def group_materials(self, name: str):
        return self.groups[name].materials

    def _mesh_for(self, g: ObjGroup) -> Mesh:
        f = np.asarray([[c[0] for c in tri] for tri in g.faces], np.int64).reshape(-1, 3)
        has_uv = all(c[1] is not None for tri in g.faces for c in tri) and len(self.uvs)
        has_n = all(c[2] is not None for tri in g.faces for c in tri) and len(self.normals)
        fu = (
            np.asarray([[c[1] for c in tri] for tri in g.faces], np.int64)
            if has_uv
            else None
        )
        fn = (
            np.asarray([[c[2] for c in tri] for tri in g.faces], np.int64)
            if has_n
            else None
        )
        return Mesh(
            vertices=self.vertices,
            faces=f.astype(np.int32),
            normals=self.normals if has_n else None,
            face_normals=fn.astype(np.int32) if fn is not None else None,
            uvs=self.uvs if has_uv else None,
            face_uvs=fu.astype(np.int32) if fu is not None else None,
        )


def _resolve(idx: int, count: int):
    """1-based absolute or negative relative OBJ index -> 0-based
    (reference `ObjModelLoader.fs:63-70`)."""
    if idx > 0:
        return idx - 1
    if idx < 0:
        return count + idx
    raise ValueError("OBJ index 0 is invalid")


def _parse_corner(token: str, nv: int, nt: int, nn: int):
    parts = token.split("/")
    vi = _resolve(int(parts[0]), nv)
    ti = ni = None
    if len(parts) >= 2 and parts[1] != "":
        ti = _resolve(int(parts[1]), nt)
    if len(parts) >= 3 and parts[2] != "":
        ni = _resolve(int(parts[2]), nn)
    return (vi, ti, ni)


def load_obj(path: str) -> ObjModel:
    vertices, uvs, normals = [], [], []
    groups: dict = {}
    current = ObjGroup(name="default")
    groups["default"] = current
    current_mtl = None
    materials: dict = {}
    material_order: list = []
    base = os.path.dirname(os.path.abspath(path))

    with open(path, "r", errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                vertices.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif tag == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif tag == "f":
                corners = [
                    _parse_corner(t, len(vertices), len(uvs), len(normals))
                    for t in parts[1:]
                ]
                # triangle fan: (0, i, i+1) — for quads this is the same
                # (0,1,2)+(0,2,3) split as the reference's Rect
                for i in range(1, len(corners) - 1):
                    current.faces.append((corners[0], corners[i], corners[i + 1]))
                    current.materials.append(current_mtl)
            elif tag in ("g", "o"):
                name = parts[1] if len(parts) > 1 else "default"
                if name not in groups:
                    groups[name] = ObjGroup(name=name)
                current = groups[name]
            elif tag == "usemtl":
                current_mtl = parts[1] if len(parts) > 1 else None
            elif tag == "mtllib":
                mtl_path = os.path.join(base, " ".join(parts[1:]))
                if os.path.exists(mtl_path):
                    loaded = load_mtl(mtl_path)
                    for nm, mspec in loaded.items():
                        if nm not in materials:
                            materials[nm] = mspec
                            material_order.append(nm)
            elif tag in ("s", "usemap", "mg", "l", "p"):
                continue  # accepted, ignored (parity with the reference grammar)
            # unknown tags ignored

    # drop empty groups (e.g. "default" when the file groups everything)
    groups = {k: g for k, g in groups.items() if g.faces}
    return ObjModel(
        vertices=np.asarray(vertices, np.float32).reshape(-1, 3),
        uvs=np.asarray(uvs, np.float32).reshape(-1, 2),
        normals=np.asarray(normals, np.float32).reshape(-1, 3),
        groups=groups,
        materials=materials,
        material_order=material_order,
    )
