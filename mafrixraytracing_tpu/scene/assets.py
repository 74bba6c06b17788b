"""Scene builders around external OBJ assets (spot / Cube / Renault12TL).

The benchmark configs in BASELINE.md reference the meshes shipped with the
reference repo (`/root/reference/3DModel/*`); these helpers build renderable
scenes from any OBJ path and fall back gracefully when assets are absent.
"""
from __future__ import annotations

import os

import numpy as np

from mafrixraytracing_tpu.io.obj import load_obj
from mafrixraytracing_tpu.scene import spec as S

REFERENCE_ASSETS = "/root/reference/3DModel"
SPOT_OBJ = os.path.join(REFERENCE_ASSETS, "spot", "spot_triangulated_good.obj")
CUBE_OBJ = os.path.join(REFERENCE_ASSETS, "Cube", "Cube.obj")
RENAULT_OBJ = os.path.join(REFERENCE_ASSETS, "Renault12TL", "Renault12TL.obj")


def mesh_scene(
    obj_path: str,
    width: int = 512,
    height: int = 512,
    albedo=(0.7, 0.5, 0.4),
    light_radiance=(12.0, 12.0, 12.0),
) -> S.SceneSpec:
    """Generic hero shot for a mesh: auto-framed camera, ground plane, and an
    overhead area light (the capability demonstrated by the reference's
    `DrawWithTexture`/spot sample, re-lit for path tracing)."""
    model = load_obj(obj_path)
    mesh = model.mesh()

    v = mesh.vertices
    lo, hi = v.min(axis=0), v.max(axis=0)
    center = (lo + hi) / 2.0
    size = float(np.max(hi - lo))

    cam_pos = center + np.array([0.0, 0.35 * size, 1.8 * size], np.float32)
    cam_dir = center - cam_pos
    ground_y = float(lo[1]) - 0.02 * size
    g = 3.0 * size
    ground = S.make_rect_mesh(
        (center[0] - g, ground_y, center[2] + g),
        (center[0] + g, ground_y, center[2] + g),
        (center[0] + g, ground_y, center[2] - g),
        (center[0] - g, ground_y, center[2] - g),
    )
    ls = 0.8 * size
    lh = float(hi[1]) + 1.5 * size
    light = S.make_rect_mesh(
        (center[0] - ls, lh, center[2] - ls),
        (center[0] + ls, lh, center[2] - ls),
        (center[0] + ls, lh, center[2] + ls),
        (center[0] - ls, lh, center[2] + ls),
    )

    return S.SceneSpec(
        camera=S.CameraSpec(
            position=tuple(cam_pos),
            direction=tuple(cam_dir),
            fov=45.0,
            aspect=width / height,
            fov_convention="standard",
        ),
        materials=[
            S.MaterialSpec(type="lambert", albedo=albedo),
            S.MaterialSpec(type="lambert", albedo=(0.8, 0.8, 0.8)),
        ],
        shapes=[S.ShapeSpec(mesh, 0), S.ShapeSpec(ground, 1)],
        area_lights=[S.AreaLightSpec(light, radiance=light_radiance, visible=False)],
        film=S.FilmSpec(width=width, height=height),
    )


def spot_scene(width: int = 512, height: int = 512) -> S.SceneSpec:
    """The BASELINE spot-cow benchmark scene (5,856 tris)."""
    return mesh_scene(SPOT_OBJ, width, height)


def have_reference_assets() -> bool:
    return os.path.exists(SPOT_OBJ)
