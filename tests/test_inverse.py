"""Inverse rendering end-to-end on the virtual 8-device CPU mesh
(BASELINE.md "inverse rendering" row; the reference is forward-only).

Two demonstrations:
- material recovery at scale: spot's perturbed albedo is recovered through
  the full path tracer;
- geometry recovery: a displaced floor's vertex positions are pulled back
  by pixel gradients (reparameterized hit-point gradients: the light
  falloff/cosine terms carry the signal; silhouettes are detached).
Vertex gradients at spot scale are individually FD-correct
(test_gradients) but noise-dominated at test-budget sample counts, so the
geometry demonstration uses a high-signal scene.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mafrixraytracing_tpu.integrator.path import PathTracerConfig
from mafrixraytracing_tpu.opt import inverse
from mafrixraytracing_tpu.parallel.mesh import make_mesh
from mafrixraytracing_tpu.parallel.render import render_image_sharded
from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.scene import spec as S
from mafrixraytracing_tpu.scene.compiler import compile_scene

pytestmark = pytest.mark.slow
CFG = PathTracerConfig(max_depth=2, rr_enable=False, backend="jnp")


@pytest.mark.skipif(not os.path.exists(assets.SPOT_OBJ),
                    reason="reference assets absent")
def test_recover_spot_albedo():
    """Perturb spot's albedo, render a target, recover it with
    `opt.inverse.fit` (converging loss + albedo error well below start)."""
    W = H = 32
    cs = compile_scene(assets.spot_scene(W, H))
    scene, camera = cs.scene, cs.camera
    mesh = make_mesh()
    target = jax.block_until_ready(
        render_image_sharded(scene, camera, mesh, W, H, 16, jax.random.key(7), CFG)
    )
    true_albedo = np.asarray(scene.mat_albedo)
    pert = true_albedo.copy()
    pert[0] = (0.2, 0.8, 0.2)
    bad = scene.replace(mat_albedo=jnp.asarray(pert))

    fitted, losses = inverse.fit(
        bad, camera, target, ("mat_albedo",), mesh,
        steps=40, lr=5e-2, spp=8, key=jax.random.key(11), config=CFG,
    )
    assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:3]), losses
    err = np.abs(np.asarray(fitted.mat_albedo)[0] - true_albedo[0]).max()
    err_start = np.abs(pert[0] - true_albedo[0]).max()
    assert err < 0.35 * err_start, (err, err_start)


def test_recover_floor_vertices():
    """A floor displaced 0.25 upward under an area light: vertex-position
    gradients pull it back (error drops > 60%)."""
    W = H = 24
    floor = S.make_rect_mesh((-2, 0, 2), (2, 0, 2), (2, 0, -2), (-2, 0, -2))
    light = S.make_rect_mesh((-0.6, 2.0, -0.6), (0.6, 2.0, -0.6),
                             (0.6, 2.0, 0.6), (-0.6, 2.0, 0.6))
    spec = S.SceneSpec(
        camera=S.CameraSpec(position=(0.0, 1.2, 3.0), direction=(0.0, -0.3, -1.0),
                            fov=60.0, fov_convention="standard"),
        materials=[S.MaterialSpec(albedo=(0.7, 0.7, 0.7))],
        shapes=[S.ShapeSpec(floor, 0)],
        area_lights=[S.AreaLightSpec(light, radiance=(12.0,) * 3, visible=False)],
    )
    cs = compile_scene(spec)
    scene, camera = cs.scene, cs.camera
    mesh = make_mesh()
    target = jax.block_until_ready(
        render_image_sharded(scene, camera, mesh, W, H, 32, jax.random.key(7), CFG)
    )
    true_v0 = np.asarray(scene.tri_v0)
    mask = np.asarray(scene.tri_mask)
    pert_v0 = true_v0 + np.where(
        mask[:, None], np.array([[0.0, 0.25, 0.0]], np.float32), 0.0
    ).astype(np.float32)
    bad = scene.replace(tri_v0=jnp.asarray(pert_v0))

    fitted, losses = inverse.fit(
        bad, camera, target, ("tri_v0",), mesh,
        steps=60, lr=3e-2, spp=8, key=jax.random.key(11), config=CFG,
    )
    assert np.mean(losses[-5:]) < 0.2 * np.mean(losses[:3]), losses
    d_before = np.linalg.norm(pert_v0 - true_v0, axis=1)[mask].mean()
    d_after = np.linalg.norm(
        np.asarray(fitted.tri_v0) - true_v0, axis=1
    )[mask].mean()
    assert d_after < 0.4 * d_before, (d_after, d_before)
