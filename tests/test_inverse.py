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


def test_mesh_vertex_param_shares_gradients():
    """`mesh_vertices` parameterization (round-4): the derived tri_v0/e1/e2
    must equal the stored caches exactly, and the gradient of a shared
    vertex must equal the SUM of the per-face cotangents that reference it
    (faces are views of the shared buffer, not independent copies)."""
    floor = S.make_rect_mesh((-2, 0, 2), (2, 0, 2), (2, 0, -2), (-2, 0, -2))
    spec = S.SceneSpec(
        materials=[S.MaterialSpec(albedo=(0.7,) * 3)],
        shapes=[S.ShapeSpec(floor, 0)],
    )
    scene = compile_scene(spec).scene
    derived = inverse.apply_params(scene, {"mesh_vertices": scene.mesh_vertices})
    live_t = np.asarray(scene.tri_mask)  # padded rows derive from vertex 0
    np.testing.assert_array_equal(np.asarray(derived.tri_v0)[live_t],
                                  np.asarray(scene.tri_v0)[live_t])
    np.testing.assert_array_equal(np.asarray(derived.tri_e1)[live_t],
                                  np.asarray(scene.tri_e1)[live_t])
    np.testing.assert_array_equal(np.asarray(derived.tri_e2)[live_t],
                                  np.asarray(scene.tri_e2)[live_t])

    # loss touching both faces: sum of all face corners
    def loss_mesh(mv):
        s = inverse.apply_params(scene, {"mesh_vertices": mv})
        w = scene.tri_mask[:, None]
        return jnp.sum(jnp.where(w, s.tri_v0 * 1.0 + s.tri_e1 * 2.0
                                 + s.tri_e2 * 3.0, 0.0))

    g = jax.grad(loss_mesh)(scene.mesh_vertices)
    f = np.asarray(scene.tri_face_vi)
    mask = np.asarray(scene.tri_mask)
    expect = np.zeros_like(np.asarray(scene.mesh_vertices))
    # d/dv0 = 1 - 2 - 3 (v0 appears in tri_v0 and negatively in e1, e2);
    # d/dv1 = 2; d/dv2 = 3
    for t in np.nonzero(mask)[0]:
        expect[f[t, 0]] += 1.0 - 2.0 - 3.0
        expect[f[t, 1]] += 2.0
        expect[f[t, 2]] += 3.0
    np.testing.assert_allclose(np.asarray(g), expect, atol=1e-5)
    # the rect's 4 vertices are genuinely shared (2 faces x 3 corners -> 4)
    assert np.unique(f[mask]).size == 4


def test_mesh_vertex_update_refreshes_pallas_accel():
    """Moving mesh vertices far outside their original cluster AABBs must
    stay visible on the Pallas backend: `apply_params` refreshes the
    cluster bounds (round-3 VERDICT weak #3 — a stale cull silently loses
    hits)."""
    from mafrixraytracing_tpu.core.v3 import V3
    from mafrixraytracing_tpu.ops import intersect_pallas as ip
    from mafrixraytracing_tpu.geometry import intersect as isect
    from mafrixraytracing_tpu.core.types import Rays

    quad = S.make_rect_mesh((-0.5, 0.0, -0.5), (0.5, 0.0, -0.5),
                            (0.5, 0.0, 0.5), (-0.5, 0.0, 0.5))
    ground = S.make_rect_mesh((-10, -5, -10), (10, -5, -10),
                              (10, -5, 10), (-10, -5, 10))
    spec = S.SceneSpec(
        materials=[S.MaterialSpec()],
        shapes=[S.ShapeSpec(quad, 0), S.ShapeSpec(ground, 0)],
    )
    scene = compile_scene(spec).scene
    assert int(scene.num_mega) >= 2  # ground is mega, quad is clustered

    # displace the quad's shared vertices +2 in y — far beyond the original
    # zero-thickness cluster AABB at y=0
    mv = np.asarray(scene.mesh_vertices).copy()
    quad_rows = np.nonzero(np.abs(mv[:, 1]) < 1e-6)[0][:4]
    mv[quad_rows, 1] += 2.0
    moved = inverse.apply_params(scene, {"mesh_vertices": jnp.asarray(mv)})

    n = 256
    o = jnp.tile(jnp.array([[0.0, 5.0, 0.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (n, 1))
    rays = Rays(origin=o, direction=d)
    t_j, i_j = isect.find_closest(moved, rays, 1e-3, 1e8)
    t_p, i_p = ip.find_closest(moved, rays, 1e-3, 1e8, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_j), np.asarray(i_p))
    # the quad is found at its NEW height (t = 3), not lost to the ground
    np.testing.assert_allclose(np.asarray(t_p), 3.0, atol=1e-4)


def test_recover_mesh_vertices_shared():
    """BASELINE 'recover vertices' through the shared-vertex
    parameterization: displace the floor's `mesh_vertices`, fit them back."""
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
    true_mv = np.asarray(scene.mesh_vertices)
    live = np.zeros(true_mv.shape[0], bool)
    live[np.unique(np.asarray(scene.tri_face_vi)[np.asarray(scene.tri_mask)])] = True
    # only the floor's 4 vertices are live (light invisible): displace them
    pert = true_mv + np.where(live[:, None], [[0.0, 0.25, 0.0]], 0.0).astype(
        np.float32
    )
    bad = inverse.apply_params(scene, {"mesh_vertices": jnp.asarray(pert)})

    # shared vertices accumulate ~3 faces' cotangents each, so the
    # effective step is ~3x the per-face parameterization's: smaller lr
    fitted, losses = inverse.fit(
        bad, camera, target, ("mesh_vertices",), mesh,
        steps=60, lr=1e-2, spp=8, key=jax.random.key(11), config=CFG,
    )
    assert np.mean(losses[-5:]) < 0.3 * np.mean(losses[:3]), losses
    # measure the DISPLACED (y) component: in-plane moves of the floor's
    # outer corners are a null space of the image loss (the camera sees the
    # interior), so the full 3D error can drift while the fit is correct
    d_before = np.abs(pert[:, 1] - true_mv[:, 1])[live].mean()
    d_after = np.abs(
        np.asarray(fitted.mesh_vertices)[:, 1] - true_mv[:, 1]
    )[live].mean()
    assert d_after < 0.4 * d_before, (d_after, d_before)


def test_smooth_vertex_grads_properties():
    """Laplacian gradient preconditioner: a constant field is a fixed point
    (coherent translations pass through untouched) and white noise shrinks
    (per-vertex MC noise is averaged away)."""
    floor = S.make_rect_mesh((-2, 0, 2), (2, 0, 2), (2, 0, -2), (-2, 0, -2))
    spec = S.SceneSpec(materials=[S.MaterialSpec()],
                       shapes=[S.ShapeSpec(floor, 0)])
    scene = compile_scene(spec).scene
    V = scene.mesh_vertices.shape[0]
    live = np.zeros(V, bool)
    live[np.unique(np.asarray(scene.tri_face_vi)[np.asarray(scene.tri_mask)])] = True

    const = jnp.asarray(np.where(live[:, None], [[0.0, 2.0, 0.0]], 0.0),
                        jnp.float32)
    out = inverse.smooth_vertex_grads(scene, const, iters=6)
    np.testing.assert_allclose(np.asarray(out)[live],
                               np.asarray(const)[live], atol=1e-5)

    rng = np.random.default_rng(0)
    noise = jnp.asarray(
        np.where(live[:, None], rng.normal(size=(V, 3)), 0.0), jnp.float32
    )
    sm = np.asarray(inverse.smooth_vertex_grads(scene, noise, iters=6))
    assert np.abs(sm[live]).mean() < 0.7 * np.abs(np.asarray(noise)[live]).mean()
