"""Gradient correctness: finite-difference validation of pixel gradients
w.r.t. albedo, emission/light radiance, and vertex positions (BASELINE.md
gradient targets). The estimator is made deterministic-enough by fixing the
RNG key: both the analytic gradient and the finite difference use the SAME
sample paths, so FD ~= AD to the quadrature step even at low spp."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.integrator.path import PathTracerConfig, trace_radiance
from mafrixraytracing_tpu.scene import spec as S
from mafrixraytracing_tpu.scene.builtin import cornell_box
from mafrixraytracing_tpu.scene.compiler import compile_scene

pytestmark = pytest.mark.slow

CFG = PathTracerConfig(backend="jnp", max_depth=3, rr_enable=False)


def _simple_scene():
    albedo, Le, s, h = 0.6, 10.0, 0.4, 2.0
    floor = S.make_rect_mesh((-10, 0, 10), (10, 0, 10), (10, 0, -10), (-10, 0, -10))
    light = S.make_rect_mesh((-s, h, -s), (s, h, -s), (s, h, s), (-s, h, s))
    spec = S.SceneSpec(
        materials=[S.MaterialSpec(albedo=(albedo,) * 3)],
        shapes=[S.ShapeSpec(floor, 0)],
        area_lights=[S.AreaLightSpec(light, radiance=(Le,) * 3, visible=False)],
    )
    return compile_scene(spec).scene


def _mean_radiance(scene, n=512, seed=0, config=CFG, origin=(0.0, 1.0, 0.0)):
    # NOTE: origin must project strictly inside ONE floor triangle — a ray on
    # the rect's diagonal seam makes the closest-hit argmin flip under +-eps
    # and halves the finite difference.
    o = jnp.tile(jnp.asarray([origin], jnp.float32), (n, 1))
    d = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (n, 1))
    keys = rng.pixel_keys(jax.random.key(seed), n)
    return jnp.mean(trace_radiance(scene, Rays(origin=o, direction=d), keys, config))


def _fd_check(f, x0, eps, rtol, directions):
    """Central finite difference along given one-hot directions."""
    g = jax.grad(f)(x0)
    for direction in directions:
        d = jnp.zeros_like(x0)
        d = d.at[direction].set(1.0)
        fp = f(x0 + eps * d)
        fm = f(x0 - eps * d)
        fd = (fp - fm) / (2 * eps)
        ad = float((g * d).sum())
        np.testing.assert_allclose(ad, float(fd), rtol=rtol, atol=1e-6)


def test_albedo_gradient_fd():
    scene = _simple_scene()

    def f(albedo):
        return _mean_radiance(scene.replace(mat_albedo=albedo))

    _fd_check(f, scene.mat_albedo, eps=1e-3, rtol=1e-2, directions=[(0, 0), (0, 2)])


def test_light_radiance_gradient_fd():
    scene = _simple_scene()

    def f(lr):
        return _mean_radiance(scene.replace(light_radiance=lr))

    # radiance enters linearly -> AD must match FD tightly
    _fd_check(f, scene.light_radiance, eps=1e-2, rtol=1e-3,
              directions=[(0, 0), (1, 1)])


def test_emission_gradient_fd():
    """Emission of visible emissive geometry (Cornell light tris)."""
    cs = compile_scene(cornell_box(width=8, height=8))
    scene = cs.scene

    def f(em):
        s = scene.replace(mat_emission=em)
        o = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (64, 1))
        d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (64, 1))  # straight at light
        keys = rng.pixel_keys(jax.random.key(1), 64)
        return jnp.mean(trace_radiance(s, Rays(origin=o, direction=d), keys, CFG))

    g = jax.grad(f)(scene.mat_emission)
    # the emissive material row (index 3: after white/green/red) must carry
    # gradient ~1/3 per channel (mean over 3 channels of direct view)
    em_rows = np.asarray(jnp.abs(g).sum(axis=1))
    assert em_rows[3] > 0.3
    _fd_check(f, scene.mat_emission, eps=1e-2, rtol=1e-3, directions=[(3, 0)])


def test_vertex_gradient_fd():
    """Move a floor triangle (changes hit distance -> inverse-square light
    falloff): d(radiance)/d(tri v0 y) must match finite differences. The ray
    lands strictly inside one triangle (see _mean_radiance note)."""
    scene = _simple_scene()
    # find which of the two floor tris the ray at (2, *, 2) hits
    from mafrixraytracing_tpu.geometry.intersect import find_closest

    rays = Rays(
        origin=jnp.array([[2.0, 1.0, 2.0]]), direction=jnp.array([[0.0, -1.0, 0.0]])
    )
    _, idx = find_closest(scene, rays, 1e-3, 1e8)
    row = int(idx[0])
    assert row >= 0

    def f(v0):
        return _mean_radiance(
            scene.replace(tri_v0=v0), n=256, origin=(2.0, 1.0, 2.0)
        )

    g = jax.grad(f)(scene.tri_v0)
    assert np.isfinite(np.asarray(g)).all()
    _fd_check(f, scene.tri_v0, eps=1e-3, rtol=0.05, directions=[(row, 1)])


def test_camera_gradient_exists():
    """Gradient w.r.t. camera origin: the ray must be OBLIQUE so moving the
    origin moves the shading point (a straight-down ray from any height hits
    the same floor point -> true gradient 0)."""
    scene = _simple_scene()
    d0 = jnp.array([1.0, -1.0, 0.0]) / jnp.sqrt(2.0)

    def f(cam_y):
        o = jnp.zeros((128, 3)) + jnp.stack([jnp.zeros(()), cam_y, jnp.zeros(())])
        d = jnp.tile(d0[None], (128, 1))
        keys = rng.pixel_keys(jax.random.key(2), 128)
        return jnp.mean(trace_radiance(scene, Rays(origin=o, direction=d), keys, CFG))

    g = float(jax.grad(f)(jnp.float32(1.0)))
    assert np.isfinite(g) and abs(g) > 1e-4
    # cross-check with finite differences
    fd = (float(f(jnp.float32(1.0 + 1e-3))) - float(f(jnp.float32(1.0 - 1e-3)))) / 2e-3
    np.testing.assert_allclose(g, fd, rtol=0.05, atol=1e-5)
