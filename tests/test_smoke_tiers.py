"""Fast default-tier smoke variants of the slow test tiers.

The full FD-gradient / golden-parity / inverse-fit matrices are `-m slow`
(minutes); a plain `pytest` run previously exercised none of them (round-4
VERDICT item 5). Each test here is a minutes->seconds reduction of one
tier, so the default gate touches every correctness claim that matters:
AD-vs-FD gradients, reference-algorithm parity, and inverse recovery.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.integrator.path import (
    PathTracerConfig,
    render_image,
    trace_radiance,
)
from mafrixraytracing_tpu.scene import spec as S
from mafrixraytracing_tpu.scene.builtin import cornell_box
from mafrixraytracing_tpu.scene.compiler import compile_scene

from golden_numpy import GoldenScene, render as golden_render

CFG = PathTracerConfig(backend="jnp", max_depth=3, rr_enable=False)


def _floor_light_scene():
    """High-signal fixture shared with test_gradients (floor + area light)."""
    floor = S.make_rect_mesh((-10, 0, 10), (10, 0, 10), (10, 0, -10), (-10, 0, -10))
    light = S.make_rect_mesh((-0.4, 2, -0.4), (0.4, 2, -0.4), (0.4, 2, 0.4), (-0.4, 2, 0.4))
    spec = S.SceneSpec(
        materials=[S.MaterialSpec(albedo=(0.6, 0.6, 0.6))],
        shapes=[S.ShapeSpec(floor, 0)],
        area_lights=[S.AreaLightSpec(light, radiance=(10.0,) * 3, visible=False)],
    )
    return compile_scene(spec).scene


def test_smoke_fd_gradient():
    """One FD check per run: light radiance enters linearly, so AD must
    match central differences tightly even at tiny sample counts."""
    scene = _floor_light_scene()

    def f(lr):
        s = scene.replace(light_radiance=lr)
        o = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (64, 1))
        d = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (64, 1))
        keys = rng.pixel_keys(jax.random.key(5), 64)
        return jnp.mean(trace_radiance(s, Rays(origin=o, direction=d), keys, CFG))

    g = jax.grad(f)(scene.light_radiance)
    eps = 1e-2
    d = jnp.zeros_like(scene.light_radiance).at[(0, 0)].set(1.0)
    fd = (float(f(scene.light_radiance + eps * d))
          - float(f(scene.light_radiance - eps * d))) / (2 * eps)
    np.testing.assert_allclose(float((g * d).sum()), fd, rtol=1e-3, atol=1e-6)


def test_smoke_golden_parity():
    """16^2 block-mean comparison of the mafrix parity estimator against the
    NumPy transcription of the reference algorithm (full gate:
    test_parity.py at 24^2 x 96 spp)."""
    W = H = 16
    SPP = 32
    DEPTH = 3
    cs = compile_scene(cornell_box(width=W, height=H, light_visible=False))
    mask = np.asarray(cs.scene.tri_mask)
    golden = GoldenScene(
        np.asarray(cs.scene.tri_v0)[mask],
        np.asarray(cs.scene.tri_e1)[mask],
        np.asarray(cs.scene.tri_e2)[mask],
        np.asarray(cs.scene.mat_albedo)[np.asarray(cs.scene.tri_mat)[mask]],
        (-0.235, 1.98, -0.235), (0.47, 0, 0), (0, 0, 0.47), (0, -1, 0),
        (10.0, 10.0, 10.0),
    )
    img_g = golden_render(golden, (0, 1, 3), (0, 0, -1), 120.0, W, H, SPP,
                          DEPTH, seed=3)
    cfg = PathTracerConfig(backend="jnp", estimator="mafrix",
                           max_depth=DEPTH + 1, rr_enable=False)
    img_f = np.asarray(
        render_image(cs.scene, cs.camera, W, H, SPP, jax.random.key(11), cfg)
    )
    # 8x8-block means: coarse enough to integrate the MC noise of 32 spp
    bg = img_g.reshape(2, 8, 2, 8, 3).mean(axis=(1, 3))
    bf = img_f.reshape(2, 8, 2, 8, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(bf.mean(), bg.mean(), rtol=0.08)
    np.testing.assert_allclose(bf, bg, rtol=0.2, atol=0.02)


def test_smoke_inverse_fit():
    """10-step albedo recovery through the full differentiable renderer
    (full gate: test_inverse.py fits spot materials and vertices)."""
    import optax

    scene = _floor_light_scene()
    W = H = 16
    from mafrixraytracing_tpu.camera.camera import Camera

    camera = Camera.pinhole((0.0, 3.0, 4.0), (0.0, -0.5, -1.0), 90.0, 1.0)
    cfg = PathTracerConfig(backend="jnp", max_depth=2, rr_enable=False)
    target = render_image(scene, camera, W, H, 8, jax.random.key(3), cfg)

    bad0 = scene.mat_albedo.at[0].set(jnp.asarray([0.2, 0.9, 0.2]))
    opt = optax.adam(0.1)

    @jax.jit
    def step(albedo, opt_state, key):
        def loss_fn(a):
            img = render_image(scene.replace(mat_albedo=a), camera, W, H, 8,
                               key, cfg)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(albedo)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(albedo, upd), opt_state, loss

    albedo, opt_state = bad0, opt.init(bad0)
    losses = []
    for i in range(10):
        albedo, opt_state, loss = step(albedo, opt_state, jax.random.key(10 + i))
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses
    err0 = float(jnp.abs(bad0[0] - scene.mat_albedo[0]).max())
    err = float(jnp.abs(albedo[0] - scene.mat_albedo[0]).max())
    assert err < 0.5 * err0, (err, err0)
