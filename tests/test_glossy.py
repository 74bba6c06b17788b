"""Glossy (normalized Phong) material — revives the reference's DEAD
`GlossySpecular` (`Core/Materials/Brdfs/GlossySpecular.fs:5-15`,
f = ks (r.wo)^exp col) with exponent control and proper importance
sampling + MIS."""
import jax
import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.integrator.path import PathTracerConfig, render_image
from mafrixraytracing_tpu.scene import spec as S
from mafrixraytracing_tpu.scene.compiler import compile_scene


def _scene(mat):
    floor = S.make_rect_mesh((-4, 0, 4), (4, 0, 4), (4, 0, -4), (-4, 0, -4))
    light = S.make_rect_mesh((-1, 3, -1), (1, 3, -1), (1, 3, 1), (-1, 3, 1))
    return compile_scene(S.SceneSpec(
        camera=S.CameraSpec(position=(0.0, 1.2, 3.5), direction=(0.0, -0.25, -1.0),
                            fov=55.0, fov_convention="standard"),
        materials=[S.MaterialSpec(albedo=(0.6,) * 3),
                   mat],
        shapes=[S.ShapeSpec(floor, 0)],
        spheres=[S.SphereSpec(center=(0.0, 0.8, 0.0), radius=0.8, material=1)],
        area_lights=[S.AreaLightSpec(light, radiance=(10.0,) * 3, visible=True)],
    ))


def _render(cs, cfg, spp=48, w=32, h=32, seed=3):
    return np.asarray(render_image(cs.scene, cs.camera, w, h, spp,
                                   jax.random.key(seed), cfg))


def test_high_exponent_approaches_mirror():
    """exp -> inf collapses the Phong lobe onto the mirror direction. At
    NORMAL incidence (camera straight down on a glossy floor, light straight
    overhead) the lobe's residual cos_i factor is ~1, so a huge-exponent
    glossy floor must match a fuzz-0 metal floor."""
    floor = S.make_rect_mesh((-4, 0, 4), (4, 0, 4), (4, 0, -4), (-4, 0, -4))
    light = S.make_rect_mesh((-2, 6, -2), (2, 6, -2), (2, 6, 2), (-2, 6, 2))

    def scene(mat):
        return compile_scene(S.SceneSpec(
            camera=S.CameraSpec(position=(0.0, 3.0, 0.0),
                                direction=(0.0, -1.0, 0.0), up=(0.0, 0.0, 1.0),
                                fov=30.0, fov_convention="standard"),
            materials=[mat],
            shapes=[S.ShapeSpec(floor, 0)],
            area_lights=[S.AreaLightSpec(light, radiance=(4.0,) * 3,
                                         visible=True, two_sided=True)],
        ))

    cfg = PathTracerConfig(max_depth=3, rr_enable=False, backend="jnp")
    img_g = _render(scene(S.MaterialSpec(type="glossy", albedo=(0.9,) * 3,
                                         exponent=50000.0)), cfg)
    img_m = _render(scene(S.MaterialSpec(type="metal", albedo=(0.9,) * 3,
                                         fuzz=0.0)), cfg)
    assert np.isfinite(img_g).all()
    # central pixels: near-normal incidence, the two must agree closely
    c_g = img_g[12:20, 12:20].mean()
    c_m = img_m[12:20, 12:20].mean()
    np.testing.assert_allclose(c_g, c_m, rtol=0.05)
    assert c_m > 0.5  # the reflection actually carries the light


def test_glossy_mis_consistent():
    """MIS on/off must agree in the mean: with MIS off the glossy surface is
    lit purely by NEE (its BSDF-hit emission is suppressed); with MIS on
    both strategies contribute with power-2 weights. Any double count or
    missing weight shows up as a brightness shift."""
    mat = S.MaterialSpec(type="glossy", albedo=(0.8,) * 3, exponent=12.0)
    cs = _scene(mat)
    cfg_on = PathTracerConfig(max_depth=3, rr_enable=False, backend="jnp",
                              mis=True)
    cfg_off = PathTracerConfig(max_depth=3, rr_enable=False, backend="jnp",
                               mis=False)
    m_on = np.mean([_render(cs, cfg_on, spp=32, seed=s).mean() for s in range(4)])
    m_off = np.mean([_render(cs, cfg_off, spp=32, seed=s + 9).mean()
                     for s in range(4)])
    np.testing.assert_allclose(m_on, m_off, rtol=0.05)


def test_glossy_sharper_with_exponent():
    """Higher exponent concentrates the reflected light: the brightest
    reflected pixel on the sphere grows while total reflected energy stays
    comparable."""
    cfg = PathTracerConfig(max_depth=3, rr_enable=False, backend="jnp")
    lo = _render(_scene(S.MaterialSpec(type="glossy", albedo=(0.9,) * 3,
                                       exponent=4.0)), cfg, spp=64)
    hi = _render(_scene(S.MaterialSpec(type="glossy", albedo=(0.9,) * 3,
                                       exponent=400.0)), cfg, spp=64)
    assert hi.max() > lo.max() * 1.3, (hi.max(), lo.max())
