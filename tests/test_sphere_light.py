"""Emissive-sphere area lights: NEE-sampled (revives the reference's DEAD
CircleAreaLightObject, `Core/Shape/CircleAreaLightObject.fs:8-25`)."""
import jax
import numpy as np

from mafrixraytracing_tpu.integrator.path import PathTracerConfig, render_image
from mafrixraytracing_tpu.scene import spec as S
from mafrixraytracing_tpu.scene.compiler import compile_scene


def _scene(emissive_sphere=True):
    floor = S.make_rect_mesh((-4, 0, 4), (4, 0, 4), (4, 0, -4), (-4, 0, -4))
    spec = S.SceneSpec(
        camera=S.CameraSpec(position=(0.0, 1.5, 4.0), direction=(0.0, -0.3, -1.0),
                            fov=55.0, fov_convention="standard"),
        materials=[S.MaterialSpec(albedo=(0.7, 0.7, 0.7)),
                   S.MaterialSpec(type="emissive", emission=(24.0, 24.0, 24.0))],
        shapes=[S.ShapeSpec(floor, 0)],
        spheres=[S.SphereSpec(center=(0.0, 1.6, 0.0), radius=0.3,
                              material=1 if emissive_sphere else 0)],
    )
    return compile_scene(spec)


CFG = PathTracerConfig(max_depth=3, rr_enable=False, backend="jnp")


def test_sphere_light_illuminates_floor():
    """A lone emissive sphere is the only light: the floor must be lit
    (through NEE — there are no triangle lights at all), brightest under
    the sphere, and the sphere itself visible to camera rays."""
    cs = _scene()
    img = np.asarray(render_image(cs.scene, cs.camera, 40, 40, 32,
                                  jax.random.key(5), CFG))
    assert np.isfinite(img).all()
    lum = img.sum(-1)
    # sphere light registered in the table
    assert int(np.asarray(cs.scene.slight_mask).sum()) == 1
    # the floor receives light (lower half of frame)
    floor_lum = lum[24:]
    assert floor_lum.max() > 0.05, floor_lum.max()
    # center of the floor (under the sphere) brighter than the frame edge
    assert floor_lum[:, 15:25].mean() > 1.25 * floor_lum[:, :4].mean()
    # the emissive sphere is visible to primary rays (bright pixels near
    # frame center, upper half)
    assert lum[:20].max() > 5.0


def test_dark_without_emission():
    cs = _scene(emissive_sphere=False)
    img = np.asarray(render_image(cs.scene, cs.camera, 32, 32, 8,
                                  jax.random.key(5), CFG))
    assert img.max() == 0.0  # no light source anywhere


def test_sphere_light_mis_unbiased_and_lower_variance():
    """Round-4 upgrade (VERDICT #6): cone-sampled NEE + power-2 MIS against
    BSDF sampling. Oracle: MIS and NEE-only estimators must agree in the
    mean (unbiasedness), and for a LARGE emissive sphere over a lambert
    floor the MIS estimator's pixel variance must not exceed NEE-only's."""
    floor = S.make_rect_mesh((-6, 0, 6), (6, 0, 6), (6, 0, -6), (-6, 0, -6))
    spec = S.SceneSpec(
        camera=S.CameraSpec(position=(0.0, 1.2, 5.0), direction=(0.0, -0.25, -1.0),
                            fov=55.0, fov_convention="standard"),
        materials=[S.MaterialSpec(albedo=(0.7, 0.7, 0.7)),
                   S.MaterialSpec(type="emissive", emission=(6.0, 6.0, 6.0))],
        shapes=[S.ShapeSpec(floor, 0)],
        spheres=[S.SphereSpec(center=(0.0, 2.2, 0.0), radius=1.6, material=1)],
    )
    cs = compile_scene(spec)
    cfg_mis = PathTracerConfig(max_depth=3, rr_enable=False, backend="jnp",
                               mis=True)
    cfg_nee = PathTracerConfig(max_depth=3, rr_enable=False, backend="jnp",
                               mis=False)

    def renders(cfg, seeds=6, spp=24):
        return np.stack([
            np.asarray(render_image(cs.scene, cs.camera, 24, 24, spp,
                                    jax.random.key(s), cfg))
            for s in range(seeds)
        ])

    r_mis = renders(cfg_mis)
    r_nee = renders(cfg_nee)
    assert np.isfinite(r_mis).all() and np.isfinite(r_nee).all()
    m_mis, m_nee = r_mis.mean(), r_nee.mean()
    # unbiasedness: the two estimators target the same integral
    np.testing.assert_allclose(m_mis, m_nee, rtol=0.05)
    # variance: per-pixel std over seeds, averaged over the lit floor
    lit = r_mis.mean(0).sum(-1) > 0.05
    v_mis = r_mis.std(axis=0).sum(-1)[lit].mean()
    v_nee = r_nee.std(axis=0).sum(-1)[lit].mean()
    assert v_mis <= v_nee * 1.05, (v_mis, v_nee)
