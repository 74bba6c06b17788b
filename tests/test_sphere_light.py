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
