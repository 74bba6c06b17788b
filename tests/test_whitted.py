"""Deterministic Whitted tracer (reference `Core/Tracer/Whitted.fs`, DEAD —
revived here as a true delta-recursion tracer, not a path-tracer alias)."""
import jax
import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.integrator.whitted import (
    WhittedConfig,
    render_whitted,
    sky_gradient,
)
from mafrixraytracing_tpu.scene import spec as S
from mafrixraytracing_tpu.scene.builtin import cornell_box
from mafrixraytracing_tpu.scene.compiler import compile_scene

CFG = WhittedConfig(max_depth=4, backend="jnp")


def test_deterministic_bit_exact():
    """No RNG anywhere: two renders are bit-identical (unlike the stochastic
    path tracer at any fixed key)."""
    cs = compile_scene(cornell_box(width=16, height=16))
    a = render_whitted(cs.scene, cs.camera, 16, 16, CFG)
    b = render_whitted(cs.scene, cs.camera, 16, 16, CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(a)) > 0.0  # lit geometry visible


def test_mirror_recursion_sees_reflection():
    """A floor-facing mirror shows the red wall's reflected color where a
    lambert floor would not: the delta recursion really traces reflections."""
    def box(metal_floor):
        sc = cornell_box(width=24, height=24)
        if metal_floor:
            # shapes[0] is the floor: rebind it to a fresh mirror material
            sc.shapes[0].material = len(sc.materials)
            sc.materials.append(
                S.MaterialSpec(type="metal", albedo=(0.95, 0.95, 0.95), fuzz=0.0)
            )
        return compile_scene(sc)

    cs_l = box(False)
    cs_m = box(True)
    img_l = np.asarray(render_whitted(cs_l.scene, cs_l.camera, 24, 24, CFG))
    img_m = np.asarray(render_whitted(cs_m.scene, cs_m.camera, 24, 24, CFG))
    # images must differ meaningfully in the floor region (bottom rows)
    assert np.abs(img_l[-6:] - img_m[-6:]).max() > 0.05


def test_sky_gradient_miss():
    """Miss shader is the RTIOW vertical lerp
    (`RenderTest/Sample/RayTracing.fs:376-381`)."""
    d = jnp.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    sky = np.asarray(sky_gradient(d))
    np.testing.assert_allclose(sky[0], (0.5, 0.7, 1.0), atol=1e-6)
    np.testing.assert_allclose(sky[1], (1.0, 1.0, 1.0), atol=1e-6)

    # an empty scene renders pure sky
    sc = S.SceneSpec(shapes=[], area_lights=[])
    cs = compile_scene(sc)
    img = np.asarray(render_whitted(cs.scene, cs.camera, 8, 8, CFG))
    assert img.min() > 0.4  # everything is sky-colored


def test_dielectric_transmission_continues():
    """A glass pane in front of the camera still shows the scene behind it
    (deterministic refract branch)."""
    sc = cornell_box(width=16, height=16)
    # glass quad just in front of the camera
    pane = S.make_rect_mesh((-2, -2, 2.0), (2, -2, 2.0), (2, 2, 2.0), (-2, 2, 2.0))
    glass_id = len(sc.materials)
    sc.materials.append(S.MaterialSpec(type="dielectric", ior=1.5))
    sc.shapes.append(S.ShapeSpec(pane, glass_id))
    cs = compile_scene(sc)
    img = np.asarray(render_whitted(cs.scene, cs.camera, 16, 16, CFG))
    base = compile_scene(cornell_box(width=16, height=16))
    ref = np.asarray(render_whitted(base.scene, base.camera, 16, 16, CFG))
    # scene is still visible (not black), dimmed by the Fresnel factor
    assert img.max() > 0.1
    assert img.mean() < ref.mean() + 1e-6
