"""Forward-correctness parity gate (BASELINE.md): the framework's
reference-parity estimator must be allclose to an independent NumPy
transcription of the reference algorithm at equal sample counts.

The reference's RNG is an unseeded `System.Random`, so the comparison is
converged-mean (equal spp, different sample sequences), on block-downsampled
images to integrate away residual MC noise (SURVEY §7 hard part (e)).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafrixraytracing_tpu.integrator.path import PathTracerConfig, render_image
from mafrixraytracing_tpu.scene.builtin import cornell_box
from mafrixraytracing_tpu.scene.compiler import compile_scene

from golden_numpy import GoldenScene, render as golden_render

pytestmark = pytest.mark.slow


def _golden_from_compiled(scene, light_corner, light_e1, light_e2,
                          light_normal, light_intensity):
    mask = np.asarray(scene.tri_mask)
    v0 = np.asarray(scene.tri_v0)[mask]
    e1 = np.asarray(scene.tri_e1)[mask]
    e2 = np.asarray(scene.tri_e2)[mask]
    albedo = np.asarray(scene.mat_albedo)[np.asarray(scene.tri_mat)[mask]]
    return GoldenScene(
        v0, e1, e2, albedo,
        light_corner, light_e1, light_e2, light_normal, light_intensity,
    )


@pytest.mark.slow
def test_mafrix_estimator_matches_golden_cornell():
    W = H = 24
    SPP = 96
    DEPTH = 3  # reference maxDepth (Scene/Scene.fs:304) -> 4 interactions

    cs = compile_scene(cornell_box(width=W, height=H, light_visible=False))

    # golden scene shares the EXACT compiled geometry (no re-derivation)
    s = 0.235
    h = 1.98
    golden = _golden_from_compiled(
        cs.scene,
        light_corner=(-s, h, -s),
        light_e1=(2 * s, 0, 0),       # p1 - p0
        light_e2=(0, 0, 2 * s),       # p3 - p0
        light_normal=(0, -1, 0),
        light_intensity=(10.0, 10.0, 10.0),
    )
    img_g = golden_render(
        golden, (0, 1, 3), (0, 0, -1), 120.0, W, H, SPP, DEPTH, seed=3
    )

    cfg = PathTracerConfig(
        backend="jnp", estimator="mafrix", max_depth=DEPTH + 1, rr_enable=False
    )
    img_f = np.asarray(
        render_image(cs.scene, cs.camera, W, H, SPP, jax.random.key(11), cfg)
    )

    # compare 4x4-block means (integrates MC noise); exclude the top rows
    # where the (invisible) light rect region has near-zero radiance
    def blocks(img):
        return img.reshape(H // 4, 4, W // 4, 4, 3).mean(axis=(1, 3))

    bg = blocks(img_g)
    bf = blocks(img_f)
    # overall brightness within 5%
    np.testing.assert_allclose(bf.mean(), bg.mean(), rtol=0.05)
    # per-block agreement: 95% of blocks within 15% (noise-dominated blocks
    # near shadow edges can deviate more)
    denom = np.maximum(bg, 0.02)
    rel = np.abs(bf - bg) / denom
    frac_ok = float((rel < 0.15).mean())
    assert frac_ok > 0.9, f"only {frac_ok:.2%} of blocks within 15%: max rel {rel.max():.3f}"
    # color correctness: left/right wall tint matches
    assert np.sign(bf[:, 0, 0].mean() - bf[:, 0, 1].mean()) == np.sign(
        bg[:, 0, 0].mean() - bg[:, 0, 1].mean()
    )


# ---------------------------------------------------------------------------
# Cross-backend correctness matrix (round-4 VERDICT #5): the physical
# estimator's math is identical on the jnp and Pallas backends — only the
# closest-hit/any-hit SEARCH differs, and the two searches are index-exact
# by contract (tests/test_pallas.py). With identical RNG streams the
# rendered images must therefore agree to float-accumulation noise, per
# material family (metal / dielectric / textured / spheres).
# ---------------------------------------------------------------------------

from mafrixraytracing_tpu.scene import spec as S  # noqa: E402


def _cross_backend_scene(kind):
    floor = S.make_rect_mesh((-4, 0, 4), (4, 0, 4), (4, 0, -4), (-4, 0, -4))
    light = S.make_rect_mesh((-1, 3.5, -1), (1, 3.5, -1), (1, 3.5, 1),
                             (-1, 3.5, 1))
    textures = []
    if kind == "metal":
        mat = S.MaterialSpec(type="metal", albedo=(0.9, 0.8, 0.6), fuzz=0.15)
    elif kind == "dielectric":
        mat = S.MaterialSpec(type="dielectric", albedo=(1, 1, 1), ior=1.5)
    elif kind == "glossy":
        mat = S.MaterialSpec(type="glossy", albedo=(0.8, 0.8, 0.8),
                             exponent=24.0)
    elif kind == "textured":
        from mafrixraytracing_tpu.materials.texture import checker_texture

        textures = [checker_texture((0.9, 0.9, 0.9), (0.1, 0.3, 0.1))]
        mat = S.MaterialSpec(albedo=(1.0, 1.0, 1.0), texture_id=0)
    else:
        mat = S.MaterialSpec(albedo=(0.7, 0.7, 0.7))
    spec = S.SceneSpec(
        camera=S.CameraSpec(position=(0.0, 1.3, 4.0),
                            direction=(0.0, -0.25, -1.0), fov=55.0,
                            fov_convention="standard"),
        materials=[S.MaterialSpec(albedo=(0.65, 0.65, 0.65)), mat],
        shapes=[S.ShapeSpec(floor, 1 if kind == "textured" else 0)],
        spheres=[S.SphereSpec(center=(0.0, 0.8, 0.0), radius=0.8, material=1)]
        if kind != "textured" else [],
        area_lights=[S.AreaLightSpec(light, radiance=(10.0,) * 3,
                                     visible=True)],
        textures=textures,
    )
    return compile_scene(spec)


@pytest.mark.parametrize("kind", ["metal", "dielectric", "glossy", "textured"])
def test_cross_backend_material_matrix(kind):
    cs = _cross_backend_scene(kind)
    W = H = 32
    cfg_j = PathTracerConfig(max_depth=4, rr_enable=False, backend="jnp")
    cfg_p = PathTracerConfig(max_depth=4, rr_enable=False, backend="pallas")
    key = jax.random.key(9)
    img_j = np.asarray(render_image(cs.scene, cs.camera, W, H, 8, key, cfg_j))
    img_p = np.asarray(render_image(cs.scene, cs.camera, W, H, 8, key, cfg_p))
    assert np.isfinite(img_j).all() and np.isfinite(img_p).all()
    assert img_j.max() > 0.01  # scene actually renders something
    np.testing.assert_allclose(img_p, img_j, rtol=2e-3, atol=2e-3)
