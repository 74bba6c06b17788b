import jax
import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.integrator.path import PathTracerConfig, trace_radiance
from mafrixraytracing_tpu.materials.texture import (
    build_atlas,
    checker_texture,
    perlin_texture,
    sample_atlas,
)
from mafrixraytracing_tpu.scene import spec as S
from mafrixraytracing_tpu.scene.compiler import compile_scene

CFG = PathTracerConfig(backend="jnp", max_depth=1, rr_enable=False)


def test_atlas_build_and_sample_corners():
    img = np.zeros((4, 4, 3), np.float32)
    img[0, 0] = [1, 0, 0]      # top-left of the image
    atlas = jnp.asarray(build_atlas([img], res=4))
    # OBJ uv (0,1) = top-left (v up, flipped at sample time)
    c = sample_atlas(atlas, jnp.array([0]), jnp.array([[0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(c[0]), [1, 0, 0], atol=1e-5)
    # untextured id -1 -> white
    c = sample_atlas(atlas, jnp.array([-1]), jnp.array([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(c[0]), [1, 1, 1])


def test_bilinear_interpolation():
    img = np.zeros((2, 2, 3), np.float32)
    img[:, 1] = 1.0  # right column white
    atlas = jnp.asarray(build_atlas([img], res=2))
    mid = sample_atlas(atlas, jnp.array([0]), jnp.array([[0.5, 0.5]]))
    assert 0.2 < float(mid[0, 0]) < 0.8


def test_checker_and_perlin_shapes():
    ch = checker_texture(tiles=4, res=32)
    assert ch.shape == (32, 32, 3)
    assert not np.allclose(ch[0, 0], ch[0, 8])  # alternating tiles
    pn = perlin_texture(res=32)
    assert pn.shape == (32, 32, 3)
    assert 0.0 <= pn.min() and pn.max() <= 1.0
    assert pn.std() > 0.05


def test_textured_material_modulates_render():
    """A floor textured with a black/white checker must render different
    radiance at uv locations of different tiles."""
    floor = S.Mesh(
        vertices=np.asarray(
            [[-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1]], np.float32
        ),
        faces=np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        face_uvs=np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    light = S.make_rect_mesh((-2, 3, -2), (2, 3, -2), (2, 3, 2), (-2, 3, 2))
    spec = S.SceneSpec(
        materials=[S.MaterialSpec(albedo=(1.0, 1.0, 1.0), texture_id=0)],
        shapes=[S.ShapeSpec(floor, 0)],
        area_lights=[S.AreaLightSpec(light, radiance=(5.0,) * 3, visible=False)],
        textures=[checker_texture((1, 1, 1), (0, 0, 0), tiles=2, res=64)],
    )
    scene = compile_scene(spec).scene

    def radiance_at(x, z, n=256):
        o = jnp.tile(jnp.array([[x, 1.0, z]], jnp.float32), (n, 1))
        d = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (n, 1))
        keys = rng.pixel_keys(jax.random.key(0), n)
        return float(
            jnp.mean(trace_radiance(scene, Rays(origin=o, direction=d), keys, CFG))
        )

    # quadrant centers map to opposite checker tiles
    bright = radiance_at(-0.5, 0.5)
    dark = radiance_at(0.5, 0.5)
    assert (bright > 5 * max(dark, 1e-6)) or (dark > 5 * max(bright, 1e-6))
