"""Checkpoint/resume: a progressive render interrupted and resumed from an
npz checkpoint is bit-identical to the uninterrupted render (the reference's
implicitly-resumable `Film.texture` + `frameCount` state, `Core/Film.fs:17-23`,
made explicit — SURVEY §5 checkpoint tier)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.film.film import FilmState
from mafrixraytracing_tpu.integrator.path import PathTracerConfig, render_sample_batch
from mafrixraytracing_tpu.scene.builtin import cornell_box
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.utils import checkpoint as ckpt

W = H = 16
CFG = PathTracerConfig(max_depth=2, rr_enable=False, backend="jnp")


def _accumulate(scene, camera, film, seed, start, count):
    key = jax.random.key(seed)
    for s in range(start, start + count):
        flat = render_sample_batch(scene, camera, W, H, s, key, CFG)
        film = film.add_frame(flat.reshape(H, W, 3))
    return film


def test_resume_bit_exact(tmp_path):
    cs = compile_scene(cornell_box(width=W, height=H))
    scene, camera = cs.scene, cs.camera
    seed = 42

    # uninterrupted: 4 progressive 1-spp frames
    full = _accumulate(scene, camera, FilmState.create(H, W), seed, 0, 4)

    # interrupted after 2 frames -> checkpoint -> resume
    half = _accumulate(scene, camera, FilmState.create(H, W), seed, 0, 2)
    path = os.path.join(tmp_path, "render.npz")
    ckpt.save_render_state(path, half, next_sample=2, seed=seed)

    film2, next_sample, seed2 = ckpt.load_render_state(path)
    assert (next_sample, seed2) == (2, seed)
    resumed = _accumulate(scene, camera, film2, seed2, next_sample, 2)

    np.testing.assert_array_equal(
        np.asarray(full.radiance_sum), np.asarray(resumed.radiance_sum)
    )
    assert int(resumed.frame_count) == int(full.frame_count) == 4
    # display path smoke: tonemapped output identical too
    np.testing.assert_array_equal(
        np.asarray(full.display()), np.asarray(resumed.display())
    )


def test_scene_roundtrip(tmp_path):
    cs = compile_scene(cornell_box(width=W, height=H))
    scene = cs.scene
    path = os.path.join(tmp_path, "scene.npz")
    ckpt.save_scene(path, scene)
    back = ckpt.load_scene(path, scene)
    for a, b in zip(
        jax.tree_util.tree_leaves(scene), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
