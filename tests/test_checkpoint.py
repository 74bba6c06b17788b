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


def test_sharded_fit_restart_bit_exact(tmp_path):
    """Failure recovery for a SHARDED inverse fit (round-4: the coverage
    table's 'nothing exercises a restart of a sharded fit'): run 8 steps
    uninterrupted; separately run 4 steps with checkpointing, simulate a
    crash, resume from the checkpoint for the remaining 4 — the final
    parameters and loss trace must match bit-exactly (counter-based key
    chain is saved/restored)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mafrixraytracing_tpu.integrator.path import PathTracerConfig
    from mafrixraytracing_tpu.opt import inverse
    from mafrixraytracing_tpu.parallel.mesh import make_mesh
    from mafrixraytracing_tpu.parallel.render import render_image_sharded
    from mafrixraytracing_tpu.scene import spec as S
    from mafrixraytracing_tpu.scene.compiler import compile_scene

    W = H = 16
    floor = S.make_rect_mesh((-2, 0, 2), (2, 0, 2), (2, 0, -2), (-2, 0, -2))
    light = S.make_rect_mesh((-0.6, 2.0, -0.6), (0.6, 2.0, -0.6),
                             (0.6, 2.0, 0.6), (-0.6, 2.0, 0.6))
    spec = S.SceneSpec(
        materials=[S.MaterialSpec(albedo=(0.4, 0.6, 0.5))],
        shapes=[S.ShapeSpec(floor, 0)],
        area_lights=[S.AreaLightSpec(light, radiance=(10.0,) * 3,
                                     visible=False)],
    )
    cfg = PathTracerConfig(max_depth=2, rr_enable=False, backend="jnp")
    cs = compile_scene(spec)
    scene, camera = cs.scene, cs.camera
    mesh = make_mesh()
    target = jax.block_until_ready(
        render_image_sharded(scene, camera, mesh, W, H, 4, jax.random.key(7),
                             cfg)
    )
    bad = scene.replace(mat_albedo=scene.mat_albedo.at[0].set(
        jnp.asarray([0.8, 0.2, 0.2])))

    common = dict(param_names=("mat_albedo",), mesh=mesh, lr=5e-2, spp=2,
                  key=jax.random.key(3), config=cfg)
    ref_scene, ref_losses = inverse.fit(bad, camera, target, steps=8, **common)

    ck = str(tmp_path / "fit_ck")
    # phase 1: 4 steps then "crash" (function returns; state is on disk)
    inverse.fit(bad, camera, target, steps=4, checkpoint_path=ck,
                checkpoint_every=2, **common)
    # phase 2: restart the SAME fit asking for 8 total — resumes at step 4
    res_scene, res_losses = inverse.fit(
        bad, camera, target, steps=8, checkpoint_path=ck,
        checkpoint_every=2, **common
    )
    assert len(res_losses) == 4  # only the resumed half ran
    np.testing.assert_array_equal(np.asarray(res_scene.mat_albedo),
                                  np.asarray(ref_scene.mat_albedo))
    np.testing.assert_allclose(res_losses, ref_losses[4:], rtol=0, atol=0)
