"""Deterministic, counter-based RNG discipline.

The reference calls `System.Random`/`Random.Shared` ad hoc from every thread
(e.g. `Core/Materials/Material.fs:9-14`, `Core/Integrator/Integrators.fs:162-168`),
so renders are unseeded and unreproducible. Here every random draw derives
from a root `jax.random` key folded with structural counters
(pixel, sample, bounce), making renders bit-reproducible and replayable —
including across different device meshes, since keys depend only on logical
indices, never on device placement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def root_key(seed: int) -> Array:
    return jax.random.key(seed)


def pixel_keys(key: Array, n: int) -> Array:
    """One key per element of a flat pixel/ray batch: fold_in(vmap) of the
    batch index, so key identity is positional and mesh-invariant."""
    idx = jnp.arange(n, dtype=jnp.uint32)
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)


def _fold(key: Array, data) -> Array:
    """fold_in that accepts batched key arrays (vmaps over leading dims)."""
    if key.ndim:
        return jax.vmap(lambda k: jax.random.fold_in(k, data))(key)
    return jax.random.fold_in(key, data)


def sample_key(key: Array, sample_idx) -> Array:
    return _fold(key, sample_idx)


def bounce_key(key: Array, bounce_idx) -> Array:
    return _fold(key, bounce_idx)


def split_dim(key: Array, dim: int) -> Array:
    """Per-dimension key under one logical draw site."""
    return _fold(key, jnp.uint32(dim))


def uniforms(key: Array, dim: int, shape=()) -> Array:
    """Per-key uniform draws at draw-site `dim`: for a batched key array of
    shape (B,), returns (B, *shape) uniforms in [0, 1)."""
    k = split_dim(key, dim)
    if k.ndim:
        return jax.vmap(lambda kk: jax.random.uniform(kk, shape))(k)
    return jax.random.uniform(k, shape)
