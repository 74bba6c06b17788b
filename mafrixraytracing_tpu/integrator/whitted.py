"""Whitted-style deterministic tracer.

Parity with the reference's (commented-out) Whitted tracer
(`Core/Tracer/Whitted.fs`, DEAD — SURVEY §2.8) and the sky-gradient miss
shader its dead tracers share (`Core/Tracer/PathTracer.fs:48-67`): perfect
mirror/refraction recursion with direct lighting at diffuse hits, no Monte
Carlo in the bounce decision (only the light-sample position is random).

TPU-native form: the "recursion" is the same masked wavefront loop as the
path tracer — a Whitted tracer is the path tracer with deterministic delta
bounces, so we implement it as a thin config + a sky-gradient background.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.integrator.path import PathTracerConfig, trace_radiance


def sky_gradient(directions: Array) -> Array:
    """The RTIOW vertical blue-white lerp used by the reference's miss
    shaders (`RenderTest/Sample/RayTracing.fs:376-381`)."""
    t = 0.5 * (directions[..., 1] + 1.0)
    white = jnp.array([1.0, 1.0, 1.0])
    blue = jnp.array([0.5, 0.7, 1.0])
    return (1.0 - t)[..., None] * white + t[..., None] * blue


def whitted_config(max_depth: int = 5) -> PathTracerConfig:
    """Whitted = NEE at every hit + delta-only continuation. With our BSDF
    table, lambert surfaces terminate after their NEE contribution when
    depth is exhausted; metal/dielectric continue deterministically (their
    'sampling' is the deterministic reflect/refract choice)."""
    return PathTracerConfig(max_depth=max_depth, nee=True, mis=True, rr_enable=False)


def trace_whitted(scene, rays: Rays, keys, max_depth: int = 5) -> Array:
    return trace_radiance(scene, rays, keys, whitted_config(max_depth))
