"""Direct-lighting-only integrators.

Parity with the reference's direct-integrator family
(`Core/Integrator/Integrators.fs:20-78`):
- `SingleDirectLightIntegrator.Eval` -> NEE against the (single) area light
  with a shadow ray — here `render_direct` with the full light table.
- `RandomDirectLightIntegrator` (uniform light pick, compiled-but-unused in
  the reference) — subsumed by the area-weighted CDF pick in
  `lights.sample_area_lights`; uniform picking was a variance pessimization,
  not a capability.
- `RayCast`-style tracer (`Core/Tracer/RayCast.fs`, DEAD in the reference):
  first-hit shading with no recursion == `render_direct`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.integrator.path import PathTracerConfig, trace_radiance


def direct_config(**overrides) -> PathTracerConfig:
    """One bounce, NEE only: camera ray -> hit -> light sampling."""
    base = dict(max_depth=1, nee=True, mis=True, rr_enable=False)
    base.update(overrides)
    return PathTracerConfig(**base)


def trace_direct(scene, rays: Rays, keys: Array, **overrides) -> Array:
    return trace_radiance(scene, rays, keys, direct_config(**overrides))
