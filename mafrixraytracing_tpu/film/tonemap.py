"""Post-processing: ACES filmic tone map + gamma.

Exact math parity with the reference post chain
(`Scene/Scene.fs:273-330`): Narkowicz ACES curve
`(x*(2.51x + 0.03)) / (x*(2.43x + 0.59) + 0.14)` clamped to [0,1]
(`Scene.fs:280-289`), then gamma via sqrt, then *255.99 to bytes
(`Scene.fs:315-330`).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def aces(x: Array) -> Array:
    """Narkowicz ACES filmic approximation (reference `Scene.fs:280-289`)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def gamma_sqrt(x: Array) -> Array:
    """Gamma 2.0 via sqrt (reference uses `sqrt`, `Scene.fs:318`)."""
    return jnp.sqrt(jnp.clip(x, 0.0, 1.0))


def tonemap(linear: Array) -> Array:
    """Linear HDR -> display [0,1]: ACES then sqrt gamma."""
    return gamma_sqrt(aces(linear))


def to_bytes(display: Array) -> Array:
    """[0,1] -> uint8 with the reference's 255.99 scale (`Scene.fs:325`)."""
    return jnp.clip(display * 255.99, 0.0, 255.0).astype(jnp.uint8)
