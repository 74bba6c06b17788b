"""Pallas TPU closest-hit kernel (placeholder gate for round-1 M0).

The real kernel lands with the wavefront milestone; until then `supports`
returns False so dispatch always uses the jnp path.
"""
from __future__ import annotations


def supports(scene) -> bool:
    return False


def find_closest(scene, rays, t_min, t_max):  # pragma: no cover
    raise NotImplementedError


def occluded(scene, rays, t_min, t_max):  # pragma: no cover
    raise NotImplementedError
