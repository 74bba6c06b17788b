"""Morton (Z-order) codes for spatial sorting — host-side NumPy.

The TPU-native replacement for the reference's recursive median-split BVH
build (`Core/Accelerate/BvhNode.fs:42-61`): triangles are sorted by the
Morton code of their centroid, which makes *contiguous index ranges
spatially coherent*. Acceleration then becomes fixed-size clusters of
consecutive triangles with AABBs — a structure with zero pointers, ideal for
masked SIMD traversal on the VPU (SURVEY §7 M1).
"""
from __future__ import annotations

import numpy as np


def _expand_bits_21(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of x so there are 2 zero bits between each
    (uint64 in, uint64 out)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton_codes(points: np.ndarray) -> np.ndarray:
    """(N, 3) float points -> (N,) uint64 63-bit Morton codes (21 bits per
    axis, normalized to the point cloud's AABB)."""
    pts = np.asarray(points, np.float64)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    extent = np.maximum(hi - lo, 1e-12)
    q = np.clip(((pts - lo) / extent) * (2**21 - 1), 0, 2**21 - 1).astype(np.uint64)
    return (
        (_expand_bits_21(q[:, 0]) << np.uint64(2))
        | (_expand_bits_21(q[:, 1]) << np.uint64(1))
        | _expand_bits_21(q[:, 2])
    )


def morton_order(points: np.ndarray) -> np.ndarray:
    """Permutation sorting points into Morton order (stable)."""
    return np.argsort(morton_codes(points), kind="stable")
