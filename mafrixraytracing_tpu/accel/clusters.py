"""Morton-clustered triangle acceleration (host build, device traversal).

Build (NumPy): sort triangles by centroid Morton code, group consecutive
runs of `CLUSTER_SIZE` into clusters, store per-cluster AABBs. Because the
sort makes consecutive triangles spatially coherent, a cluster AABB is a
tight bound, and traversal = "test cluster AABB, only then test its
triangles" — the branch-free, pointer-free analog of the reference's BVH
(`Core/Accelerate/BvhNode.fs:11-84`; its leaf size 3 and recursive descent
become cluster size 64 and a masked loop).

The device-side consumers are:
- `ops.intersect_pallas` — Pallas kernel with per-ray-tile cluster skipping.
- `geometry.intersect_clustered` — jnp path that uses cluster AABB distances
  to bound the search (used for correctness checks).

A second level ("supercluster" AABBs over runs of `SUPER_FACTOR` clusters)
caps the cluster scan for large scenes (Renault12TL, 37k tris).
"""
from __future__ import annotations

import numpy as np

# 128 = TPU lane width: the Pallas kernel tests one cluster (sublanes)
# against one ray tile (lanes) as a single (128, 128) vector op.
CLUSTER_SIZE = 128
SUPER_FACTOR = 16  # clusters per supercluster

_EMPTY_MIN = np.float32(3e38)
_EMPTY_MAX = np.float32(-3e38)


def build_clusters(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, mask: np.ndarray):
    """Compute the Morton permutation and cluster/supercluster AABBs for a
    padded triangle SoA. Returns a dict:
      perm        (T,)   permutation to apply to every per-tri array
      cluster_min (C,3), cluster_max (C,3)
      super_min   (S,3), super_max   (S,3)
    Padded (masked-out) triangles sort to the end and produce empty AABBs
    (min > max), which fail every slab test.
    """
    from mafrixraytracing_tpu.accel.morton import morton_codes

    T = v0.shape[0]
    n_valid = int(mask.sum())
    centroids = v0 + (e1 + e2) / 3.0

    codes = morton_codes(centroids[:n_valid]) if n_valid else np.zeros(0, np.uint64)
    perm_valid = np.argsort(codes, kind="stable")
    perm = np.concatenate([perm_valid, np.arange(n_valid, T)]).astype(np.int64)

    v0s, e1s, e2s = v0[perm], e1[perm], e2[perm]
    masks = mask[perm]

    p0 = v0s
    p1 = v0s + e1s
    p2 = v0s + e2s
    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    tri_min = np.where(masks[:, None], tri_min, _EMPTY_MIN)
    tri_max = np.where(masks[:, None], tri_max, _EMPTY_MAX)

    C = (T + CLUSTER_SIZE - 1) // CLUSTER_SIZE
    pad = C * CLUSTER_SIZE - T
    if pad:
        tri_min = np.concatenate(
            [tri_min, np.full((pad, 3), _EMPTY_MIN, np.float32)]
        )
        tri_max = np.concatenate(
            [tri_max, np.full((pad, 3), _EMPTY_MAX, np.float32)]
        )
    cluster_min = tri_min.reshape(C, CLUSTER_SIZE, 3).min(axis=1)
    cluster_max = tri_max.reshape(C, CLUSTER_SIZE, 3).max(axis=1)

    S = (C + SUPER_FACTOR - 1) // SUPER_FACTOR
    spad = S * SUPER_FACTOR - C
    cmin_p = np.concatenate(
        [cluster_min, np.full((spad, 3), _EMPTY_MIN, np.float32)]
    )
    cmax_p = np.concatenate(
        [cluster_max, np.full((spad, 3), _EMPTY_MAX, np.float32)]
    )
    super_min = cmin_p.reshape(S, SUPER_FACTOR, 3).min(axis=1)
    super_max = cmax_p.reshape(S, SUPER_FACTOR, 3).max(axis=1)

    return {
        "perm": perm,
        "cluster_min": cluster_min.astype(np.float32),
        "cluster_max": cluster_max.astype(np.float32),
        "super_min": super_min.astype(np.float32),
        "super_max": super_max.astype(np.float32),
    }


def refresh_clusters(scene):
    """Recompute cluster/supercluster AABBs on-device from the scene's
    (possibly updated) triangle arrays — required after vertex-position
    optimization steps so the Pallas culling path stays conservative. Pure
    jnp; cheap (O(T)); keeps the Morton order fixed (a slightly stale order
    only loosens bounds, never correctness)."""
    import jax.numpy as jnp

    v0, e1, e2 = scene.tri_v0, scene.tri_e1, scene.tri_e2
    mask = scene.tri_mask[:, None]
    p1, p2 = v0 + e1, v0 + e2
    tmin = jnp.minimum(jnp.minimum(v0, p1), p2)
    tmax = jnp.maximum(jnp.maximum(v0, p1), p2)
    tmin = jnp.where(mask, tmin, _EMPTY_MIN)
    tmax = jnp.where(mask, tmax, _EMPTY_MAX)

    C = scene.cluster_min.shape[0]
    k = v0.shape[0] // C
    cmin = tmin.reshape(C, k, 3).min(axis=1)
    cmax = tmax.reshape(C, k, 3).max(axis=1)

    S = scene.super_min.shape[0]
    pad = S * SUPER_FACTOR - C
    cmin_p = jnp.concatenate(
        [cmin, jnp.full((pad, 3), _EMPTY_MIN, jnp.float32)]
    )
    cmax_p = jnp.concatenate(
        [cmax, jnp.full((pad, 3), _EMPTY_MAX, jnp.float32)]
    )
    smin = cmin_p.reshape(S, SUPER_FACTOR, 3).min(axis=1)
    smax = cmax_p.reshape(S, SUPER_FACTOR, 3).max(axis=1)
    return scene.replace(
        cluster_min=cmin, cluster_max=cmax, super_min=smin, super_max=smax
    )
