import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafrixraytracing_tpu.accel.clusters import (
    CLUSTER_SIZE,
    build_clusters,
    refresh_clusters,
)
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.geometry import intersect as isect
from mafrixraytracing_tpu.scene.builtin import cornell_box
from mafrixraytracing_tpu.scene.compiler import compile_scene




def test_cluster_bounds_contain_triangles():
    cs = compile_scene(cornell_box())
    s = cs.scene
    T = s.tri_v0.shape[0]
    C = s.cluster_min.shape[0]
    assert C * CLUSTER_SIZE == T
    v0 = np.asarray(s.tri_v0)
    e1 = np.asarray(s.tri_e1)
    e2 = np.asarray(s.tri_e2)
    mask = np.asarray(s.tri_mask)
    cmin = np.asarray(s.cluster_min)
    cmax = np.asarray(s.cluster_max)
    mega = np.asarray(s.mega_ids)
    mega = set(mega[mega >= 0].tolist())
    for t in range(T):
        # mega triangles are deliberately outside the clusters: the dense
        # jnp test in ops.intersect_pallas owns them
        if not mask[t] or t in mega:
            continue
        c = t // CLUSTER_SIZE
        for p in (v0[t], v0[t] + e1[t], v0[t] + e2[t]):
            assert (p >= cmin[c] - 1e-4).all(), (t, c)
            assert (p <= cmax[c] + 1e-4).all(), (t, c)


def test_empty_clusters_are_inverted():
    cs = compile_scene(cornell_box())
    s = cs.scene
    mask = np.asarray(s.tri_mask).reshape(-1, CLUSTER_SIZE)
    empty = ~mask.any(axis=1)
    if empty.any():
        cmin = np.asarray(s.cluster_min)[empty]
        cmax = np.asarray(s.cluster_max)[empty]
        assert (cmin > cmax).all()


def test_render_unchanged_by_cluster_reorder():
    """The accel build's triangle reordering is an implementation detail: the closest hit for
    any ray must be identical (same t, same surface point)."""
    cs = compile_scene(cornell_box())
    key = jax.random.key(0)
    d = jax.random.normal(key, (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((64, 3)) + jnp.array([0.0, 1.0, 1.0])
    hit = isect.intersect_scene(cs.scene, Rays(origin=o, direction=d))
    # the box is open at z=+1 (no front wall), so only most rays hit
    assert float(jnp.mean(hit.valid)) > 0.5
    assert np.isfinite(np.asarray(hit.t)).all()
    # spot check against a slow direct NumPy Moller-Trumbore evaluation
    v0 = np.asarray(cs.scene.tri_v0)
    e1 = np.asarray(cs.scene.tri_e1)
    e2 = np.asarray(cs.scene.tri_e2)
    mask = np.asarray(cs.scene.tri_mask)
    on, dn = np.asarray(o), np.asarray(d)
    for i in range(8):
        ts = []
        for t_idx in range(v0.shape[0]):
            if not mask[t_idx]:
                continue
            pvec = np.cross(dn[i], e2[t_idx])
            det = np.dot(e1[t_idx], pvec)
            if abs(det) < 1e-10:
                continue
            tvec = on[i] - v0[t_idx]
            u = np.dot(tvec, pvec) / det
            qvec = np.cross(tvec, e1[t_idx])
            v = np.dot(dn[i], qvec) / det
            tt = np.dot(e2[t_idx], qvec) / det
            if u >= 0 and v >= 0 and u + v <= 1 and 1e-4 < tt < 1e8:
                ts.append(tt)
        if ts:
            assert bool(hit.valid[i])
            np.testing.assert_allclose(float(hit.t[i]), min(ts), rtol=1e-4)
        else:
            assert not bool(hit.valid[i])


def test_refresh_clusters_tracks_moved_vertices():
    cs = compile_scene(cornell_box())
    s = cs.scene
    moved = s.replace(tri_v0=s.tri_v0 + jnp.array([0.0, 5.0, 0.0]))
    refreshed = refresh_clusters(moved)
    valid_cluster = np.asarray(s.tri_mask).reshape(-1, CLUSTER_SIZE).any(axis=1)
    dmin = np.asarray(refreshed.cluster_min - s.cluster_min)[valid_cluster]
    # v0-shift moves whole triangles (e1/e2 relative) -> bounds shift up
    assert (dmin[:, 1] >= 4.99).all()
