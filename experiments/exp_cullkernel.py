"""Experiment: standalone Pallas cull kernel vs XLA _cull (round 5).

Grid = n_tiles//8 steps; each step culls 8 ray tiles (1024 rays): slab
tests in VMEM, one (8, CP) row-independent bitonic sort, writes sorted
lists/entries + counts + per-ray far. Rays arrive component-major
((n_tiles*8, TILE): rows = 8 components per tile) so every HBM buffer at
the kernel boundary is dense — no (B, 8)/(B, 1) lane-padded layouts.
"""
import os, sys, time
import jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import lax
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mafrixraytracing_tpu.ops import intersect_pallas as IP
from mafrixraytracing_tpu.ops.intersect_pallas import (
    TILE, CP, BIG, pack_aabbs, _lane_bitonic_sort)
from mafrixraytracing_tpu.core.v3 import V3
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.integrator import path as P

W = H = 256
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera

px, py = P.make_pixel_uv(W, H)
u = (px + 0.5) / W
v = (py + 0.5) / H
rays = camera.get_rays(u, v)
o = jnp.tile(rays.origin, (8, 1))
d = jnp.tile(rays.direction, (8, 1))
B = o.shape[0]
print("B =", B, "clusters =", scene.cluster_min.shape[0])


def timed(name, fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:55s} {dt*1e3:9.3f} ms")
    return r


def _slab8(aabb_ref, rt, t_max):
    """Slab test one tile: rt (TILE, 8) ray records. Returns (entry row
    (1, CP), far col (TILE, 1))."""
    tn = jnp.full((TILE, CP), -BIG, jnp.float32)
    tf = jnp.full((TILE, CP), BIG, jnp.float32)
    for a in range(3):
        oa = rt[:, a:a + 1]
        da = rt[:, 3 + a:4 + a]
        safe = jnp.where(jnp.abs(da) > 1e-12, da,
                         jnp.where(da >= 0, 1e-12, -1e-12))
        r0 = pl.reciprocal(safe, approx=True)
        inv = r0 * (2.0 - safe * r0)
        t0 = (aabb_ref[a:a + 1, :] - oa) * inv
        t1 = (aabb_ref[3 + a:4 + a, :] - oa) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    live = jnp.broadcast_to(aabb_ref[6:7, :], (TILE, CP)) > 0.5
    hitm = live & (tn <= tf) & (tf > 0.0) & (tn < t_max)
    entry = jnp.where(hitm, jnp.maximum(tn, 0.0), BIG)
    far = jnp.max(jnp.where(hitm, tf, -BIG), axis=1, keepdims=True)
    far = jnp.minimum(far, t_max)
    return jnp.min(entry, axis=0, keepdims=True), far


def _cull_kernel(aabb_ref, rays_ref, list_out, entry_out, count_out, far_out):
    rows, fars = [], []
    for j in range(8):
        rt = rays_ref[j * 8:(j + 1) * 8, :].T  # (TILE, 8)
        t_max = rt[:, 6:7]
        e, far = _slab8(aabb_ref, rt, t_max)
        rows.append(e)
        fars.append(far.T)
    entry8 = jnp.concatenate(rows, axis=0)          # (8, CP)
    ids8 = lax.broadcasted_iota(jnp.int32, (8, CP), 1)
    entry_s, ids_s = _lane_bitonic_sort(entry8, ids8)
    list_out[:] = ids_s
    entry_out[:] = entry_s
    count_out[:] = jnp.sum((entry_s < BIG).astype(jnp.int32), axis=1,
                           keepdims=True)
    far_out[:] = jnp.concatenate(fars, axis=0)      # (8, TILE)


@jax.jit
def cull_pallas(aabbs, rays_cm):
    n_tiles = rays_cm.shape[0] // 8
    return pl.pallas_call(
        _cull_kernel,
        grid=(n_tiles // 8,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((64, TILE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, CP), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, CP), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((8, CP), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CP), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
    )(aabbs, rays_cm)


def pack_rays_cm(o, d, t_max):
    n_tiles = o.x.shape[0] // TILE
    cols = [o.x, o.y, o.z, d.x, d.y, d.z, t_max, jnp.zeros_like(t_max)]
    cm = jnp.stack([c.reshape(n_tiles, TILE) for c in cols], axis=1)
    return cm.reshape(n_tiles * 8, TILE)


oV = V3.of(o); dV = V3.of(d)
t_max = jnp.full((B,), 1e8, jnp.float32)
aabbs = pack_aabbs(scene.cluster_min, scene.cluster_max)

xla_cull = jax.jit(lambda o_, d_, t: IP._cull(o_, d_, t, scene.cluster_min,
                                              scene.cluster_max))
r_xla = timed("XLA _cull (B=512k, C=64)", xla_cull, oV, dV, t_max)

pk = jax.jit(pack_rays_cm)
rays_cm = timed("pack_rays_cm", pk, oV, dV, t_max)
r_pl = timed("pallas cull kernel", cull_pallas, aabbs, rays_cm)

both = jax.jit(lambda o_, d_, t: cull_pallas(aabbs, pack_rays_cm(o_, d_, t)))
timed("pack + pallas cull (one jit)", both, oV, dV, t_max)

lists_x, counts_x, entries_x, far_x = [jnp.asarray(a) for a in r_xla]
lists_p, entries_p, counts_p, far_p = [jnp.asarray(a) for a in r_pl]
print("counts equal:", bool(jnp.all(counts_x == counts_p[:, 0])))
import numpy as np
lx, cx, ex = np.asarray(lists_x), np.asarray(counts_x), np.asarray(entries_x)
lp, ep = np.asarray(lists_p), np.asarray(entries_p)
n_bad = 0
for i in range(0, lx.shape[0], 57):
    k = cx[i]
    if set(lx[i, :k]) != set(lp[i, :k]) or not np.allclose(
            ex[i, :k], ep[i, :k], rtol=1e-5):
        n_bad += 1
print("mismatched tiles (sampled):", n_bad)
print("far allclose:", bool(jnp.allclose(far_x, far_p.reshape(-1),
                                         rtol=1e-5)))
