"""Instrumented kernel variants: how many clusters are walked? What does a
full walk (no early exit) cost? What does per-row bookkeeping cost?"""
import os, sys, time
from functools import partial

import jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax import lax
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.ops import intersect_pallas as IP
from mafrixraytracing_tpu.ops.intersect_pallas import (
    TILE, GROUP, ROWS, EXIT_CHECK, CLUSTER_SIZE, T_MIN_CONST, _mt_terms,
    _search_specs, pack_tris, _cull, _pack_rays,
)
from mafrixraytracing_tpu.ops import dispatch
from mafrixraytracing_tpu.materials.bsdf import sample_bsdf

W = H = 256
SPP_G = 8
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera
B = W * H


def timed(name, fn, *args, n=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt*1e3:9.2f} ms", flush=True)
    return r, dt


# instrumented kernel: also outputs walked-cluster count per tile
def _closest_kernel_dbg(list_ref, count_ref, entry_ref, ray_ref, tri_ref,
                        t_out, i_out, k_out):
    r = pl.program_id(0) % GROUP
    rc = tuple(ray_ref[:, i : i + 1] for i in range(6))
    t_max = ray_ref[:, 6:7]
    far = ray_ref[:, 7:8]
    lanes = lax.broadcasted_iota(jnp.int32, (TILE, CLUSTER_SIZE), 1)
    n = count_ref[r, 0]

    def test_cluster(k, best_t, best_i):
        c = list_ref[r, k]
        t, valid = _mt_terms(rc, tri_ref, c)
        valid = valid & (t > T_MIN_CONST) & (t < best_t)
        new_t = jnp.where(valid, t, best_t)
        new_i = jnp.where(valid, lanes + c * CLUSTER_SIZE, best_i)
        return new_t, new_i

    def chunk_body(state):
        k, best_t, best_i = state

        def one(j, bb):
            bt, bi = bb
            idx = jnp.minimum(k + j, jnp.maximum(n - 1, 0))
            nt, ni = test_cluster(idx, bt, bi)
            in_range = (k + j) < n
            bt = jnp.where(in_range, nt, bt)
            bi = jnp.where(in_range, ni, bi)
            return bt, bi

        best_t, best_i = lax.fori_loop(0, EXIT_CHECK, one, (best_t, best_i))
        return k + EXIT_CHECK, best_t, best_i

    def chunk_cond(state):
        k, best_t, _ = state
        limit = jnp.minimum(jnp.min(best_t, axis=1, keepdims=True), far)
        worst = jnp.max(limit)
        return (k < n) & (entry_ref[r, jnp.minimum(k, n - 1)] < worst)

    init = (
        jnp.int32(0),
        jnp.broadcast_to(t_max, (TILE, CLUSTER_SIZE)),
        jnp.full((TILE, CLUSTER_SIZE), -1, jnp.int32),
    )
    kf, best_t, best_i = lax.while_loop(chunk_cond, chunk_body, init)
    row_t = jnp.min(best_t, axis=1, keepdims=True)
    row_i = jnp.min(
        jnp.where(best_t <= row_t, best_i, jnp.int32(2**31 - 1)),
        axis=1, keepdims=True,
    )
    hit = row_t < t_max
    t_out[:] = row_t
    i_out[:] = jnp.where(hit, row_i, -1)
    k_out[:] = jnp.broadcast_to(jnp.minimum(kf, n)[None, None], (TILE, 1))


# full walk: no early exit at all (upper bound on walk cost)
def _closest_kernel_full(list_ref, count_ref, entry_ref, ray_ref, tri_ref,
                         t_out, i_out):
    r = pl.program_id(0) % GROUP
    rc = tuple(ray_ref[:, i : i + 1] for i in range(6))
    t_max = ray_ref[:, 6:7]
    lanes = lax.broadcasted_iota(jnp.int32, (TILE, CLUSTER_SIZE), 1)
    n = count_ref[r, 0]

    def body(k, bb):
        bt, bi = bb
        c = list_ref[r, k]
        t, valid = _mt_terms(rc, tri_ref, c)
        valid = valid & (t > T_MIN_CONST) & (t < bt)
        return jnp.where(valid, t, bt), jnp.where(valid, lanes + c * CLUSTER_SIZE, bi)

    init = (
        jnp.broadcast_to(t_max, (TILE, CLUSTER_SIZE)),
        jnp.full((TILE, CLUSTER_SIZE), -1, jnp.int32),
    )
    best_t, best_i = lax.fori_loop(0, n, body, init)
    row_t = jnp.min(best_t, axis=1, keepdims=True)
    row_i = jnp.min(
        jnp.where(best_t <= row_t, best_i, jnp.int32(2**31 - 1)),
        axis=1, keepdims=True,
    )
    hit = row_t < t_max
    t_out[:] = row_t
    i_out[:] = jnp.where(hit, row_i, -1)


def run_kernel(kernel, tri_pack, lists, counts, entries, rays8, extra_out=False):
    Bp = rays8.shape[0]
    n_tiles = Bp // TILE
    specs = _search_specs(n_tiles, lists.shape[1])
    outs = [
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((TILE, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
    ]
    if extra_out:
        outs.append(jax.ShapeDtypeStruct((Bp, 1), jnp.int32))
        out_specs.append(
            pl.BlockSpec((TILE, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        kernel, out_shape=outs, out_specs=out_specs, **specs
    )(lists, counts.reshape(-1, 1), entries, rays8, tri_pack)


@partial(jax.jit, static_argnames=("which",))
def search(s, o, d, t_max, which="dbg"):
    lists, counts, entries, far = _cull(o, d, t_max, s.cluster_min, s.cluster_max)
    rays8 = _pack_rays(o, d, t_max, far)
    tp = pack_tris(s)
    if which == "dbg":
        return run_kernel(_closest_kernel_dbg, tp, lists, counts, entries, rays8,
                          extra_out=True)
    return run_kernel(_closest_kernel_full, tp, lists, counts, entries, rays8)


# --- wavefronts ---
perm, inv = P.tiled_pixel_order(W, H, *P._spp_tile_shape(SPP_G))
px, py = P.make_pixel_uv(W, H)
px, py = px[perm], py[perm]
pxg, pyg = jnp.repeat(px, SPP_G), jnp.repeat(py, SPP_G)
key = jax.random.key(0)
bk = rng.pixel_keys(key, B)
sk = jax.vmap(lambda s: rng.sample_key(bk, s))(jnp.arange(SPP_G))
sk = jnp.swapaxes(sk, 0, 1).reshape(B * SPP_G)
jit_uv = rng.uniforms(sk, 1000, (2,))
u = (pxg + jit_uv[:, 0]) / W
v = (pyg + jit_uv[:, 1]) / H
prim = camera.get_rays(u, v)
BG = B * SPP_G
tmax_all = jnp.full((BG,), 1e8, jnp.float32)
print(f"TILE={TILE} EXIT_CHECK={EXIT_CHECK}", flush=True)

(t1, i1, kw), _ = timed("closest primary dbg", lambda: search(scene, prim.origin, prim.direction, tmax_all))
import numpy as np
kwn = np.asarray(kw[::TILE, 0])
print(f"primary walked/tile: mean {kwn.mean():.1f} p50 {np.percentile(kwn,50):.0f} "
      f"p90 {np.percentile(kwn,90):.0f} max {kwn.max()}", flush=True)

timed("closest primary FULL walk",
      lambda: search(scene, prim.origin, prim.direction, tmax_all, which="full"))

# bounce-1
@jax.jit
def one_bounce(s, r, k):
    hit = dispatch.intersect_scene(s, r, 1e-3, 1e8)
    bs = sample_bsdf(s, hit, -r.direction, rng.bounce_key(k, 0))
    from mafrixraytracing_tpu.core.math import dot
    off = jnp.where(dot(hit.normal, bs.wi)[:, None] >= 0, 1.0, -1.0) * hit.normal
    alive = hit.valid & bs.valid
    return Rays(origin=hit.point + off * 1e-3, direction=bs.wi), alive

b1, alive1 = one_bounce(scene, prim, sk)
order = jnp.argsort(P._coherence_key(scene, b1, alive1))
b1s = jax.tree_util.tree_map(lambda x: x[order], b1)
tmax1s = jnp.where(alive1, 1e8, 0.0)[order]

(t2, i2, kw2), _ = timed("closest bounce1-sorted dbg",
                         lambda: search(scene, b1s.origin, b1s.direction, tmax1s))
kw2n = np.asarray(kw2[::TILE, 0])
print(f"bounce1 walked/tile: mean {kw2n.mean():.1f} p50 {np.percentile(kw2n,50):.0f} "
      f"p90 {np.percentile(kw2n,90):.0f} max {kw2n.max()}", flush=True)

# --- verify dbg vs full equality on primary ---
tf, if_ = search(scene, prim.origin, prim.direction, tmax_all, which="full")
print("dbg==full t:", bool(jnp.allclose(t1, tf)), " idx:", bool(jnp.all(i1 == if_)), flush=True)
print("primary hit rate:", float((i1 >= 0).mean()), flush=True)
# re-time in isolation, alternating order
for nm, wh in [("full", "full"), ("dbg", "dbg"), ("full2", "full"), ("dbg2", "dbg")]:
    timed(f"re-time {nm}", lambda wh=wh: search(scene, prim.origin, prim.direction, tmax_all, which=wh), n=5)
