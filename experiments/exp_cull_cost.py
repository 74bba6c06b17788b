"""Measure the XLA-side cull cost vs the Pallas walk cost in isolation.

Chained dependent iterations + one final block_until_ready: wall-clock of a
single async call lies under the axon tunnel, but N dependent iterations
cannot complete early, so total/N is a true per-iteration time.
"""
import os, sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.core.v3 import V3
from mafrixraytracing_tpu.ops import intersect_pallas as ip
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.core import rng

W = H = 256
G = 8
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera
B = W * H * G
px, py = P.make_pixel_uv(W, H)
perm, inv = P.tiled_pixel_order(W, H, *P._spp_tile_shape(G))
px, py = px[perm], py[perm]
pxg, pyg = jnp.repeat(px, G), jnp.repeat(py, G)
keys = rng.pixel_keys(jax.random.key(0), W * H)
skeys = jax.vmap(lambda s: rng.sample_key(keys, s))(jnp.arange(G))
skeys = jnp.swapaxes(skeys, 0, 1).reshape(B)
ju = rng.uniforms(skeys, 1000, (2,))
u = (pxg + ju[:, 0]) / W
v = (pyg + ju[:, 1]) / H
rays = camera.get_rays(u, v)
o, d = V3.of(rays.origin), V3.of(rays.direction)
t_max = jnp.full((B,), 1e8, jnp.float32)

def timed(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    x = args
    r = None
    for i in range(iters):
        r = f(*x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name::<40} {dt:8.3f} ms")
    return dt

# full closest query (cull + kernel + merge)
def full(o_x):
    o2 = V3(o_x, o.y, o.z)
    t, i = ip.find_closest_soa(scene, o2, d, 1e-3, t_max)
    return t.sum() + o_x[0]  # dependency-chainable scalar? keep array dep
def full_chain(ox):
    o2 = V3(ox, o.y, o.z)
    t, i = ip.find_closest_soa(scene, o2, d, 1e-3, t_max)
    return ox + 0.0 * t  # (B,) — feeds next iteration

# cull only
def cull_chain(ox):
    o2 = V3(ox, o.y, o.z)
    lists, counts, entries, far = ip._cull(o2, d, t_max, scene.cluster_min, scene.cluster_max)
    return ox + 0.0 * far

# kernel only (precomputed lists)
tri_pack = ip.pack_tris(scene)
lists, counts, entries, far = jax.jit(lambda: ip._cull(o, d, t_max, scene.cluster_min, scene.cluster_max))()
rays8 = jax.jit(lambda: ip._pack_rays(o, d, t_max, far))()
def kernel_chain(r8):
    t, i = ip._search(tri_pack, lists, counts.reshape(-1,1)[:,0], entries, r8, 1e-3, False)
    return r8 + 0.0 * t[:, None]

# anyhit full
def any_chain(ox):
    o2 = V3(ox, o.y, o.z)
    occ = ip.occluded_soa(scene, o2, d, 1e-3, t_max)
    return ox + 0.0 * occ.astype(jnp.float32)

timed("full find_closest_soa", full_chain, o.x)
timed("cull only", cull_chain, o.x)
timed("kernel only (closest)", kernel_chain, rays8)
timed("full occluded_soa", any_chain, o.x)
