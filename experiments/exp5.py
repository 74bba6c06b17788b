"""Search-kernel timing on realistic wavefronts (primary + bounce rays).

Usage: MFX_TILE=128 MFX_EXIT_CHECK=8 python exp5.py [--full]
Times find_closest / occluded per wavefront, the coherence argsort, and
(with --full) trace_radiance + render_image fwd / fwd+bwd.
"""
import os, sys, time
from functools import partial

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.ops import intersect_pallas as IP
from mafrixraytracing_tpu.ops import dispatch
from mafrixraytracing_tpu.materials.bsdf import sample_bsdf

W = H = 256
SPP_G = 8  # samples interleaved per pixel in the bench wavefront
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera
config = P.PathTracerConfig(max_depth=5)
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


# --- build the bench-identical primary wavefront (interleaved, B*G rays) ---
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
print(f"wavefront: {BG} rays  TILE={IP.TILE} EXIT_CHECK={IP.EXIT_CHECK}", flush=True)

fc = jax.jit(lambda s, r, tm: IP.find_closest(s, r, 1e-3, tm))
fc = partial(fc, scene)
occ = jax.jit(lambda s, r, tm: IP.occluded(s, r, 1e-3, tm))
occ = partial(occ, scene)
tmax_all = jnp.full((BG,), 1e8, jnp.float32)

(t0_, i0_), _ = timed("closest primary (interleaved)", fc, prim, tmax_all)

# --- bounce-1 wavefront: scatter off the primary hits ---
@jax.jit
def one_bounce(r, k):
    hit = dispatch.intersect_scene(scene, r, 1e-3, 1e8)
    bs = sample_bsdf(scene, hit, -r.direction, rng.bounce_key(k, 0))
    from mafrixraytracing_tpu.core.math import dot
    off = jnp.where(dot(hit.normal, bs.wi)[:, None] >= 0, 1.0, -1.0) * hit.normal
    alive = hit.valid & bs.valid
    return Rays(origin=hit.point + off * 1e-3, direction=bs.wi), alive

b1, alive1 = one_bounce(prim, sk)
b1 = jax.block_until_ready(b1)
tmax1 = jnp.where(alive1, 1e8, 0.0)
print(f"bounce-1 alive: {float(alive1.mean()):.3f}", flush=True)

timed("closest bounce-1 (unsorted)", fc, b1, tmax1)

ck = jax.jit(lambda r, a: jnp.argsort(P._coherence_key(scene, r, a)))
order, _ = timed("coherence argsort", ck, b1, alive1)
b1s = jax.tree_util.tree_map(lambda x: x[order], b1)
tmax1s = tmax1[order]
timed("closest bounce-1 (sorted)", fc, b1s, tmax1s)
timed("anyhit bounce-1 (sorted)", occ, b1s, tmax1s)

# cull stats
_, counts, _, _ = jax.jit(
    lambda o, d, t: IP._cull(o, d, t, scene.cluster_min, scene.cluster_max)
)(b1s.origin, b1s.direction, tmax1s)
print(f"bounce-1 sorted survivors/tile: mean {float(counts.mean()):.1f} "
      f"max {int(counts.max())}", flush=True)
_, counts_p, _, _ = jax.jit(
    lambda o, d, t: IP._cull(o, d, t, scene.cluster_min, scene.cluster_max)
)(prim.origin, prim.direction, tmax_all)
print(f"primary survivors/tile:         mean {float(counts_p.mean()):.1f} "
      f"max {int(counts_p.max())}", flush=True)

if "--full" in sys.argv:
    tr = jax.jit(lambda r, k: P.trace_radiance(scene, r, k, config))
    timed("trace_radiance depth5 (BG rays)", tr, prim, sk, n=3)
    fwd = jax.jit(lambda key: P.render_image(scene, camera, W, H, 64, key, config))
    timed("forward render_image 64spp", fwd, jax.random.key(0), n=1)

    def loss_fn(albedo, radiance, tri_v0, key):
        s = scene.replace(mat_albedo=albedo, light_radiance=radiance, tri_v0=tri_v0)
        return jnp.mean(P.render_image(s, camera, W, H, 64, key, config))

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    timed("fwd+bwd render_image 64spp", grad_fn,
          scene.mat_albedo, scene.light_radiance, scene.tri_v0,
          jax.random.key(0), n=1)
