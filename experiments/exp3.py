"""Step-overhead vs work split (not shipped)."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.ops import intersect_pallas as IP
from mafrixraytracing_tpu.integrator import path as P

W = H = 256
cs = compile_scene(assets.spot_scene(W, H))
scene, cam = cs.scene, cs.camera
px, py = P.make_pixel_uv(W, H)
perm, inv = P.tiled_pixel_order(W, H)
u = (px[perm] + 0.5) / W; v = (py[perm] + 0.5) / H
pr = cam.get_rays(u, v)
o, d = pr.origin, pr.direction
B = o.shape[0]
tmax = jnp.full((B,), 1e8, jnp.float32)

lists, counts, entries, far = jax.jit(
    lambda o, d, t: IP._cull(o, d, t, scene.cluster_min, scene.cluster_max)
)(o, d, tmax)
print("TILE:", IP.TILE, "tiles:", counts.shape[0],
      "mean survivors:", float(counts.mean()), "max:", int(counts.max()))
tri_pack = jax.jit(IP.pack_tris)(scene)
rays8 = IP._pack_rays(o, d, tmax, far)

def timed(name, fn, *args, n=20):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)

f = jax.jit(lambda *a: IP._closest_impl(*a))
timed("kernel real lists", f, tri_pack, lists, counts, entries, rays8)
timed("kernel empty lists", f, tri_pack, lists, jnp.zeros_like(counts), entries, rays8)
one = jnp.minimum(counts, 8)
timed("kernel counts<=8", f, tri_pack, lists, one, entries, rays8)
cull = jax.jit(lambda o, d, t: IP._cull(o, d, t, scene.cluster_min, scene.cluster_max))
timed("cull (bitonic)", cull, o, d, tmax)
