"""Profiling harness: where does the bench iteration time go? (not shipped)"""
import os, sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets

W = H = 256
SPP = 64
DEPTH = 5

cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera
config = P.PathTracerConfig(max_depth=DEPTH)


def timed(name, fn, *args, n=3):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt*1e3:10.1f} ms")
    return dt


# 1. forward-only render
fwd = jax.jit(lambda key: P.render_image(scene, camera, W, H, SPP, key, config))
timed("forward render_image 64spp", fwd, jax.random.key(0))

# 2. fwd+bwd
def loss_fn(albedo, radiance, tri_v0, key):
    s = scene.replace(mat_albedo=albedo, light_radiance=radiance, tri_v0=tri_v0)
    return jnp.mean(P.render_image(s, camera, W, H, SPP, key, config))

grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
args = (scene.mat_albedo, scene.light_radiance, scene.tri_v0)
timed("fwd+bwd render_image 64spp", grad_fn, *args, jax.random.key(0))

# 3. search-only on primary rays (one wavefront, 65536 rays)
px, py = P.make_pixel_uv(W, H)
u = (px + 0.5) / W
v = (py + 0.5) / H
rays = camera.get_rays(u, v)
from mafrixraytracing_tpu.ops import intersect_pallas as IP

srch = jax.jit(lambda r: IP.find_closest(scene, r, 1e-3, 1e8))
timed("pallas find_closest 65536 primary rays", srch, rays, n=10)

# 4. cull-only
o, d = rays.origin, rays.direction
tmax = jnp.full((o.shape[0],), 1e8, jnp.float32)
from mafrixraytracing_tpu.core.v3 import V3

cull = jax.jit(lambda o, d, t: IP._cull(V3.of(o), V3.of(d), t,
                                        scene.cluster_min, scene.cluster_max))
timed("cull only", cull, o, d, tmax, n=10)

# 5. single 1-spp wavefront trace (fwd)
keys = rng.pixel_keys(jax.random.key(1), o.shape[0])
tr = jax.jit(lambda r, k: P.trace_radiance(scene, r, k, config))
timed("trace_radiance 1spp (5 bounces)", tr, rays, keys, n=5)

# 6. how many clusters survive on primary rays?
lists, counts, entries, far = cull(o, d, tmax)
print("clusters total:", scene.cluster_min.shape[0],
      " mean survivors/tile:", float(counts.mean()),
      " max:", int(counts.max()))
print("tris:", scene.tri_v0.shape[0])
