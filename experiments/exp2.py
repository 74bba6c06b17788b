"""TPU parity + perf check of the new kernel (not shipped)."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.ops import intersect_pallas as IP
from mafrixraytracing_tpu.geometry import intersect as isect
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.core import rng

W = H = 256
cs = compile_scene(assets.spot_scene(W, H))
scene, cam = cs.scene, cs.camera

# parity on mixed primary+random rays
px, py = P.make_pixel_uv(W, H)
u = (px + 0.5) / W; v = (py + 0.5) / H
pr = cam.get_rays(u, v)
key = jax.random.key(0)
ro = jax.random.uniform(key, (8192, 3), minval=-1.0, maxval=1.5)
rd = jax.random.normal(jax.random.key(1), (8192, 3))
rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
rays = Rays(origin=jnp.concatenate([pr.origin[:8192], ro]),
            direction=jnp.concatenate([pr.direction[:8192], rd]))

f_new = jax.jit(lambda r: IP.find_closest(scene, r, 1e-3, 1e8))
f_ref = jax.jit(lambda r: isect.find_closest(scene, r, 1e-3, 1e8))
t1, i1 = f_new(rays); t2, i2 = f_ref(rays)
t1, i1, t2, i2 = map(np.asarray, (t1, i1, t2, i2))
m1, m2 = i1 >= 0, i2 >= 0
print("hitmask agree:", (m1 == m2).mean())
print("t allclose:", np.allclose(t1[m1 & m2], t2[m1 & m2], rtol=1e-4, atol=1e-4))
print("idx agree:", (i1[m1 & m2] == i2[m1 & m2]).mean())
occ_new = jax.jit(lambda r: IP.occluded(scene, r, 1e-3, 2.0))(rays)
occ_ref = jax.jit(lambda r: isect.occluded(scene, r, 1e-3, 2.0))(rays)
print("occ agree:", (np.asarray(occ_new) == np.asarray(occ_ref)).mean())

def timed(name, fn, *args, n=10):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)

# perf: full primary wavefront
srch = jax.jit(lambda r: IP.find_closest(scene, r, 1e-3, 1e8))
timed("find_closest 65536 primary", srch, pr)
config = P.PathTracerConfig(max_depth=5)
keys = rng.pixel_keys(jax.random.key(1), pr.origin.shape[0])
tr = jax.jit(lambda r, k: P.trace_radiance(scene, r, k, config))
timed("trace_radiance 1spp 5 bounces", tr, pr, keys, n=5)
