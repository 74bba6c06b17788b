"""Diagnostics: backward cost source + cull component costs (not shipped)."""
import os, sys, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.ops import intersect_pallas as IP

W = H = 256
SPP = 64
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera
config = P.PathTracerConfig(max_depth=5)


def timed(name, fn, *args, n=3):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt*1e3:10.1f} ms", flush=True)
    return dt


def loss_fn(albedo, radiance, tri_v0, key):
    s = scene.replace(mat_albedo=albedo, light_radiance=radiance, tri_v0=tri_v0)
    return jnp.mean(P.render_image(s, camera, W, H, SPP, key, config))


# 1. grad wrt albedo+radiance only (no vertex scatter)
g2 = jax.jit(lambda a, r, k: jax.grad(loss_fn, argnums=(0, 1))(a, r, scene.tri_v0, k))
timed("fwd+bwd albedo+radiance only", g2, scene.mat_albedo, scene.light_radiance, jax.random.key(0), n=1)

# 2. grad wrt vertices only
g3 = jax.jit(lambda v, k: jax.grad(loss_fn, argnums=(2,))(scene.mat_albedo, scene.light_radiance, v, k))
timed("fwd+bwd tri_v0 only", g3, scene.tri_v0, jax.random.key(0), n=1)

# 3. forward with sort_secondary off
cfg_ns = P.PathTracerConfig(max_depth=5, sort_secondary=False)
fwd_ns = jax.jit(lambda key: P.render_image(scene, camera, W, H, SPP, key, cfg_ns))
timed("forward no-sort 64spp", fwd_ns, jax.random.key(0), n=1)

# 4. cull component costs at wavefront size
B = 1 << 19
o = jnp.tile(camera.get_rays(jnp.full((B,), 0.5), jnp.full((B,), 0.5)).origin, (1, 1))
key = jax.random.key(1)
d = jax.random.normal(key, (B, 3))
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
tmax = jnp.full((B,), 1e8, jnp.float32)
cull = jax.jit(lambda o, d, t: IP._cull(o, d, t, scene.cluster_min, scene.cluster_max))
timed("cull 524288 rays (C=64)", cull, o, d, tmax, n=10)

C = scene.cluster_min.shape[0]
tiles = B // 128
te = jax.random.uniform(key, (tiles, C))
srt = jax.jit(lambda te: jnp.argsort(te, axis=1))
timed(f"argsort ({tiles},{C})", srt, te, n=10)

tiles32 = B // 32
te32 = jax.random.uniform(key, (tiles32, C))
srt32 = jax.jit(lambda te: jnp.argsort(te, axis=1))
timed(f"argsort ({tiles32},{C})", srt32, te32, n=10)

# full argsort over rays (the wavefront coherence sort)
kk = jax.random.randint(key, (B,), 0, 1 << 21)
s_full = jax.jit(lambda k: jnp.argsort(k))
timed("argsort 524288 (wavefront sort)", s_full, kk, n=10)
