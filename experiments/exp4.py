"""Interleaved-spp + TILE scan: forward render timing (not shipped)."""
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

W = H = 256; SPP = 64
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera
config = P.PathTracerConfig(max_depth=5)

# survivors with interleaved ordering (primary wavefront)
B = W * H
G = P._spp_group(SPP, B, config.wavefront)
px, py = P.make_pixel_uv(W, H)
perm, inv = P.tiled_pixel_order(W, H, *P._spp_tile_shape(G))
pxg = jnp.repeat(px[perm], G); pyg = jnp.repeat(py[perm], G)
key = jax.random.key(0)
bk = rng.pixel_keys(key, B)
sk = jax.vmap(lambda s: rng.sample_key(bk, s))(jnp.arange(G))
sk = jnp.swapaxes(sk, 0, 1).reshape(B * G)
jit_uv = rng.uniforms(sk, 1000, (2,))
u = (pxg + jit_uv[:, 0]) / W; v = (pyg + jit_uv[:, 1]) / H
rays = camera.get_rays(u, v)
tmax = jnp.full((B * G,), 1e8, jnp.float32)
_, counts, _, _ = jax.jit(lambda o, d, t: IP._cull(o, d, t, scene.cluster_min, scene.cluster_max))(rays.origin, rays.direction, tmax)
print("TILE:", IP.TILE, "G:", G, "mean survivors (interleaved primary):", float(counts.mean()), flush=True)

fwd = jax.jit(lambda key: P.render_image(scene, camera, W, H, SPP, key, config))
r = fwd(jax.random.key(0)); jax.block_until_ready(r)
t0 = time.perf_counter(); r = fwd(jax.random.key(1)); jax.block_until_ready(r)
print(f"forward 64spp: {time.perf_counter()-t0:.2f} s", flush=True)
