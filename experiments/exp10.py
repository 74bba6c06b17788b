import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets

W = H = 256; SPP = 64
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera

def timed(name, fn, n=3):
    try:
        r = fn(); jax.block_until_ready(r)
    except Exception as e:
        print(f"{name:40s} FAILED: {str(e)[:120]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n): r = fn()
    jax.block_until_ready(r)
    print(f"{name:40s} {(time.perf_counter()-t0)/n:8.2f} s", flush=True)

def bwd(cfg):
    def loss_fn(params, key):
        s = scene.replace(**params)
        return jnp.mean(P.render_image(s, camera, W, H, SPP, key, cfg))
    g = jax.jit(jax.grad(loss_fn))
    params = {k: getattr(scene, k) for k in ("mat_albedo", "light_radiance", "tri_v0")}
    return lambda: g(params, jax.random.key(1))

base = P.PathTracerConfig(max_depth=5)
mk = lambda **kw: base.__class__(**{**base.__dict__, **kw})
timed("64spp fwd+bwd nosort+noremat", bwd(mk(sort_secondary=False, remat=False)))
timed("64spp fwd+bwd nosort+remat", bwd(mk(sort_secondary=False)))
