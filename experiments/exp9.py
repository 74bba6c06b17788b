"""remat / sort ablations at 16spp (post-SoA)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets

W = H = 256; SPP = 16
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera

def timed(name, fn, *args, n=3):
    try:
        r = fn(*args); jax.block_until_ready(r)
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:90]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:9.1f} ms", flush=True)

def bwd(cfg):
    def loss_fn(params, key):
        s = scene.replace(**params)
        return jnp.mean(P.render_image(s, camera, W, H, SPP, key, cfg))
    g = jax.jit(jax.grad(loss_fn))
    params = {k: getattr(scene, k) for k in ("mat_albedo", "light_radiance", "tri_v0")}
    return lambda: g(params, jax.random.key(1))

def fwd(cfg):
    f = jax.jit(lambda s, key: P.render_image(s, camera, W, H, SPP, key, cfg))
    return lambda: f(scene, jax.random.key(1))

base = P.PathTracerConfig(max_depth=5)
mk = lambda **kw: base.__class__(**{**base.__dict__, **kw})
timed("fwd base", fwd(base))
timed("fwd no-sort", fwd(mk(sort_secondary=False)))
timed("fwd+bwd base (remat)", bwd(base))
timed("fwd+bwd no-remat", bwd(mk(remat=False)))
timed("fwd+bwd no-sort", bwd(mk(sort_secondary=False)))
