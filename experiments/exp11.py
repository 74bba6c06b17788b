import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets

W = H = 256; SPP = 16
cs = compile_scene(assets.renault_scene(W, H))
scene, camera = cs.scene, cs.camera
print("renault tris:", scene.tri_v0.shape[0], "clusters:", scene.cluster_min.shape[0], flush=True)

def timed(name, fn, n=3):
    try:
        r = fn(); jax.block_until_ready(r)
    except Exception as e:
        print(f"{name:40s} FAILED: {str(e)[:100]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n): r = fn()
    jax.block_until_ready(r)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:9.0f} ms", flush=True)

def fwd(cfg):
    f = jax.jit(lambda s, key: P.render_image(s, camera, W, H, SPP, key, cfg))
    return lambda: f(scene, jax.random.key(1))

base = P.PathTracerConfig(max_depth=5)
mk = lambda **kw: base.__class__(**{**base.__dict__, **kw})
timed("renault fwd sorted", fwd(base))
timed("renault fwd no-sort", fwd(mk(sort_secondary=False)))
