"""Ablation timing: where does the render_image fwd / fwd+bwd time go?"""
import os, sys, time
from functools import partial

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets

W = H = 256
SPP = 16  # quarter of bench; scale x4
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera


def timed(name, fn, *args, n=2):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def fwd(cfg):
    f = jax.jit(lambda s, key: P.render_image(s, camera, W, H, SPP, key, cfg))
    return lambda: f(scene, jax.random.key(1))


def bwd(cfg, wrt=("mat_albedo", "light_radiance", "tri_v0")):
    def loss_fn(params, key):
        s = scene.replace(**params)
        return jnp.mean(P.render_image(s, camera, W, H, SPP, key, cfg))

    g = jax.jit(jax.grad(loss_fn))
    params = {k: getattr(scene, k) for k in wrt}
    return lambda: g(params, jax.random.key(1))


base = P.PathTracerConfig(max_depth=5)
timed("fwd base (depth5,nee,sort,remat)", fwd(base))
timed("fwd no-sort", fwd(base.__class__(**{**base.__dict__, "sort_secondary": False})))
timed("fwd no-nee", fwd(base.__class__(**{**base.__dict__, "nee": False})))
timed("fwd depth2", fwd(base.__class__(**{**base.__dict__, "max_depth": 2})))
timed("fwd depth1", fwd(base.__class__(**{**base.__dict__, "max_depth": 1})))
timed("fwd no-remat", fwd(base.__class__(**{**base.__dict__, "remat": False})))

timed("fwd+bwd base (albedo,rad,v0)", bwd(base))
timed("fwd+bwd albedo only", bwd(base, ("mat_albedo",)))
timed("fwd+bwd v0 only", bwd(base, ("tri_v0",)))
timed("fwd+bwd no-remat", bwd(base.__class__(**{**base.__dict__, "remat": False})))
timed("fwd+bwd no-sort", bwd(base.__class__(**{**base.__dict__, "sort_secondary": False})))
