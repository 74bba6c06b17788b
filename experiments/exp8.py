"""Device-time (profiler-based) measurement of candidate primitives.
Wall-clock lies under the axon tunnel; only trust device durations."""
import os, sys, time, json, gzip, glob, collections, shutil

import jax, jax.numpy as jnp
from jax import lax, random

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

B = 524288
T = 8192
N_RUNS = 5


def device_ms(tag, fn, *args):
    """Total device time of one call, averaged over N_RUNS (profiler)."""
    r = fn(*args)
    jax.block_until_ready(r)
    import re
    d = "/tmp/prof_" + re.sub(r"[^A-Za-z0-9]+", "_", tag)
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        for _ in range(N_RUNS):
            r = fn(*args)
        jax.block_until_ready(r)
        time.sleep(0.05)
    tj = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))[-1]
    ev = json.load(gzip.open(tj))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot = 0.0
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
            continue
        # top-level module events only (avoid double count): jit_* wrappers
        if e["name"].startswith("jit_") or e["name"].startswith("jit("):
            tot += e.get("dur", 0)
    ms = tot / 1e3 / N_RUNS
    print(f"{tag:44s} {ms:9.3f} ms", flush=True)
    return ms


k = random.key(0)
idx = random.randint(k, (B,), 0, T)
perm = random.permutation(random.fold_in(k, 1), B)
key_arr = random.randint(random.fold_in(k, 2), (B,), 0, 1 << 21)
xB = random.normal(random.fold_in(k, 3), (B,))
xB3 = random.normal(random.fold_in(k, 4), (B, 3))
tbl3 = random.normal(random.fold_in(k, 5), (T, 3))
tbl48 = random.normal(random.fold_in(k, 6), (T, 48))
tbls3 = [random.normal(random.fold_in(k, 10 + i), (T, 3)) for i in range(15)]
arrs = [random.normal(random.fold_in(k, 30 + i), (B, 3)) for i in range(4)]
small = [random.normal(random.fold_in(k, 40 + i), (B,)) for i in range(4)]

device_ms("gather (T,3)[idxB]", jax.jit(lambda t, i: t[i]), tbl3, idx)
device_ms("gather (T,48)[idxB]", jax.jit(lambda t, i: t[i]), tbl48, idx)
device_ms("15x gather (T,3)[idxB]", jax.jit(lambda ts, i: [t[i] for t in ts]), tbls3, idx)
device_ms("gather (B,)[perm]", jax.jit(lambda t, i: t[i]), xB, perm)
device_ms("argsort (B,) i32", jax.jit(lambda a: jnp.argsort(a)), key_arr)
device_ms("sort_key_val 1 payload", jax.jit(lambda a, b: lax.sort((a, b), num_keys=1)), key_arr, xB)
ops17 = (key_arr,) + tuple(a[:, j] for a in arrs for j in range(3)) + tuple(small)
device_ms("lax.sort 17 operands", jax.jit(lambda *o: lax.sort(o, num_keys=1)), *ops17)
device_ms("scatter set (B,3)->[perm]", jax.jit(lambda x, p: jnp.zeros((B, 3)).at[p].set(x)), xB3, perm)
device_ms("scatter-add (B,3)->(T,3)", jax.jit(lambda x, i: jnp.zeros((T, 3)).at[i].add(x)), xB3, idx)

# take_along_axis(argmin) vs min-reduce on (B, 32)
t32 = random.normal(random.fold_in(k, 60), (B, 32))
ids32 = jnp.broadcast_to(jnp.arange(32, dtype=jnp.int32)[None], (B, 32))
def taa(t):
    a = jnp.argmin(t, axis=1)
    return jnp.take_along_axis(t, a[:, None], axis=1)[:, 0], a
def minred(t):
    m = jnp.min(t, axis=1)
    i = jnp.min(jnp.where(t <= m[:, None], ids32, 1 << 30), axis=1)
    return m, i
device_ms("take_along(argmin) (B,32)", jax.jit(taa), t32)
device_ms("min-reduce (B,32)", jax.jit(minred), t32)

# onehot-matmul gather & scatter-add
def onehot_gather(t, i):
    # chunked (B, T) one-hot @ (T, 48) in bf16
    out = []
    for c in range(0, B, 65536):
        ic = i[c:c + 65536]
        oh = (ic[:, None] == jnp.arange(T)[None, :]).astype(jnp.bfloat16)
        out.append(jnp.dot(oh, t.astype(jnp.bfloat16), preferred_element_type=jnp.float32))
    return jnp.concatenate(out)
device_ms("onehot-matmul gather (T,48)", jax.jit(onehot_gather), tbl48, idx)

x48 = random.normal(random.fold_in(k, 61), (B, 48))
def onehot_scatter(x, i):
    acc = jnp.zeros((T, 48), jnp.float32)
    for c in range(0, B, 65536):
        ic = i[c:c + 65536]
        oh = (ic[:, None] == jnp.arange(T)[None, :]).astype(jnp.bfloat16)
        acc = acc + jnp.dot(oh.T, x[c:c + 65536].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    return acc
device_ms("onehot-matmul scatter (B,48)->(T,48)", jax.jit(onehot_scatter), x48, idx)

# threefry uniforms
keys = random.split(random.fold_in(k, 70), B)
from mafrixraytracing_tpu.core import rng as RNG
device_ms("rng.uniforms (B,2)", jax.jit(lambda kk: RNG.uniforms(kk, 0, (2,))), keys)
