"""Device-time profiler: trace one fwd+bwd bench iteration and print the
top HLO ops / fusions by TPU device time (not shipped; used to steer the
perf work — wall-clock under the axon tunnel lies, only device durations
from jax.profiler traces are trusted)."""
import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mafrixraytracing_tpu.integrator import path as P
from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene import assets

W = H = int(os.environ.get("PROF_SIZE", 256))
SPP = int(os.environ.get("PROF_SPP", 16))
DEPTH = int(os.environ.get("PROF_DEPTH", 5))
TRACE_DIR = os.environ.get("PROF_DIR", "/tmp/mfx_trace")

cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera
config = P.PathTracerConfig(max_depth=DEPTH)
if os.environ.get("PROF_COMPACT", "1") == "1" and DEPTH == 5:
    # bench-calibrated spot survival schedule (see bench.calibrated_config)
    config = __import__("dataclasses").replace(
        config, compact=(1.0, 0.742, 0.161, 0.079, 0.029)
    )


def loss_fn(albedo, radiance, tri_v0, key):
    s = scene.replace(mat_albedo=albedo, light_radiance=radiance, tri_v0=tri_v0)
    return jnp.mean(P.render_image(s, camera, W, H, SPP, key, config))


grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
args = (scene.mat_albedo, scene.light_radiance, scene.tri_v0)
print("compiling/warmup...", flush=True)
jax.block_until_ready(grad_fn(*args, jax.random.key(0)))
print("tracing...", flush=True)
os.makedirs(TRACE_DIR, exist_ok=True)
with jax.profiler.trace(TRACE_DIR):
    jax.block_until_ready(grad_fn(*args, jax.random.key(1)))
time.sleep(2)

paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True),
               key=os.path.getmtime)
assert paths, f"no trace under {TRACE_DIR}"
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
# find TPU pids (process names containing TPU / device)
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
tpu_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower()}
if not tpu_pids:
    print("process names:", pid_names)
    tpu_pids = set(pid_names)

by_op = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        total += dur
        by_op[name] += dur

print(f"\ntotal device time: {total:.1f} ms "
      f"({W}x{H} @ {SPP}spp depth {DEPTH}, fwd+bwd)\n")
print(f"{'ms':>10}  {'%':>5}  op")
for name, ms in by_op.most_common(60):
    print(f"{ms:10.2f}  {100*ms/max(total,1e-9):5.1f}  {name[:140]}")
