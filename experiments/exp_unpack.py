"""Microbench: 36-column unpack strategies for the packed attr rows (TPU).
Times are DEVICE durations from jax.profiler (tunnel wall-clock lies)."""
import sys, os, glob, gzip, json, collections
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from jax import lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
B = 1 << 19
P = 8200
COLS = 36
key = jax.random.key(0)
table = jax.random.normal(key, (P, COLS), jnp.float32)
idx = jax.random.randint(jax.random.key(1), (B,), 0, P)

def consume(cols):
    # sum of products so every column is read
    acc = cols[0]
    for c in cols[1:]:
        acc = acc + c
    return acc

@jax.jit
def variant_barrier(table, idx):
    row = table[idx]
    cols = lax.optimization_barrier(tuple(row[:, k] for k in range(COLS)))
    return consume(cols)

@jax.jit
def variant_transpose(table, idx):
    row = table[idx]
    rt = lax.optimization_barrier(row.T)  # (36, B)
    cols = lax.optimization_barrier(tuple(rt[k] for k in range(COLS)))
    return consume(cols)

# Pallas transpose-unpack: (B, 36) -> 36 x (B,) in one pass
UNROWS = 1024  # rays per grid step (sublane dim of the input block)

def _unpack_kernel(rows_ref, *outs):
    blk = rows_ref[...]  # (UNROWS, 36)
    for k in range(COLS):
        outs[k][...] = blk[:, k].reshape(UNROWS // 128, 128)

@jax.jit
def variant_pallas(table, idx):
    row = table[idx]
    outs = pl.pallas_call(
        _unpack_kernel,
        grid=(B // UNROWS,),
        in_specs=[pl.BlockSpec((UNROWS, COLS), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((UNROWS // 128, 128), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)] * COLS,
        out_shape=[jax.ShapeDtypeStruct((B // 128, 128), jnp.float32)] * COLS,
    )(row)
    cols = tuple(o.reshape(B) for o in outs)
    return consume(cols)

@jax.jit
def gather_only(table, idx):
    return table[idx].sum()

def device_ms(fn, *args, n=10, tag="x"):
    r = fn(*args); jax.block_until_ready(r)
    d = f"/tmp/unpack_trace_{tag}"
    with jax.profiler.trace(d):
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
    paths = sorted(glob.glob(f"{d}/**/*.trace.json.gz", recursive=True),
                   key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu = {p for p, nm in pid_names.items() if "TPU" in nm or "/device" in nm.lower()}
    import re
    SKIP = re.compile(r"^(while[.\d]*|\d+|jit_\w+.*)$")
    tot = sum(e.get("dur", 0) / 1e3 for e in ev
              if e.get("ph") == "X" and e.get("pid") in tpu
              and not SKIP.match(e.get("name", "")))
    return tot / n

print("gather only     :", f"{device_ms(gather_only, table, idx, tag='g'):8.2f} ms")
print("barrier slices  :", f"{device_ms(variant_barrier, table, idx, tag='b'):8.2f} ms")
print("transpose slices:", f"{device_ms(variant_transpose, table, idx, tag='t'):8.2f} ms")
print("pallas unpack   :", f"{device_ms(variant_pallas, table, idx, tag='p'):8.2f} ms")
