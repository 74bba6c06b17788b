"""Experiment: Pallas scatter-add of (B, 36) rows into a small (P, 36)
table vs XLA's native scatter-add (the packed-table gather VJP — 17.8
ms/iter in the round-5 trace, the largest single backward op).

Design: sequential grid over row blocks; indices scalar-prefetched to
SMEM; a VMEM scratch accumulator (P, 36) persists across grid steps and
is added to the output on the last step. Inner loop: dynamic sublane
read-modify-write per row.
"""
import os, sys, time
import jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import lax
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1 << 19
P = 8192 + 8
COLS = 36
ROWS_PER_STEP = 4096

key = jax.random.key(0)
rows = jax.random.normal(key, (B, COLS), jnp.float32)
# realistic index distribution: tile-coherent (runs of nearby prims)
base = jax.random.randint(jax.random.key(1), (B // 128,), 0, P - 1)
idx = jnp.clip(
    jnp.repeat(base, 128)
    + jax.random.randint(jax.random.key(2), (B,), 0, 17), 0, P - 1
).astype(jnp.int32)


def timed(name, fn, *args, n=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name:48s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms")
    return r


@jax.jit
def xla_scatter(rows, idx):
    return jnp.zeros((P, COLS), jnp.float32).at[idx].add(rows)


def _scatter_kernel(idx_ref, rows_ref, out_ref, acc_ref):
    g = pl.program_id(0)
    ng = pl.num_programs(0)

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i, _):
        r = idx_ref[i]
        acc_ref[pl.ds(r, 1), :] += rows_ref[pl.ds(i, 1), :]
        return 0

    lax.fori_loop(0, ROWS_PER_STEP, body, 0)

    @pl.when(g == ng - 1)
    def _flush():
        out_ref[...] = acc_ref[...]


@jax.jit
def pallas_scatter(rows, idx):
    grid = B // ROWS_PER_STEP
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((ROWS_PER_STEP, COLS), lambda g, idx: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((P, COLS), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((P, COLS), jnp.float32),
    )(idx, rows)


r1 = timed("XLA scatter-add (B=512k -> 8200x36)", xla_scatter, rows, idx)
try:
    r2 = timed("pallas scatter-add", pallas_scatter, rows, idx)
    import numpy as np
    print("allclose:", bool(jnp.allclose(r1, r2, rtol=1e-4, atol=1e-3)),
          "maxdiff:", float(jnp.max(jnp.abs(r1 - r2))))
except Exception as e:
    print("pallas scatter FAILED:", str(e)[:400])
