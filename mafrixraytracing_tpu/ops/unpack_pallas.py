"""Pallas row-fetch + transpose-unpack for packed attribute tables.

The hot integrator path fetches one (36,) attribute row per ray from the
packed `(T+Sp, 36)` table (`geometry.intersect.packed_attr_table`) and then
consumes the row as 36 flat (B,) SoA columns. On TPU the gathered (B, 36)
array is tiled T(8,128) with the minor dim padded 36 -> 128, and XLA lowers
the 36 column slices into ~9 separate fusions that EACH re-read the entire
padded array — ~24 ms apiece at B=512k, >200 ms per bench iteration in
round 3's profile (the single largest non-kernel cost).

This module keeps the row gather in XLA (1.3 ms — it is fine) and replaces
the unpack with ONE Pallas pass: each grid step reads a (UNROWS=4096, 36)
block and writes the 36 transposed (UNROWS/128, 128) column blocks, so the
padded array is read exactly once (measured ~3x total win;
experiments/exp_unpack.py). Batch sizes that are not a multiple of UNROWS
are padded up (and the columns sliced back) so the fast path covers every
wavefront size on TPU.

Differentiability: `fetch_cols` carries a custom VJP — cotangents of the 36
columns are packed back into a (B, 36) matrix (the same kernel shape in
reverse) and scatter-added into the table at the gathered indices, exactly
the transpose XLA would have produced for `table[idx]`.

Reference provenance: this implements the per-hit attribute fetch the
reference performs via `MaterialManager[hit.materialIndex]` + object fields
(`Core/Integrator/Integrators.fs:118`, `Core/Interfaces/IMaterial.fs:20-35`)
as one batched table fetch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

COLS = 36
UNROWS = 4096  # rays per grid step; out blocks are (UNROWS/128, 128)


def _unpack_kernel(rows_ref, *outs):
    blk = rows_ref[...]  # (UNROWS, COLS)
    for k in range(COLS):
        outs[k][...] = blk[:, k].reshape(UNROWS // 128, 128)


def _unpack_rows_impl(rows):
    """(B, 36) -> tuple of 36 (B,) columns, one pass over the padded array."""
    B = rows.shape[0]
    outs = pl.pallas_call(
        _unpack_kernel,
        grid=(B // UNROWS,),
        in_specs=[pl.BlockSpec((UNROWS, COLS), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((UNROWS // 128, 128), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)] * COLS,
        out_shape=[jax.ShapeDtypeStruct((B // 128, 128), jnp.float32)] * COLS,
    )(rows)
    return tuple(o.reshape(B) for o in outs)


def _pack_rows_impl(cols):
    """tuple of 36 (B,) columns -> (B, 36) (VJP of the unpack). The pack
    direction is a single-producer concatenate — XLA emits it as one fusion
    (one padded write), so no Pallas kernel is needed here; it is the
    36-consumer SLICE direction that XLA splits into ~9 full re-reads."""
    return jnp.stack(cols, axis=1)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@jax.custom_vjp
def _fetch(table, idx):
    rows = table[idx]
    return _unpack_rows_impl(rows)


def _fetch_fwd(table, idx):
    return _fetch(table, idx), (idx, table.shape[0])


def _fetch_bwd(res, ct_cols):
    idx, P = res
    cts = tuple(
        c if c is not None else jnp.zeros(idx.shape, jnp.float32)
        for c in ct_cols
    )
    ct_rows = _pack_rows_impl(cts)
    ct_table = jnp.zeros((P, COLS), jnp.float32).at[idx].add(ct_rows)
    return ct_table, None


_fetch.defvjp(_fetch_fwd, _fetch_bwd)


def fetch_cols(table, idx):
    """Gather rows `table[idx]` and return them as a tuple of 36 flat (B,)
    columns. On TPU, batches are padded to a multiple of UNROWS so every
    wavefront size takes the Pallas single-pass unpack (padded lanes gather
    row 0 and their cotangents are zero — sliced off before use); off-TPU,
    falls back to the (correct, slower) barrier-slice form. Differentiable
    w.r.t. `table`."""
    B = idx.shape[0]
    assert table.shape[1] == COLS, table.shape
    if _on_tpu():
        Bp = -(-B // UNROWS) * UNROWS
        if Bp == B:
            return _fetch(table, idx)
        idx_p = jnp.concatenate([idx, jnp.zeros((Bp - B,), idx.dtype)])
        return tuple(c[:B] for c in _fetch(table, idx_p))
    rows = table[idx]
    return lax.optimization_barrier(tuple(rows[:, k] for k in range(COLS)))
