"""Sharded rendering: pixel wavefronts over a device mesh.

Replaces `Array.Parallel.iter` thread fan-out (`Integrators.fs:164`) with
`shard_map` over a 1-D device mesh: each device traces its pixel shard
against the replicated scene, so forward rendering needs **no** collectives
(per-device framebuffer shards compose the image, the analog of per-host
framebuffer accumulation in the north star). Gradient reduction for inverse
rendering lives in `opt.inverse` (psum over the same axis).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mafrixraytracing_tpu.core import rng
from mafrixraytracing_tpu.core.types import Rays
from mafrixraytracing_tpu.integrator.path import PathTracerConfig, trace_radiance
from mafrixraytracing_tpu.parallel.mesh import RAY_AXIS


def _render_flat_pixels(scene, camera, pixel_ids, width, height, spp, key,
                        config, sample_offset=0):
    """Trace `spp` jittered samples for a flat batch of pixel ids.
    pixel_ids: (B,) i32 (row-major y*width + x). Returns (B, 3).
    `sample_offset` shifts the per-pixel sample indices so callers can
    partition one logical sample set across calls (gradient microbatching
    in `opt.inverse`) without reusing RNG streams."""
    px = (pixel_ids % width).astype(jnp.float32)
    py = (pixel_ids // width).astype(jnp.float32)
    base_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        pixel_ids.astype(jnp.uint32)
    )

    def one_sample(acc, s):
        skeys = rng.sample_key(base_keys, s)
        jit_uv = rng.uniforms(skeys, 1000, (2,))
        lens_uv = rng.uniforms(skeys, 1001, (2,))
        u = (px + jit_uv[:, 0]) / width
        v = (py + jit_uv[:, 1]) / height
        rays = camera.get_rays(u, v, lens_uv=lens_uv)
        return acc + trace_radiance(scene, rays, skeys, config), None

    acc, _ = lax.scan(
        one_sample,
        jnp.zeros((pixel_ids.shape[0], 3), jnp.float32),
        jnp.arange(spp) + sample_offset,
    )
    return acc / spp


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "spp", "config"),
)
def render_image_sharded(
    scene,
    camera,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int,
    key,
    config: PathTracerConfig = PathTracerConfig(),
):
    """Full-frame render with pixels sharded over `mesh`'s ray axis.
    Returns (height, width, 3) linear radiance. Pixel count is padded up to
    a multiple of the mesh size; RNG keys derive from *global* pixel ids, so
    the image is bit-identical for any device count (tested on the virtual
    8-CPU mesh, SURVEY §4)."""
    from mafrixraytracing_tpu.integrator.path import tiled_pixel_order

    n_dev = mesh.shape[RAY_AXIS]
    B = width * height
    B_pad = ((B + n_dev - 1) // n_dev) * n_dev
    # tile-swizzled ray order for intersector coherence; RNG keys derive
    # from the *global pixel id*, so the image is order-invariant
    perm, _ = tiled_pixel_order(width, height)
    pixel_ids = jnp.asarray(perm)[jnp.arange(B_pad, dtype=jnp.int32) % B]

    def shard_fn(scene, camera, ids):
        return _render_flat_pixels(
            scene, camera, ids, width, height, spp, key, config
        )

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )(scene, camera, pixel_ids)
    img = jnp.zeros((B, 3), jnp.float32).at[pixel_ids[:B]].set(out[:B])
    return img.reshape(height, width, 3)


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "spp_per_device", "config"),
)
def render_spp_sharded(
    scene,
    camera,
    mesh: Mesh,
    width: int,
    height: int,
    spp_per_device: int,
    key,
    config: PathTracerConfig = PathTracerConfig(),
):
    """Alternative decomposition: every device renders *all* pixels at
    `spp_per_device` samples with device-distinct RNG, and shards are
    averaged with a `psum` — total spp = spp_per_device * n_devices. Useful
    when the image is small but sample counts are huge."""
    B = width * height
    pixel_ids = jnp.arange(B, dtype=jnp.int32)

    def shard_fn(scene, camera):
        di = lax.axis_index(RAY_AXIS)
        dev_key = jax.random.fold_in(key, di)
        img = _render_flat_pixels(
            scene, camera, pixel_ids, width, height, spp_per_device, dev_key, config
        )
        return lax.pmean(img, RAY_AXIS)

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )(scene, camera)
    return out.reshape(height, width, 3)
