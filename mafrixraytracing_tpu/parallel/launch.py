"""Multi-host launch: extend the single-host mesh to a TPU pod slice.

The reference has no distributed runtime at all (SURVEY §2.15: its only
parallelism is `Array.Parallel` threads). Here the same renderer code runs
multi-host because everything is expressed over a `jax.sharding.Mesh`:
initialize the distributed runtime once per process, then build the mesh
over *all* devices — `shard_map` collectives (framebuffer psum, gradient
pmean in `opt.inverse`) ride ICI within a slice and DCN across slices with
no further code changes.

Typical pod-slice launch (one process per host; the TPU runtime provides
coordinator discovery so bare `initialize()` suffices on Cloud TPU):

    python -c "
    from mafrixraytracing_tpu.parallel import launch
    launch.init()                     # no-op on a single host
    mesh = launch.global_mesh()
    ...render_image_sharded(scene, camera, mesh, ...)"

For explicit coordination (e.g. GPU clusters or manual setups), pass
coordinator_address/num_processes/process_id or set the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
"""
from __future__ import annotations

import os

import jax

from mafrixraytracing_tpu.parallel.mesh import make_mesh

_initialized = False


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> bool:
    """Initialize `jax.distributed` for a multi-process run. Returns True
    if the distributed runtime was initialized, False when running
    single-process (no coordination configured — the common dev case).
    Idempotent."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    on_tpu_pod = jax.default_backend() == "tpu" and (
        os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def global_mesh():
    """1-D ray-parallel mesh over every device of every process (after
    `init()`, `jax.devices()` is global)."""
    return make_mesh()


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
