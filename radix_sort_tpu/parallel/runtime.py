"""Multi-host runtime bootstrap.

The reference is single-process (SURVEY.md §2 parallelism inventory); on
TPU pods each host runs one process and must join a coordination service
before any collective compiles.  This wraps `jax.distributed.initialize`
with the engine's conventions plus a minimal health-check — the
failure-detection hook the reference lacked entirely (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
import time


@dataclasses.dataclass
class RuntimeInfo:
    process_id: int
    num_processes: int
    local_devices: int
    global_devices: int
    coordinator: str | None


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> RuntimeInfo:
    """Join (or skip, single-host) the distributed runtime.

    On Cloud TPU pods all three arguments are auto-detected from the
    metadata environment; pass them explicitly elsewhere.  Safe to call on
    a single host: becomes a no-op describing the local topology.
    """
    import jax

    multi = (coordinator_address is not None
             or os.environ.get("JAX_COORDINATOR_ADDRESS")
             or num_processes not in (None, 1))
    if multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return RuntimeInfo(
        process_id=jax.process_index(),
        num_processes=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
        coordinator=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
    )


def health_check(mesh=None, timeout_s: float = 30.0) -> dict:
    """All-reduce a per-process heartbeat across the mesh; returns per-host
    status.  A hung or dead host surfaces as a timeout here rather than a
    silent stall inside a collective."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import mesh as mesh_lib

    if mesh is None:
        mesh = mesh_lib.make_mesh()
    t0 = time.time()
    token = jnp.ones((mesh.devices.size,), jnp.int32)
    try:
        total = jax.jit(lambda t: jnp.sum(t))(token)
        ok = int(total) == mesh.devices.size
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": str(e),
                "elapsed_s": time.time() - t0}
    return {"ok": bool(ok), "devices": mesh.devices.size,
            "process_count": jax.process_count(),
            "elapsed_s": round(time.time() - t0, 3)}
