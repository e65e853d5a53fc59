"""Multi-host runtime initialization (the Toil leader/worker analog).

The reference distributes phases as Toil jobs over a shared jobstore
(SURVEY §2.4, §5); the TPU-native runtime is one SPMD program over all
hosts of a slice: `jax.distributed.initialize` joins the processes,
after which `jax.devices()` is the GLOBAL device list and the existing
mesh code (parallel/mesh.py) shards work across hosts automatically —
collectives ride ICI within a slice and DCN across slices.

Single-process runs (tests, one-chip benches) need no initialization;
every entry point here degrades to a no-op in that case.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               log=lambda m: None) -> bool:
    """Join the multi-host process group if configured; else no-op.

    Configuration comes from the arguments or the standard environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, as
    set by TPU pod launchers).  Returns True when running multi-host.
    """
    global _initialized
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return False
    if _initialized:
        return True
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("JAX_PROCESS_ID", "-1")))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=None if process_id < 0 else process_id)
    _initialized = True
    log(f"jax.distributed: process {jax.process_index()}/"
        f"{jax.process_count()}, {len(jax.devices())} global devices")
    return True


def is_primary() -> bool:
    """True on the host that does file I/O / logging (process 0)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def global_mesh(axis: str = "d", backend: str | None = None) -> Mesh:
    """1-D mesh over every device of every host (data-parallel axis for
    the chunk-pair grid)."""
    devs = jax.devices(backend) if backend else jax.devices()
    return Mesh(np.array(devs), (axis,))


def host_device_mesh(host_axis: str = "h", device_axis: str = "d",
                     backend: str | None = None) -> Mesh:
    """2-D (hosts × local devices) mesh: shard coarse work (ancestors,
    chromosome batches) over `h` riding DCN, fine work (pair batches)
    over `d` riding ICI — the scaling-book hybrid-mesh recipe."""
    devs = jax.devices(backend) if backend else jax.devices()
    n_proc = max(1, jax.process_count())
    per_host = len(devs) // n_proc
    if per_host * n_proc != len(devs):
        # uneven (or single-host test shells): fall back to 1 × N
        n_proc, per_host = 1, len(devs)
    grid = np.array(devs).reshape(n_proc, per_host)
    return Mesh(grid, (host_axis, device_axis))


def scaling_report(mesh: Mesh, t_one: float, t_mesh: float) -> dict:
    """Scaling-efficiency record for the BASELINE north-star
    (≥0.8 efficiency at 2 hosts): efficiency = t_one / (N * t_mesh)."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    eff = t_one / (n * t_mesh) if t_mesh > 0 else 0.0
    return dict(n_devices=n, t_one_s=t_one, t_mesh_s=t_mesh,
                efficiency=round(float(eff), 4))
