"""Multi-host initialisation.

Single-host multi-chip needs nothing: `jax.devices()` sees the whole slice
and the (data, model) mesh lays collectives on ICI.  Across hosts (DCN),
each process must join the cluster before any backend use; this wraps
`jax.distributed.initialize` with environment autodetection and builds the
global mesh over every process's devices.

The reference has no multi-process story at all (SURVEY §5.8); this is the
net-new scaling entry point.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax

from echr_tpu.parallel.mesh import build_mesh

log = logging.getLogger("echr_tpu.distributed")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host cluster.  On TPU pods the three arguments are
    autodetected from the environment; pass them explicitly elsewhere.
    No-op when running single-process."""
    n = num_processes if num_processes is not None else int(
        os.environ.get("ECHR_NUM_PROCESSES", "1")
    )
    if n <= 1 and coordinator_address is None:
        log.info("single process — skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed initialised: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def global_mesh(dp: Optional[int] = None, tp: int = 1):
    """Mesh over every device in the cluster.  Data-parallel rows should map
    to hosts first so gradient psum rides ICI within a host/slice and only
    crosses DCN once per ring step."""
    n = jax.device_count()
    if dp is None:
        dp = n // tp
    return build_mesh(shape=(dp, tp))
