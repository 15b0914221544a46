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
    _collective_warmup()


def _collective_warmup(attempts: int = 3) -> None:
    """Initialise the cross-host collective context EARLY with a trivial
    barrier, retried.  XLA:CPU's Gloo context init has a hard 30 s
    rendezvous deadline; without this, the first REAL collective lands
    after minutes of compile work whose duration can skew between
    processes (persistent-cache hits vs fresh compiles, host load), and a
    >30 s skew kills the run.  At process start the skew is milliseconds.
    CPU-only: TPU collectives ride ICI with the coordination service's
    long barriers and need no warmup."""
    import time as _time

    if jax.process_count() <= 1 or jax.default_backend() != "cpu":
        return
    from jax.experimental import multihost_utils

    for attempt in range(attempts):
        try:
            multihost_utils.sync_global_devices(f"echr_gloo_warmup_{attempt}")
            return
        except Exception:  # Gloo rendezvous deadline — peer slow; retry
            if attempt == attempts - 1:
                raise
            log.warning("collective warmup attempt %d timed out; retrying",
                        attempt)
            _time.sleep(5)


def maybe_initialize_from_env() -> bool:
    """CLI entry hook: join a cluster when the environment asks for one.

    * ``ECHR_COORDINATOR=host:port`` + ``ECHR_NUM_PROCESSES`` +
      ``ECHR_PROCESS_ID`` — explicit cluster (CPU labs, non-pod setups);
    * ``ECHR_DISTRIBUTED=1`` — full autodetection (TPU pods, where
      jax.distributed.initialize() discovers the topology itself).

    Returns True when a cluster was joined.  Launch the SAME command on
    every host; engine.train/evaluate pick up jax.process_count() from
    there (see docs/OPERATIONS.md)."""
    # make the environment's platform choice authoritative: an interpreter-
    # startup PJRT plugin registration (e.g. a sitecustomize) may have
    # flipped jax_platforms after the env var was read
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialised; leave it be
    coord = os.environ.get("ECHR_COORDINATOR")
    if coord:
        initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["ECHR_NUM_PROCESSES"]),
            process_id=int(os.environ["ECHR_PROCESS_ID"]),
        )
        return True
    if os.environ.get("ECHR_DISTRIBUTED", "").lower() in ("1", "true"):
        jax.distributed.initialize()
        log.info(
            "distributed autodetect: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )
        _collective_warmup()
        return True
    return False


def global_mesh(dp: Optional[int] = None, tp: int = 1):
    """Mesh over every device in the cluster.  Data-parallel rows should map
    to hosts first so gradient psum rides ICI within a host/slice and only
    crosses DCN once per ring step."""
    n = jax.device_count()
    if n % max(tp, 1) != 0:
        # build_mesh would silently fall back to (n, 1), discarding the
        # requested tensor-parallel layout — fail fast instead
        raise ValueError(
            f"tensor-parallel degree {tp} does not divide the cluster's "
            f"{n} devices; choose tp | device_count")
    if dp is None:
        dp = n // tp
    elif dp * tp != n:
        # same fail-fast for an explicit dp: build_mesh would silently
        # rebuild as (n // tp, tp), discarding the requested layout
        raise ValueError(
            f"dp*tp = {dp}*{tp} does not cover the cluster's {n} devices; "
            f"choose dp*tp == device_count (or omit dp)")
    return build_mesh(shape=(dp, tp))


def allgather_object(obj):
    """All-gather an arbitrary picklable/JSON-able object across processes;
    returns the per-process list [obj_0, ..., obj_{P-1}] on every process.

    Two-phase ragged gather over the jax collective transport (DCN): first
    every process's payload length, then the zero-padded payload bytes.
    Single-process: returns [obj] without touching the backend."""
    import pickle

    import numpy as np

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    lens = multihost_utils.process_allgather(
        np.array([payload.size], np.int64), tiled=False
    ).reshape(-1)
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = multihost_utils.process_allgather(buf, tiled=False)
    gathered = np.asarray(gathered).reshape(jax.process_count(), -1)
    return [
        pickle.loads(gathered[p, : int(lens[p])].tobytes())
        for p in range(jax.process_count())
    ]


def gather_predictions(predictions: dict) -> dict:
    """Merge per-host eval prediction dicts (vid -> records) from a
    host-sharded eval sweep into the full split's predictions on every
    process.  Hosts see disjoint videos (Loader shard), so the merge is a
    plain union; duplicate vids keep the lowest process's copy."""
    merged: dict = {}
    for part in allgather_object(predictions):
        for vid, recs in part.items():
            merged.setdefault(vid, recs)
    return merged
