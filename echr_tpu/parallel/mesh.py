"""Device mesh construction and sharding rules.

Net-new vs the reference, which is strictly single-process single-GPU
(SURVEY §2.15/§5.8: no torch.distributed/NCCL/MPI anywhere).  The
TPU-native scaling story:

  * axis "data"  — data parallelism: each chip trains on different videos;
    gradients are reduced by XLA-inserted collectives over ICI (psum from
    the sharded-batch jit, no hand-written NCCL analogue).
  * axis "model" — tensor parallelism for the wide pieces: the vocab-sized
    logit/embedding matmuls and the TSRM head axis shard cleanly.

Shardings are expressed as `NamedSharding`/PartitionSpec on the arguments
of one jitted train step; XLA lays collectives on ICI.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from echr_tpu.config import Config


def build_mesh(cfg: Optional[Config] = None, devices=None, shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """Build a (data, model) mesh.  Defaults to all local devices on the
    data axis; `shape` overrides (dp, tp)."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = cfg.runtime.mesh_shape if cfg is not None else (len(devices), 1)
    dp, tp = shape
    if dp * tp != len(devices):
        dp, tp = len(devices) // max(tp, 1), max(tp, 1)
        if dp * tp != len(devices):
            dp, tp = len(devices), 1
    names = cfg.runtime.mesh_axis_names if cfg is not None else ("data", "model")
    arr = np.asarray(devices).reshape(dp, tp)
    mesh = Mesh(arr, names)
    _warmup_mesh_collectives(mesh)
    return mesh


_warmed_meshes = set()


def _warmup_mesh_collectives(mesh: Mesh) -> None:
    """Establish every Gloo communicator this mesh's collectives will use,
    NOW, while inter-process skew is small.

    XLA:CPU backs cross-process collectives with Gloo, which creates one
    communicator per device GROUP lazily at the first collective over that
    group — with a hard ~30 s rendezvous deadline (GetKeyValue timeout).
    The first real collective (e.g. the gradient psum inside a jitted
    train step) lands only after minutes of compile work whose duration
    can skew across processes (persistent-cache hit vs miss, host load);
    a >30 s skew kills the run with "Gloo context initialization failed:
    DEADLINE_EXCEEDED".  distributed.initialize's process-level warmup
    covers the one-device-per-process group that sync_global_devices
    uses, but NOT the per-mesh groups: a psum over the full (dp, tp) mesh
    rendezvouses a fresh group of all dp*tp devices, and per-axis psums
    use row/column groups.  Running a tiny psum over all axes and over
    each multi-device axis right after mesh construction creates those
    communicators while skew is milliseconds (the tiny programs compile
    in ~ms on every process).  Memoized per (device layout, axis names);
    no-op on single-process or non-CPU backends."""
    if jax.process_count() <= 1 or jax.default_backend() != "cpu":
        return
    key = (tuple(d.id for d in mesh.devices.flat),
           tuple(mesh.devices.shape), mesh.axis_names)
    if key in _warmed_meshes:
        return
    from jax.experimental.shard_map import shard_map

    names = mesh.axis_names
    axis_sets = [tuple(names)] + [
        (n,) for n in names if mesh.shape[n] > 1 and len(names) > 1
    ]
    for axes in axis_sets:
        def f(x, _axes=axes):
            return jax.lax.psum(x, _axes)

        g = jax.jit(shard_map(f, mesh=mesh,
                              in_specs=P(), out_specs=P()))
        np.asarray(g(np.ones((1,), np.float32)))  # fetch = exec barrier
    _warmed_meshes.add(key)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split over the data axis, rest replicated."""
    return NamedSharding(mesh, P("data"))


def param_sharding_rules(mesh: Mesh):
    """PartitionSpec tree rules for tensor-parallel parameters.

    Returns a function mapping a param path/leaf to a NamedSharding.  The
    wide vocab-dim matrices shard over "model"; everything else replicates.
    (With mesh model=1 this degenerates to full replication.)
    """

    tp = mesh.shape["model"]

    def fits(leaf, axis: int) -> bool:
        return leaf.shape[axis] % tp == 0

    def rule(path: Tuple[str, ...], leaf) -> NamedSharding:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        if "embed" in joined and leaf.ndim == 2 and fits(leaf, 0):
            return NamedSharding(mesh, P("model", None))  # [V+1, E] over vocab
        if "logit" in joined and leaf.ndim == 2 and fits(leaf, 1):
            return NamedSharding(mesh, P(None, "model"))  # [H, V+1] over vocab
        if "logit" in joined and leaf.ndim == 1 and fits(leaf, 0):
            return NamedSharding(mesh, P("model"))
        if "out_w" in joined and leaf.ndim == 3 and fits(leaf, 0):
            return NamedSharding(mesh, P("model", None, None))  # TSRM heads
        return NamedSharding(mesh, P())

    return rule


def shard_params(params, mesh: Mesh):
    """Place params by the tensor-parallel rules.  On a multi-process mesh
    the host-local copies (identical on every process — same PRNGKey) are
    lifted to global arrays via make_array_from_callback, since device_put
    cannot target non-addressable devices."""
    rule = param_sharding_rules(mesh)
    if jax.process_count() > 1:
        def put(path, leaf):
            s = rule(path, leaf)
            arr = np.asarray(leaf)
            return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])
    else:
        def put(path, leaf):
            return jax.device_put(leaf, rule(path, leaf))
    return jax.tree_util.tree_map_with_path(put, params)
