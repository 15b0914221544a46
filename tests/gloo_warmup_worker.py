"""Worker for the Gloo mesh-collective warmup test (run via subprocess).

Usage: python gloo_warmup_worker.py <port> <pid> <skew_s> <warmup:0|1>
Env (set by the parent test): JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=2

Reproduces the test_multihost flake: XLA:CPU creates one Gloo
communicator per device GROUP, lazily, at the first collective over that
group, with a hard ~30 s rendezvous deadline (GetKeyValue timeout).  The
first psum over a fresh (dp, tp) mesh lands after the jitted step's
compile, and compile skew between processes (cache hit vs miss, host
load) can exceed 30 s.

This worker makes the skew explicit: build the mesh, then process 1
sleeps `skew_s` seconds (standing in for a slow compile) before both run
a psum over the full mesh.  With warmup=1 (parallel.mesh.build_mesh's
_warmup_mesh_collectives, the default) the communicator already exists
when the skewed psum arrives, so the fast process just waits in the op;
with warmup=0 the group rendezvous itself eats the skew, and a skew
> 30 s dies with "Gloo context initialization failed: DEADLINE_EXCEEDED".
"""
import sys
import time


def main(port: int, pid: int, skew_s: float, warmup: bool) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from echr_tpu.parallel import mesh as mesh_mod
    from echr_tpu.parallel.distributed import initialize

    if not warmup:
        mesh_mod._warmup_mesh_collectives = lambda m: None

    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=2, process_id=pid)
    assert jax.device_count() == 4, jax.device_count()

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = mesh_mod.build_mesh(shape=(4, 1))

    if pid == 1 and skew_s > 0:
        time.sleep(skew_s)  # stand-in for a slow big-step compile

    f = jax.jit(shard_map(lambda v: jax.lax.psum(v, ("data", "model")),
                          mesh=mesh, in_specs=P(), out_specs=P()))
    out = np.asarray(f(np.full((2,), 1.0, np.float32)))
    assert float(out[0]) == 4.0, out  # replicated 1.0 psum'd over 4 devices
    print("PSUM_OK", float(out[0]), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3]),
         bool(int(sys.argv[4])))
