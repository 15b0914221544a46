"""Training CLI: `python -m echr_tpu.cli.train [reference-style flags]`.

Same flag surface as the reference's `python train.py` (reference:
opts.py + train.py:510-513) so the published experiment scripts translate
1:1 — see experiments/*.sh.
"""
from __future__ import annotations

import sys

from echr_tpu.config import parse_config
from echr_tpu.engine.train import train
from echr_tpu.utils.cache import enable_persistent_compile_cache


def main(argv=None) -> None:
    from echr_tpu.parallel.distributed import maybe_initialize_from_env

    enable_persistent_compile_cache()
    # parse BEFORE joining the cluster: a --help/typo exit must happen
    # before jax.distributed.initialize, or this host would join (and then
    # abandon) the barrier and wedge every other host at its first
    # collective
    cfg = parse_config(argv)
    # multi-host launch (net-new vs the reference): run this same command
    # on every host with ECHR_COORDINATOR/ECHR_NUM_PROCESSES/ECHR_PROCESS_ID
    # (or ECHR_DISTRIBUTED=1 on TPU pods) — train() then shards the batch
    # over the global mesh; see docs/OPERATIONS.md
    maybe_initialize_from_env()
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
