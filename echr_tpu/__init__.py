"""echr_tpu — a TPU-native dense-video-captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the ECHR
reference codebase (Event-Centric Hierarchical Representation for dense
video captioning, TCSVT 2020): temporal action proposals (SST), a
hierarchical scene/event/frame context builder with cross-event relation
attention (TSRM), and an LSTM caption decoder family — re-designed for
TPUs: statically-shaped and masked everywhere, `lax.scan` recurrences,
MXU-friendly matmuls, data/tensor-parallel via `jax.sharding.Mesh`.

Package map (reference parity cited per module):
  config          — typed config tree mirroring the reference flag surface (opts.py)
  data/           — host input pipeline: label synthesis, batching, prefetch
  models/         — SST, TSRM, context builders, caption decoder cores
  ops/            — recurrent / attention / masked primitives + Pallas kernels
  engine/         — train/eval loops, checkpointing, curriculum
  parallel/       — mesh construction and sharding rules
  metrics/        — dense-video-captioning evaluation protocol (Py3)
  utils/          — logging, timers, misc
"""

__version__ = "0.1.0"

from echr_tpu.config import Config  # noqa: F401
