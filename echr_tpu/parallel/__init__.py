from echr_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    batch_sharding,
    replicated,
)
