from echr_tpu.models.registry import (  # noqa: F401
    init_captioner,
    init_tap,
)
