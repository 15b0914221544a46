from echr_tpu.compat.torch_import import (  # noqa: F401
    import_reference_checkpoint,
    import_cg_state_dict,
    import_tap_state_dict,
)
