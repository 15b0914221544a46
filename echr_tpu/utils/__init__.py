from echr_tpu.utils.text import decode_sequence  # noqa: F401
